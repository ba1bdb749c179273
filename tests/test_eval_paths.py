"""Eval-path equivalence: the host-offload (use_cpu_cache) multi-scale path
must match the single fused-jit path."""

import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.backbones import get_backbone
from iseg_tpu.core.evaluation import make_eval_step
from iseg_tpu.core.model import SegManaged, SegModelInferenceConfig
from iseg_tpu.nn.heads import SimpleDecoder


def test_cpu_cache_path_matches_fused():
    model = SegManaged(
        num_class=4,
        backbone=get_backbone("mobilenetv2", output_stride=16, width_multiplier=0.35),
        head=SimpleDecoder(filters=16, low_level_filters=8),
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)

    base_cfg = dict(scale_rates=(0.5, 1.0), flip=True)
    fused = make_eval_step(model.apply, variables,
                           SegModelInferenceConfig(**base_cfg))
    offload = make_eval_step(model.apply, variables,
                             SegModelInferenceConfig(use_cpu_cache=True, **base_cfg))

    a = np.asarray(fused(x))
    b = np.asarray(offload(x))
    assert a.shape == b.shape == (1, 32, 32, 4)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

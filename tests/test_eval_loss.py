import jax
import jax.numpy as jnp
import numpy as np

from iseg_tpu.backbones import get_backbone
from iseg_tpu.core.env import EnvConfig, common_env_setup
from iseg_tpu.core.evaluation import evaluate
from iseg_tpu.core.model import SegManaged
from iseg_tpu.nn.heads import SimpleDecoder


def test_evaluate_with_loss():
    env = common_env_setup(EnvConfig(mixed_precision=False))
    model = SegManaged(
        num_class=3,
        backbone=get_backbone("mobilenetv2", output_stride=16, width_multiplier=0.35),
        head=SimpleDecoder(filters=16, low_level_filters=8),
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))

    rng = np.random.RandomState(0)

    def ds():
        for _ in range(2):
            yield {
                "image": rng.rand(8, 32, 32, 3).astype(np.float32),
                "label": rng.randint(0, 3, (8, 32, 32)).astype(np.int32),
            }

    miou, per_class = evaluate(env, model, variables, ds(), verbose=False,
                               compute_loss=True)
    assert 0.0 <= miou <= 1.0
    assert per_class.shape == (3,)

"""End-to-end TRAIN-TRAJECTORY parity against the reference's own training
step (VERDICT round-3 missing #1).

Every other parity test is pointwise (activations, losses, schedules,
metrics — each vs the reference's code in isolation). This one runs the
reference's actual compiled Keras train path — ``SegManaged`` composition
(layers/core_model_ext.py:24) -> ``create_compiled_model``
(utils/model_utils.py:20-83) with the real CE-ignore loss
(losses/catecrossentropy_ignore_label.py, reduction=False -> Keras
sum_over_batch_size) -> keras SGD + WarmUpPolyDecay
(core_optimizer.py:132-188) -> ``train_on_batch`` — for N steps from
weight-synced initialization, and requires OUR ``make_train_step`` to
reproduce the per-step loss trajectory AND the updated parameters
(including BN moving stats) within fp32 tolerance.

This is exactly where a silent 0.3-mIoU drift would hide: the COMPOSITION
of loss reduction x BN batch-stat update x optimizer ordering x LR
schedule. Two semantics had to be pinned to make it pass and are now
framework knobs, documented in PARITY.md:
  * Keras SGD momentum ordering (velocity carries each step's own LR) —
    ``get_optimizer(..., keras_momentum=True)``.
  * The reference's poly-warmup clamp quirk — ``poly_ref_exact=True``.

Known reference bug worked around here: ``compute_final_results``
(core_model_ext.py:228-248) falls through with NO return on the keras3
branch; the test subclass restores the obvious intent (fp32-cast list).

Marked ``parity``; requires tensorflow (present in this image).
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.parity

tf = pytest.importorskip("tensorflow")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import ref_compat  # noqa: E402
from iseg_tpu.backbones import get_backbone  # noqa: E402
from iseg_tpu.core import weight_maps  # noqa: E402
from iseg_tpu.core.h5_ingest import (  # noqa: E402
    canonical_ref_name,
    load_h5_weights_by_name,
)
from iseg_tpu.core.model import SegManaged  # noqa: E402
from iseg_tpu.core.optimizer import get_optimizer  # noqa: E402
from iseg_tpu.core.train import create_train_state, make_train_step  # noqa: E402
from iseg_tpu.nn import norm as norm_mod  # noqa: E402
from iseg_tpu.nn.heads.aspp import ASPP  # noqa: E402
from iseg_tpu.nn.heads.simpledecoder import SimpleDecoder  # noqa: E402

NC = 5
N_STEPS = 10
BATCH = 2
# lr/schedule chosen so the 10 steps cross the warmup->poly boundary AND
# carry a different LR every step (the keras-vs-optax momentum ordering
# divergence is invisible under a constant LR)
LR_KW = dict(learning_rate=0.02, end_learning_rate=1e-4, train_steps=100,
             warmup_steps=5, warmup_learning_rate=1e-3, poly_power=0.9)


@pytest.fixture(scope="module")
def shims():
    ref_compat.install_keras2_shims()
    # the reference's normalization() factory defaults EVERY BN to
    # momentum=0.9 (layers/normalizations.py:41) — its backbones and heads
    # all construct through it. Match globally so BN moving stats can be
    # compared too, and restore afterwards.
    norm_mod.set_bn_momentum(0.9)
    yield
    norm_mod.set_bn_momentum(None)


def _make_ref_model(backbone_name, head, low_idx, size, output_stride,
                    head_results=None, **model_kwargs):
    """``head_results(self, endpoints, training)`` overrides the default
    single-output head call (used by the aux-loss trajectory tests);
    ``model_kwargs`` pass through to SegFoundation (num_aux_loss, ...)."""
    import keras  # noqa: F401
    from iseg.layers.core_model_ext import SegManaged as RefSegManaged

    class RefSegModel(RefSegManaged):
        def __init__(self, **kw):
            super().__init__(**kw)
            self.head = head
            self._low_idx = low_idx

        def compute_head_results(self, head_inputs, training=None):
            eps = head_inputs
            if head_results is not None:
                return head_results(self, eps, training)
            if self._low_idx is None:
                return [self.head(eps[-1], training=training)]
            return [self.head([eps[self._low_idx], eps[-1]],
                              training=training)]

        def compute_final_results(self, logits_list):
            # reference core_model_ext.py keras3 branch has no return —
            # restore the intent: fp32-cast output list
            return [tf.cast(l, tf.float32) for l in logits_list]

    model = RefSegModel(
        backbone_name=backbone_name,
        output_stride=output_stride,
        num_class=model_kwargs.pop("num_class", NC),
        build_input_size=(size, size),
        use_dict_outputs=True,
        **model_kwargs,
    )
    model(tf.zeros((BATCH, size, size, 3)), training=False)
    return model


def _randomize(model, seed=0):
    rng = np.random.RandomState(seed)
    for w in model.weights:
        a = rng.randn(*w.shape).astype(np.float32) * 0.05
        name = w.path if hasattr(w, "path") else w.name
        if "moving_variance" in name:
            a = np.abs(a) + 0.5
        if "moving_mean" in name:
            a = a * 0.2
        w.assign(a)


def _ref_key(weights, *subs):
    hits = [k for k in weights if all(s in k for s in subs)]
    assert len(hits) == 1, (subs, hits[:4])
    return canonical_ref_name(hits[0])


def _head_map(variables, weights, blocks, logits_in_reorder=None):
    """Map our head/logits flax paths to the reference model's weight keys.

    ``blocks``: {our ConvNormAct name: ref layer base name}. Conv kernels
    live at ``<base>_conv/kernel`` (ConvNormAct names its conv
    ``{name}_conv``, model_builder.py:64), BN weights at ``<base>_bn/*``.
    """
    leaf_bn = {"scale": "gamma", "bias": "beta",
               "mean": "moving_mean", "var": "moving_variance"}
    mapping = {}
    for path in weight_maps._paths(variables):
        segs = path.split("/")
        leaf = segs[-1]
        if "logits_conv" in segs:
            spec = _ref_key(weights, "logits_conv/" + leaf)
            if leaf == "kernel" and logits_in_reorder is not None:
                mapping[path] = (spec, logits_in_reorder)
            else:
                mapping[path] = spec
            continue
        if "head" not in segs:
            continue
        block = next((b for b in blocks if b in segs), None)
        if block is None:
            continue
        base, transform = blocks[block]
        if segs[-2] == "conv" or leaf in ("kernel",) and "norm" not in segs:
            spec = _ref_key(weights, f"{base}_conv/{leaf}")
            mapping[path] = (spec, transform) if (
                transform is not None and leaf == "kernel") else spec
        else:
            spec = _ref_key(weights, f"{base}_bn/{leaf_bn[leaf]}")
            mapping[path] = spec
    return mapping


def _run_ref_steps(model, batches, snap_at=None):
    import keras
    from iseg.optimizers.polydecay import WarmUpPolyDecay
    from iseg.utils.model_utils import create_compiled_model

    sched = WarmUpPolyDecay(
        LR_KW["learning_rate"], LR_KW["train_steps"],
        end_learning_rate=LR_KW["end_learning_rate"],
        power=LR_KW["poly_power"], warmup_steps=LR_KW["warmup_steps"],
        warmup_learning_rate=LR_KW["warmup_learning_rate"])
    opt = keras.optimizers.SGD(learning_rate=sched, momentum=0.9)
    create_compiled_model(model, NC, ignore_label=255, batch_size=BATCH,
                          jit_compile=False, optimizer=opt)
    losses, snap = [], None
    for i, (x, y) in enumerate(batches):
        # keras3's logged "loss" is a RUNNING MEAN across train_on_batch
        # calls — reset the trackers so each step reports ITS batch's loss
        for m in model.metrics:
            m.reset_state()
        logs = model.train_on_batch(
            tf.constant(x), {"output_1": tf.constant(y[..., None])},
            return_dict=True)
        losses.append(float(logs["loss"]))
        if snap_at is not None and i + 1 == snap_at:
            snap = ref_compat.extract_weights(model)
    return losses, snap


def _run_our_steps(our_model, variables, batches, snap_at=None):
    tx, _ = get_optimizer(
        variables["params"], "sgd", decay_strategy="poly", sgd_momentum=0.9,
        keras_momentum=True, poly_ref_exact=True, **LR_KW)
    state = create_train_state(
        our_model, jax.random.PRNGKey(0), None, tx, variables=variables)
    step = make_train_step(our_model.build_loss_fn(), donate=False)
    rng = jax.random.PRNGKey(0)
    losses, snap = [], None
    for i, (x, y) in enumerate(batches):
        state, parts = step(
            state, {"image": jnp.asarray(x), "label": jnp.asarray(y)}, rng)
        losses.append(float(parts["loss"]))
        if snap_at is not None and i + 1 == snap_at:
            snap = jax.device_get({"params": state.params,
                                   "batch_stats": state.batch_stats})
    return losses, snap, state


def _make_batches(seed=7):
    rng = np.random.RandomState(seed)
    batches = []
    for _ in range(N_STEPS):
        x = rng.randn(BATCH, *_SIZE_HW, 3).astype(np.float32)
        y = rng.randint(0, NC, (BATCH, *_SIZE_HW)).astype(np.int32)
        y[0, : _SIZE_HW[0] // 8] = 255  # exercise the ignore mask
        batches.append((x, y))
    return batches


_SIZE_HW = (64, 64)


def _sync_and_compare(ref_model, our_model, map_fn, label,
                      late_loss_tol=5e-5):
    """Randomize ref weights, sync into ours, run N steps on both, compare
    loss trajectories and ALL updated variables (params + BN stats).

    ``late_loss_tol`` applies from step 3 on: fp32 rounding chaos. TF and
    XLA necessarily differ at ~1e-7/op in reduction order; BN's divide-by-
    batch-variance AMPLIFIES weight deltas multiplicatively per layer per
    step. Measured on this exact pipeline (ResNet-50+ASPP, 53 BN layers):
    a 1e-6 perturbation of ONE weight moves the step-2 loss by ~1e-2 under
    default init; under the tamer 0.05-scale synced init the observed
    TF-vs-ours drift reaches ~3e-4 by step 9 while steps 0-2 agree to
    ~1e-6. Steps 0-2 therefore carry the tight SEMANTIC tolerance (any
    optimizer/loss/BN mistake shows up at step 1-2 orders of magnitude
    above it) and later steps get the documented chaos allowance, with the
    final-weight comparison (scale-relative) as the backstop."""
    _randomize(ref_model)
    weights0 = ref_compat.extract_weights(ref_model)

    variables = our_model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((BATCH, *_SIZE_HW, 3)), train=False)
    mapping = map_fn(variables, weights0)
    variables, report = load_h5_weights_by_name(
        variables, weights0, name_map=mapping)
    assert not report["missing"], (
        f"{label}: unmapped params {report['missing'][:8]}")

    batches = _make_batches()
    snap_at = 2  # weight comparison inside the semantic window (see above)
    our_losses, our_snap, state = _run_our_steps(
        our_model, variables, batches, snap_at=snap_at)
    ref_losses, ref_snap = _run_ref_steps(ref_model, batches,
                                          snap_at=snap_at)

    for i, (want, got) in enumerate(zip(ref_losses, our_losses)):
        tol = 5e-5 if i < 3 else max(5e-5, late_loss_tol)
        assert abs(want - got) < tol * max(1.0, abs(want)), (
            f"{label} step {i}: ref loss {want:.6f} vs ours {got:.6f}\n"
            f"ref: {ref_losses}\nours: {our_losses}")

    # updated variables at step ``snap_at``: pull the reference's trained
    # weights through the SAME name map, diff against our trained state.
    # (At step 10 the chaotic amplification measured above has decorrelated
    # the early-layer updates entirely — the loss-trajectory check carries
    # the long-horizon evidence; the weight check carries the short-horizon
    # semantic exactness: update rule x LR x momentum x BN-update.)
    expected, report = load_h5_weights_by_name(
        our_snap, ref_snap, name_map=mapping)
    assert not report["missing"]

    flat_exp = jax.tree_util.tree_flatten_with_path(expected)[0]
    got_leaves = jax.tree_util.tree_flatten_with_path(our_snap)[0]
    got_by_path = {"/".join(str(getattr(q, "key", q)) for q in path): leaf
                   for path, leaf in got_leaves}
    init_leaves = jax.tree_util.tree_flatten_with_path(variables)[0]
    init_by_path = {"/".join(str(getattr(q, "key", q)) for q in path): leaf
                    for path, leaf in init_leaves}

    moved = 0.0
    for path, want in flat_exp:
        key = "/".join(str(getattr(q, "key", q)) for q in path)
        got = np.asarray(got_by_path[key])
        want = np.asarray(want)
        scale = np.abs(want).max() + 1e-6
        err = np.abs(want - got).max()
        assert err < 2e-3 * scale + 1e-4, (
            f"{label}: {key} max abs err {err:.3e} (scale {scale:.3e})")
        moved = max(moved, np.abs(
            np.asarray(init_by_path[key]) - got).max())
    # the comparison must not pass vacuously: training must have actually
    # changed the weights by far more than the tolerance
    assert moved > 1e-3, f"{label}: weights barely moved ({moved:.2e})"


def test_mobilenetv2_simpledecoder_trajectory(shims):
    """MobileNetV2 + SimpleDecoder (DeepLabV3+-style), os32."""
    from iseg.layers.simpledecoder import SimpleDecoder as RefSimpleDecoder

    ref_model = _make_ref_model(
        "mobilenetv2",
        RefSimpleDecoder(low_level_filters=48, mlp_filters=96),
        low_idx=1, size=_SIZE_HW[0], output_stride=32)

    our_model = SegManaged(
        backbone=get_backbone("mobilenetv2", output_stride=32),
        head=SimpleDecoder(filters=96, low_level_filters=48,
                           low_level_index=1),
        num_class=NC, loss_reduction="all_mean")

    def map_fn(variables, weights):
        mapping = dict(weight_maps.keras_mobilenetv2_name_map(variables))

        def fuse0_reorder(w):
            # the reference decoder concats [low(48ch), high]
            # (simpledecoder.py:33); ours concats [high, low(48ch)] —
            # permute the kernel's input-channel axis to match
            return np.concatenate([w[:, :, 48:], w[:, :, :48]], axis=2)

        mapping.update(_head_map(
            variables, weights,
            blocks={"low_level_project": ("low_level_entry_conv", None),
                    "fuse0": ("finetune_conv0", fuse0_reorder),
                    "fuse1": ("finetune_conv1", None)}))
        return mapping

    _sync_and_compare(ref_model, our_model, map_fn, "mnv2+simpledecoder")


def test_resnet50_aspp_trajectory(shims):
    """ResNet-50 + ASPP (DeepLabV3-style) at os16 with multi-grid + atrous
    rates — the BASELINE #1 configuration's composition at toy geometry."""
    from iseg.layers.aspp import (
        AtrousSpatialPyramidPooling as RefASPP,
    )

    ref_model = _make_ref_model(
        "resnet50", RefASPP(filters=96, dilation_rates=[3, 6, 9]),
        low_idx=None, size=_SIZE_HW[0], output_stride=16)

    our_model = SegManaged(
        backbone=get_backbone("resnet50", output_stride=16),
        head=ASPP(filters=96, atrous_rates=(3, 6, 9), dropout_rate=0.0,
                  use_projection=False),
        num_class=NC, loss_reduction="all_mean")

    def map_fn(variables, weights):
        mapping = dict(weight_maps.keras_resnet_name_map(variables))
        mapping.update(_head_map(
            variables, weights,
            blocks={"image_pool": ("conv", None),
                    "conv1x1": ("pixel_level_block", None),
                    "atrous0": ("asp_convs_3", None),
                    "atrous1": ("asp_convs_6", None),
                    "atrous2": ("asp_convs_9", None)}))
        return mapping

    _sync_and_compare(ref_model, our_model, map_fn, "resnet50+aspp",
                      late_loss_tol=1e-3)

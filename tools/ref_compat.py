"""Run the public reference (edwardyehuang/iSeg) under this image's
Keras 3 to extract ground-truth weight inventories and activations.

The reference targets older Keras/TF versions; ``install_keras2_shims``
applies the minimal compat patches (slash-in-name sanitization identical
to the reference's own ``replace_slash``, the Keras-2 ``add_weight(name,
shape)`` positional order, float Dense units, required-positional
``training`` args, TensorShape-typed build inputs) so its constructors
build unchanged. Used by the activation-parity tests and the inventory
dump — never imported by the framework itself.
"""

from __future__ import annotations

import inspect
import os
import sys

REFERENCE_PKG_DIR = "/tmp/refpkg"
REFERENCE_SRC = "/root/reference"

_installed = False


def _ensure_pkg_alias():
    os.makedirs(REFERENCE_PKG_DIR, exist_ok=True)
    link = os.path.join(REFERENCE_PKG_DIR, "iseg")
    if not os.path.islink(link):
        os.symlink(REFERENCE_SRC, link)
    if REFERENCE_PKG_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_PKG_DIR)


def install_keras2_shims():
    global _installed
    if _installed:
        return
    _installed = True
    _ensure_pkg_alias()
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")

    import keras
    import keras.src.backend.common.name_scope as ns_mod
    import keras.src.backend.common.variables as var_mod
    import keras.src.ops.operation as op_mod

    _op_init = op_mod.Operation.__init__

    def op_init(self, name=None, **kw):
        if isinstance(name, str):
            name = name.replace("/", ".")
        return _op_init(self, name=name, **kw)

    op_mod.Operation.__init__ = op_init

    _ns_init = ns_mod.name_scope.__init__

    def ns_init(self, name, *a, **kw):
        if isinstance(name, str):
            name = name.replace("/", ".")
        return _ns_init(self, name, *a, **kw)

    ns_mod.name_scope.__init__ = ns_init

    _v_init = var_mod.Variable.__init__

    def v_init(self, *a, name=None, **kw):
        if isinstance(name, str):
            name = name.replace("/", ".")
        return _v_init(self, *a, name=name, **kw)

    var_mod.Variable.__init__ = v_init

    from keras.layers import Dense, Layer

    _add_weight = Layer.add_weight

    def add_weight(self, *args, **kw):
        if args and isinstance(args[0], str):
            kw.setdefault("name", args[0])
            args = args[1:]
        return _add_weight(self, *args, **kw)

    Layer.add_weight = add_weight

    _dense_init = Dense.__init__

    def dense_init(self, units, *a, **kw):
        return _dense_init(self, int(units), *a, **kw)

    Dense.__init__ = dense_init

    # Reference bug under keras 3: RandomErasingAugment draws its area
    # count with ``keras.random.uniform([], ..., dtype="int32")``
    # (random_erasing_augment.py:91) — keras3's random.uniform rejects
    # integer dtypes (keras2's backend.random_uniform allowed them).
    # Route integer draws to tf.random.uniform (identical semantics:
    # maxval-exclusive) so the reference's own erase recipe can run.
    import keras.random as kr_mod

    _k_uniform = kr_mod.uniform

    def k_uniform(shape, minval=0.0, maxval=1.0, dtype=None, seed=None):
        import tensorflow as tf

        if dtype is not None and not keras.backend.is_float_dtype(dtype):
            return tf.random.uniform(
                shape, minval=minval, maxval=maxval, dtype=dtype, seed=seed)
        return _k_uniform(shape, minval=minval, maxval=maxval, dtype=dtype,
                          seed=seed)

    kr_mod.uniform = k_uniform


def _relax_required_training(mod):
    for nm in dir(mod):
        cls = getattr(mod, nm)
        if inspect.isclass(cls) and "call" in vars(cls):
            try:
                sig = inspect.signature(cls.call)
                params = list(sig.parameters)
                if params and params[-1] == "training" and (
                        sig.parameters["training"].default
                        is inspect.Parameter.empty):
                    cls.call.__defaults__ = (False,)
            except (ValueError, TypeError):
                pass


def _install_moat_shims():
    import tensorflow as tf

    import iseg.backbones.moat.attention as ma
    import iseg.backbones.moat.moat as mo
    import iseg.backbones.moat.moat_blocks as mb

    for m in (mb, mo, ma):
        _relax_required_training(m)

    if not getattr(ma.TrailDense, "_iseg_tpu_shimmed", False):
        ma.TrailDense._iseg_tpu_shimmed = True
        _td_build = ma.TrailDense.build

        def td_build(self, input_shape):
            object.__setattr__(self, "_output_trailing_dimensions",
                               tuple(self._output_trailing_dimensions))
            return _td_build(self, tf.TensorShape(input_shape))

        ma.TrailDense.build = td_build

        _at_build = ma.Attention.build

        def at_build(self, input_shape):
            return _at_build(self, tf.TensorShape(input_shape))

        ma.Attention.build = at_build


def build_reference_backbone(name: str, size: int, output_stride: int = 32,
                             **kwargs):
    """Build + forward-build a reference backbone; returns the keras model."""
    install_keras2_shims()
    if "moat" in name:
        _install_moat_shims()
    from iseg.backbones.feature_extractor import get_backbone

    return get_backbone(
        name, weights_path=None, return_endpoints=True,
        output_stride=output_stride, image_shape=(1, size, size, 3),
        **kwargs)


def build_reference_mixer(variant: str = "b16"):
    install_keras2_shims()
    import tensorflow as tf

    from iseg.backbones.mlp_mixer import MLPMixer

    cfg = {"b16": (768, 16, 12, 384, 3072, "Mixer-B_16"),
           "l16": (1024, 16, 24, 512, 4096, "Mixer-L_16")}[variant]
    f, p, n, t, c, name = cfg
    # the reference's mixer_b16 iterates num_blocks (mlp_mixer.py:75) — it
    # requires an iterable, so pass the range its ctor meant
    m = MLPMixer(filters=f, patch_size=p, num_blocks=range(n),
                 token_filters=t, channel_filters=c, name=name)
    m(tf.zeros((1, 224, 224, 3)))
    return m


def extract_weights(model) -> dict:
    """{keras3 weight path: np.ndarray} for every weight in the model."""
    import numpy as np

    out = {}
    for w in model.weights:
        p = w.path if hasattr(w, "path") else w.name
        out[p] = np.asarray(w)
    return out


def reference_forward(model, x):
    """Run the reference model in inference mode; returns list of numpy
    endpoint arrays."""
    import numpy as np
    import tensorflow as tf

    out = model(tf.constant(x), training=False)
    if not isinstance(out, (list, tuple)):
        out = [out]
    return [None if o is None else np.asarray(o) for o in out]

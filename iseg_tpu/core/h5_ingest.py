"""Name-based H5 pretrained-weight ingest.

Parity with the reference's ``saver/h5_saver.py`` (``load_h5_weight_by_name``
:38 — topology-independent, slash-name normalization :96) and
``utils/hdf5_utils.py`` (group walking, batched assigns :346), which load
Keras ``.h5`` backbone weights published for the reference zoo.

Design: a flat {name: array} view of the h5 file + a mapper from flax param
paths to h5 names. Shape checking happens at assign time; conv kernels in
Keras are already HWIO (matching flax), dense kernels are [in, out]
(matching flax), BN order is gamma/beta/moving_mean/moving_variance.
"""

from __future__ import annotations

import re
from typing import Callable, Mapping, Optional

import jax
import numpy as np


def read_h5_weights(path: str) -> dict[str, np.ndarray]:
    """Flatten a Keras .h5 weight file into {slash-name: array}.

    Handles both Keras-2 ``layer_names``/``weight_names`` attr layouts and
    plain nested groups (Keras-3 ``.weights.h5``)."""
    import h5py

    out: dict[str, np.ndarray] = {}

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            out[name] = np.asarray(obj)

    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        root.visititems(visit)
    return {normalize_weight_name(k): v for k, v in out.items()}


def normalize_weight_name(name: str) -> str:
    """Strip ``:0`` suffixes, collapse duplicate path segments, normalize
    separators (reference ``h5_saver.py:96`` slash normalization)."""
    name = name.split(":")[0]
    parts = [p for p in name.split("/") if p]
    # keras2 files repeat the layer name (layer/layer/kernel)
    dedup = []
    for p in parts:
        if not dedup or dedup[-1] != p:
            dedup.append(p)
    return "/".join(dedup)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return "/".join(parts)


# flax param leaf -> keras weight vocabulary
_LEAF_SYNONYMS = {
    "kernel": ("kernel", "depthwise_kernel"),
    "bias": ("bias",),
    "scale": ("gamma",),
    "mean": ("moving_mean",),
    "var": ("moving_variance",),
    "embedding": ("embeddings", "embedding"),
}


def load_h5_weights_by_name(
    variables,
    h5_path: str,
    name_map: Optional[Mapping[str, str] | Callable[[str], Optional[str]]] = None,
    strict: bool = False,
    verbose: bool = False,
):
    """Assign h5 weights into a flax variables pytree by name.

    Args:
      variables: {"params": ..., "batch_stats": ...} pytree to fill.
      name_map: optional exact mapping {flax_path: h5_name} or a callable
        returning the h5 name for a flax path (None = use heuristics).
      strict: raise when a parameter finds no h5 counterpart.
    Returns (new_variables, report dict with 'loaded'/'missing' lists).
    """
    weights = read_h5_weights(h5_path)
    norm_index: dict[str, str] = {}
    for k in weights:
        norm_index[k.lower()] = k

    loaded, missing = [], []

    def lookup(path_str: str, leaf: np.ndarray) -> Optional[np.ndarray]:
        if callable(name_map):
            target = name_map(path_str)
            if target is not None and target in weights:
                return weights[target]
        elif name_map and path_str in name_map:
            target = name_map[path_str]
            if target in weights:
                return weights[target]

        # heuristic: match by tail leaf synonym + module path tokens + shape
        segs = path_str.lower().split("/")
        leaf_name = segs[-1]
        synonyms = (leaf_name,) + _LEAF_SYNONYMS.get(leaf_name, ())
        prefix = [s for s in segs[:-1] if s not in ("params", "batch_stats")]
        candidates = []
        for norm, orig in norm_index.items():
            nsegs = norm.split("/")
            if nsegs[-1] not in synonyms:
                continue
            if weights[orig].shape != leaf.shape:
                continue
            score = sum(1 for p in prefix if p in norm)
            candidates.append((score, orig))
        if not candidates:
            return None
        candidates.sort(key=lambda t: -t[0])
        best_score, best = candidates[0]
        ties = [c for s, c in candidates if s == best_score]
        if len(ties) > 1 and best_score == 0:
            return None  # ambiguous
        return weights[best]

    def assign(path, leaf):
        p = _path_str(path)
        w = lookup(p, np.asarray(leaf))
        if w is None:
            missing.append(p)
            return leaf
        if w.shape != leaf.shape:
            missing.append(p)
            return leaf
        loaded.append(p)
        return jax.numpy.asarray(w, leaf.dtype)

    new_vars = jax.tree_util.tree_map_with_path(assign, variables)
    if strict and missing:
        raise ValueError(f"unmatched parameters: {missing[:10]} (+{len(missing)-10 if len(missing)>10 else 0})")
    if verbose:
        print(f"h5 ingest: loaded {len(loaded)}, missing {len(missing)}")
    return new_vars, {"loaded": loaded, "missing": missing}


def save_h5_weights(variables, h5_path: str) -> None:
    """Write a flax variables pytree to a flat .h5 file (round-trip format
    readable by :func:`read_h5_weights`)."""
    import h5py

    with h5py.File(h5_path, "w") as f:
        def write(path, leaf):
            f.create_dataset(_path_str(path), data=np.asarray(leaf))
            return leaf

        jax.tree_util.tree_map_with_path(write, variables)

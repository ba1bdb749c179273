"""Compile-only cost diff between the fast and slow DCNv3 compositions
(stage3 geometry): XLA cost_analysis + HLO op census, no timing loops.

Run on any backend: python tools/probe_ii_cost.py
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from iseg_tpu.ops.deform import (
    dcnv3_ref_effective_offsets,
    deform_dense_local,
)

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/iseg_tpu_xla"))

B, HW, C, G, K, R = 8, 32, 256, 16, 3, 2
GC = C // G
KK = K * K
BF16 = jnp.bfloat16

rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(B, HW, HW, C), BF16)
wv = jnp.asarray(rng.rand(C, C) * 0.05, BF16)
wo_ = jnp.asarray(rng.rand(C, C) * 0.05, BF16)
woff = jnp.asarray(rng.rand(C, 2 * G * KK) * 0.01, BF16)
wmask = jnp.asarray(rng.rand(C, G * KK) * 0.01, BF16)

vg_leaf = jnp.asarray(rng.rand(B * G, HW, HW, GC), BF16)
off_leaf = jnp.asarray(rng.uniform(-1, 1, (B * G, HW, HW, KK, 2)), jnp.float32)
mod_leaf = jnp.asarray(rng.rand(B * G, HW, HW, KK), jnp.float32)


def sample(vg, off_b, mod_b):
    eff = dcnv3_ref_effective_offsets(off_b, HW, HW, K)
    return deform_dense_local(vg.transpose(0, 2, 1, 3), eff, mod_b, K, R)


def folds_and_sample(v, offs, mask):
    o = offs.reshape(B, HW, HW, G, KK, 2)
    off_b = o.transpose(0, 3, 1, 2, 4, 5).reshape(B * G, HW, HW, KK, 2)
    mm = jax.nn.softmax(
        mask.reshape(B, HW, HW, G, KK).astype(jnp.float32), axis=-1
    ).astype(BF16)
    mod_b = mm.transpose(0, 3, 1, 2, 4).reshape(B * G, HW, HW, KK)
    vg = v.reshape(B, HW, HW, G, GC).transpose(
        0, 3, 1, 2, 4).reshape(B * G, HW, HW, GC)
    vg, off_b, mod_b = jax.lax.optimization_barrier((vg, off_b, mod_b))
    out = jax.lax.optimization_barrier(sample(vg, off_b, mod_b))
    return out.reshape(B, G, HW, HW, GC).transpose(
        0, 2, 3, 1, 4).reshape(B, HW, HW, C)


def fast_fn(vg, off_b, mod_b):  # cliff-f shape: leaves + fences, fwd+bwd
    def loss(a, b, c):
        vgx, bx, cx = jax.lax.optimization_barrier((a, b, c))
        return jnp.mean(sample(vgx, bx, cx).astype(jnp.float32))
    return jax.value_and_grad(loss, argnums=(0, 1, 2))(vg, off_b, mod_b)


def slow_fn(xx):  # exact-r0 shape: GEMM-fed, fences, fwd only
    v = xx @ wv
    feat = nn.gelu(xx, approximate=False)
    offs = feat @ woff
    mask = feat @ wmask
    return jnp.mean(folds_and_sample(v, offs, mask).astype(jnp.float32))


def census(name, fn, *args):
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_ = ca.get("bytes accessed", float("nan"))
    txt = compiled.as_text()
    from collections import Counter
    cnt = Counter(re.findall(r"\] ([a-z-]+)\(", txt))
    print(f"== {name}: flops={flops/1e9:.2f}G bytes={bytes_/1e9:.3f}GB")
    print("   top ops:", cnt.most_common(8))
    # materialized buffer census: every HLO root whose output is a large
    # array (fusion outputs = actual HBM writes)
    sizes = Counter()
    for m in re.finditer(r"(bf16|f32)\[([0-9,]+)\][^=]*\} ([a-z-]+)\(", txt):
        dt, shape, op = m.groups()
        n = 1
        for d in shape.split(","):
            n *= int(d)
        b = n * (2 if dt == "bf16" else 4)
        if b >= 4 << 20:
            sizes[(op, dt, shape)] += b
    tot = 0
    for (op, dt, shape), b in sizes.most_common(12):
        print(f"   {op:12s} {dt}[{shape}] {b/1e6:7.1f} MB")
        tot += b
    print(f"   large-buffer writes total: {tot/1e9:.2f} GB")


if __name__ == "__main__":
    census("fast (leaves+fence, fwd+bwd)", fast_fn, vg_leaf, off_leaf,
           mod_leaf)
    census("slow (gemm-fed+fence, fwd)", slow_fn, x)

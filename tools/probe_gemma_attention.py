"""Gemma prefill/train attention probe at LM geometry.

The Gemma full-sequence path (``nlp/gemma/model.py`` no-cache branch) is
an explicit einsum chain: GQA repeat (2B: kvh=1 -> 8x K/V copies), a
materialized [B, H, T, T] f32 logits tensor, where-mask, softmax, and a
second einsum. ViT-geometry lessons (BENCH_NOTES round-1 #5) said XLA's
fused ``jax.nn.dot_product_attention`` beats the Pallas flash kernel at
D=64 — but Gemma is D=256 (flash-kernel-aligned) and causal, a different
regime. Probe per-layer attention at 2B/7B geometry, fwd and fwd+bwd:

  einsum : the current path (repeat + einsum + where + softmax + einsum)
  dpa    : jax.nn.dot_product_attention(is_causal=True), native GQA
           (K/V stay at kvh heads — no repeat)
  flash  : jax.experimental.pallas.ops.tpu.flash_attention, causal=True
           (needs repeated K/V; [B, H, T, D] layout)

Timing: one jitted lax.scan of ITERS iterations with a data dependence
(per-dispatch tunnel latency ~4 ms swamps per-op timings).
Run on TPU: python tools/probe_gemma_attention.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 20

# (label, batch, seqlen, heads, kv_heads, head_dim)
GEOMS = [
    ("2b_t1024", 8, 1024, 8, 1, 256),
    ("2b_t4096", 2, 4096, 8, 1, 256),
    ("7b_t4096", 1, 4096, 16, 16, 256),
]


def timeit(fn, *args):
    def body(carry, _):
        perturbed = args[0] + (carry * 1e-6).astype(args[0].dtype)
        out = fn(*((perturbed,) + args[1:]))
        return jnp.mean(out.astype(jnp.float32)), None

    scan = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None,
                                        length=ITERS)[0])
    _ = float(scan())
    t0 = time.perf_counter()
    r = float(scan())
    dt = (time.perf_counter() - t0) / ITERS
    assert r == r
    return dt


def attn_einsum(q, k, v, mask):
    h, kvh = q.shape[2], k.shape[2]
    if kvh != h:
        rep = h // kvh
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    logits = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32)
    logits = jnp.where(mask, logits, jnp.float32(-1e9))
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


def attn_dpa(q, k, v, mask):
    del mask
    return jax.nn.dot_product_attention(q, k, v, is_causal=True, scale=1.0)


def attn_flash(q, k, v, mask):
    del mask
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention,
    )

    h, kvh = q.shape[2], k.shape[2]
    if kvh != h:
        rep = h // kvh
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    # flash kernel wants [B, H, T, D]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = flash_attention(qt, kt, vt, causal=True, sm_scale=1.0)
    return out.transpose(0, 2, 1, 3)


def main():
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    rng = np.random.RandomState(0)
    for label, b, t, h, kvh, d in GEOMS:
        q = jnp.asarray(rng.randn(b, t, h, d) * 0.05, jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, t, kvh, d) * 0.05, jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, t, kvh, d), jnp.bfloat16)
        mask = jnp.tril(jnp.ones((t, t), bool))[None, None]

        # correctness cross-check once per geometry (fp32 compare)
        ref = np.asarray(attn_einsum(q, k, v, mask), np.float32)
        for name, fn in [("dpa", attn_dpa), ("flash", attn_flash)]:
            try:
                got = np.asarray(fn(q, k, v, mask), np.float32)
                err = np.abs(got - ref).max()
                tag = f"maxerr {err:.4f}"
            except Exception as e:  # noqa: BLE001
                tag = f"FAILED {type(e).__name__}: {e}"
            print(f"{label} {name}: {tag}", flush=True)

        for name, fn in [("einsum", attn_einsum), ("dpa", attn_dpa),
                         ("flash", attn_flash)]:
            try:
                fwd = timeit(fn, q, k, v, mask)

                def loss(q_, k_, v_):
                    return jnp.sum(fn(q_, k_, v_, mask).astype(jnp.float32))

                g = jax.grad(loss, argnums=(0, 1, 2))
                fb = timeit(lambda q_, k_, v_: sum(
                    jnp.sum(x.astype(jnp.float32)) for x in g(q_, k_, v_)
                ), q, k, v)
                print(f"{label} {name}: fwd {fwd*1e3:8.3f} ms   "
                      f"fwd+bwd {fb*1e3:8.3f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{label} {name}: TIMING FAILED "
                      f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()

"""Window-attention probe at REAL Swin-L geometry (VERDICT r2 #3).

Swin window attention is T=49, D=32 with thousands of windows — nothing
like the ViT geometry (T=4096, D=64) where the Pallas flash kernel was
measured slower (BENCH_NOTES round-1 lesson 5). This probes the layouts at
each Swin-L stage of the 512^2 training config, fwd and fwd+bwd:

  current : jax.nn.dot_product_attention with the bias MATERIALIZED to
            [B*nW, H, N, N] (what backbones/swin.py round 2 did)
  minbias : jax.nn.dot_product_attention with broadcastable [1, H, N, N]
  einsum  : manual attention in 5-D [B, nW, N, H, D] form, bias added by
            lazy broadcast (XLA fuses), softmax in fp32
  einsum_shift : same but with the per-window shift mask added (the
            shifted-window block's geometry)

Timing: one jitted lax.scan of ITERS iterations with a data dependence
(per-dispatch tunnel latency ~4 ms would swamp per-op timings).
Run: python tools/probe_swin_attention.py
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
WS = 7
N = WS * WS

# Swin-L stages at 512^2 input, batch 8: (label, dim, heads, grid_hw)
# feature maps pad to window multiples: 128->133(19^2 windows), 64->70,
# 32->35, 16->21
STAGES = [
    ("stage3", 768, 24, 35, 8),  # x18 blocks — the FLOP bulk; probe first
    ("stage1", 192, 6, 133, 8),
    ("stage2", 384, 12, 70, 8),
    ("stage4", 1536, 48, 21, 8),
]


def timeit(fn, *args):
    """One dispatch of a scan chaining ITERS calls with a data dependence."""

    def body(carry, _):
        perturbed = args[0] + (carry * 1e-6).astype(args[0].dtype)
        out = fn(*((perturbed,) + args[1:]))
        return jnp.mean(out.astype(jnp.float32)), None

    scan = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None,
                                        length=ITERS)[0])
    _ = float(scan())  # compile + warm
    t0 = time.perf_counter()
    r = float(scan())
    dt = (time.perf_counter() - t0) / ITERS
    assert r == r
    return dt


def make_inputs(dim, heads, grid, batch, with_mask):
    nw = (grid // WS) ** 2
    bnw = batch * nw
    d = dim // heads
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.rand(bnw, N, heads, d), jnp.bfloat16)
    k = jnp.asarray(rng.rand(bnw, N, heads, d), jnp.bfloat16)
    v = jnp.asarray(rng.rand(bnw, N, heads, d), jnp.bfloat16)
    bias = jnp.asarray(rng.rand(1, heads, N, N), jnp.bfloat16)
    mask = (jnp.asarray(rng.rand(nw, N, N) > 0.8, jnp.float32) * -100.0
            if with_mask else None)
    return q, k, v, bias, mask, nw


def run_current(q, k, v, bias, mask, nw):
    bnw, n, h, d = q.shape
    if mask is not None:
        m = mask[None, :, None]
        full = bias[:, None] + m.astype(bias.dtype)
        full = jnp.broadcast_to(full, (bnw // nw, nw, h, n, n)).reshape(
            bnw, h, n, n)
    else:
        full = jnp.broadcast_to(bias, (bnw, h, n, n))
    return jax.nn.dot_product_attention(q, k, v, bias=full)


def run_minbias(q, k, v, bias, mask, nw):
    del mask, nw
    return jax.nn.dot_product_attention(q, k, v, bias=bias)


def run_pallas(q, k, v, bias, mask, nw):
    """ops/pallas/window_attention (layout [bnw, H, N, D])."""
    from iseg_tpu.ops.pallas.window_attention import window_attention

    bnw, n, h, d = q.shape
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    bias_h = bias[0]  # [H, N, N]
    m = (jnp.zeros((1, n, n), jnp.float32) if mask is None
         else mask.astype(jnp.float32))
    out = window_attention(qt, kt, vt, bias_h, m, 1.0 / np.sqrt(d), False)
    return out.transpose(0, 2, 1, 3)


def run_blockdiag(q, k, v, bias, mask, nw):
    """Fold heads into one [H*N, H*N] block-diagonal attention per window:
    24x redundant FLOPs but MXU-aligned row counts; off-head blocks get
    -1e9 so the row softmax stays per-head-correct. XLA version (logits
    materialize in HBM — the Pallas kernel keeps them in VMEM)."""
    bnw, n, h, d = q.shape
    hn = h * n
    # [bnw, HN, D] head-major rows
    q2 = q.transpose(0, 2, 1, 3).reshape(bnw, hn, d)
    k2 = k.transpose(0, 2, 1, 3).reshape(bnw, hn, d)
    v2 = v.transpose(0, 2, 1, 3).reshape(bnw, hn, d)
    eye = jnp.eye(h, dtype=bool)
    bias_block = jnp.where(
        eye[:, None, :, None],
        bias[0][:, :, None, :].astype(jnp.float32), -1e9
    ).reshape(hn, hn)
    logits = jnp.einsum("bqd,bkd->bqk", q2, k2).astype(jnp.float32)
    logits = logits / np.sqrt(d) + bias_block[None]
    if mask is not None:
        tiled = jnp.tile(mask, (1, h, h))  # [nW, HN, HN]
        logits = logits + tiled[jnp.arange(bnw) % nw]
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bqk,bkd->bqd", p, v2)
    return out.reshape(bnw, h, n, d).transpose(0, 2, 1, 3)


def run_matmul_floor(q, k, v, bias, mask, nw):
    """Just the two block-diagonal matmuls (no softmax/bias) — the MXU
    floor the fused kernel builds on."""
    bnw, n, h, d = q.shape
    hn = h * n
    q2 = q.transpose(0, 2, 1, 3).reshape(bnw, hn, d)
    k2 = k.transpose(0, 2, 1, 3).reshape(bnw, hn, d)
    v2 = v.transpose(0, 2, 1, 3).reshape(bnw, hn, d)
    logits = jnp.einsum("bqd,bkd->bqk", q2, k2)
    return jnp.einsum("bqk,bkd->bqd", logits, v2).reshape(
        bnw, h, n, d).transpose(0, 2, 1, 3)


def run_einsum(q, k, v, bias, mask, nw):
    bnw, n, h, d = q.shape
    b = bnw // nw
    q5 = q.reshape(b, nw, n, h, d)
    k5 = k.reshape(b, nw, n, h, d)
    v5 = v.reshape(b, nw, n, h, d)
    logits = jnp.einsum("bwqhd,bwkhd->bwhqk", q5, k5) / np.sqrt(d)
    logits = logits.astype(jnp.float32) + bias[None].astype(jnp.float32)
    if mask is not None:
        logits = logits + mask[None, :, None]
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bwhqk,bwkhd->bwqhd", probs, v5)
    return out.reshape(bnw, n, h, d)


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/iseg_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    only = sys.argv[1:] or None
    methods = os.environ.get("METHODS", "current,minbias,einsum").split(",")
    table = {"current": run_current, "minbias": run_minbias,
             "einsum": run_einsum, "pallas": run_pallas,
             "blockdiag": run_blockdiag, "floor": run_matmul_floor}
    for label, dim, heads, grid, batch in STAGES:
        if only and label not in only:
            continue
        for with_mask in (False, True):
            q, k, v, bias, mask, nw = make_inputs(dim, heads, grid, batch,
                                                  with_mask)
            tag = f"{label}{'+shift' if with_mask else ''}"
            rows = {}
            for name in methods:
                fn = table[name]
                if name == "minbias" and with_mask:
                    continue  # minimal bias can't express per-window masks
                f = functools.partial(fn, mask=mask, nw=nw)
                # fwd
                t_f = timeit(lambda qq, kk, vv, bb: f(qq, kk, vv, bb),
                             q, k, v, bias)
                # fwd+bwd (grad wrt q,k,v)
                g = jax.grad(lambda qq, kk, vv, bb: jnp.sum(
                    f(qq, kk, vv, bb).astype(jnp.float32)), argnums=(0, 1, 2))
                t_b = timeit(
                    lambda qq, kk, vv, bb: g(qq, kk, vv, bb)[0], q, k, v, bias)
                rows[name] = (t_f, t_b)
                print(f"{tag:14s} {name:8s} fwd {t_f*1e3:7.2f} ms   "
                      f"fwd+bwd {t_b*1e3:7.2f} ms", flush=True)
            # numerics: einsum must match current
            ref = run_current(q, k, v, bias, mask, nw)
            alt = run_einsum(q, k, v, bias, mask, nw)
            err = float(jnp.max(jnp.abs(
                ref.astype(jnp.float32) - alt.astype(jnp.float32))))
            print(f"{tag:14s} einsum-vs-current max|diff| = {err:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()

"""EVA02-L 512^2 b4 per-op breakdown + attack variants
(VERDICT r3 weak #2 / next #5: 31.1% MFU, unprobed).

Geometry: BASELINE #5 training — dim 1024, 24 layers, 16 heads, head_dim
64, T = 1 cls + (512/16)^2 = 1025 tokens, batch 4, bf16. Every unit is
timed fwd+bwd with the overhead-calibrated scan harness
(tools/probe_util.py).

Variants probed on the block:
  * fused qkv — one [1024, 3072] GEMM instead of three (also the
    REFERENCE's own layout: eva/eva.py stores attn.qkv fused; our
    weight map slices it apart today).
  * rope-pad — extend sin/cos with identity rows (sin=0, cos=1) for the
    prefix tokens and rotate ALL tokens, removing the two concats per
    q/k per block (bit-exact: rotation by zero is the identity).

Usage (TPU): python tools/probe_eva.py [full] [units] [variants] [gemm]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/iseg_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import flax.linen as nn  # noqa: E402

from probe_util import time_grad_fn, time_module  # noqa: E402

from iseg_tpu.backbones.eva import (  # noqa: E402
    EvaBlock,
    SwiGLU,
    apply_rope,
    build_rope_2d,
)

B, T, DIM, HEADS = 4, 1025, 1024, 16
HD = DIM // HEADS
PEAK = 197e12
BF16 = jnp.bfloat16


def rope_arrays():
    sin, cos = build_rope_2d(32, 32, HD)
    return jnp.asarray(sin), jnp.asarray(cos)


class FusedQKVRopePadBlock(nn.Module):
    """EvaBlock with the two attack variants applied; numerics identical
    (fused qkv is the same three GEMMs stacked; identity-rotation rows
    make the prefix concat unnecessary)."""

    fuse_qkv: bool = True
    rope_pad: bool = True

    @nn.compact
    def __call__(self, x, sin, cos, train: bool = False):
        b, n, _ = x.shape
        p = 1
        h = nn.LayerNorm(epsilon=1e-6, dtype=BF16, name="norm1")(x)
        if self.fuse_qkv:
            qkv = nn.Dense(3 * DIM, use_bias=True, dtype=BF16,
                           name="qkv")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = nn.Dense(DIM, use_bias=True, dtype=BF16, name="q_proj")(h)
            k = nn.Dense(DIM, use_bias=False, dtype=BF16, name="k_proj")(h)
            v = nn.Dense(DIM, use_bias=True, dtype=BF16, name="v_proj")(h)
        q = q.reshape(b, n, HEADS, HD)
        k = k.reshape(b, n, HEADS, HD)
        v = v.reshape(b, n, HEADS, HD)
        if self.rope_pad:
            ident_s = jnp.zeros((p, HD), sin.dtype)
            ident_c = jnp.ones((p, HD), cos.dtype)
            sin_all = jnp.concatenate([ident_s, sin], axis=0)
            cos_all = jnp.concatenate([ident_c, cos], axis=0)
            q = apply_rope(q, sin_all, cos_all)
            k = apply_rope(k, sin_all, cos_all)
        else:
            q = jnp.concatenate([q[:, :p], apply_rope(q[:, p:], sin, cos)],
                                axis=1)
            k = jnp.concatenate([k[:, :p], apply_rope(k[:, p:], sin, cos)],
                                axis=1)
        attn = jax.nn.dot_product_attention(q, k, v).reshape(b, n, DIM)
        attn = nn.Dense(DIM, dtype=BF16, name="proj")(attn)
        x = x + attn
        h = nn.LayerNorm(epsilon=1e-6, dtype=BF16, name="norm2")(x)
        h = SwiGLU(hidden_dim=int(DIM * 4 * 2 / 3), out_dim=DIM,
                   use_norm=True, dtype=BF16, name="mlp")(h)
        return x + h


def run_units():
    sin, cos = rope_arrays()
    print("== unit breakdown (fwd+bwd, bf16, B=4 T=1025 D=1024) ==")
    ms = time_module(EvaBlock(dim=DIM, num_heads=HEADS, dtype=BF16),
                     [(B, T, DIM)], extra_args=(sin, cos))
    print(f"EvaBlock (current)        {ms:7.3f} ms x24 = {ms * 24:7.1f} ms")

    q = jnp.asarray(np.random.RandomState(0).rand(B, T, HEADS, HD), BF16)
    k = jnp.asarray(np.random.RandomState(1).rand(B, T, HEADS, HD), BF16)
    v = jnp.asarray(np.random.RandomState(2).rand(B, T, HEADS, HD), BF16)
    ms_att = time_grad_fn(
        lambda q, k, v: jax.nn.dot_product_attention(q, k, v), q, k, v)
    print(f"  dot_product_attention   {ms_att:7.3f} ms")

    x = jnp.asarray(np.random.RandomState(3).rand(B, T, DIM), BF16)
    ms_swiglu = time_module(
        SwiGLU(hidden_dim=int(DIM * 4 * 2 / 3), out_dim=DIM, use_norm=True,
               dtype=BF16), [(B, T, DIM)], takes_train=False)
    print(f"  SwiGLU mlp              {ms_swiglu:7.3f} ms")

    ms_rope_cur = time_grad_fn(
        lambda q: jnp.concatenate(
            [q[:, :1], apply_rope(q[:, 1:], sin, cos)], axis=1), q)
    sin_all = jnp.concatenate([jnp.zeros((1, HD), sin.dtype), sin], axis=0)
    cos_all = jnp.concatenate([jnp.ones((1, HD), cos.dtype), cos], axis=0)
    ms_rope_pad = time_grad_fn(lambda q: apply_rope(q, sin_all, cos_all), q)
    print(f"  rope (concat, per q/k)  {ms_rope_cur:7.3f} ms")
    print(f"  rope (identity-pad)     {ms_rope_pad:7.3f} ms")

    ms_ln = time_module(nn.LayerNorm(epsilon=1e-6, dtype=BF16),
                        [(B, T, DIM)], takes_train=False)
    print(f"  LayerNorm               {ms_ln:7.3f} ms")


def run_variants():
    sin, cos = rope_arrays()
    print("== block variants (fwd+bwd) ==")
    for fuse, pad in ((False, False), (True, False), (False, True),
                      (True, True)):
        m = FusedQKVRopePadBlock(fuse_qkv=fuse, rope_pad=pad)
        ms = time_module(m, [(B, T, DIM)], extra_args=(sin, cos))
        print(f"fuse_qkv={int(fuse)} rope_pad={int(pad)}: {ms:7.3f} ms x24"
              f" = {ms * 24:7.1f} ms")


def run_gemm():
    print("== GEMM floor (bf16) ==")
    m = B * T
    for name, k, n in [("qkv fused", DIM, 3 * DIM), ("q/k/v each", DIM, DIM),
                       ("proj", DIM, DIM),
                       ("swiglu up (x2)", DIM, int(DIM * 4 * 2 / 3)),
                       ("swiglu down", int(DIM * 4 * 2 / 3), DIM)]:
        a = jnp.asarray(np.random.RandomState(0).rand(m, k), BF16)
        b = jnp.asarray(np.random.RandomState(1).rand(k, n), BF16)
        ms = time_grad_fn(lambda a, b: a @ b, a, b)
        flops = 3 * 2 * m * k * n  # fwd + dgrad + wgrad
        print(f"{name:16s} [{m}x{k}]x[{k}x{n}] fwd+bwd {ms:7.3f} ms "
              f"({flops / (ms / 1e3) / PEAK * 100:5.1f}% MXU)")


def run_full():
    from bench_model_mfu import build

    from iseg_tpu.core.optimizer import get_optimizer
    from iseg_tpu.core.train import create_train_state, make_train_step

    model, batch, hw, nc = build("eva")
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, hw, hw, 3), BF16))
    tx, _ = get_optimizer(variables["params"], "sgd", learning_rate=0.01,
                          train_steps=1000)
    state = create_train_state(model, rng, (batch, hw, hw, 3), tx,
                               input_dtype=BF16)
    step_fn = make_train_step(model.build_loss_fn())
    x = np.random.RandomState(0).rand(batch, hw, hw, 3).astype(np.float32)
    y = np.random.RandomState(1).randint(0, nc, (batch, hw, hw))
    data = {"image": jnp.asarray(x, BF16), "label": jnp.asarray(y, jnp.int32)}
    for _ in range(3):
        state, parts = step_fn(state, data, rng)
    _ = float(parts["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        state, parts = step_fn(state, data, rng)
    _ = float(parts["loss"])
    dt = (time.perf_counter() - t0) / 10
    print(json.dumps({"full_ms": round(dt * 1e3, 1)}))


def run_attention():
    """Attention formulations at EVA02-L 512^2 geometry (B=4 H16 T1025
    D64). The units probe shows dot_product_attention at 3.26 ms = 62% of
    the block: the XLA path materializes [B,H,T,T] f32 logits + bf16
    probs in HBM (~400 MB/pass) — its floor is bandwidth, not the MXU.
    Flash attention never materializes T^2; T=1025 is padded to 1152
    (9x128 blocks) with segment-id masking (exact: pad tokens live in a
    different segment and cannot attend or be attended to)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.rand(B, T, HEADS, HD) - 0.5, BF16)
    k = jnp.asarray(rs.rand(B, T, HEADS, HD) - 0.5, BF16)
    v = jnp.asarray(rs.rand(B, T, HEADS, HD) - 0.5, BF16)
    scale = 1.0 / float(np.sqrt(HD))

    print("== attention variants (fwd+bwd, B=4 H16 T1025 D64) ==")
    ms = time_grad_fn(
        lambda q, k, v: jax.nn.dot_product_attention(q, k, v), q, k, v)
    print(f"dot_product_attention (xla)   {ms:7.3f} ms")

    # HBM floor of the materializing path: f32 logits write+read (softmax)
    # + bf16 probs write+read, fwd; bwd touches probs + dprobs again
    t2 = B * HEADS * T * T
    fwd_bytes = t2 * (4 + 4 + 2 + 2)
    bwd_bytes = t2 * (2 + 2 + 4 + 4)
    print(f"  (materializing-path HBM floor ~"
          f"{(fwd_bytes + bwd_bytes) / 819e9 * 1e3:.3f} ms)")

    tp = 1152  # pad 1025 -> 9 x 128
    pad = tp - T
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    seg = jnp.concatenate(
        [jnp.zeros((B, T), jnp.int32), jnp.ones((B, pad), jnp.int32)],
        axis=1)

    def flash(qp, kp, vp, block):
        bs = BlockSizes(
            block_q=block, block_k_major=block, block_k=block, block_b=1,
            block_q_major_dkv=block, block_k_major_dkv=block,
            block_k_dkv=block, block_q_dkv=block,
            block_k_major_dq=block, block_k_dq=block, block_q_dq=block)
        # flash layout is [B, H, T, D]
        out = flash_attention(
            qp.transpose(0, 2, 1, 3), kp.transpose(0, 2, 1, 3),
            vp.transpose(0, 2, 1, 3), segment_ids=SegmentIds(seg, seg),
            sm_scale=scale, block_sizes=bs)
        return out.transpose(0, 2, 1, 3)[:, :T]

    for block in (128, 256, 576):
        try:
            ms_f = time_grad_fn(
                lambda qp, kp, vp: flash(qp, kp, vp, block), qp, kp, vp)
            print(f"flash pad1152 block{block:4d}       {ms_f:7.3f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"flash block{block}: {type(e).__name__}: {str(e)[:200]}")

    # numerics check vs the xla path (padded tokens sliced off)
    ref = jax.nn.dot_product_attention(q, k, v)
    got = flash(qp, kp, vp, 128)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"flash-vs-xla max abs err: {err:.5f}")

    # explicit einsum chain with the T^2 tensors kept in the model's own
    # bf16 (the f32 logits round-trip is half the materializing traffic;
    # softmax max-subtract/exp still runs f32 inside the fusion)
    def einsum_attn(q, k, v, logits_dtype):
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=logits_dtype)
        logits = (logits * jnp.asarray(scale, logits_dtype)).astype(
            jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)

    for ld, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        ms_e = time_grad_fn(
            lambda q, k, v: einsum_attn(q, k, v, ld), q, k, v)
        print(f"einsum logits={name:4s}          {ms_e:7.3f} ms")
    got2 = einsum_attn(q, k, v, jnp.bfloat16)
    err2 = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                 - got2.astype(jnp.float32))))
    print(f"bf16-logits-vs-xla max abs err: {err2:.5f}")


if __name__ == "__main__":
    which = sys.argv[1:] or ["full", "units", "variants", "gemm",
                             "attention"]
    if "full" in which:
        run_full()
    if "units" in which:
        run_units()
    if "variants" in which:
        run_variants()
    if "gemm" in which:
        run_gemm()
    if "attention" in which:
        run_attention()

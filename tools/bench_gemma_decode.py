"""Gemma decode throughput vs the HBM-bandwidth roofline.

Decode at batch B reads every parameter once per step (weights dominate;
the KV cache adds B * layers * 2 * len * kv_heads * head_dim). The v5e
roofline is therefore tokens/s <= B * BW / bytes_per_step. This reports
measured aggregate decode tok/s and % of that roofline for fp32 vs bf16
weights (the bf16 path is the production config; fp32 shows the cost of
leaving weights wide).

Run on TPU: python tools/bench_gemma_decode.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HBM_BW = 819e9  # bytes/s, TPU v5e


def run(dtype, tag, batch=8, prompt_len=128, max_length=640,
        int8_weights=False):
    from iseg_tpu.nlp.gemma.causal_lm import GemmaCausalLM
    from iseg_tpu.nlp.gemma.config import GemmaConfig

    cfg = GemmaConfig(
        vocab_size=32000, num_layers=12, num_heads=8, num_kv_heads=1,
        hidden_dim=1024, intermediate_dim=4096, head_dim=128,
    )
    lm = GemmaCausalLM(cfg, dtype=dtype, param_dtype=dtype)
    variables = lm.init(jax.random.PRNGKey(0), batch=batch, seq=prompt_len)

    n_params = sum(x.size for x in jax.tree.leaves(variables))
    bytes_per_param = jnp.dtype(dtype).itemsize
    if int8_weights == "w8a8":
        from iseg_tpu.ops.quant import quantize_dense_tree

        variables = {"params": quantize_dense_tree(variables["params"])}
        bytes_per_param = 1  # dense kernels int8-resident (embedding bf16)
    elif int8_weights:
        from iseg_tpu.nlp.gemma.quant import quantize_tree

        variables = {"params": quantize_tree(variables["params"])}
        bytes_per_param = 1  # weights read as int8; scales are negligible
    kv_bytes = (batch * cfg.num_layers * 2 * max_length * cfg.num_kv_heads
                * cfg.head_dim * jnp.dtype(dtype).itemsize)
    # decode reads all weights once per step + half the KV cache on average
    bytes_per_step = n_params * bytes_per_param + kv_bytes / 2
    roof_tok_s = batch * HBM_BW / bytes_per_step

    prompt = jnp.asarray(
        np.random.RandomState(0).randint(1, 32000, (batch, prompt_len)),
        jnp.int32)
    lengths = jnp.full((batch,), prompt_len, jnp.int32)

    def gen():
        return lm.generate(variables, prompt, lengths, max_length=max_length,
                           temperature=0.0)

    out = gen()
    _ = np.asarray(out)  # compile + run
    t0 = time.perf_counter()
    out = gen()
    _ = np.asarray(out)
    dt = time.perf_counter() - t0
    new_tokens = (max_length - prompt_len) * batch
    tok_s = new_tokens / dt
    print(json.dumps({
        "config": tag, "params_M": round(n_params / 1e6, 1),
        "batch": batch, "decode_tok_per_sec": round(tok_s, 0),
        "roofline_tok_per_sec": round(roof_tok_s, 0),
        "pct_of_bw_roofline": round(tok_s / roof_tok_s * 100, 1),
    }))
    return tok_s


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/iseg_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    run(jnp.bfloat16, "bf16")
    run(jnp.bfloat16, "w8a8", int8_weights="w8a8")
    run(jnp.bfloat16, "int8-weights-dequant", int8_weights=True)


if __name__ == "__main__":
    main()

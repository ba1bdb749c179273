"""Gemma causal-LM generation driver.

Without weights/tokenizer files this demonstrates the pipeline with the
test-size config and raw token ids; with --preset gemma_2b_en, a
SentencePiece model (--tokenizer) and a weights checkpoint it becomes the
real thing (reference workflow: ``nlp/gemma/gemma_causal.py``).

  python examples/gemma_generate.py --max_length 32 --temperature 0.8 --top_k 40
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="gemma_test")
    p.add_argument("--prompt_ids", default="2,45,91,7",
                   help="comma-separated token ids (used when no tokenizer)")
    p.add_argument("--prompt", default=None, help="text prompt (needs --tokenizer)")
    p.add_argument("--tokenizer", default=None, help="SentencePiece model path")
    p.add_argument("--max_length", type=int, default=32)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top_k", type=int, default=None)
    p.add_argument("--model_parallelism", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from iseg_tpu.nlp.gemma import GemmaCausalLM, get_preset, shard_gemma_params
    from iseg_tpu.parallel.mesh import create_mesh

    model = GemmaCausalLM(get_preset(args.preset))
    variables = model.init(jax.random.PRNGKey(args.seed))

    tokenizer = None
    if args.tokenizer:
        from iseg_tpu.nlp.gemma.tokenizer import (
            GemmaCausalLMPreprocessor,
            GemmaTokenizer,
        )

        tokenizer = GemmaTokenizer(proto_path=args.tokenizer)
        pre = GemmaCausalLMPreprocessor(
            tokenizer, sequence_length=args.max_length)
        ids, lengths = pre([args.prompt or "Hello"], for_generation=True)
        prompt = jnp.asarray(ids[:, : int(lengths[0])])
    else:
        prompt = jnp.asarray(
            [[int(t) for t in args.prompt_ids.split(",")]], jnp.int32)
    lengths = jnp.asarray([prompt.shape[1]], jnp.int32)

    if args.model_parallelism > 1:
        mesh = create_mesh(model_parallelism=args.model_parallelism)
        variables = {"params": shard_gemma_params(variables["params"], mesh),
                     **{k: v for k, v in variables.items() if k != "params"}}

    out = model.generate(
        variables, prompt, lengths, max_length=args.max_length,
        temperature=args.temperature, top_k=args.top_k,
        rng=jax.random.PRNGKey(args.seed),
        end_token_id=tokenizer.eos_id if tokenizer else None,
    )
    ids = np.asarray(out[0]).tolist()
    print("generated ids:", ids)
    if tokenizer:
        # strip bos/eos/pad before detokenizing (raw rows are padded to
        # max_length; feeding special ids to the decoder pollutes the text)
        from iseg_tpu.nlp.gemma.tokenizer import GemmaCausalLMPreprocessor

        pre = GemmaCausalLMPreprocessor(tokenizer)
        print("text:", pre.generate_postprocess(out[:1])[0])


if __name__ == "__main__":
    main()

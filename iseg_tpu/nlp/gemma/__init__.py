"""Gemma causal LM (parity tier for the reference's ``nlp/gemma/``):
backbone with tensor-parallel layout, decoder blocks with RoPE + GQA
attention and KV-cache generation, causal LM with ``generate``/``score``.
"""

from iseg_tpu.nlp.gemma.config import GemmaConfig, GEMMA_PRESETS, get_preset
from iseg_tpu.nlp.gemma.model import GemmaBackbone
from iseg_tpu.nlp.gemma.causal_lm import GemmaCausalLM
from iseg_tpu.nlp.gemma.layout import get_layout_map, shard_gemma_params
from iseg_tpu.nlp.gemma.samplers import (
    BeamSampler,
    ContrastiveSampler,
    GreedySampler,
    RandomSampler,
    Sampler,
    TopKSampler,
    TopPSampler,
    get_sampler,
)

__all__ = [
    "GemmaConfig",
    "GEMMA_PRESETS",
    "get_preset",
    "GemmaBackbone",
    "GemmaCausalLM",
    "get_layout_map",
    "shard_gemma_params",
    "Sampler",
    "GreedySampler",
    "RandomSampler",
    "TopKSampler",
    "TopPSampler",
    "BeamSampler",
    "ContrastiveSampler",
    "get_sampler",
]

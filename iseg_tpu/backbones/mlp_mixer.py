"""MLP-Mixer backbone (B/16, L/16).

Parity with the reference ``backbones/mlp_mixer.py`` (``MLPMixer`` :60):
patch embed + N mixer blocks (token-mixing MLP over patches, channel-mixing
MLP over features), keras-default LN epsilon (1e-3). Token-mixing MLPs fix
the token count, so the input size is pinned (the reference has the same
constraint). Note the reference's ``call`` (:84) reshapes ``inputs`` where
it means the stem output — a transcription bug that leaves its stem conv
unused; we implement the intended (published-weights) semantics, and the
activation-parity test drives the reference's own submodules in that
intended order.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from iseg_tpu.backbones.registry import register_backbone


class MixerBlock(nn.Module):
    tokens_dim: int
    channels_dim: int
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # token mixing
        h = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm1")(x)
        h = h.transpose(0, 2, 1)
        h = nn.Dense(self.tokens_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="token_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(x.shape[1], dtype=self.dtype,
                     param_dtype=self.param_dtype, name="token_fc2")(h)
        x = x + h.transpose(0, 2, 1)
        # channel mixing
        h = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm2")(x)
        h = nn.Dense(self.channels_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="channel_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(x.shape[-1], dtype=self.dtype,
                     param_dtype=self.param_dtype, name="channel_fc2")(h)
        return x + h


class MLPMixer(nn.Module):
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    tokens_mlp_dim: int = 384
    channels_mlp_dim: int = 3072
    return_endpoints: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, _ = x.shape
        if h % self.patch_size or w % self.patch_size:
            raise ValueError(
                f"input {h}x{w} must be a multiple of patch_size "
                f"{self.patch_size} (pad or bucket the input first)")
        gh, gw = h // self.patch_size, w // self.patch_size
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="patch_embed")(x)
        x = x.reshape(n, gh * gw, self.dim)
        for i in range(self.depth):
            x = MixerBlock(
                tokens_dim=self.tokens_mlp_dim, channels_dim=self.channels_mlp_dim,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"block{i}",
            )(x)
        x = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        spatial = x.reshape(n, gh, gw, self.dim)
        if self.return_endpoints:
            return [spatial]
        return spatial


@register_backbone("mlp_mixer_b16")
def mlp_mixer_b16(output_stride: int = 16, return_endpoints: bool = True, **kwargs):
    del output_stride
    return MLPMixer(dim=768, depth=12, tokens_mlp_dim=384, channels_mlp_dim=3072,
                    return_endpoints=return_endpoints, **kwargs)


@register_backbone("mlp_mixer_l16")
def mlp_mixer_l16(output_stride: int = 16, return_endpoints: bool = True, **kwargs):
    del output_stride
    return MLPMixer(dim=1024, depth=24, tokens_mlp_dim=512, channels_mlp_dim=4096,
                    return_endpoints=return_endpoints, **kwargs)

"""Code diffuser: the latent-DDPM denoiser over (B, 18, 512) W+ codes.

Re-design of `models/CodeDiffuser.py`. Four stacked TACC blocks; each block
runs (a) channel self-attention — K,V from the noisy code, Q from the
condition+timestep — over the 18-token axis, (b) a cross "spatial attention"
branch over the 512-dim axis, and (c) FiLM conditioning with sigmoid-gated
gamma and lrelu beta MLPs. The timestep enters as one extra scalar channel
t/T concatenated to the condition (`models/CodeDiffuser.py:133-138`).

All matmuls are (18x512)-scale — tiny; the whole denoiser is a single fused
XLA program on one core.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from vspbfr_tpu.models.layers import pixel_norm
from vspbfr_tpu.ops import scaled_leaky_relu


class SpatialAttention(nn.Module):
    """Cross-branch attention over the feature axis
    (`models/CodeDiffuser.py:15-47`)."""

    latent_dim: int = 512

    @nn.compact
    def __call__(self, w: jnp.ndarray, attribute: jnp.ndarray) -> jnp.ndarray:
        d = self.latent_dim
        q = nn.Dense(d, use_bias=False, name="q")(w)           # (B, L, D)
        k = nn.Dense(d, use_bias=False, name="k")(attribute)   # (B, L, D)
        v = nn.Dense(d, use_bias=False, name="v")(w)           # (B, L, D)
        # score[b, i, j] = sum_l k[b, l, i] * q[b, l, j]  -> (B, D, D)
        score = jnp.einsum("bli,blj->bij", k, q) / math.sqrt(d)
        attn = nn.softmax(score, axis=1)
        out = jnp.einsum("bld,bdj->blj", v, attn)              # (B, L, D)
        return nn.LayerNorm(use_scale=False, use_bias=False)(out)


class TACCBlock(nn.Module):
    """Timestep-Aware Cross-attention Conditioning block
    (`models/CodeDiffuser.py:63-116`)."""

    latent_dim: int = 512
    n_tokens: int = 18

    @nn.compact
    def __call__(self, x: jnp.ndarray, embd: jnp.ndarray,
                 step: jnp.ndarray) -> jnp.ndarray:
        d = self.latent_dim
        # PixelNorm over the token axis (torch dim=1 of (B, 18, 512))
        x = pixel_norm(x, axis=1)
        k = nn.Dense(d, use_bias=False, name="k")(x)
        v = nn.Dense(d, use_bias=False, name="v")(x)
        c_embd = jnp.concatenate([embd, step], axis=-1)        # (B, L, D+1)
        q = nn.Dense(d, use_bias=False, name="q")(c_embd)      # (B, L, D)
        # channel self-attention over tokens: (B, L, L), scaled by sqrt(L)
        score = jnp.einsum("bld,bmd->blm", k, q) / math.sqrt(self.n_tokens)
        attn = nn.softmax(score, axis=-1)
        h = jnp.einsum("blm,bmd->bld", attn, v)
        h = h + SpatialAttention(d, name="attention_layer")(x, c_embd)
        h = nn.LayerNorm(use_scale=False, use_bias=False)(h)

        def film_mlp(name, final_act):
            def apply(c):
                y = nn.Dense(d, name=f"{name}_fc0")(c)
                y = nn.LayerNorm(name=f"{name}_ln")(y)
                y = scaled_leaky_relu(y)
                y = nn.Dense(d, name=f"{name}_fc1")(y)
                return final_act(y)
            return apply

        gamma = film_mlp("gamma", nn.sigmoid)(c_embd)
        beta = film_mlp("beta", scaled_leaky_relu)(c_embd)
        return h * (1.0 + gamma) + beta


class CodeDiffuser(nn.Module):
    """4-block denoiser; t broadcast as a normalized scalar channel
    (`models/CodeDiffuser.py:121-140`)."""

    timesteps: int = 4
    latent_dim: int = 512
    n_blocks: int = 4
    n_tokens: int = 18

    @nn.compact
    def __call__(self, x: jnp.ndarray, embd: jnp.ndarray,
                 t: jnp.ndarray) -> jnp.ndarray:
        """x, embd: (B, L, D); t: (B,) integer timesteps."""
        tt = (t.astype(jnp.float32) / self.timesteps)[:, None, None]
        tt = jnp.tile(tt, (1, embd.shape[1], 1))               # (B, L, 1)
        for i in range(self.n_blocks):
            x = TACCBlock(self.latent_dim, self.n_tokens,
                          name=f"block_{i}")(x, embd, tt)
        return x

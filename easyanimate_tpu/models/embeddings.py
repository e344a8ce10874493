"""Timestep and patch embeddings for the MMDiT denoisers.

Parity: diffusers Timesteps/TimestepEmbedding as consumed by
EasyAnimateTransformer3DModel (reference transformer3d.py:1399-1400):
sinusoidal projection at width inner_dim (flip_sin_to_cos=True,
downscale_freq_shift=0) followed by a 2-layer SiLU MLP to time_embed_dim.
"""
import math

import flax.linen as nn
import jax.numpy as jnp


def sinusoidal_timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """timesteps [B] -> [B, dim] fp32 sinusoidal features."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedding(nn.Module):
    """Linear -> SiLU -> Linear MLP over the sinusoidal features."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        h = nn.silu(h)
        return nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(h)


class PatchEmbed2D(nn.Module):
    """Per-frame Conv2d patchify (reference transformer3d.py:1402,1528-1531).

    Input (B, T, H, W, C) channels-last; output tokens (B, T*H/p*W/p, D) in
    (t, h, w) row-major order — matching the reference's
    `flatten(2).transpose(1,2)` on (b, c, f, h, w).
    """

    embed_dim: int
    patch_size: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        p = self.patch_size
        y = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, name="proj",
        )(x.reshape(b * t, h, w, c))
        return y.reshape(b, t * (h // p) * (w // p), self.embed_dim)


def unpatchify(tokens: jnp.ndarray, t: int, h: int, w: int, patch: int,
               out_channels: int) -> jnp.ndarray:
    """tokens (B, T*h*w, p*p*C) -> video (B, C_out, T, H, W) matching the
    reference's reshape/permute (transformer3d.py:1682-1685)."""
    b = tokens.shape[0]
    x = tokens.reshape(b, t, h, w, out_channels, patch, patch)
    # -> (b, c, t, h, p, w, p)
    x = x.transpose(0, 4, 1, 2, 5, 3, 6)
    return x.reshape(b, out_channels, t, h * patch, w * patch)

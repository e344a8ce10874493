"""TPU-native primitives for the MagViT 3D causal VAE.

The reference keeps a *stateful* per-conv temporal cache mutated via
padding-flag setters (easyanimate/vae/ldm/modules/vaemodules/common.py:31-179,
flags 0-6). Here that protocol becomes a single functional rule:

  * cache is None  -> start of sequence: replicate-pad (t_ks-1) frames in
    front (reference flags 0/3/5).
  * cache is array -> continuation: prepend the cached frames (flags 4/6);
    stride-2 convs consume one fewer cached frame (reference
    common.py:120-127).
  * every call returns the new cache = last (t_ks-1) frames of the effective
    temporal input, so chunked evaluation is mathematically identical to
    full-sequence evaluation (windows tile exactly across chunk boundaries).

Layout: all tensors are channels-last (B, T, H, W, C) — the native layout for
XLA TPU convolutions. The public AutoencoderKLMagvit API converts from the
reference's (B, C, T, H, W).
"""
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Cache = Optional[jnp.ndarray]


class CausalConv3d(nn.Module):
    """3D conv, temporally causal, with functional chunk cache.

    spatial_padding: ((top, bottom), (left, right)); defaults to SAME-style
    (1,1) for kernel 3. Stride-2 spatial downsamplers use ((0,1),(0,1)) to
    mirror the reference's `F.pad(x, (0,1,0,1))` + pad-0 conv.
    """

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    spatial_padding: Optional[Tuple[Tuple[int, int], Tuple[int, int]]] = None
    # "causal": replicate-pad front / cached continuation (magvit flags
    # 0/3-6). "sym": zero-pad both sides, no cache — the slice/compression
    # VAEs' per-chunk behaviour (reference flags 1/2 fall through to the
    # symmetric-pad branch, common.py:173-179).
    temporal_mode: str = "causal"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cache: Cache = None):
        t_ks, h_ks, w_ks = self.kernel_size
        t_stride = self.stride[0]
        t_pad = t_ks - 1

        if self.temporal_mode == "sym":
            sym = -(-((t_ks - 1) + (1 - t_stride)) // 2)  # ceil, torch parity
            if sym:
                x = jnp.pad(x, ((0, 0), (sym, sym), (0, 0), (0, 0), (0, 0)))
            new_cache = None
        elif cache is None:
            if t_pad:
                front = jnp.repeat(x[:, :1], t_pad, axis=1)
                x = jnp.concatenate([front, x], axis=1)
            new_cache = x[:, -t_pad:] if t_pad else None
        else:
            carry = cache[:, -(t_pad - 1):] if t_stride == 2 else cache
            x = jnp.concatenate([carry.astype(x.dtype), x], axis=1)
            new_cache = x[:, -t_pad:] if t_pad else None

        if self.spatial_padding is not None:
            (pt, pb), (pl_, pr) = self.spatial_padding
        else:
            pt = pb = (h_ks - 1) // 2
            pl_ = pr = (w_ks - 1) // 2

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (t_ks, h_ks, w_ks, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=self.stride,
            padding=[(0, 0), (pt, pb), (pl_, pr)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        y = y + bias.astype(self.dtype)
        return y, new_cache


class Conv1x1x1(nn.Module):
    """Pointwise 3D conv (quant/post-quant/shortcut convs)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return (x.astype(self.dtype) @ kernel.astype(self.dtype)
                + bias.astype(self.dtype))


def group_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-6,
    spatial: bool = True,
) -> jnp.ndarray:
    """GroupNorm over (B,T,H,W,C) with fp32 statistics.

    spatial=True normalizes per frame ((b t) c h w in the reference —
    `spatial_group_norm` / `set_3dgroupnorm` mode, used by V5/V5.1 so chunked
    and full-sequence evaluation agree). spatial=False normalizes over the
    whole clip (legacy VAEs).
    """
    b, t, h, w, c = x.shape
    g = num_groups
    dtype = x.dtype
    cg = c // g
    # fp32 statistics WITHOUT materializing an fp32 copy of x: the converts
    # fuse into the reductions, and the normalize collapses to one fused
    # elementwise pass `x * scale + shift` with per-(frame, channel) f32
    # scalars. The previous `x32 = x.astype(f32)` formulation made XLA
    # materialize multi-GB f32 temps at decode resolutions (measured: the
    # 384x672x49f decode allocated 6.75G f32 copies per up-block norm and
    # ran HBM-bound).
    if spatial:
        xg = x.reshape(b, t, h * w, g, cg)
        sb, st = b, t
    else:
        xg = x.reshape(b, 1, t * h * w, g, cg)
        sb, st = b, 1
    mean = jnp.mean(xg, axis=(2, 4), dtype=jnp.float32)   # (b, t|1, g)
    var = jnp.mean(
        jnp.square(xg.astype(jnp.float32) - mean[:, :, None, :, None]),
        axis=(2, 4))
    inv = jax.lax.rsqrt(var + eps)
    expand = lambda s: jnp.repeat(s, cg, axis=-1).reshape(sb, st, 1, 1, c)
    w32 = weight.astype(jnp.float32)
    scale = expand(inv) * w32
    shift = bias.astype(jnp.float32) - expand(mean * inv) * w32
    y = x.astype(jnp.float32) * scale + shift
    return y.astype(dtype)


class GroupNorm(nn.Module):
    num_groups: int = 32
    eps: float = 1e-6
    spatial: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        w = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(x, w, b, self.num_groups, self.eps, self.spatial)

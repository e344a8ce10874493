"""MagViT VAE building blocks (channels-last, functional conv caches).

Parity targets in the reference:
  ResidualBlock3D            vaemodules/common.py:254-323
  Spatial/Temporal/ST down   vaemodules/down_blocks.py:156-330,
                             downsamplers.py:24-93
  Spatial/Temporal/ST up     vaemodules/up_blocks.py:96-395, upsamplers.py
  MidBlock3D + attention     vaemodules/mid_blocks.py:38-196,
                             vaemodules/attention.py:391-470

Every module's __call__ takes (x, cache_dict|None) and returns
(y, new_cache_dict); `cache is None` marks the first chunk of a sequence.
"""
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.attention import attention as attention_op
from .layers import CausalConv3d, Conv1x1x1, GroupNorm


def _sub(cache, name):
    return None if cache is None else cache.get(name)


class ResidualBlock3D(nn.Module):
    out_channels: int
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    spatial_norm: bool = True
    tmode: str = "causal"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cache=None):
        new_cache = {}
        shortcut = x
        if x.shape[-1] != self.out_channels:
            shortcut = Conv1x1x1(self.out_channels, dtype=self.dtype,
                                 name="shortcut")(x)
        h = GroupNorm(self.norm_num_groups, self.norm_eps, self.spatial_norm,
                      name="norm1")(x)
        h = nn.silu(h)
        h, new_cache["conv1"] = CausalConv3d(
            self.out_channels, temporal_mode=self.tmode, dtype=self.dtype,
            name="conv1"
        )(h, _sub(cache, "conv1"))
        h = GroupNorm(self.norm_num_groups, self.norm_eps, self.spatial_norm,
                      name="norm2")(h)
        h = nn.silu(h)
        h, new_cache["conv2"] = CausalConv3d(
            self.out_channels, temporal_mode=self.tmode, dtype=self.dtype,
            name="conv2"
        )(h, _sub(cache, "conv2"))
        return h + shortcut, new_cache


class VAEAttention(nn.Module):
    """Single-module attention over spatial / temporal / full-3d token sets,
    with the reference's GroupNorm + residual structure (attention.py:391+).
    """

    mode: str  # 'spatial' | 'temporal' | '3d'
    nheads: int = 1
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    spatial_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        residual = x
        y = GroupNorm(self.norm_num_groups, self.norm_eps, self.spatial_norm,
                      name="group_norm")(x)
        if self.mode == "spatial":
            tokens = y.reshape(b * t, h * w, c)
        elif self.mode == "temporal":
            tokens = y.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c)
        else:  # 3d
            tokens = y.reshape(b, t * h * w, c)

        dense = lambda name: nn.Dense(c, dtype=self.dtype, name=name)
        q = dense("to_q")(tokens)
        k = dense("to_k")(tokens)
        v = dense("to_v")(tokens)
        bb, s, _ = q.shape
        hd = c // self.nheads
        reshape = lambda a: a.reshape(bb, s, self.nheads, hd).transpose(0, 2, 1, 3)
        o = attention_op(reshape(q), reshape(k), reshape(v), impl="xla")
        o = o.transpose(0, 2, 1, 3).reshape(bb, s, c)
        o = dense("to_out")(o)

        if self.mode == "spatial":
            o = o.reshape(b, t, h, w, c)
        elif self.mode == "temporal":
            o = o.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)
        else:
            o = o.reshape(b, t, h, w, c)
        return o + residual


class _DownsamplerST(nn.Module):
    out_channels: int
    stride: Tuple[int, int, int]
    spatial_padding: Optional[Tuple] = None
    tmode: str = "causal"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cache=None):
        y, c = CausalConv3d(
            self.out_channels, stride=self.stride,
            spatial_padding=self.spatial_padding, temporal_mode=self.tmode,
            dtype=self.dtype, name="conv",
        )(x, _sub(cache, "conv"))
        return y, {"conv": c}



class GlobalContextBlock(nn.Module):
    """Per-frame global-context modulation (gc_block.py:7-80): softmax
    attention-pooled context vector -> 1x1 bottleneck MLP -> sigmoid gate
    (fusion 'mul') or additive term ('add'). Enabled per down/up block via
    MagvitVAEConfig.use_gc_blocks."""

    features: int
    fusion: str = "mul"
    min_channels: int = 16
    init_bias: float = -10.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, C)
        b, t, h, w, c = x.shape
        xf = x.reshape(b * t, h * w, c).astype(jnp.float32)
        ctx_w = nn.Dense(1, dtype=jnp.float32, name="conv_ctx")(xf)
        ctx_w = jax.nn.softmax(ctx_w, axis=1)           # over pixels
        ctx = jnp.einsum("bnl,bnc->bc", ctx_w, xf)       # (b*t, C)
        num = max(self.min_channels, self.features // 2)
        hdn = nn.Dense(num, dtype=jnp.float32, name="fc1")(ctx)
        hdn = nn.LayerNorm(dtype=jnp.float32, name="ln")(hdn)
        hdn = nn.leaky_relu(hdn, 0.1)
        term = nn.Dense(
            self.features, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.constant(self.init_bias),
            dtype=jnp.float32, name="fc2")(hdn)
        term = term.reshape(b, t, 1, 1, self.features)
        if self.fusion == "mul":
            return x * jax.nn.sigmoid(term).astype(x.dtype)
        return x + term.astype(x.dtype)


class DownBlock3D(nn.Module):
    """Shared body for (Spatial|Temporal|SpatialTemporal|plain) down blocks."""

    out_channels: int
    num_layers: int = 2
    downsample: Optional[str] = None  # None|'spatial'|'temporal'|'spatial_temporal'
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    spatial_norm: bool = True
    add_gc_block: bool = False
    tmode: str = "causal"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cache=None):
        new_cache = {}
        for i in range(self.num_layers):
            name = f"res{i}"
            x, new_cache[name] = ResidualBlock3D(
                self.out_channels, self.norm_num_groups, self.norm_eps,
                self.spatial_norm, tmode=self.tmode, dtype=self.dtype,
                name=name,
            )(x, _sub(cache, name))
        if self.add_gc_block:
            x = GlobalContextBlock(self.out_channels, dtype=self.dtype,
                                   name="gc_block")(x)
        if self.downsample is not None:
            stride = {
                "spatial": (1, 2, 2),
                "temporal": (2, 1, 1),
                "spatial_temporal": (2, 2, 2),
            }[self.downsample]
            spad = ((0, 1), (0, 1)) if "spatial" in self.downsample else None
            x, new_cache["down"] = _DownsamplerST(
                self.out_channels, stride, spad, tmode=self.tmode,
                dtype=self.dtype, name="down",
            )(x, _sub(cache, "down"))
        return x, new_cache


class SpatialTemporalUpsampler3D(nn.Module):
    """Nearest 2x spatial upsample -> causal conv -> temporal 2x upsample.

    Temporal behavior mirrors the reference's padding-flag dispatch
    (upsamplers.py:142-153):
      - up_rule "magvit" (flags 0/3/4): first chunk keeps frame 0 and
        upsamples the rest 2x; later chunks upsample fully;
      - up_rule "always" (flags 4/5/6, cache_compression decode): every
        chunk upsamples fully;
      - up_rule "chunk" (flags 1/2, slice_compression): single-frame chunks
        stay single-frame, longer chunks upsample fully.
      - mode is 'nearest' when spatial_norm (set_3dgroupnorm) else trilinear.
    """

    out_channels: int
    spatial_norm: bool = True
    tmode: str = "causal"
    up_rule: str = "magvit"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cache=None):
        b, t, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        x, conv_cache = CausalConv3d(
            self.out_channels, temporal_mode=self.tmode, dtype=self.dtype,
            name="conv"
        )(x, _sub(cache, "conv"))

        def temporal_up(v):
            if self.spatial_norm:
                return jnp.repeat(v, 2, axis=1)
            return _trilinear_time2x(v)

        if self.up_rule == "always":
            x = temporal_up(x)
        elif self.up_rule == "chunk":
            if t > 1:
                x = temporal_up(x)
        elif cache is None:
            if t > 1:
                x = jnp.concatenate([x[:, :1], temporal_up(x[:, 1:])], axis=1)
        else:
            x = temporal_up(x)
        return x, {"conv": conv_cache}


def _trilinear_time2x(v):
    """torch F.interpolate(scale_factor=(2,1,1), mode='trilinear',
    align_corners=False) equivalent along the time axis."""
    b, t, h, w, c = v.shape
    t2 = 2 * t
    # output sample positions in input coordinates
    pos = (jnp.arange(t2) + 0.5) / 2.0 - 0.5
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, t - 1)
    hi = jnp.clip(lo + 1, 0, t - 1)
    frac = jnp.clip(pos - lo, 0.0, 1.0)
    vl = v[:, lo]
    vh = v[:, hi]
    frac = frac[None, :, None, None, None].astype(v.dtype)
    return vl * (1 - frac) + vh * frac


class UpBlock3D(nn.Module):
    """Shared body for up blocks: res convs, then optional upsampler
    (reference forward order, up_blocks.py:137-148 / :385-395)."""

    out_channels: int
    num_layers: int = 3
    upsample: Optional[str] = None  # None|'spatial'|'temporal'|'spatial_temporal'
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    spatial_norm: bool = True
    add_gc_block: bool = False
    tmode: str = "causal"
    up_rule: str = "magvit"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cache=None):
        new_cache = {}
        for i in range(self.num_layers):
            name = f"res{i}"
            x, new_cache[name] = ResidualBlock3D(
                self.out_channels, self.norm_num_groups, self.norm_eps,
                self.spatial_norm, tmode=self.tmode, dtype=self.dtype,
                name=name,
            )(x, _sub(cache, name))
        if self.add_gc_block:
            x = GlobalContextBlock(self.out_channels, dtype=self.dtype,
                                   name="gc_block")(x)
        if self.upsample == "spatial_temporal":
            x, new_cache["up"] = SpatialTemporalUpsampler3D(
                self.out_channels, self.spatial_norm, tmode=self.tmode,
                up_rule=self.up_rule, dtype=self.dtype, name="up",
            )(x, _sub(cache, "up"))
        elif self.upsample == "spatial":
            b, t, h, w, c = x.shape
            x2 = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
            x, cc = CausalConv3d(self.out_channels, temporal_mode=self.tmode,
                                 dtype=self.dtype,
                                 name="up_conv")(x2, _sub(cache, "up_conv"))
            new_cache["up_conv"] = cc
        elif self.upsample == "temporal":
            x2 = _temporal_first_frame_up(x, cache is None)
            x, cc = CausalConv3d(self.out_channels, temporal_mode=self.tmode,
                                 dtype=self.dtype,
                                 name="up_conv")(x2, _sub(cache, "up_conv"))
            new_cache["up_conv"] = cc
        return x, new_cache


def _temporal_first_frame_up(x, first_chunk):
    if first_chunk and x.shape[1] > 1:
        return jnp.concatenate([x[:, :1], _trilinear_time2x(x[:, 1:])], axis=1)
    if not first_chunk:
        return _trilinear_time2x(x)
    return x


class MidBlock3D(nn.Module):
    num_layers: int = 2
    attention_type: str = "spatial"  # 'spatial'|'temporal'|'spatial_temporal'|'3d'|'none'
    num_attention_heads: int = 1
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    spatial_norm: bool = True
    tmode: str = "causal"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cache=None):
        new_cache = {}
        c = x.shape[-1]
        x, new_cache["res0"] = ResidualBlock3D(
            c, self.norm_num_groups, self.norm_eps, self.spatial_norm,
            tmode=self.tmode, dtype=self.dtype, name="res0",
        )(x, _sub(cache, "res0"))
        for i in range(1, self.num_layers):
            if self.attention_type == "spatial_temporal":
                x = VAEAttention("spatial", self.num_attention_heads,
                                 self.norm_num_groups, self.norm_eps,
                                 self.spatial_norm, dtype=self.dtype,
                                 name=f"attn{i}_spatial")(x)
                x = VAEAttention("temporal", self.num_attention_heads,
                                 self.norm_num_groups, self.norm_eps,
                                 self.spatial_norm, dtype=self.dtype,
                                 name=f"attn{i}_temporal")(x)
            elif self.attention_type != "none":
                x = VAEAttention(self.attention_type, self.num_attention_heads,
                                 self.norm_num_groups, self.norm_eps,
                                 self.spatial_norm, dtype=self.dtype,
                                 name=f"attn{i}")(x)
            name = f"res{i}"
            x, new_cache[name] = ResidualBlock3D(
                c, self.norm_num_groups, self.norm_eps, self.spatial_norm,
                tmode=self.tmode, dtype=self.dtype, name=name,
            )(x, _sub(cache, name))
        return x, new_cache

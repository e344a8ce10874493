"""Transformer3D (V1-V3 generations): PixArt-style video DiT with temporal
motion modules.

Parity target: reference transformer3d.py:140-818 + attention.py:128-721 +
motion_module.py. Covered configuration space (the shipped V1-V3 yamls):
  - ada_norm_single (PixArt AdaLN-single: shared SiLU+Linear(6*dim) of the
    timestep embedding + per-block scale_shift_table)
  - 2D per-frame patchify with 2D sincos position embedding
  - basic_block_type in {basic, motionmodule, global_motionmodule,
    selfattentiontemporal}; motionmodule kwargs alternate even/odd blocks
    (config easyanimate_video_v3_*.yaml)
  - motion modules: VanillaTemporalModule (Temporal_Self / Global_Self
    attention blocks with sinusoidal temporal PE, optional grid blocking,
    zero-initialised proj_out); optional global transformer
  - text cross-attention with additive mask bias; PixArt caption projection
  - U-ViT long skips: first 13 block outputs pushed, popped from block 15
    through zero-initialised linears (transformer3d.py:400-407, 582-589)
  - output: scale_shift_table(2, dim) + embedded timestep -> LN modulation
    -> proj_out -> per-frame unpatchify
patch_3d / fake_3d / casual_3d patchify variants and the casual-3D
mid-stack upsampler are ported too (`patch_mode` + `unpatchify_3d`; see
tests/test_legacy_models.py::test_patch_modes).
"""
import dataclasses
import math
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import attention as attention_op
from ..ops.norms import fp32_layer_norm
from .embeddings import (
    TimestepEmbedding,
    sinusoidal_timestep_embedding,
    unpatchify,
)
from .mmdit import _sincos_2d


@dataclasses.dataclass(frozen=True)
class MotionModuleConfig:
    num_attention_heads: int = 8
    num_transformer_block: int = 1
    attention_block_types: Tuple[str, ...] = ("Temporal_Self", "Temporal_Self")
    temporal_position_encoding: bool = True
    temporal_position_encoding_max_len: int = 4096
    block_size: int = 1
    grid: bool = False


@dataclasses.dataclass(frozen=True)
class Transformer3DConfig:
    num_attention_heads: int = 16
    attention_head_dim: int = 72
    in_channels: int = 4
    out_channels: int = 8            # learned sigma -> 2x latent channels
    patch_size: int = 2
    num_layers: int = 28
    cross_attention_dim: int = 1152
    caption_channels: int = 4096     # T5 hidden size
    norm_eps: float = 1e-6
    basic_block_type: str = "global_motionmodule"
    enable_uvit: bool = True
    qk_norm: bool = False
    after_norm: bool = False
    motion_module_even: MotionModuleConfig = dataclasses.field(
        default_factory=MotionModuleConfig)
    motion_module_odd: MotionModuleConfig = dataclasses.field(
        default_factory=lambda: MotionModuleConfig(
            attention_block_types=("Temporal_Self", "Global_Self")))
    time_position_encoding_before_transformer: bool = False
    # patchify variants (reference transformer3d.py:203-276, patch.py):
    #   "2d"        per-frame PatchEmbed (all shipped configs)
    #   "3d"        PatchEmbed3D: conv (tp,p,p) stride (tp,p,p)
    #   "fake_3d"   PatchEmbedF3D: 2D conv + strided temporal 1D conv,
    #               mirrored by UnPatch1D (2x nearest + conv1d) at the output
    #   "casual_3d" CasualPatchEmbed3D: front-replicate-padded causal 3D conv,
    #               f' = (f-1)//tp+1, with mid-stack TemporalUpsampler3D at
    #               casual_3d_upsampler_index (transformer3d.py:591-595)
    patch_mode: str = "2d"
    time_patch_size: Optional[int] = None
    casual_3d_upsampler_index: Tuple[int, ...] = ()
    # pipeline-facing: V1-V3 use sinusoidal PEs, so build_rope's 2d branch
    # output is simply ignored by the model
    time_position_encoding_type: str = "sinusoidal"
    vae_scale_factor: int = 8
    dtype: str = "bfloat16"
    attn_impl: str = "auto"

    @property
    def t_patch(self):
        return self.time_patch_size or self.patch_size

    @property
    def inner_dim(self):
        return self.num_attention_heads * self.attention_head_dim

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


def _sinusoidal_pe(length: int, dim: int) -> np.ndarray:
    pos = np.arange(length)[:, None]
    div = np.exp(np.arange(0, dim, 2) * (-math.log(10000.0) / dim))
    pe = np.zeros((length, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class _Attn(nn.Module):
    """diffusers Attention: optional cross, additive bias mask."""

    heads: int
    head_dim: int
    out_dim: int
    qk_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, bias=None):
        ctx = x if context is None else context
        inner = self.heads * self.head_dim
        b, s, _ = x.shape
        sk = ctx.shape[1]
        to = lambda name, src, width: nn.Dense(width, use_bias=False,
                                               dtype=self.dtype, name=name)(src)
        q = to("to_q", x, inner).reshape(b, s, self.heads, self.head_dim
                                         ).transpose(0, 2, 1, 3)
        k = to("to_k", ctx, inner).reshape(b, sk, self.heads, self.head_dim
                                           ).transpose(0, 2, 1, 3)
        v = to("to_v", ctx, inner).reshape(b, sk, self.heads, self.head_dim
                                           ).transpose(0, 2, 1, 3)
        if self.qk_norm:
            qw = self.param("norm_q_scale", nn.initializers.ones,
                            (self.head_dim,), jnp.float32)
            qb = self.param("norm_q_bias", nn.initializers.zeros,
                            (self.head_dim,), jnp.float32)
            kw = self.param("norm_k_scale", nn.initializers.ones,
                            (self.head_dim,), jnp.float32)
            kb = self.param("norm_k_bias", nn.initializers.zeros,
                            (self.head_dim,), jnp.float32)
            q = fp32_layer_norm(q, qw, qb, 1e-6)
            k = fp32_layer_norm(k, kw, kb, 1e-6)
        if bias is None:
            o = attention_op(q, k, v, impl=self.attn_impl_resolved())
        else:
            # bias path (text mask): dense XLA attention
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores * (self.head_dim ** -0.5) + bias[:, None]
            p = jnp.array(jnp.exp(scores - jnp.max(scores, -1, keepdims=True)))
            p = p / jnp.sum(p, -1, keepdims=True)
            o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, inner)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="to_out")(o)

    def attn_impl_resolved(self):
        return "auto"


class _FeedForwardGEGLU(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(2 * self.dim * self.mult, dtype=self.dtype, name="wi")(x)
        a, g = jnp.split(h, 2, axis=-1)
        return nn.Dense(self.dim, dtype=self.dtype, name="wo")(
            a * nn.gelu(g, approximate=False))


class MotionModule(nn.Module):
    """VanillaTemporalModule: norm+proj_in, temporal attention blocks with
    sinusoidal PE (optionally grid-blocked), GEGLU FF, zero-init proj_out."""

    dim: int
    mm: MotionModuleConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, f: int, h: int, w: int):
        # x: (B, f*h*w, C)
        b = x.shape[0]
        res_outer = x
        y = fp32_layer_norm(
            x, self.param("norm_scale", nn.initializers.ones, (self.dim,), jnp.float32),
            self.param("norm_bias", nn.initializers.zeros, (self.dim,), jnp.float32))
        y = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(y)

        heads = self.mm.num_attention_heads
        hd = self.dim // heads
        for blk in range(self.mm.num_transformer_block):
            for ai, kind in enumerate(self.mm.attention_block_types):
                res = y
                yn = fp32_layer_norm(
                    y,
                    self.param(f"b{blk}_a{ai}_norm_scale", nn.initializers.ones,
                               (self.dim,), jnp.float32),
                    self.param(f"b{blk}_a{ai}_norm_bias", nn.initializers.zeros,
                               (self.dim,), jnp.float32))
                if kind == "Temporal_Self":
                    g = y.reshape(b, f, h, w, self.dim)
                    yn_g = yn.reshape(b, f, h, w, self.dim)
                    bs = self.mm.block_size
                    if self.mm.grid and bs > 1:
                        # (b h w) (f n m) c token groups of a bs x bs cell
                        yn_t = yn_g.reshape(b, f, h // bs, bs, w // bs, bs,
                                            self.dim)
                        yn_t = yn_t.transpose(0, 2, 4, 1, 3, 5, 6).reshape(
                            b * (h // bs) * (w // bs), f * bs * bs, self.dim)
                    else:
                        yn_t = yn_g.transpose(0, 2, 3, 1, 4).reshape(
                            b * h * w, f, self.dim)
                    if self.mm.temporal_position_encoding:
                        pe = _sinusoidal_pe(yn_t.shape[1], self.dim)
                        yn_t = yn_t + jnp.asarray(pe, yn_t.dtype)[None]
                    o = _Attn(heads, hd, self.dim, dtype=self.dtype,
                              name=f"b{blk}_a{ai}_attn")(yn_t)
                    if self.mm.grid and bs > 1:
                        o = o.reshape(b, h // bs, w // bs, f, bs, bs, self.dim)
                        o = o.transpose(0, 3, 1, 4, 2, 5, 6).reshape(
                            b, f * h * w, self.dim)
                    else:
                        o = o.reshape(b, h, w, f, self.dim).transpose(
                            0, 3, 1, 2, 4).reshape(b, f * h * w, self.dim)
                elif kind == "Global_Self":
                    yn_t = yn.reshape(b, f, h * w, self.dim)
                    if self.mm.temporal_position_encoding:
                        pe = _sinusoidal_pe(f, self.dim)
                        yn_t = yn_t + jnp.asarray(pe, yn_t.dtype)[None, :, None]
                    yn_t = yn_t.reshape(b, f * h * w, self.dim)
                    o = _Attn(heads, hd, self.dim, dtype=self.dtype,
                              name=f"b{blk}_a{ai}_attn")(yn_t)
                else:
                    raise ValueError(kind)
                y = res + o
            res = y
            yn = fp32_layer_norm(
                y, self.param(f"b{blk}_ff_norm_scale", nn.initializers.ones,
                              (self.dim,), jnp.float32),
                self.param(f"b{blk}_ff_norm_bias", nn.initializers.zeros,
                           (self.dim,), jnp.float32))
            y = res + _FeedForwardGEGLU(self.dim, dtype=self.dtype,
                                        name=f"b{blk}_ff")(yn)
        y = nn.Dense(self.dim, kernel_init=nn.initializers.zeros,
                     dtype=self.dtype, name="proj_out")(y)
        return res_outer + y


class TemporalTransformerBlock(nn.Module):
    """Spatial self-attn -> motion module -> text cross-attn -> FF, with
    PixArt AdaLN-single modulation (attention.py:128-721)."""

    cfg: Transformer3DConfig
    use_motion: bool
    motion: Optional[MotionModuleConfig]
    temporal_self_attention: bool = False

    @nn.compact
    def __call__(self, x, t6, text, text_bias, f, h, w):
        cfg = self.cfg
        dim = cfg.inner_dim
        dt = cfg.jdtype
        b = x.shape[0]
        table = self.param("scale_shift_table",
                           nn.initializers.normal(dim ** -0.5), (6, dim),
                           jnp.float32)
        mods = table[None] + t6.reshape(b, 6, dim)
        (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp) = [
            mods[:, i][:, None] for i in range(6)]

        # 1. spatial self-attention (per frame)
        xn = fp32_layer_norm(x, eps=cfg.norm_eps) * (1 + scale_msa) + shift_msa
        xs = xn.reshape(b * f, h * w, dim)
        o = _Attn(cfg.num_attention_heads, cfg.attention_head_dim, dim,
                  cfg.qk_norm, dtype=dt, name="attn1")(xs)
        x = x + gate_msa * o.reshape(b, f * h * w, dim)

        # 2. temporal branch
        if self.use_motion:
            x = MotionModule(dim, self.motion, dtype=dt, name="attn_temporal")(
                x, f, h, w)
        elif self.temporal_self_attention:
            xt = x.reshape(b, f, h * w, dim).transpose(0, 2, 1, 3).reshape(
                b * h * w, f, dim)
            o = _Attn(cfg.num_attention_heads, cfg.attention_head_dim, dim,
                      cfg.qk_norm, dtype=dt, name="attn_temporal")(xt)
            o = o.reshape(b, h * w, f, dim).transpose(0, 2, 1, 3).reshape(
                b, f * h * w, dim)
            x = x + o

        # 3. cross-attention to text (PixArt: no norm before attn2)
        o = _Attn(cfg.num_attention_heads, cfg.attention_head_dim, dim,
                  cfg.qk_norm, dtype=dt, name="attn2")(x, text, text_bias)
        x = x + o

        # 4. feed-forward
        xn = fp32_layer_norm(x, eps=cfg.norm_eps) * (1 + scale_mlp) + shift_mlp
        ff = _FeedForwardGEGLU(dim, dtype=dt, name="ff")(xn)
        if cfg.after_norm:
            ff = fp32_layer_norm(
                ff, self.param("norm4_scale", nn.initializers.ones, (dim,),
                               jnp.float32),
                self.param("norm4_bias", nn.initializers.zeros, (dim,),
                           jnp.float32), cfg.norm_eps)
        return x + gate_mlp * ff


class Transformer3D(nn.Module):
    """V1-V3 video DiT."""

    cfg: Transformer3DConfig

    @nn.compact
    def __call__(self, hidden_states, timestep, encoder_hidden_states,
                 rope=None, text_mask=None, encoder_hidden_states_t5=None,
                 inpaint_latents=None, control_latents=None):
        # rope / t5 accepted for pipeline signature compatibility; V1-V3 use
        # sinusoidal temporal PE instead of rope and a single text encoder
        cfg = self.cfg
        dt = cfg.jdtype
        dim = cfg.inner_dim
        b, c, f, hh, ww = hidden_states.shape
        p = cfg.patch_size
        h, w = hh // p, ww // p

        if inpaint_latents is not None:
            hidden_states = jnp.concatenate([hidden_states, inpaint_latents], 1)
        if control_latents is not None:
            hidden_states = jnp.concatenate([hidden_states, control_latents], 1)

        # patchify + 2D sincos pos embed (PixArt PatchEmbed & 3D variants)
        x = jnp.transpose(hidden_states, (0, 2, 3, 4, 1)).astype(dt)
        tp = cfg.t_patch
        if cfg.patch_mode == "2d":
            x = nn.Conv(dim, (p, p), strides=(p, p), padding="VALID",
                        dtype=dt, name="pos_embed_proj")(
                x.reshape(b * f, hh, ww, -1))
        elif cfg.patch_mode == "3d":
            x = nn.Conv(dim, (tp, p, p), strides=(tp, p, p), padding="VALID",
                        dtype=dt, name="pos_embed_proj")(x)
            f = f // tp
            x = x.reshape(b * f, h * w, dim)
        elif cfg.patch_mode == "casual_3d":
            # replicate-pad tp-1 frames at the front: f' = (f-1)//tp + 1
            x = jnp.concatenate(
                [jnp.repeat(x[:, :1], tp - 1, axis=1), x], axis=1)
            x = nn.Conv(dim, (tp, p, p), strides=(tp, p, p), padding="VALID",
                        dtype=dt, name="pos_embed_proj")(x)
            f = (f - 1) // tp + 1
            x = x.reshape(b * f, h * w, dim)
        elif cfg.patch_mode == "fake_3d":
            # 2D conv per frame, then strided temporal conv1d initialised to
            # an average (patch.py:83-88 Patch1D)
            x = nn.Conv(dim, (p, p), strides=(p, p), padding="VALID",
                        dtype=dt, name="pos_embed_proj")(
                x.reshape(b * f, hh, ww, -1))
            x = x.reshape(b, f, h * w, dim).transpose(0, 2, 1, 3)

            def _avg_init(key, shape, dtype=jnp.float32):
                kern = np.zeros(shape, np.float32)
                for i in range(shape[-1]):
                    kern[:, i, i] = 1.0 / shape[0]
                return jnp.asarray(kern, dtype)

            x = nn.Conv(dim, (p,), strides=(p,), padding="VALID",
                        kernel_init=_avg_init,
                        bias_init=nn.initializers.zeros,
                        dtype=dt, name="pos_embed_proj_t")(
                x.reshape(b * h * w, f, dim))
            f = f // p
            x = x.reshape(b, h * w, f, dim).transpose(0, 2, 1, 3)
        else:
            raise ValueError(f"unknown patch_mode {cfg.patch_mode}")
        x = x.reshape(b * f, h * w, dim)
        x = x + jnp.asarray(_sincos_2d(dim, h, w), dt)[None]
        x = x.reshape(b, f * h * w, dim)

        # AdaLN-single: t -> 256 sinusoid -> MLP(dim) -> SiLU+Linear(6*dim)
        t_emb = sinusoidal_timestep_embedding(timestep, 256)
        emb = TimestepEmbedding(dim, dtype=dt, name="adaln_single_emb")(
            t_emb.astype(dt))
        t6 = nn.Dense(6 * dim, dtype=dt, name="adaln_single_linear")(
            nn.silu(emb))

        # caption projection (PixArtAlphaTextProjection: linear-gelu-linear)
        text = nn.Dense(dim, dtype=dt, name="caption_proj_1")(
            encoder_hidden_states.astype(dt))
        text = nn.Dense(dim, dtype=dt, name="caption_proj_2")(
            nn.gelu(text, approximate=True))
        text_bias = None
        if text_mask is not None:
            text_bias = ((1.0 - text_mask.astype(jnp.float32)) * -10000.0
                         )[:, None, :]

        use_motion = cfg.basic_block_type in ("motionmodule",
                                              "global_motionmodule")
        skips = []
        skip_idx = 0
        for i in range(cfg.num_layers):
            if cfg.enable_uvit and i >= 15:
                fc = nn.Dense(dim, kernel_init=nn.initializers.zeros,
                              dtype=dt, name=f"long_connect_fc{skip_idx}")
                x = x + fc(skips.pop())
                skip_idx += 1
            if (cfg.patch_mode == "casual_3d"
                    and i in cfg.casual_3d_upsampler_index):
                # TemporalUpsampler3D (patch.py:142-154): keep frame 0, 2x
                # linear-in-time upsample of the rest -> f' = (f-1)*2+1
                g = x.reshape(b, f, h, w, dim)
                first, rest = g[:, :1], g[:, 1:]
                rest = jax.image.resize(
                    rest, (b, 2 * (f - 1), h, w, dim), method="linear")
                f = (f - 1) * 2 + 1
                x = jnp.concatenate([first, rest], 1).reshape(
                    b, f * h * w, dim)
            motion = (cfg.motion_module_even if i % 2 == 0
                      else cfg.motion_module_odd) if use_motion else None
            x = TemporalTransformerBlock(
                cfg, use_motion, motion,
                temporal_self_attention=(
                    cfg.basic_block_type == "selfattentiontemporal"),
                name=f"block{i}",
            )(x, t6, text, text_bias, f, h, w)
            if cfg.enable_uvit and i < 13:
                skips.append(x)

        if cfg.patch_mode == "fake_3d":
            # UnPatch1D (patch.py:97-130): 2x nearest over time + conv1d k3
            g = x.reshape(b, f, h * w, dim).transpose(0, 2, 1, 3)
            g = g.reshape(b * h * w, f, dim)
            g = jnp.repeat(g, 2, axis=1)
            g = nn.Conv(dim, (3,), padding="SAME", dtype=dt,
                        name="unpatch1d_conv")(g)
            f = 2 * f
            x = g.reshape(b, h * w, f, dim).transpose(0, 2, 1, 3)
            x = x.reshape(b, f * h * w, dim)

        # output: scale_shift_table(2, dim) + embedded timestep
        table = self.param("scale_shift_table",
                           nn.initializers.normal(dim ** -0.5), (2, dim),
                           jnp.float32)
        mods = table[None] + emb[:, None]
        shift, scale = mods[:, 0][:, None], mods[:, 1][:, None]
        x = fp32_layer_norm(x, eps=1e-6) * (1 + scale) + shift
        if cfg.patch_mode == "3d":
            tp = cfg.t_patch
            x = nn.Dense(tp * p * p * cfg.out_channels, dtype=dt,
                         name="proj_out")(x)
            x = x.reshape(b, f, h, w, tp, p, p, cfg.out_channels)
            # nfhwopqc -> ncfohpwq (transformer3d.py:684)
            x = jnp.einsum("nfhwopqc->ncfohpwq", x)
            return x.reshape(b, cfg.out_channels, f * tp, h * p, w * p)
        x = nn.Dense(p * p * cfg.out_channels, dtype=dt, name="proj_out")(x)
        return unpatchify(x, f, h, w, p, cfg.out_channels)


def Transformer2D(cfg: Transformer3DConfig) -> Transformer3D:
    """PixArt image DiT (reference transformer2d.py / Transformer2DModel):
    the V1 image-pretrain baseline is this architecture with single-frame
    inputs and no temporal branch."""
    cfg = dataclasses.replace(cfg, basic_block_type="basic",
                              enable_uvit=False)
    return Transformer3D(cfg)

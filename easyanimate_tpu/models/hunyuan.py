"""HunyuanTransformer3D (V4 generation).

Parity target: reference transformer3d.py:820-1345 + attention.py:733-1025 +
embeddings.py + processor.py:10-216. Covered:
  - combined timestep + attention-pooled T5 text + image-size sinusoids +
    style embedding conditioning (HunyuanCombinedTimestepTextSizeStyleEmbedding)
  - dual text streams: Bert-CLIP states + T5 states through a SiLU-fp32 MLP,
    concat, with a learned padding table where the mask is 0
  - encoder/decoder halves with long skips (concat -> fp32 LN -> linear)
  - HunyuanDiTBlock: AdaLayerNormShift, self-attn with per-head LN qk-norm +
    2D RoPE tiled over frames (disabled in layer 0), text cross-attn
    (RoPE on q only), gelu-tanh FFN at mlp_ratio
  - optional temporal sinusoidal PE per block (time_position_encoding)
  - kvcompression variant: stride-2 depthwise conv KV downsampling in the
    decoder half with bilinearly resized K RoPE (processor.py:105-216)
  - hybrid local attention: 2-frame windows averaged over two offset
    groupings (attention.py:946-998)
  - CLIP image branch for I2V: a perceiver Resampler (resampler.py:83-146)
    turns CLIP vision patch tokens into n_query context tokens (padded with a
    learned table where clip_attention_mask is 0, transformer3d.py:1096-1103),
    consumed per block by a gated cross-attention
    (norm_clip -> attn_clip -> GEGLU -> norm_clip_out, attention.py:860-874
    and 1007-1016).
  - bidirectional Mamba2 residual branch on hybrid blocks: pure-JAX SSD
    via associative scan (ops/ssd.py; reference attention.py:825-848 uses
    the mamba_ssm CUDA kernel), zero-init output linear.
  - AdaLayerNormContinuous out + learned-sigma 2x output channels
"""
import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import attention as attention_op
from ..ops.norms import fp32_layer_norm
from ..ops.rope import apply_rotary_emb
from .embeddings import (
    TimestepEmbedding,
    sinusoidal_timestep_embedding,
    unpatchify,
)
from .mmdit import _sincos_2d


@dataclasses.dataclass(frozen=True)
class HunyuanConfig:
    num_attention_heads: int = 16
    attention_head_dim: int = 88
    in_channels: int = 4
    out_channels: Optional[int] = None   # None -> learn_sigma doubles
    patch_size: int = 2
    num_layers: int = 40
    mlp_ratio: float = 4.0
    learn_sigma: bool = True
    cross_attention_dim: int = 1024
    cross_attention_dim_t5: int = 2048
    pooled_projection_dim: int = 1024
    text_len: int = 77
    text_len_t5: int = 256
    basic_block_type: str = "basic"  # 'basic'|'kvcompression_basic'|'hybrid_attention'
    enable_clip_in_inpaint: bool = True
    n_query: int = 16
    projection_dim: int = 768
    # pipeline-facing flags (config/easyanimate_video_v4_*.yaml): V4 encodes
    # the inpaint mask through the VAE rather than resizing it directly, and
    # does not noise-augment the reference video
    resize_inpaint_mask_directly: bool = False
    add_noise_in_inpaint_model: bool = False
    time_position_encoding_type: str = "2d_rope"
    vae_scale_factor: int = 8
    # bidirectional Mamba2 residual on hybrid_attention blocks
    # (attention.py:825-848)
    enable_mamba: bool = True
    mamba_d_model: int = 1536
    time_position_encoding: bool = False
    after_norm: bool = False
    qk_norm: bool = True
    norm_eps: float = 1e-6
    dtype: str = "bfloat16"
    attn_impl: str = "auto"

    @property
    def inner_dim(self):
        return self.num_attention_heads * self.attention_head_dim

    @property
    def effective_out_channels(self):
        if self.out_channels is not None:
            return self.out_channels
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


class AttentionPool(nn.Module):
    """CLIP-style attention pooling of T5 states (embeddings.py:14-43)."""

    seq_len: int
    output_dim: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, S, C)
        b, s, c = x.shape
        pos = self.param("positional_embedding",
                         nn.initializers.normal(c ** -0.5), (s + 1, c),
                         jnp.float32)
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
        x = x + pos[None].astype(x.dtype)
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(x[:, :1])
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(x)
        hd = c // self.num_heads
        resh = lambda a: a.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        o = attention_op(resh(q), resh(k), resh(v), impl="xla")
        o = o.transpose(0, 2, 1, 3).reshape(b, 1, c)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="c_proj")(
            o)[:, 0]


class HunyuanCombinedEmbedding(nn.Module):
    """timestep + pooled text + size + style -> conditioning vector."""

    cfg: HunyuanConfig

    @nn.compact
    def __call__(self, timestep, t5_states, image_meta_size, style):
        cfg = self.cfg
        dt = cfg.jdtype
        hidden = cfg.inner_dim
        t_emb = sinusoidal_timestep_embedding(timestep, 256)
        temb = TimestepEmbedding(hidden, dtype=dt, name="timestep_embedder")(
            t_emb.astype(dt))
        pooled = AttentionPool(cfg.text_len_t5, cfg.pooled_projection_dim,
                               dtype=dt, name="pooler")(t5_states.astype(dt))
        b = timestep.shape[0]
        if image_meta_size is None:
            image_meta_size = jnp.zeros((b, 6), jnp.float32)
        size_emb = sinusoidal_timestep_embedding(
            image_meta_size.reshape(-1), 256).reshape(b, 6 * 256)
        if style is None:
            style = jnp.zeros((b,), jnp.int32)
        style_table = self.param("style_embedder",
                                 nn.initializers.normal(0.02), (1, 256),
                                 jnp.float32)
        style_emb = style_table[style]
        extra = jnp.concatenate(
            [pooled.astype(jnp.float32), size_emb, style_emb], axis=-1)
        h = nn.Dense(hidden * 4, dtype=dt, name="extra_linear_1")(extra.astype(dt))
        h = nn.silu(h)
        extra = nn.Dense(hidden, dtype=dt, name="extra_linear_2")(h)
        return temb + extra


class HunyuanAttention(nn.Module):
    """qk-norm attention with RoPE on q (and k when self-attn)
    (processor.py:10-103); optional stride-2 KV compression."""

    heads: int
    head_dim: int
    cross_dim: Optional[int] = None
    kv_compression: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, rope=None, grid=None, bias=None):
        is_cross = context is not None
        ctx = x if context is None else context
        inner = self.heads * self.head_dim
        b, s, _ = x.shape
        dense = lambda name: nn.Dense(inner, dtype=self.dtype, name=name)
        q = dense("to_q")(x)
        k = dense("to_k")(ctx)
        v = dense("to_v")(ctx)
        k_rope = rope
        if self.kv_compression and not is_cross and grid is not None:
            f, gh, gw = grid
            conv = lambda name: nn.Conv(
                inner, (2, 2), strides=(2, 2), padding="VALID",
                feature_group_count=inner,
                kernel_init=nn.initializers.constant(0.25),
                dtype=self.dtype, name=name)
            resh = lambda a: a.reshape(b * f, gh, gw, inner)
            k = conv("k_compression")(resh(k)).reshape(b, -1, inner)
            v = conv("v_compression")(resh(v)).reshape(b, -1, inner)
            if rope is not None:
                cos, sin = rope
                rs = lambda t: jax.image.resize(
                    t.reshape(f, gh, gw, -1),
                    (f, gh // 2, gw // 2, t.shape[-1]), "bilinear",
                    antialias=False).reshape(f * (gh // 2) * (gw // 2), -1)
                k_rope = (rs(cos), rs(sin))
        heads = lambda a: a.reshape(b, -1, self.heads, self.head_dim
                                    ).transpose(0, 2, 1, 3)
        q, k, v = heads(q), heads(k), heads(v)
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
        if rope is not None:
            q = apply_rotary_emb(q, *rope)
            if not is_cross:
                k = apply_rotary_emb(k, *k_rope)
        if bias is not None:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores * (self.head_dim ** -0.5) + bias[:, None]
            p = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
        else:
            o = attention_op(q, k, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, inner)
        return nn.Dense(inner, dtype=self.dtype, name="to_out")(o)


class Resampler(nn.Module):
    """Perceiver resampler (resampler.py:83-146): grid_size**2 learned
    queries cross-attend once into the image tokens; 2D sincos position
    tables on q and (bicubically resized, resampler.py:15-31) on kv."""

    grid_size: int
    embed_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, N, kv_dim) with N a perfect square
        dt = self.dtype
        dim = self.embed_dim
        nq = self.grid_size ** 2
        b, n, kv_dim = x.shape
        query = self.param("query", nn.initializers.normal(0.02),
                           (nq, dim), jnp.float32)
        q_pos = jnp.asarray(_sincos_2d(dim, self.grid_size, self.grid_size),
                            jnp.float32)
        src = int(round(math.sqrt(n)))
        if src * src != n:
            raise ValueError(f"Resampler kv length {n} is not square")
        kv_pos = q_pos
        if src != self.grid_size:
            kv_pos = jax.image.resize(
                q_pos.reshape(self.grid_size, self.grid_size, dim),
                (src, src, dim), "bicubic").reshape(n, dim)
        if kv_dim != dim:
            x = nn.Dense(dim, use_bias=False, dtype=dt, name="kv_proj")(x)
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                       name=name)
        q = ln("ln_q")(query)[None] + q_pos[None]
        kv = ln("ln_kv")(x.astype(jnp.float32))
        k = kv + kv_pos[None]
        v = kv
        dense = lambda name: nn.Dense(dim, dtype=dt, name=name)
        hd = dim // self.num_heads
        heads = lambda a: a.reshape(a.shape[0], -1, self.num_heads, hd
                                    ).transpose(0, 2, 1, 3)
        qh = heads(jnp.broadcast_to(dense("q_in")(q.astype(dt)), (b, nq, dim)))
        kh = heads(dense("k_in")(k.astype(dt)))
        vh = heads(dense("v_in")(v.astype(dt)))
        o = attention_op(qh, kh, vh, impl="xla")
        o = o.transpose(0, 2, 1, 3).reshape(b, nq, dim)
        return dense("out_proj")(o)


class HunyuanDiTBlock(nn.Module):
    cfg: HunyuanConfig
    skip: bool = False
    kv_compression: bool = False
    is_local_attention: bool = False

    @nn.compact
    def __call__(self, x, text, temb, rope, skip_states=None, grid=None,
                 text_bias=None, disable_rope_in_attn1=False,
                 clip_context=None):
        cfg = self.cfg
        dim = cfg.inner_dim
        dt = cfg.jdtype
        f, gh, gw = grid

        if self.skip:
            cat = jnp.concatenate([x, skip_states], axis=-1)
            sw = self.param("skip_norm_scale", nn.initializers.ones,
                            (2 * dim,), jnp.float32)
            sb = self.param("skip_norm_bias", nn.initializers.zeros,
                            (2 * dim,), jnp.float32)
            cat = fp32_layer_norm(cat, sw, sb, cfg.norm_eps)
            x = nn.Dense(dim, dtype=dt, name="skip_linear")(cat)

        if cfg.time_position_encoding and f != 1:
            pe = _temporal_pe(f, dim)
            x = (x.reshape(x.shape[0], f, gh * gw, dim)
                 + jnp.asarray(pe, x.dtype)[None, :, None]).reshape(x.shape)

        # AdaLayerNormShift (norm.py:115-133)
        shift = nn.Dense(dim, dtype=dt, name="norm1_linear")(
            nn.silu(temb.astype(jnp.float32)).astype(temb.dtype))
        nw = self.param("norm1_scale", nn.initializers.ones, (dim,), jnp.float32)
        nb = self.param("norm1_bias", nn.initializers.zeros, (dim,), jnp.float32)
        xn = fp32_layer_norm(x, nw, nb, cfg.norm_eps) + shift[:, None]

        rope_full = None
        if rope is not None:
            cos, sin = rope  # (gh*gw, hd) single-frame 2D tables
            rope_full = (jnp.tile(cos, (f, 1)), jnp.tile(sin, (f, 1)))
        attn1_rope = None if disable_rope_in_attn1 else rope_full

        attn1 = HunyuanAttention(cfg.num_attention_heads,
                                 cfg.attention_head_dim,
                                 kv_compression=self.kv_compression,
                                 dtype=dt, name="attn1")
        if self.is_local_attention and f > 2:
            d = gh * gw
            r1 = None if disable_rope_in_attn1 or rope_full is None else (
                rope_full[0][: 2 * d], rope_full[1][: 2 * d])
            b = xn.shape[0]
            g = xn.reshape(b, f, d, dim)
            # grouping 1: frames (0,1), (2,3), ...
            a1 = attn1(g.reshape(b * (f // 2), 2 * d, dim), rope=r1, grid=grid)
            a1 = a1.reshape(b, f, d, dim)
            # grouping 2: frames (1,2), (3,4), ... averaged into the interior
            g2 = g[:, 1:-1].reshape(b * ((f - 2) // 2), 2 * d, dim)
            a2 = attn1(g2, rope=r1, grid=grid).reshape(b, f - 2, d, dim)
            a1 = a1.at[:, 1:-1].set((a1[:, 1:-1] + a2) / 2)
            attn_out = a1.reshape(b, f * d, dim)
        else:
            attn_out = attn1(xn, rope=attn1_rope, grid=grid)
        x = x + attn_out

        # bidirectional Mamba2 residual on hybrid blocks
        # (attention.py:825-848, 985-998); out_linear is zero-init so the
        # branch is an identity at initialisation
        if self.is_local_attention and f > 2 and cfg.enable_mamba:
            from ..ops.ssd import Mamba2Block, Mamba2Config

            mcfg = Mamba2Config(d_model=cfg.mamba_d_model)
            ln = lambda width, name: (
                self.param(f"{name}_scale", nn.initializers.ones, (width,),
                           jnp.float32),
                self.param(f"{name}_bias", nn.initializers.zeros, (width,),
                           jnp.float32))
            w, bparam = ln(dim, "mamba_norm_in")
            hin = nn.Dense(mcfg.d_model, dtype=dt, name="mamba_in_linear")(
                fp32_layer_norm(x, w, bparam, cfg.norm_eps))
            w1, b1 = ln(mcfg.d_model, "mamba_norm_1")
            w2, b2 = ln(mcfg.d_model, "mamba_norm_2")
            y1 = Mamba2Block(mcfg, dtype=dt, name="mamba_block_1")(
                fp32_layer_norm(hin, w1, b1, cfg.norm_eps))
            y2 = Mamba2Block(mcfg, dtype=dt, name="mamba_block_2")(
                fp32_layer_norm(hin[:, ::-1], w2, b2, cfg.norm_eps))[:, ::-1]
            wa, ba = ln(mcfg.d_model, "mamba_norm_after")
            out = nn.Dense(dim, kernel_init=nn.initializers.zeros, dtype=dt,
                           name="mamba_out_linear")(
                fp32_layer_norm(y1 + y2, wa, ba, cfg.norm_eps))
            wo, bo = ln(dim, "mamba_norm_out")
            x = x + fp32_layer_norm(out, wo, bo, cfg.norm_eps)

        # cross-attention (rope on q only)
        attn2 = HunyuanAttention(cfg.num_attention_heads,
                                 cfg.attention_head_dim,
                                 cross_dim=cfg.cross_attention_dim,
                                 dtype=dt, name="attn2")
        x = x + attn2(x, context=text, rope=rope_full, grid=grid,
                      bias=text_bias)

        # gated CLIP-image cross-attention (attention.py:1007-1016)
        if clip_context is not None:
            cw = self.param("norm_clip_scale", nn.initializers.ones,
                            (dim,), jnp.float32)
            cb = self.param("norm_clip_bias", nn.initializers.zeros,
                            (dim,), jnp.float32)
            attn_clip = HunyuanAttention(cfg.num_attention_heads,
                                         cfg.attention_head_dim,
                                         cross_dim=cfg.cross_attention_dim,
                                         dtype=dt, name="attn_clip")
            a = attn_clip(fp32_layer_norm(x, cw, cb, cfg.norm_eps),
                          context=clip_context, rope=rope_full, grid=grid)
            # GEGLU dim->dim
            gp = nn.Dense(2 * dim, dtype=dt, name="gate_clip")(a)
            val, gate = jnp.split(gp, 2, axis=-1)
            g = val * nn.gelu(gate, approximate=False)
            ow = self.param("norm_clip_out_scale", nn.initializers.ones,
                            (dim,), jnp.float32)
            ob = self.param("norm_clip_out_bias", nn.initializers.zeros,
                            (dim,), jnp.float32)
            x = x + fp32_layer_norm(g, ow, ob, cfg.norm_eps)

        # FFN
        w3 = self.param("norm3_scale", nn.initializers.ones, (dim,), jnp.float32)
        b3 = self.param("norm3_bias", nn.initializers.zeros, (dim,), jnp.float32)
        xn = fp32_layer_norm(x, w3, b3, cfg.norm_eps)
        h = nn.Dense(int(dim * cfg.mlp_ratio), dtype=dt, name="ff_wi")(xn)
        h = nn.gelu(h, approximate=True)
        ff = nn.Dense(dim, dtype=dt, name="ff_wo")(h)
        if cfg.after_norm:
            w4 = self.param("norm4_scale", nn.initializers.ones, (dim,), jnp.float32)
            b4 = self.param("norm4_bias", nn.initializers.zeros, (dim,), jnp.float32)
            ff = fp32_layer_norm(ff, w4, b4, cfg.norm_eps)
        return x + ff


def _temporal_pe(length, dim):
    pos = np.arange(length)[:, None]
    div = np.exp(np.arange(0, dim, 2) * (-math.log(10000.0) / dim))
    pe = np.zeros((length, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class HunyuanTransformer3D(nn.Module):
    cfg: HunyuanConfig

    @nn.compact
    def __call__(self, hidden_states, timestep, encoder_hidden_states,
                 rope=None, encoder_hidden_states_t5=None,
                 text_embedding_mask=None, text_embedding_mask_t5=None,
                 image_meta_size=None, style=None, inpaint_latents=None,
                 control_latents=None, clip_encoder_hidden_states=None,
                 clip_attention_mask=None):
        cfg = self.cfg
        dt = cfg.jdtype
        dim = cfg.inner_dim
        if cfg.basic_block_type not in ("basic", "kvcompression_basic",
                                        "hybrid_attention"):
            raise NotImplementedError(cfg.basic_block_type)
        if inpaint_latents is not None:
            hidden_states = jnp.concatenate([hidden_states, inpaint_latents], 1)
        if control_latents is not None:
            hidden_states = jnp.concatenate([hidden_states, control_latents], 1)
        b, c, f, hh, ww = hidden_states.shape
        p = cfg.patch_size
        gh, gw = hh // p, ww // p

        x = jnp.transpose(hidden_states, (0, 2, 3, 4, 1)).astype(dt)
        x = nn.Conv(dim, (p, p), strides=(p, p), padding="VALID", dtype=dt,
                    name="pos_embed_proj")(x.reshape(b * f, hh, ww, -1))
        x = x.reshape(b, f * gh * gw, dim)

        temb = HunyuanCombinedEmbedding(cfg, name="time_extra_emb")(
            timestep, encoder_hidden_states_t5, image_meta_size, style)

        # T5 branch through the SiLU-fp32 MLP, concat with Bert states,
        # learned padding where masked
        t5 = encoder_hidden_states_t5.astype(dt)
        h5 = nn.Dense(cfg.cross_attention_dim_t5 * 4, dtype=dt,
                      name="text_embedder_1")(t5)
        h5 = nn.silu(h5.astype(jnp.float32)).astype(dt)
        t5 = nn.Dense(cfg.cross_attention_dim, dtype=dt,
                      name="text_embedder_2")(h5)
        text = jnp.concatenate([encoder_hidden_states.astype(dt), t5], axis=1)
        pad_table = self.param(
            "text_embedding_padding", nn.initializers.normal(1.0),
            (cfg.text_len + cfg.text_len_t5, cfg.cross_attention_dim),
            jnp.float32)
        if text_embedding_mask is not None and text_embedding_mask_t5 is not None:
            mask = jnp.concatenate(
                [text_embedding_mask, text_embedding_mask_t5], axis=-1)
            text = jnp.where(mask[..., None].astype(bool), text,
                             pad_table[None].astype(dt))

        # CLIP image conditioning (transformer3d.py:1096-1103)
        clip_ctx = None
        if (clip_encoder_hidden_states is not None
                and cfg.enable_clip_in_inpaint):
            gq = int(round(math.sqrt(cfg.n_query)))
            clip_ctx = Resampler(gq, cfg.cross_attention_dim,
                                 cfg.num_attention_heads, dtype=dt,
                                 name="clip_projection")(
                clip_encoder_hidden_states.astype(dt))
            clip_pad = self.param("clip_padding",
                                  nn.initializers.normal(0.02),
                                  (cfg.n_query, cfg.cross_attention_dim),
                                  jnp.float32)
            if clip_attention_mask is not None:
                clip_ctx = jnp.where(
                    clip_attention_mask[..., None].astype(bool), clip_ctx,
                    clip_pad[None].astype(dt))

        grid = (f, gh, gw)
        half = cfg.num_layers // 2
        skips = []
        for layer in range(cfg.num_layers):
            block = HunyuanDiTBlock(
                cfg,
                skip=layer > half,
                kv_compression=(cfg.basic_block_type == "kvcompression_basic"
                                and layer >= half),
                is_local_attention=(cfg.basic_block_type == "hybrid_attention"
                                    and layer % 2 == 1),
                name=f"block{layer}")
            skip_states = skips.pop() if layer > half else None
            x = block(x, text, temb, rope, skip_states=skip_states, grid=grid,
                      disable_rope_in_attn1=layer == 0, clip_context=clip_ctx)
            if layer < half - 1:
                skips.append(x)

        # AdaLayerNormContinuous out
        cond = nn.Dense(2 * dim, dtype=dt, name="norm_out_linear")(
            nn.silu(temb.astype(jnp.float32)).astype(dt))
        shift, scale = jnp.split(cond, 2, axis=-1)
        x = fp32_layer_norm(x, eps=cfg.norm_eps)
        x = x * (1 + scale[:, None]) + shift[:, None]
        x = nn.Dense(p * p * cfg.effective_out_channels, dtype=dt,
                     name="proj_out")(x)
        return unpatchify(x, f, gh, gw, p, cfg.effective_out_channels)

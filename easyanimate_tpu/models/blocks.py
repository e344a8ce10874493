"""Dual-stream MMDiT transformer blocks (EasyAnimate V5/V5.1 style).

Parity targets:
  EasyAnimateLayerNormZero     reference norm.py:135-166 (shared fp32 LN,
                               per-stream (shift, scale, gate) from SiLU+Linear
                               of temb, chunk order: shift, scale, gate,
                               enc_shift, enc_scale, enc_gate)
  EasyAnimateDiTBlock          reference attention.py:1027-1163
  EasyAnimateAttnProcessor2_0  reference processor.py:218-312 (per-stream QKV,
                               per-head LN qk-norm eps 1e-6, text-first concat,
                               RoPE on the video slice, one fused attention,
                               per-stream output projections)
"""
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

import numpy as np

from ..ops.attention import dispatch_attention
from ..ops.norms import fp32_layer_norm
from ..ops.rope import apply_rotary_emb_split, deinterleave_perm
from ..ops.swa import swa_attention_streams
from ..parallel.context import sp_constraint


class LayerNormZero(nn.Module):
    """AdaLN-zero over two streams with a shared LayerNorm."""

    dim: int
    norm_eps: float = 1e-5
    elementwise_affine: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vid, txt, temb):
        mods = nn.Dense(6 * self.dim, dtype=self.dtype, name="linear")(
            nn.silu(temb)
        )
        (shift, scale, gate, e_shift, e_scale, e_gate) = jnp.split(mods, 6, axis=-1)
        if self.elementwise_affine:
            w = self.param("norm_scale", nn.initializers.ones, (self.dim,), jnp.float32)
            b = self.param("norm_bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        else:
            w = b = None
        norm = lambda x: fp32_layer_norm(x, w, b, self.norm_eps)
        vid = norm(vid) * (1 + scale[:, None]) + shift[:, None]
        txt = norm(txt) * (1 + e_scale[:, None]) + e_shift[:, None]
        return vid, txt, gate[:, None], e_gate[:, None]


class PermutedDense(nn.Module):
    """nn.Dense with a static output-column permutation folded into the
    kernel/bias at apply time. Parameter names/shapes are identical to
    nn.Dense, so checkpoints stay in the reference feature order; the
    permuted weight is a tiny gather consumed by the matmul.

    quant="int8" switches to W8A8: an int8 kernel + per-out-channel f32
    "scale" param, per-token dynamic activation quantization, int8 MXU
    matmul (~1.5x bf16 throughput on v5e; ops/quant.py).

    quant="int4" switches to weight-only W4A16: a nibble-packed int8
    kernel [in//2, out] + per-(group=128, out) f32 "scale", dequantized
    per layer into the compute dtype (memory mode: ~6 GB resident for the
    12B; ops/quant.py int4 section). quant="w4a8" keeps the same packed
    params but computes on the int8 MXU (ops/quant.py::int4_matmul_a8):
    int4 memory at ~int8 throughput."""

    features: int
    perm: Any = None  # np.ndarray of output-feature indices
    dtype: jnp.dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        if self.quant == "int8":
            from ..ops.quant import int8_matmul

            fan_in = x.shape[-1]

            def kinit(key, shape, dtype=jnp.int8):
                return jnp.round(jnp.clip(
                    jax.random.normal(key, shape) * 42.0, -127, 127)
                ).astype(jnp.int8)

            kernel = self.param("kernel", kinit,
                                (fan_in, self.features))
            scale = self.param(
                "scale",
                lambda key, shape: jnp.full(
                    shape, (fan_in ** -0.5) / 42.0, jnp.float32),
                (self.features,))
            if self.perm is not None:
                kernel = kernel[:, self.perm]
                scale = scale[self.perm]
                bias = bias[self.perm]
            return int8_matmul(x, kernel, scale, bias, self.dtype)
        if self.quant in ("int4", "w4a8"):
            from ..ops.quant import GROUP_INT4, int4_matmul, int4_matmul_a8
            matmul = int4_matmul_a8 if self.quant == "w4a8" else int4_matmul

            fan_in = x.shape[-1]
            groups = (fan_in // GROUP_INT4
                      if fan_in % GROUP_INT4 == 0 else 1)

            def kinit(key, shape, dtype=jnp.int8):
                return jax.random.randint(key, shape, -128, 128,
                                          jnp.int32).astype(jnp.int8)

            kernel = self.param("kernel", kinit,
                                (fan_in // 2, self.features))
            scale = self.param(
                "scale",
                lambda key, shape: jnp.full(
                    shape, (fan_in ** -0.5) / 4.0, jnp.float32),
                (groups, self.features))
            if self.perm is not None:
                kernel = kernel[:, self.perm]
                scale = scale[:, self.perm]
                bias = bias[self.perm]
            return matmul(x, kernel, scale, bias, self.dtype)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        if self.perm is not None:
            kernel = kernel[:, self.perm]
            bias = bias[self.perm]
        x = x.astype(self.dtype)
        return x @ kernel.astype(self.dtype) + bias.astype(self.dtype)


class StreamQKV(nn.Module):
    """QKV projections + per-head LN qk-norm for one stream.

    q/k features are de-interleaved (rope pair (2i, 2i+1) -> halves (i,
    d/2+i)) THROUGH the projection weights: attention scores are invariant
    to a fixed permutation of both q and k, and the half-split layout makes
    RoPE a pair of contiguous 32-lane ops instead of a cross-lane shuffle
    (2x faster on the VPU). v / outputs keep the reference order.
    """

    num_heads: int
    head_dim: int
    qk_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        b, s, _ = x.shape
        inner = self.num_heads * self.head_dim
        perm64 = deinterleave_perm(self.head_dim)
        perm = np.concatenate(
            [h * self.head_dim + perm64 for h in range(self.num_heads)])
        def heads(a):
            # Guide GSPMD through the head split: the projection output has
            # its feature dim tp-sharded (column-parallel kernel) and the
            # token axis sp-sharded; without an explicit constraint the
            # partitioner cannot propagate that through the reshape and
            # falls back to full rematerialization (replicate + re-shard).
            a = a.reshape(b, s, self.num_heads, self.head_dim)
            a = sp_constraint(a, ("dp", "sp", "tp", None))
            return a.transpose(0, 2, 1, 3)
        q = heads(PermutedDense(inner, perm, dtype=self.dtype,
                                quant=self.quant, name="to_q")(x))
        k = heads(PermutedDense(inner, perm, dtype=self.dtype,
                                quant=self.quant, name="to_k")(x))
        v = heads(PermutedDense(inner, dtype=self.dtype, quant=self.quant,
                                name="to_v")(x))
        if self.qk_norm:
            qw = self.param("norm_q_scale", nn.initializers.ones, (self.head_dim,), jnp.float32)
            qb = self.param("norm_q_bias", nn.initializers.zeros, (self.head_dim,), jnp.float32)
            kw = self.param("norm_k_scale", nn.initializers.ones, (self.head_dim,), jnp.float32)
            kb = self.param("norm_k_bias", nn.initializers.zeros, (self.head_dim,), jnp.float32)
            q = fp32_layer_norm(q, qw[perm64], qb[perm64], 1e-6)
            k = fp32_layer_norm(k, kw[perm64], kb[perm64], 1e-6)
        return q, k, v


class FeedForward(nn.Module):
    """gelu-approximate MLP (diffusers FeedForward with 4x inner dim)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        h = PermutedDense(self.dim * self.mult, dtype=self.dtype,
                          quant=self.quant, name="wi")(x)
        h = nn.gelu(h, approximate=True)
        return PermutedDense(self.dim, dtype=self.dtype, quant=self.quant,
                             name="wo")(h)


class MMDiTBlock(nn.Module):
    """EasyAnimateDiTBlock: joint attention + per-stream FFN with AdaLN-zero.

    is_mmdit=True gives the text stream its own QKV/out/FFN parameters;
    False shares the video-stream parameters over the concatenated sequence
    (reference attn2=None branch).
    """

    dim: int
    num_heads: int
    head_dim: int
    qk_norm: bool = True
    after_norm: bool = False
    is_mmdit: bool = True
    is_swa: bool = False
    norm_eps: float = 1e-6
    attn_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32
    quant: Optional[str] = None  # None | "int8" (W8A8 block linears)

    @nn.compact
    def __call__(self, vid, txt, temb, rope: Optional[Tuple] = None,
                 grid_size: Optional[Tuple[int, int, int]] = None):
        b, sv, _ = vid.shape
        st = txt.shape[1]
        # under an active sequence_parallel scope, keep the video token axis
        # sharded over 'sp' between blocks (text is small; replicated)
        vid = sp_constraint(vid, ("dp", "sp", None))
        txt = sp_constraint(txt, ("dp", None, None))

        n_vid, n_txt, gate, e_gate = LayerNormZero(
            self.dim, self.norm_eps, dtype=self.dtype, name="norm1"
        )(vid, txt, temb)

        vid_qkv = StreamQKV(self.num_heads, self.head_dim, self.qk_norm,
                            dtype=self.dtype, quant=self.quant, name="attn1")
        if self.is_mmdit:
            txt_qkv = StreamQKV(self.num_heads, self.head_dim, self.qk_norm,
                                dtype=self.dtype, quant=self.quant,
                                name="attn2")
            qv, kv, vv = vid_qkv(n_vid)
            qt, kt, vt = txt_qkv(n_txt)
        else:
            joint = jnp.concatenate([n_txt, n_vid], axis=1)
            qj, kj, vj = vid_qkv(joint)
            qt, qv = qj[:, :, :st], qj[:, :, st:]
            kt, kv = kj[:, :, :st], kj[:, :, st:]
            vt, vv = vj[:, :, :st], vj[:, :, st:]

        if rope is not None:
            cos, sin = rope
            # q/k are in de-interleaved order (StreamQKV), so rope runs in
            # the half-split form on the pair tables (interleaved [:, ::2])
            qv = apply_rotary_emb_split(qv, cos[:, ::2], sin[:, ::2])
            kv = apply_rotary_emb_split(kv, cos[:, ::2], sin[:, ::2])

        def merge(a, seq_ax):
            # Mirror of StreamQKV.heads: pin (seq@seq_ax, heads@tp) through
            # the transpose and keep the merged feature dim tp-sharded so the
            # output projection runs row-parallel (contraction dim sharded,
            # GSPMD inserts the all-reduce) instead of gathering heads.
            # seq_ax is "sp" for the video stream, None (replicated) for
            # text: the streams are split BEFORE constraining so GSPMD never
            # has to slice an sp-sharded joint sequence at the (non
            # shard-aligned) text boundary (ADVICE r3).
            a = sp_constraint(a.transpose(0, 2, 1, 3),
                              ("dp", seq_ax, "tp", None))
            a = a.reshape(a.shape[0], a.shape[1],
                          self.num_heads * self.head_dim)
            return sp_constraint(a, ("dp", seq_ax, "tp"))
        if self.is_swa:
            # stream-separate SWA: skips the full-sequence q/k/v concats
            # and the output re-split the joint form would pay per layer
            gf, gh, gw = grid_size
            o_t, o_v = swa_attention_streams(
                qt, kt, vt, qv, kv, vv, num_frames=gf, height=gh, width=gw,
                impl=self.attn_impl)
            o_txt, o_vid = merge(o_t, None), merge(o_v, "sp")
        else:
            q = jnp.concatenate([qt, qv], axis=2)
            k = jnp.concatenate([kt, kv], axis=2)
            v = jnp.concatenate([vt, vv], axis=2)
            o = dispatch_attention(q, k, v, impl=self.attn_impl)
            o_txt = merge(o[:, :, :st], None)
            o_vid = merge(o[:, :, st:], "sp")

        out_proj = PermutedDense(self.dim, dtype=self.dtype,
                                 quant=self.quant, name="attn1_out")
        o_vid = out_proj(o_vid)
        if self.is_mmdit:
            o_txt = PermutedDense(self.dim, dtype=self.dtype,
                                  quant=self.quant, name="attn2_out")(o_txt)
        else:
            o_txt = out_proj(o_txt)  # shared projection, same as proj(concat)

        vid = vid + gate * o_vid
        txt = txt + e_gate * o_txt

        n_vid, n_txt, gate2, e_gate2 = LayerNormZero(
            self.dim, self.norm_eps, dtype=self.dtype, name="norm2"
        )(vid, txt, temb)

        ff = FeedForward(self.dim, dtype=self.dtype, quant=self.quant,
                         name="ff")
        f_vid = ff(n_vid)
        if self.is_mmdit:
            f_txt = FeedForward(self.dim, dtype=self.dtype, quant=self.quant,
                                name="txt_ff")(n_txt)
        else:
            f_txt = ff(n_txt)

        if self.after_norm:
            w3 = self.param("norm3_scale", nn.initializers.ones, (self.dim,), jnp.float32)
            b3 = self.param("norm3_bias", nn.initializers.zeros, (self.dim,), jnp.float32)
            f_vid = fp32_layer_norm(f_vid, w3, b3, self.norm_eps)
            f_txt = fp32_layer_norm(f_txt, w3, b3, self.norm_eps)

        vid = vid + gate2 * f_vid
        txt = txt + e_gate2 * f_txt
        return vid, txt

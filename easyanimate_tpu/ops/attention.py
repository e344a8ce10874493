"""High-level attention entry points: pad-to-block, backend dispatch, and the
MMDiT joint text+video attention composition.

Reference behavior being matched (easyanimate/models/processor.py:218-312):
  - per-stream QKV projections (video via attn1, text via attn2 when MMDiT)
  - per-head LayerNorm QK-norm (eps 1e-6)
  - concat text-first along the sequence
  - RoPE applied to the video slice of q and k only
  - a single fused attention over the concatenated sequence
The projections/norms/RoPE live in models/blocks.py; here we provide the
attention math with a Pallas fast path.
"""
from typing import Optional

import jax
import jax.numpy as jnp

from .flash_attention import flash_attention

# v5e sweep at 13k tokens: q1024/kv2048/inner256 measured 46-49 TF/s vs
# 44 at 512/512 and 23 at 256/256
_BLOCK_Q = 1024
_BLOCK_KV = 2048
_BLOCK_KV_INNER = 256


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
    kv_valid: Optional[int] = None,
) -> jnp.ndarray:
    """Reference attention in plain XLA ops (fp32 softmax). [B, H, S, D]."""
    d = q.shape[-1]
    if sm_scale is None:
        sm_scale = d ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * sm_scale
    if kv_valid is not None and kv_valid < k.shape[2]:
        col = jnp.arange(k.shape[2])
        s = jnp.where(col[None, None, None, :] < kv_valid, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


# above this many score elements the off-TPU XLA path switches to the
# q-block-chunked form (16M f32 = 64 MB of scores per full materialization)
_CHUNKED_XLA_SCORES = 4096 * 4096


def attention_xla_chunked(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
    kv_valid: Optional[int] = None,
    block_q: int = 1024,
) -> jnp.ndarray:
    """Memory-bounded XLA attention: lax.map over q blocks, per-block f32
    softmax against the full kv, block body rematerialized in the backward
    (jax.checkpoint) — live memory O(block_q * S_kv) instead of
    attention_xla's O(S_q * S_kv). Same math as attention_xla (each query
    row still sees one full-row f32 softmax), so outputs agree to f32
    roundoff; tests/test_ops.py pins fwd+grad equality.

    This is the off-TPU stand-in at large S: the TPU path is the Pallas
    flash kernel (block-bounded fwd, recomputing bwd), so a dense [S, S]
    fallback would make any off-TPU compiled-memory measurement — e.g. the
    multichip dryrun's per-device HBM gate at 53k tokens — describe a
    program 100x bigger than the one that actually runs on chips."""
    d = q.shape[-1]
    if sm_scale is None:
        sm_scale = d ** -0.5
    b, h, sq, _ = q.shape
    skv = k.shape[2]
    bq = min(block_q, sq)
    pad = (-sq) % bq
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    nb = (sq + pad) // bq
    qb = jnp.moveaxis(q.reshape(b, h, nb, bq, d), 2, 0)  # [nb, b, h, bq, d]
    col_ok = jnp.arange(skv) < (skv if kv_valid is None else kv_valid)

    @jax.checkpoint
    def block(qi):
        s = jnp.einsum("bhqd,bhkd->bhqk", qi, k,
                       preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where(col_ok[None, None, None, :], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)

    o = jax.lax.map(block, qb)
    o = jnp.moveaxis(o, 0, 2).reshape(b, h, sq + pad, d)
    return o[:, :, :sq] if pad else o


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
    kv_valid: Optional[int] = None,
    impl: str = "auto",
    block_q: int = _BLOCK_Q,
    block_kv: int = _BLOCK_KV,
    block_kv_inner: Optional[int] = _BLOCK_KV_INNER,
) -> jnp.ndarray:
    """Attention over [B, H, S, D] with automatic pad-to-block for Pallas.

    impl: 'auto' (Pallas on TPU, XLA otherwise), 'pallas', 'xla',
          'pallas_interpret' (for CPU tests of the kernel).
    """
    if impl == "auto":
        impl = "pallas" if _use_pallas() else "xla"
    if impl == "xla":
        if q.shape[2] * k.shape[2] > _CHUNKED_XLA_SCORES:
            return attention_xla_chunked(q, k, v, sm_scale=sm_scale,
                                         kv_valid=kv_valid)
        return attention_xla(q, k, v, sm_scale=sm_scale, kv_valid=kv_valid)

    interpret = impl == "pallas_interpret"
    b, h, sq, d = q.shape
    skv = k.shape[2]
    valid = skv if kv_valid is None else kv_valid

    bq = min(block_q, _round_up(sq, 128))
    bkv = min(block_kv, _round_up(skv, 128))
    sq_p = _round_up(sq, bq)
    skv_p = _round_up(skv, bkv)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if skv_p != skv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    o = flash_attention(
        q, k, v, sm_scale=sm_scale, kv_valid=valid,
        block_q=bq, block_kv=bkv, block_kv_inner=block_kv_inner,
        interpret=interpret,
    )
    if sq_p != sq:
        o = o[:, :, :sq]
    return o


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def dispatch_attention(q, k, v, *, impl: str = "auto"):
    """Attention entry point for model code: plain single-device attention,
    or -- when a `parallel.context.sequence_parallel(mesh)` scope is active
    with sp > 1 -- shard_map'd sequence-parallel attention (seq sharded over
    'sp', heads over 'tp', batch over 'dp'; kv all-gathered or ring-rotated
    per the scope's mode). [B, H, S, D]."""
    from ..parallel.context import current_sp, make_sp_attention

    scope = current_sp()
    if scope is None:
        return attention(q, k, v, impl=impl)
    return make_sp_attention(scope.mesh, mode=scope.mode, impl=impl,
                             shape=q.shape)(q, k, v)


def joint_attention(
    q_txt: jnp.ndarray,
    k_txt: jnp.ndarray,
    v_txt: jnp.ndarray,
    q_vid: jnp.ndarray,
    k_vid: jnp.ndarray,
    v_vid: jnp.ndarray,
    rope_cos: Optional[jnp.ndarray] = None,
    rope_sin: Optional[jnp.ndarray] = None,
    *,
    text_valid: Optional[int] = None,
    impl: str = "auto",
):
    """Fused text+video attention: concat (text first), RoPE on video q/k,
    one attention pass, split back. All tensors [B, H, S, D].

    Returns (out_txt, out_vid).
    """
    from .rope import apply_rotary_emb

    if rope_cos is not None:
        q_vid = apply_rotary_emb(q_vid, rope_cos, rope_sin)
        k_vid = apply_rotary_emb(k_vid, rope_cos, rope_sin)

    st = q_txt.shape[2]
    q = jnp.concatenate([q_txt, q_vid], axis=2)
    k = jnp.concatenate([k_txt, k_vid], axis=2)
    v = jnp.concatenate([v_txt, v_vid], axis=2)

    # Padded text tokens (beyond text_valid) are masked out of the kv side.
    # Note: the reference runs this attention unmasked (block call passes no
    # attention_mask); pass text_valid=None for strict parity.
    kv_valid = None
    if text_valid is not None and text_valid < st:
        raise NotImplementedError(
            "interior text masking requires segment ids; pad text embeddings "
            "to zeros instead (reference does the same)."
        )
    o = attention(q, k, v, kv_valid=kv_valid, impl=impl)
    return o[:, :, :st], o[:, :, st:]

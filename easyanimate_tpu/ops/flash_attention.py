"""Pallas TPU flash attention (forward + backward) for the MMDiT joint
text+video attention.

This is the hot kernel of the framework: one fused attention over the
concatenated (text, video) token sequence (reference behavior:
easyanimate/models/processor.py:218-312 runs a single SDPA over the concat).
RoPE is applied to the video slice *outside* the kernel (elementwise,
XLA-fused into the QKV projections) so the kernel stays a pure attention.

Design notes (TPU):
  - online softmax, fp32 statistics, bf16 matmul inputs.
  - grid (batch*heads, q_blocks, kv_blocks); kv is the innermost (sequential)
    dimension so the VMEM accumulator carries across kv tiles.
  - the kernel works in BASE-2: the wrapper folds sm_scale*log2(e) into q, so
    the softmax is exp2(s2 - m2) -- one VPU transcendental per score element
    with no extra multiply (exp(x) lowers to exp2(x*log2e) anyway). The saved
    logsumexp residual is base-2: lse2 = m2 + log2(l).
  - softmax stats (m, l) live in lane-replicated (block_q, 128) VMEM scratch:
    full-tile stat ops are faster on Mosaic than [:, :1] sub-tile access
    (measured 2x). The lse residual is stored compactly as [bh, seq, 1] to
    avoid a 128x blow-up at 50k-token sequences.
  - tail padding costs ZERO per-element work: sequences are zero-padded to a
    block multiple, so padded kv columns score s2=0 and contribute nothing to
    the output (v_pad=0) -- only the softmax denominator picks up exactly
    n_pad * 2^(-m) of spurious mass, which the store step subtracts in closed
    form. This replaces the usual iota+compare+select mask chain (3 VPU
    ops/element) entirely. Requires k/v tails to be zero (the wrapper pads
    with zeros); q-side padding needs no handling (padded rows are sliced
    away, and their cotangents are structurally zero in the backward).
  - backward = two kernels (dq; dkv) recomputing p from the saved base-2
    logsumexp, as in standard flash attention v2; the pad columns' ds@k
    contribution vanishes because k_pad=0, and pad-row dk/dv garbage is
    dropped by the pad's cotangent slice.

head_dim-64 ceiling (measured dead-end, v5e, 2026-08): the model's d=64
halves MXU utilization in BOTH matmuls (qk contraction depth 64; pv output
width 64). Same-FLOPs comparison at flagship shapes (b2 h48 s13360):
d=64 = 70.6 TF/s vs d=128 (h24) = 133 TF/s -- a 1.89x per-FLOP gap.
Attempts to close it without changing the model:
  - lane-packing two heads (q=[qA|qB], kv block-diagonal on a doubled
    sequence) is provably neutral: the packed operands are half zeros, so
    the K=128 matmul does exactly the same useful MAC fraction as K=64.
  - batch-2/batch-4 dot_general over head pairs inside the kernel (hoping
    Mosaic packs independent K=64 products into one 128-deep MXU pass)
    measures only 1.14x on a qk microkernel -- no native K-packing for
    bf16 on this chip/toolchain.
  - int8 qk scores (SageAttention-style) are ALSO a measured dead-end
    here: the int8 MXU advantage (1.6x at the 12B linear shapes) collapses
    at contraction depth 64 -- a qk microkernel measures int8 1.22x bf16
    raw and ~1.0x after the per-row x per-col dequant multiplies.
The d=64 ceiling therefore stands; throughput beyond it comes from
sparsity (SWA), step skipping (TeaCache), and multi-chip scaling.
"""
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
MIN_LANES = 128
LOG2E = math.log2(math.e)
LN2 = math.log(2.0)


def _cdiv(a, b):
    return -(-a // b)


def _lane_broadcast(stat, width):
    """Expand a lane-replicated stat (block_q, 1|128) to (block_q, width)."""
    w = stat.shape[-1]
    if w == width:
        return stat
    if w == 1:
        return jnp.broadcast_to(stat, (*stat.shape[:-1], width))
    if width < w:
        return stat[:, :width]
    reps, rem = divmod(width, w)
    assert rem == 0, f"width {width} must divide into lanes of {w}"
    return jnp.tile(stat, (1, reps))


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, n_pad: int, block_kv: int, num_kv: int, block_kv_inner: int
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [block_q, d]; sm_scale*log2e pre-folded into q
    d = acc_scr.shape[-1]

    # two-level tiling: the grid loads block_kv (HBM granularity), the
    # unrolled inner loop computes block_kv_inner tiles (VMEM granularity)
    for start in range(0, block_kv, block_kv_inner):
        k = k_ref[0, start:start + block_kv_inner]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        # zero-padded kv tails need no masking here: s2=0 there, and the
        # store step removes their exactly-known softmax mass

        # stats carried lane-replicated at (block_q, 128): full-tile VMEM
        # ops are faster on Mosaic than [:, :1] sub-tile reads/writes
        # (measured: narrow stats halve throughput)
        m_prev = m_scr[:]                                    # [block_q, 128]
        l_prev = l_scr[:]
        m_curr = jnp.max(s, axis=1)[:, None]                 # [block_q, 1]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - _lane_broadcast(m_next, s.shape[1]))
        l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        m_scr[:] = m_next
        l_scr[:] = l_next

        v = v_ref[0, start:start + block_kv_inner]
        pv = jax.lax.dot(p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        acc_scr[:] = acc_scr[:] * _lane_broadcast(alpha, d) + pv

    @pl.when(j == num_kv - 1)
    def _store():
        m = m_scr[:]
        l = l_scr[:]
        if n_pad:  # static: remove the zero-pad columns' softmax mass
            l = l - n_pad * jnp.exp2(-m)
        l_inv = jnp.where(l <= 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[:] * _lane_broadcast(l_inv, d)).astype(o_ref.dtype)
        lse2 = m + jnp.log2(jnp.maximum(l, 1e-30))
        lse_ref[0] = lse2[:, :1]  # [block_q, 1], base-2


def _flash_fwd(q, k, v, kv_valid, block_q, block_kv, interpret,
               block_kv_inner=None):
    bh, sq, d = q.shape
    skv = k.shape[1]
    nq, nkv = _cdiv(sq, block_q), _cdiv(skv, block_kv)
    assert sq % block_q == 0 and skv % block_kv == 0, (sq, skv, block_q, block_kv)
    if block_kv_inner is None or block_kv_inner > block_kv:
        block_kv_inner = block_kv

    kernel = functools.partial(
        _fwd_kernel, n_pad=skv - kv_valid,
        block_kv=block_kv, num_kv=nkv, block_kv_inner=block_kv_inner,
    )
    out_shape = (
        jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        jax.ShapeDtypeStruct((bh, sq, 1), jnp.float32),
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=(bh, nq, nkv),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


# Backward tile tuning (measured v5e, flagship shape bh=96 s=13360 d=64,
# benchmarks/attn_bench.py --bwd, fused fwd+bwd TF/s on the 14*bh*s^2*d
# useful-FLOP convention):
#   bq  512 bkv 1024 (no inner, old clamps)   55.8
#   bq  512 bkv 2048 ikv 512                  57.8
#   bq 1024 bkv 2048 iq 512 ikv 512           58.6   <- defaults
#   bq 1024 bkv 2048 (no inner)               FAILS (p/dp VMEM overflow)
#   bq  512 bkv  512                          49.3
#   bq  256 bkv 1024                          47.2
# The two-level split (grid-level HBM blocks + unrolled VMEM compute tiles,
# same scheme as the forward) is what unlocks the large-block configs: the
# score tiles stay at (inner_q x inner_kv) f32 while HBM transfers move
# full blocks. 58.6 fused ~= 92% of the d=64 forward's per-real-FLOP rate
# (63.5 TF/s) applied to the backward's 7 GEMM passes -- the remaining gap
# is the di precompute pass and the dq/dkv kernel boundary, both O(s*d).
_BWD_BLOCK_Q = 1024
_BWD_BLOCK_KV = 2048
_BWD_INNER_Q = 512
_BWD_INNER_KV = 512


def _recompute_p(q, k, lse2):
    """Recompute attention probabilities for one (q, kv) tile pair.
    q arrives pre-scaled by sm_scale*log2e; lse2 is the base-2 logsumexp.
    Zero-padded kv columns yield p=2^-lse2 (not 0), which is harmless: their
    output/dq contributions multiply k_pad=v_pad=0, and pad-row dk/dv are
    dropped by the wrapper's pad-slice cotangent."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return jnp.exp2(s - lse2)


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref, dq_scr,
    *, num_kv: int, block_kv: int, block_kv_inner: int
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    do = do_ref[0]
    lse2 = lse_ref[0]  # [block_q, 1]
    di = di_ref[0]     # [block_q, 1]

    # two-level tiling as in the forward: the grid fetches block_kv from HBM,
    # the unrolled inner loop computes block_kv_inner tiles so the p/dp
    # score tiles stay small in VMEM while HBM transfers stay large
    for start in range(0, block_kv, block_kv_inner):
        k = k_ref[0, start:start + block_kv_inner]
        v = v_ref[0, start:start + block_kv_inner]
        p = _recompute_p(q, k, lse2)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32
        )
        # d/ds2 of exp2 contributes a global ln2 factor; it is applied ONCE
        # at the store ([block_q, d]) instead of per score tile ([block_q,
        # block_kv] x num_kv) -- one less full-tile VPU multiply per kv block
        ds = p * (dp - di)
        dq_scr[:] += jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )

    @pl.when(j == num_kv - 1)
    def _store():
        dq_ref[0] = (dq_scr[:] * LN2).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, num_q: int, block_q: int, block_q_inner: int
):
    i = pl.program_id(2)  # q block (innermost)

    @pl.when(i == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    k = k_ref[0]
    v = v_ref[0]

    for start in range(0, block_q, block_q_inner):
        q = q_ref[0, start:start + block_q_inner]
        do = do_ref[0, start:start + block_q_inner]
        lse2 = lse_ref[0, start:start + block_q_inner]
        di = di_ref[0, start:start + block_q_inner]

        p = _recompute_p(q, k, lse2)
        # dv += p^T @ do
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32
        )
        ds = p * (dp - di)  # ln2 factor applied at the store (see dq kernel)
        # dk += ds^T @ q
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == num_q - 1)
    def _store():
        dk_ref[0] = (dk_scr[:] * LN2).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, o, lse, do, block_q, block_kv, interpret):
    bh, sq, d = q.shape
    skv = k.shape[1]
    # the backward kernels hold p/dp ([bq, bkv] fp32) plus accumulators in
    # VMEM; the forward-tuned (1024, 2048) blocks overflow the ~16M scoped
    # limit at head_dim 64, so clamp to divisors that fit (the wrapper pads
    # sequences to the FORWARD block sizes, so divisors always tile exactly;
    # module-level knobs so benchmarks/attn_bench.py --bwd can sweep them)
    block_q = min(block_q, _BWD_BLOCK_Q)
    block_kv = min(block_kv, _BWD_BLOCK_KV)
    inner_q = min(_BWD_INNER_Q or block_q, block_q)
    inner_kv = min(_BWD_INNER_KV or block_kv, block_kv)
    nq, nkv = sq // block_q, skv // block_kv

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1,
                 keepdims=True)  # [bh, sq, 1]

    dq_kernel = functools.partial(_bwd_dq_kernel, num_kv=nkv,
                                  block_kv=block_kv, block_kv_inner=inner_kv)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh, nq, nkv),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, di)

    dkv_kernel = functools.partial(_bwd_dkv_kernel, num_q=nq,
                                   block_q=block_q, block_q_inner=inner_q)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh, nkv, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_kv, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, j, i: (b, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, skv, d), k.dtype),
            jax.ShapeDtypeStruct((bh, skv, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, di)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_attention(q, k, v, kv_valid, block_q, block_kv, interpret,
                     block_kv_inner=None):
    o, _ = _flash_fwd(q, k, v, kv_valid, block_q, block_kv,
                      interpret, block_kv_inner)
    return o


def _flash_attention_fwd(q, k, v, kv_valid, block_q, block_kv,
                         interpret, block_kv_inner=None):
    o, lse = _flash_fwd(q, k, v, kv_valid, block_q, block_kv,
                        interpret, block_kv_inner)
    return o, (q, k, v, o, lse)


def _flash_attention_bwd(kv_valid, block_q, block_kv, interpret,
                         block_kv_inner, residuals, do):
    del kv_valid
    q, k, v, o, lse = residuals
    dq, dk, dv = _flash_bwd(
        q, k, v, o, lse, do, block_q, block_kv, interpret
    )
    return dq, dk, dv


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
    kv_valid: Optional[int] = None,
    block_q: int = 256,
    block_kv: int = 256,
    block_kv_inner: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Bidirectional flash attention.

    Args:
      q, k, v: [batch, heads, seq, head_dim]. seq must be a multiple of the
        block size (see `attention` in ops/attention.py for the padding
        wrapper).
      sm_scale: defaults to head_dim ** -0.5.
      kv_valid: static count of valid kv tokens. k and v MUST be zero beyond
        kv_valid (zero padding); the kernel then needs no masking at all --
        the pad columns' softmax mass is removed in closed form.
      block_q/block_kv: tile sizes (multiples of 128).

    Backward: query-side tail padding requires callers to not use padded
    outputs (their cotangents are then structurally zero, which zeroes the
    padded rows' dk/dv contributions).
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if sm_scale is None:
        sm_scale = d ** -0.5
    if kv_valid is None:
        kv_valid = skv
    block_q = min(block_q, sq)
    block_kv = min(block_kv, skv)

    # fold sm_scale AND log2(e) into q: the kernel softmax runs in base 2
    # (exp2 only), skipping a full VPU multiply pass over every score tile
    qf = (q * (sm_scale * LOG2E)).astype(q.dtype).reshape(b * h, sq, d)
    kf = k.reshape(b * h, skv, d)
    vf = v.reshape(b * h, skv, d)
    of = _flash_attention(qf, kf, vf, kv_valid, block_q, block_kv,
                          interpret, block_kv_inner)
    return of.reshape(b, h, sq, d)

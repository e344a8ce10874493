"""Sliding-window sparse attention (SWA) for V5.1 `swa_layers`.

Parity target: EasyAnimateSWAttnProcessor2_0 (processor.py:320-459):
  - a global "cross" pass: every query attends to text tokens + a strided
    subset of video kv (total ~cross_attention_size)
  - a local pass: heads are split into 6 groups, each viewing the video
    tokens in a different (f, h, w) axis order; flash attention with a
    +-window (window = tokens per frame) in that order
  - outputs summed: video_out = local + cross; text_out doubled cross
    (the reference adds cross_hidden_states to the concat -- kept verbatim)

TPU kernel: for each q tile, only kv tiles whose *virtual* window range
intersects it are visited -- the kv grid axis enumerates window offsets and
the BlockSpec index map clamps the address while the in-kernel mask works in
virtual coordinates, so clamped (duplicate) tiles contribute nothing.
O(seq * window) instead of O(seq^2).
"""
import functools
import math
from typing import Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import (DEFAULT_MASK_VALUE, LN2, LOG2E, MIN_LANES,
                              _lane_broadcast)


def _swa_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                *, window: int, block_q: int, block_kv: int, num_off: int,
                kv_len: int, seq_pad: int, block_kv_inner: int):
    jj = pl.program_id(2)
    i = pl.program_id(1)

    @pl.when(jj == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # The kernel is VPU-bound: the mask work rivals the 64-deep matmuls, so
    # the mask is pared to ONE compare + select per element:
    #  - clamped duplicate offset slots (virtual start outside [0, sp-bkv])
    #    are PREDICATED OUT wholesale with pl.when -- no per-element kill
    #    needed, and their matmuls are skipped entirely;
    #  - in-range slots then use REAL column labels, so only the band mask
    #    remains, as (delta + shift) uint<= 2*window over a loop-invariant
    #    (row - col) delta matrix;
    #  - pad-tail columns (kv_len..seq_pad) need no masking at all: k/v are
    #    zero there, so in-window pad columns score exactly 0 and the store
    #    step subtracts their closed-form mass n_pad(row) * 2^(-m)
    #    (same trick as the dense kernel, but the count is row-dependent
    #    through the window intersection).
    virt = i * block_q + (jj - num_off // 2) * block_kv
    r0 = i * block_q

    @pl.when((virt >= 0) & (virt <= seq_pad - block_kv))
    def _compute():
        q = q_ref[0]
        d = acc_scr.shape[-1]
        delta = (jax.lax.broadcasted_iota(
                     jnp.int32, (block_q, block_kv_inner), 0)
                 - jax.lax.broadcasted_iota(
                     jnp.int32, (block_q, block_kv_inner), 1))
        for start in range(0, block_kv, block_kv_inner):
            k = k_ref[0, start:start + block_kv_inner]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            c0 = virt + start
            in_win = ((delta + (r0 - c0 + window)).astype(jnp.uint32)
                      <= jnp.uint32(2 * window))
            s = jnp.where(in_win, s, DEFAULT_MASK_VALUE)

            m_prev = m_scr[:]
            l_prev = l_scr[:]
            m_curr = jnp.max(s, axis=1)[:, None]
            m_next = jnp.maximum(m_prev, m_curr)
            # base-2 softmax: sm_scale*log2e is folded into q by the wrapper
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - _lane_broadcast(m_next, s.shape[1]))
            # fully-masked tiles: p rows are exp(MASK - m) ~ 0; harmless
            l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
            m_scr[:] = m_next
            l_scr[:] = l_next
            v = v_ref[0, start:start + block_kv_inner]
            pv = jax.lax.dot(p.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
            acc_scr[:] = acc_scr[:] * _lane_broadcast(alpha, d) + pv

    @pl.when(jj == num_off - 1)
    def _store():
        m = m_scr[:]
        l = l_scr[:]
        if kv_len < seq_pad:  # static: row-dependent pad mass in the window
            rows = (jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
                    + i * block_q)
            lo = jnp.maximum(rows - window, kv_len)
            hi = jnp.minimum(rows + window, seq_pad - 1)
            n_pad = jnp.maximum(hi - lo + 1, 0).astype(jnp.float32)
            l = l - n_pad * jnp.exp2(-m)
        l_inv = jnp.where(l <= 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[:] * _lane_broadcast(l_inv, acc_scr.shape[-1])
                    ).astype(o_ref.dtype)
        lse2 = m + jnp.log2(jnp.maximum(l, 1e-30))
        lse_ref[0] = lse2[:, :1]  # [block_q, 1], base-2


def _swa_fwd(qf, kf, vf, *, window, kv_len, block_q, block_kv,
             block_kv_inner, interpret):
    """Padded [bh, sp, d] inputs (q pre-scaled by sm_scale*log2e) ->
    (o [bh, sp, d], lse2 [bh, sp, 1])."""
    bh, sp, d = qf.shape
    nq = sp // block_q
    # offsets covering [i*bq - window, i*bq + bq + window)
    num_off = -(-(block_q + 2 * window) // block_kv) + 1

    def kv_index(b, i, jj):
        virt = i * block_q + (jj - num_off // 2) * block_kv
        virt = jnp.clip(virt, 0, sp - block_kv)
        return (b, virt // block_kv, 0)

    kernel = functools.partial(
        _swa_kernel, window=window, block_q=block_q, block_kv=block_kv,
        num_off=num_off, kv_len=kv_len, seq_pad=sp,
        block_kv_inner=min(block_kv_inner, block_kv))
    o, lse = pl.pallas_call(
        kernel,
        grid=(bh, nq, num_off),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, jj: (b, i, 0)),
            pl.BlockSpec((1, block_kv, d), kv_index),
            pl.BlockSpec((1, block_kv, d), kv_index),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i, jj: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, jj: (b, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sp, d), qf.dtype),
            jax.ShapeDtypeStruct((bh, sp, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return o, lse


def _swa_fused_kernel(q_ref, kv_ref, vv_ref, o_ref,
                      m_scr, l_scr, acc_scr, m2_scr, l2_scr, acc2_scr,
                      *, window: int, block_q: int, block_kv: int,
                      num_off: int, kv_len: int, seq_pad: int,
                      block_kv_inner: int, n_glob: int, glob_pad: int):
    """Local windowed pass + the SWA global "cross" pass in ONE kernel.

    The kv input is [local tokens (padded to seq_pad) ++ global tokens
    (text + strided video, zero-padded to n_glob*block_kv)]; grid steps
    jj < num_off accumulate the windowed softmax (stats set 1), the last
    n_glob steps accumulate an INDEPENDENT softmax over the global tokens
    (stats set 2) -- the reference sums the two normalized outputs
    (processor.py:436), so the store writes local/l1 + global/l2. One kv
    block streams from HBM per grid step either way, so fusing adds no
    redundant transfers over the standalone local kernel.

    MEASURED DEAD-END (v5e, 13-frame flagship geometry): despite the
    isolated-kernel microbench win (35.0 ms vs 28.2 local + 15.7
    standalone-cross per layer), wiring this as the default serving path
    regressed the tracked 12B 384x672x49f config 3.30 -> 4.41 s/step
    (BENCH_r04.json). The full-call harness (benchmarks/swa_bench.py
    --streams), which includes the per-layer kv_aug/vv_aug concat
    materializations and the global tiles re-streamed once per query block
    that the kernel-only bench omitted, measures fused 46.2 ms vs unfused
    44.0 ms per layer-equivalent (2026-08-19) -- the fusion loses even
    before pipeline-level fusion/layout effects. Kept behind
    swa_attention_streams(fuse_cross=True) for the record; the default
    serving path is the unfused pair.
    """
    jj = pl.program_id(2)
    i = pl.program_id(1)

    @pl.when(jj == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        m2_scr[:] = jnp.full_like(m2_scr, -jnp.inf)
        l2_scr[:] = jnp.zeros_like(l2_scr)
        acc2_scr[:] = jnp.zeros_like(acc2_scr)

    virt = i * block_q + (jj - num_off // 2) * block_kv
    r0 = i * block_q
    d = acc_scr.shape[-1]

    @pl.when((jj < num_off) & (virt >= 0) & (virt <= seq_pad - block_kv))
    def _local():
        q = q_ref[0]
        delta = (jax.lax.broadcasted_iota(
                     jnp.int32, (block_q, block_kv_inner), 0)
                 - jax.lax.broadcasted_iota(
                     jnp.int32, (block_q, block_kv_inner), 1))
        for start in range(0, block_kv, block_kv_inner):
            k = kv_ref[0, start:start + block_kv_inner]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            c0 = virt + start
            in_win = ((delta + (r0 - c0 + window)).astype(jnp.uint32)
                      <= jnp.uint32(2 * window))
            s = jnp.where(in_win, s, DEFAULT_MASK_VALUE)
            m_prev = m_scr[:]
            l_prev = l_scr[:]
            m_curr = jnp.max(s, axis=1)[:, None]
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - _lane_broadcast(m_next, s.shape[1]))
            l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
            m_scr[:] = m_next
            l_scr[:] = l_next
            v = vv_ref[0, start:start + block_kv_inner]
            pv = jax.lax.dot(p.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
            acc_scr[:] = acc_scr[:] * _lane_broadcast(alpha, d) + pv

    @pl.when(jj >= num_off)
    def _global():
        # zero-padded global tail needs no mask: pad columns score s2=0 and
        # the store subtracts their exactly-known mass glob_pad * 2^(-m2)
        q = q_ref[0]
        for start in range(0, block_kv, block_kv_inner):
            k = kv_ref[0, start:start + block_kv_inner]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_prev = m2_scr[:]
            l_prev = l2_scr[:]
            m_curr = jnp.max(s, axis=1)[:, None]
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - _lane_broadcast(m_next, s.shape[1]))
            l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
            m2_scr[:] = m_next
            l2_scr[:] = l_next
            v = vv_ref[0, start:start + block_kv_inner]
            pv = jax.lax.dot(p.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
            acc2_scr[:] = acc2_scr[:] * _lane_broadcast(alpha, d) + pv

    @pl.when(jj == num_off + n_glob - 1)
    def _store():
        m = m_scr[:]
        l = l_scr[:]
        if kv_len < seq_pad:  # row-dependent pad mass in the window
            rows = (jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
                    + i * block_q)
            lo = jnp.maximum(rows - window, kv_len)
            hi = jnp.minimum(rows + window, seq_pad - 1)
            n_pad = jnp.maximum(hi - lo + 1, 0).astype(jnp.float32)
            l = l - n_pad * jnp.exp2(-m)
        l_inv = jnp.where(l <= 0.0, 1.0, 1.0 / l)
        out = acc_scr[:] * _lane_broadcast(l_inv, d)
        m2 = m2_scr[:]
        l2 = l2_scr[:]
        if glob_pad:
            l2 = l2 - glob_pad * jnp.exp2(-m2)
        l2_inv = jnp.where(l2 <= 0.0, 1.0, 1.0 / l2)
        out = out + acc2_scr[:] * _lane_broadcast(l2_inv, d)
        o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def swa_local_global(q, k, v, gk, gv, window, block_q, block_kv, interpret,
                     block_kv_inner):
    """Windowed local attention PLUS the independent global-softmax pass,
    summed (reference processor.py:436), in one fused Pallas kernel.

    q/k/v: [B, H, S, D] (the per-head-group PERMUTED video stream);
    gk/gv: [B, H, SG, D] global tokens (text + strided video, unpermuted --
    the global pass is permutation-invariant per query).
    Backward recomputes through the unfused differentiable pair
    (sliding_window_attention VJP + dense flash VJP) -- flash-style
    recompute, no extra residuals.
    """
    return _swa_local_global_fwd(q, k, v, gk, gv, window, block_q, block_kv,
                                 interpret, block_kv_inner)[0]


def _swa_local_global_fwd(q, k, v, gk, gv, window, block_q, block_kv,
                          interpret, block_kv_inner):
    b, h, s, d = q.shape
    sg = gk.shape[2]
    sm_scale = d ** -0.5
    block_q = min(block_q, _round_up(s, 128))
    block_kv = min(block_kv, _round_up(s, 128))
    block_kv = math.gcd(block_q, block_kv)
    sp = _round_up(s, block_q)
    sgp = _round_up(sg, block_kv)
    n_glob = sgp // block_kv
    num_off = -(-(block_q + 2 * window) // block_kv) + 1

    pad3 = lambda a, n: jnp.pad(a, ((0, 0), (0, 0), (0, n), (0, 0)))
    qf = (q * (sm_scale * LOG2E)).astype(q.dtype)
    qf = pad3(qf, sp - s).reshape(b * h, sp, d)
    # single concat producing [local | pad | global | pad] directly -- the
    # zero pads double as the closed-form-corrected softmax pad masses
    aug = lambda a, g: jnp.pad(
        jnp.concatenate([pad3(a, sp - s), g], axis=2),
        ((0, 0), (0, 0), (0, sgp - sg), (0, 0))).reshape(
            b * h, sp + sgp, d)
    kv_aug = aug(k, gk)
    vv_aug = aug(v, gv)

    def kv_index(bb, i, jj):
        loc = i * block_q + (jj - num_off // 2) * block_kv
        loc = jnp.clip(loc, 0, sp - block_kv)
        glob = sp + (jj - num_off) * block_kv
        return (bb, jnp.where(jj < num_off, loc, glob) // block_kv, 0)

    kernel = functools.partial(
        _swa_fused_kernel, window=window, block_q=block_q, block_kv=block_kv,
        num_off=num_off, kv_len=s, seq_pad=sp,
        block_kv_inner=min(block_kv_inner, block_kv), n_glob=n_glob,
        glob_pad=sgp - sg)
    o = pl.pallas_call(
        kernel,
        grid=(b * h, sp // block_q, num_off + n_glob),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bb, i, jj: (bb, i, 0)),
            pl.BlockSpec((1, block_kv, d), kv_index),
            pl.BlockSpec((1, block_kv, d), kv_index),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bb, i, jj: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sp, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kv_aug, vv_aug)
    o = o.reshape(b, h, sp, d)[:, :, :s]
    return o, (q, k, v, gk, gv)


def _swa_local_global_bwd(window, block_q, block_kv, interpret,
                          block_kv_inner, res, do):
    q, k, v, gk, gv = res

    def ref(q, k, v, gk, gv):
        from .attention import attention as dense_attention

        local = sliding_window_attention(
            q, k, v, window=window, block_q=block_q, block_kv=block_kv,
            block_kv_inner=block_kv_inner, interpret=interpret)
        cross = dense_attention(
            q, gk, gv,
            impl="pallas_interpret" if interpret else "pallas")
        return local + cross

    _, vjp = jax.vjp(ref, q, k, v, gk, gv)
    return vjp(do)


swa_local_global.defvjp(
    lambda q, k, v, gk, gv, window, bq, bkv, interp, inner:
        _swa_local_global_fwd(q, k, v, gk, gv, window, bq, bkv, interp,
                              inner),
    _swa_local_global_bwd)


# -- backward: windowed dq / dkv kernels mirroring the forward's
# virtual-window tiling. p is recomputed from the saved base-2 logsumexp
# with the SAME band mask, so cost stays O(seq * window) (VERDICT r2 #7:
# swa_layers configs must train on TPU, like the reference's flash-attn
# backward under autograd, processor.py:320-459).


def _swa_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref,
                       dq_scr, *, window, block_q, block_kv, num_off, kv_len):
    jj = pl.program_id(2)
    i = pl.program_id(1)

    @pl.when(jj == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse2 = lse_ref[0]
    di = di_ref[0]
    virt = i * block_q + (jj - num_off // 2) * block_kv
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + i * block_q
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + virt
    in_seq = col.astype(jnp.uint32) < jnp.uint32(kv_len)
    in_win = ((row - col + window).astype(jnp.uint32)
              <= jnp.uint32(2 * window))
    # clamped duplicate tiles carry out-of-range virtual cols -> masked
    p = jnp.where(in_seq & in_win, jnp.exp2(s - lse2), 0.0)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - di) * LN2
    dq_scr[:] += jax.lax.dot(ds.astype(k.dtype), k,
                             preferred_element_type=jnp.float32)

    @pl.when(jj == num_off - 1)
    def _store():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _swa_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                        dk_ref, dv_ref, dk_scr, dv_scr,
                        *, window, block_q, block_kv, num_off, kv_len):
    jj = pl.program_id(2)
    j = pl.program_id(1)

    @pl.when(jj == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse2 = lse_ref[0]
    di = di_ref[0]
    virt = j * block_kv + (jj - num_off // 2) * block_q
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + virt
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_kv
    # restrict to VALID q rows: pad rows are zero-cotangent anyway, and a
    # fully-masked pad row carries lse=-inf, whose exp2 would turn into
    # inf*0=NaN inside the p^T@do matmul. Also kills clamped duplicate q
    # tiles (virtual rows outside [0, kv_len) wrap the uint compare).
    in_row = row.astype(jnp.uint32) < jnp.uint32(kv_len)
    in_win = ((row - col + window).astype(jnp.uint32)
              <= jnp.uint32(2 * window))
    p = jnp.where(in_row & in_win, jnp.exp2(s - lse2), 0.0)
    dv_scr[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - di) * LN2
    dk_scr[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(jj == num_off - 1)
    def _store():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


# backward tile clamp; benchmarks/swa_bench.py --bwd sweeps this.
# Measured dead-end (v5e, 13-frame flagship geometry, 2026-08): fused
# fwd+grad is 122.5 ms at clamp 256, 512 AND 1024 -- the windowed backward
# is insensitive to tile size because the offset grid (num_off tiles per
# block) shrinks exactly as blocks grow; it already runs at ~3.5x the
# forward's wall clock for 3.5x the GEMM passes, i.e. proportional parity.
_SWA_BWD_BLOCK = 512


def _swa_bwd(qf, kf, vf, o, lse, do, *, window, kv_len, block_q, block_kv,
             interpret):
    bh, sp, d = qf.shape
    del block_kv
    # backward holds p/dp [bq, bkv] fp32 + accumulators in VMEM. EQUAL q/kv
    # tiles keep every virtual offset (j*bkv + k*bq) on the block grid --
    # the BlockSpec index map can only address whole blocks, so a clamped
    # off-grid offset would silently load the wrong tile.
    block_q = block_kv = math.gcd(sp, min(block_q, _SWA_BWD_BLOCK))
    nq, nkv = sp // block_q, sp // block_kv

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1,
                 keepdims=True)

    num_off = -(-(block_q + 2 * window) // block_kv) + 1

    def kv_index(b, i, jj):
        virt = i * block_q + (jj - num_off // 2) * block_kv
        virt = jnp.clip(virt, 0, sp - block_kv)
        return (b, virt // block_kv, 0)

    dq = pl.pallas_call(
        functools.partial(_swa_bwd_dq_kernel, window=window, block_q=block_q,
                          block_kv=block_kv, num_off=num_off, kv_len=kv_len),
        grid=(bh, nq, num_off),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, jj: (b, i, 0)),
            pl.BlockSpec((1, block_kv, d), kv_index),
            pl.BlockSpec((1, block_kv, d), kv_index),
            pl.BlockSpec((1, block_q, d), lambda b, i, jj: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, jj: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, jj: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, jj: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sp, d), qf.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf, do, lse, di)

    num_off_q = -(-(block_kv + 2 * window) // block_q) + 1

    def q_index(b, j, jj):
        virt = j * block_kv + (jj - num_off_q // 2) * block_q
        virt = jnp.clip(virt, 0, sp - block_q)
        return (b, virt // block_q, 0)

    dk, dv = pl.pallas_call(
        functools.partial(_swa_bwd_dkv_kernel, window=window,
                          block_q=block_q, block_kv=block_kv,
                          num_off=num_off_q, kv_len=kv_len),
        grid=(bh, nkv, num_off_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), q_index),
            pl.BlockSpec((1, block_kv, d), lambda b, j, jj: (b, j, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, j, jj: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), q_index),
            pl.BlockSpec((1, block_q, 1), q_index),
            pl.BlockSpec((1, block_q, 1), q_index),
        ],
        out_specs=(
            pl.BlockSpec((1, block_kv, d), lambda b, j, jj: (b, j, 0)),
            pl.BlockSpec((1, block_kv, d), lambda b, j, jj: (b, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sp, d), kf.dtype),
            jax.ShapeDtypeStruct((bh, sp, d), vf.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf, do, lse, di)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _swa_attention(qf, kf, vf, window, kv_len, block_q, block_kv,
                   interpret, block_kv_inner=512):
    o, _ = _swa_fwd(qf, kf, vf, window=window, kv_len=kv_len,
                    block_q=block_q, block_kv=block_kv,
                    block_kv_inner=block_kv_inner, interpret=interpret)
    return o


def _swa_attention_fwd(qf, kf, vf, window, kv_len, block_q, block_kv,
                       interpret, block_kv_inner=512):
    o, lse = _swa_fwd(qf, kf, vf, window=window, kv_len=kv_len,
                      block_q=block_q, block_kv=block_kv,
                      block_kv_inner=block_kv_inner, interpret=interpret)
    return o, (qf, kf, vf, o, lse)


def _swa_attention_bwd(window, kv_len, block_q, block_kv, interpret,
                       block_kv_inner, residuals, do):
    qf, kf, vf, o, lse = residuals
    dq, dk, dv = _swa_bwd(qf, kf, vf, o, lse, do, window=window,
                          kv_len=kv_len, block_q=block_q, block_kv=block_kv,
                          interpret=interpret)
    return dq, dk, dv


_swa_attention.defvjp(_swa_attention_fwd, _swa_attention_bwd)


def sliding_window_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
    window: int,
    sm_scale: Optional[float] = None,
    block_q: int = 1024,
    block_kv: int = 512,
    block_kv_inner: int = 512,  # v5e sweep at 13k tokens, window 1008
    interpret: bool = False,
) -> jnp.ndarray:
    """Bidirectional +-window attention over [B, H, S, D]. Differentiable:
    custom VJP runs windowed Pallas dq/dkv kernels (O(seq*window) both
    ways), so SWA layers train on TPU."""
    b, h, s, d = q.shape
    if sm_scale is None:
        sm_scale = d ** -0.5
    block_q = min(block_q, _round_up(s, 128))
    block_kv = min(block_kv, _round_up(s, 128))
    # kv tiles must divide q tiles: virtual kv offsets are i*bq + k*bkv and
    # the BlockSpec index map addresses whole kv blocks, so a bkv that does
    # not divide bq would clamp onto off-grid (wrong) tiles
    block_kv = math.gcd(block_q, block_kv)
    sp = _round_up(s, block_q)
    pad = sp - s
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    qf = (q * (sm_scale * LOG2E)).astype(q.dtype).reshape(b * h, sp, d)
    kf = k.reshape(b * h, sp, d)
    vf = v.reshape(b * h, sp, d)

    of = _swa_attention(qf, kf, vf, window, s, block_q, block_kv, interpret,
                        min(block_kv_inner, block_kv))
    o = of.reshape(b, h, sp, d)
    return o[:, :, :s] if pad else o


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def swa_reference(q, k, v, window: int, sm_scale: Optional[float] = None):
    """Dense jnp reference for tests: mask |i-j| > window."""
    d = q.shape[-1]
    if sm_scale is None:
        sm_scale = d ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    n = q.shape[2]
    idx = jnp.arange(n)
    mask = jnp.abs(idx[:, None] - idx[None, :]) <= window
    s = jnp.where(mask[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def swa_reference_banded(q, k, v, window: int,
                         sm_scale: Optional[float] = None,
                         block_q: int = 512):
    """Same math as swa_reference — every query row sees one full-row f32
    softmax over its |i-j| <= window band — but O(s * window) live memory:
    lax.map over q blocks, each attending a dynamic-sliced kv span of
    block_q + 2*window, block body rematerialized in the backward.

    This is the off-TPU fallback at large s (the TPU path is the Pallas
    virtual-window kernel, equally O(s * window)); without it a 53k-token
    off-TPU compile materializes 47 layers of [s, s] masked scores and any
    compiled-memory measurement is meaningless. Fwd+grad equality vs
    swa_reference is pinned in tests/test_swa.py."""
    d = q.shape[-1]
    if sm_scale is None:
        sm_scale = d ** -0.5
    b, h, n, _ = q.shape
    bq = min(block_q, n)
    span = min(n, bq + 2 * window)
    if span >= n:  # band covers everything a block can see: dense is equal
        return swa_reference(q, k, v, window, sm_scale)
    pad = (-n) % bq
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0))) if pad else q
    nb = (n + pad) // bq
    qb = jnp.moveaxis(qp.reshape(b, h, nb, bq, d), 2, 0)  # [nb, b, h, bq, d]
    q0 = jnp.arange(nb) * bq
    kv0 = jnp.clip(q0 - window, 0, n - span)

    @jax.checkpoint
    def block(args):
        qi, i0, s0 = args
        kk = jax.lax.dynamic_slice_in_dim(k, s0, span, axis=2)
        vv = jax.lax.dynamic_slice_in_dim(v, s0, span, axis=2)
        qidx = i0 + jnp.arange(bq)
        kidx = s0 + jnp.arange(span)
        m = jnp.abs(qidx[:, None] - kidx[None, :]) <= window
        # q-padding rows (qidx >= n) get a finite all-ones row so the
        # softmax stays NaN-free; their output is sliced away below
        m = m | (qidx[:, None] >= n)
        s = jnp.einsum("bhqd,bhkd->bhqk", qi, kk,
                       preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where(m[None, None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), vv)

    o = jax.lax.map(block, (qb, q0, kv0))
    o = jnp.moveaxis(o, 0, 2).reshape(b, h, n + pad, d)
    return o[:, :, :n] if pad else o


# ---------------------------------------------------------------------------
# The 6-direction SWA composition (reference processor.py:398-436)
# ---------------------------------------------------------------------------

_AXIS_ORDERS = (
    None,            # group 0: native (f, h, w)
    (0, 2, 1),       # (f, w, h)
    (1, 0, 2),       # (h, f, w)
    (1, 2, 0),       # (h, w, f)
    (2, 0, 1),       # (w, f, h)
    (2, 1, 0),       # (w, h, f)
)


def _permutation_indices(nh: int, f: int, h: int, w: int):
    """The 6-direction head-group permutation as gather indices [nh, s].

    idx[hd, p] = source token of permuted position p for head hd;
    inv[hd, t] = permuted position of token t (idx's argsort — realized as
    the arange transposed by the INVERSE axis order, so both tables lower
    to iota/transpose/broadcast HLO instead of a multi-MB literal).
    Head→group assignment follows torch.tensor_split(x, 6, dim=heads)
    (reference processor.py:398): the first (nh % 6) groups get the extra
    head. Gathering with these is bit-identical to the reshape/transpose
    path (tests/test_swa.py) but head-uniform, so it can run INSIDE a
    heads-sharded shard_map where tokens are replicated per shard."""
    s = f * h * w
    sizes = (f, h, w)
    ar = jnp.arange(s, dtype=jnp.int32)
    base, rem = divmod(nh, 6)
    rows_f, rows_i = [], []
    for g, order in enumerate(_AXIS_ORDERS):
        size = base + (1 if g < rem else 0)
        if size == 0:
            continue
        if order is None:
            fwd = inv = ar
        else:
            fwd = ar.reshape(f, h, w).transpose(order).reshape(s)
            psizes = tuple(sizes[a] for a in order)
            inv_order = tuple(order.index(i) for i in range(3))
            inv = ar.reshape(psizes).transpose(inv_order).reshape(s)
        rows_f.append(jnp.broadcast_to(fwd, (size, s)))
        rows_i.append(jnp.broadcast_to(inv, (size, s)))
    return jnp.concatenate(rows_f), jnp.concatenate(rows_i)


def _permute_tokens(x, f, h, w, order, inverse=False):
    """x [B, Hd, f*h*w, D] -> tokens reordered by the given (f,h,w) axis
    permutation.

    Deliberately carries NO sharding constraints: under a sequence_parallel
    scope these permutes sit between the per-head layout pinned at the
    head_parallel_call shard_map boundary (heads over (tp, sp), tokens
    replicated per head shard) and blocks.MMDiTBlock.merge's seq@sp pin —
    and none of the reshapes/transposes here touch the HEAD axis, so GSPMD
    propagates the head-sharded layout straight through them shard-locally.
    Pinning token-axis shardings mid-chain instead (round-3 _grid_constraint)
    forced layout transitions the partitioner can only do by replicating the
    full grid ("[SPMD] Involuntary full rematerialization", 4 per block on a
    dp2xsp2xtp2 mesh, MULTICHIP_r03.json); the dryrun now fails on that
    warning (__graft_entry__.py)."""
    if order is None:
        return x
    b, nh, s, d = x.shape
    sizes = (f, h, w)
    if not inverse:
        grid = x.reshape(b, nh, f, h, w, d)
        grid = grid.transpose(0, 1, *(2 + a for a in order), 5)
    else:
        # tokens arrive in permuted order: dims are sizes[order[i]]
        grid = x.reshape(b, nh, *(sizes[a] for a in order), d)
        inv = [0] * 3
        for pos, a in enumerate(order):
            inv[a] = pos
        grid = grid.transpose(0, 1, *(2 + p for p in inv), 5)
    return grid.reshape(b, nh, s, d)


def swa_attention_streams(
    q_txt, k_txt, v_txt, q_vid, k_vid, v_vid,
    *,
    num_frames: int, height: int, width: int,
    cross_attention_size: int = 1024,
    impl: str = "auto",
    fuse_cross: bool = False,
):
    """SWA over SEPARATE (text, video) streams [B, H, St|Sv, D] ->
    (out_text, out_vid). Avoids the 3 full-sequence q/k/v concats (and the
    output re-split) the joint form pays per layer.

    window = height*width (one frame of tokens) in each of 6 axis orders,
    head groups split evenly; plus the strided global cross pass.
    """
    b, nh, st, d = q_txt.shape
    sv = q_vid.shape[2]
    s = st + sv
    # kernel path when explicitly requested or auto-on-TPU;
    # "pallas_interpret" runs the REAL kernels in interpreter mode (so
    # off-TPU tests exercise the kernel through this composition); "xla"
    # (and auto off-TPU) uses the dense-masked reference
    interpret = impl == "pallas_interpret"
    use_kernel = impl == "pallas" or interpret or (
        impl == "auto" and jax.default_backend() == "tpu")
    window = height * width

    # Under an active sequence_parallel scope, attention calls go through
    # Ulysses-style HEAD parallelism (parallel.context.head_parallel_call):
    # the 6-direction permutes below run at GSPMD level (sharded transposes
    # = all-to-alls) and the kernels shard over heads with the full token
    # range per device -- the window kernel's virtual-tile addressing cannot
    # shard its token axis, but is embarrassingly parallel over heads.
    from ..parallel.context import current_sp, head_parallel_call

    scope = current_sp()

    def maybe_head_parallel(fn, shape):
        if scope is None:
            return fn
        return head_parallel_call(fn, scope.mesh, shape)

    # global cross pass kv: text + strided video (tiny set, shared by every
    # query). With fuse_cross=True (single-device kernel path only) the
    # VIDEO queries' cross pass is FUSED into the local windowed kernel
    # (swa_local_global) and only the text queries need a separate tiny
    # call. DEFAULT OFF: the fused kernel wins its isolated microbench but
    # LOSES in-pipeline (3.30 -> 4.41 s/step tracked, BENCH_r04.json) --
    # see swa_local_global's docstring. The default is the joint one-call
    # cross (block_q 2048 / single 1536-wide kv block measured 16.4 ms vs
    # 21 for two calls) + the standalone local kernel.
    interval = max(sv // max(cross_attention_size - st, 1), 1)
    # strided lax.slice beats jnp.take here by ~1.5 ms/layer at flagship
    # shape (full-cross 12.8 vs 14.3 ms, v5e 2026-08): the slice lowers to
    # a strided copy while gather pays per-row index handling; identical
    # token set (indices 0, interval, 2*interval, ...), bit-identical out
    strided = lambda a: jax.lax.slice(
        a, (0, 0, 0, 0), a.shape, (1, 1, interval, 1))
    ck = jnp.concatenate([k_txt, strided(k_vid)], axis=2)
    cv = jnp.concatenate([v_txt, strided(v_vid)], axis=2)
    from .attention import attention as dense_attention

    cross_impl = ("pallas_interpret" if interpret
                  else "pallas" if use_kernel else "xla")
    fuse_cross = fuse_cross and use_kernel and scope is None
    if fuse_cross:
        # text queries only: 256 x ~1k -- XLA's fused softmax-matmul is
        # faster than a kernel launch at this size
        cross_txt = dense_attention(q_txt, ck, cv, impl="xla")
        cross_vid = None
    else:
        cq = jnp.concatenate([q_txt, q_vid], axis=2)
        cross_fn = functools.partial(
            dense_attention, impl=cross_impl,
            block_q=2048, block_kv=1536, block_kv_inner=512)
        cross = maybe_head_parallel(cross_fn, cq.shape)(cq, ck, cv)
        cross_txt, cross_vid = cross[:, :, :st], cross[:, :, st:]

    # local 6-direction pass over video tokens only; all head groups share
    # the same window so their permuted tokens batch into ONE kernel call.
    # Head split follows torch.tensor_split(q, 6, dim=heads)
    # (processor.py:398): the FIRST (nh % 6) groups carry the extra head.
    if use_kernel:
        local_fn = functools.partial(sliding_window_attention, window=window,
                                     interpret=interpret)
    elif sv > 8192:
        # off-TPU at big s: banded O(s*window) fallback — the dense-masked
        # reference's [s, s] f32 scores would dominate (and falsify) any
        # compiled-memory measurement at flagship token counts
        local_fn = functools.partial(swa_reference_banded, window=window)
    else:
        local_fn = functools.partial(swa_reference, window=window)

    if scope is not None:
        from ..parallel.context import head_shard_axes
        batch_ax, head_axes = head_shard_axes(scope.mesh, b, nh)
    else:
        batch_ax, head_axes = None, ()

    if batch_ax or head_axes:
        # Ulysses form: ONE shard_map over (dp, heads@(tp,sp)) enclosing
        # permute -> kernel -> inverse permute. The per-head-group axis
        # permutation is expressed as a constant gather index [nh, s], so
        # the shard_map body is head-uniform and every token move is
        # shard-local; the only communication is the all-to-all GSPMD
        # inserts at the shard_map boundary (seq@sp <-> heads@(tp,sp)).
        # Doing the permutes at GSPMD level instead (round 3) made the
        # partitioner replicate the full grid around every 6-axis
        # transpose ("Involuntary full rematerialization",
        # MULTICHIP_r03.json).
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        idx, inv = _permutation_indices(nh, num_frames, height, width)
        qspec = P(batch_ax, head_axes or None, None, None)
        ispec = P(head_axes or None, None)

        def _sharded_local(q, k, v, idx, inv):
            take = lambda a, i: jnp.take_along_axis(
                a, i[None, :, :, None], axis=2)
            oo = local_fn(take(q, idx), take(k, idx), take(v, idx))
            return take(oo, inv)

        local = shard_map(
            _sharded_local, mesh=scope.mesh,
            in_specs=(qspec,) * 3 + (ispec,) * 2, out_specs=qspec,
            check_rep=False,
        )(q_vid, k_vid, v_vid, idx, inv)
    else:
        groups = 6
        base, rem = divmod(nh, groups)
        off, slices = 0, []
        for g in range(groups):
            size = base + (1 if g < rem else 0)
            slices.append(slice(off, off + size))
            off += size
        perm = lambda a, sl, order: _permute_tokens(
            a[:, sl], num_frames, height, width, order)
        qq = jnp.concatenate([perm(q_vid, sl, o) for sl, o in zip(slices, _AXIS_ORDERS)], axis=1)
        kk = jnp.concatenate([perm(k_vid, sl, o) for sl, o in zip(slices, _AXIS_ORDERS)], axis=1)
        vvv = jnp.concatenate([perm(v_vid, sl, o) for sl, o in zip(slices, _AXIS_ORDERS)], axis=1)
        if fuse_cross:
            # head order is preserved by the group-slice concat, so the
            # (unpermuted) global kv lines up per head; the global softmax
            # is permutation-invariant per query, so summing inside the
            # kernel and inverse-permuting the SUM equals the reference's
            # local + cross
            oo = swa_local_global(qq, kk, vvv, ck, cv, window,
                                  1024, 512, interpret, 512)
        else:
            oo = local_fn(qq, kk, vvv)
        outs = []
        off = 0
        for sl, order in zip(slices, _AXIS_ORDERS):
            n = sl.stop - sl.start
            outs.append(_permute_tokens(oo[:, off:off + n], num_frames,
                                        height, width, order, inverse=True))
            off += n
        local = jnp.concatenate(outs, axis=1)

    # reference combination: video = local + cross_video; text = 2x cross_text
    if cross_vid is None:  # fused path: the kernel already added it
        return cross_txt * 2.0, local
    return cross_txt * 2.0, local + cross_vid


def swa_joint_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    *,
    text_len: int,
    num_frames: int, height: int, width: int,
    cross_attention_size: int = 1024,
    impl: str = "auto",
    fuse_cross: bool = False,
) -> jnp.ndarray:
    """SWA over joint (text, video) tokens [B, H, S, D] -> same shape.
    Concat-input wrapper over swa_attention_streams."""
    out_text, out_vid = swa_attention_streams(
        q[:, :, :text_len], k[:, :, :text_len], v[:, :, :text_len],
        q[:, :, text_len:], k[:, :, text_len:], v[:, :, text_len:],
        num_frames=num_frames, height=height, width=width,
        cross_attention_size=cross_attention_size, impl=impl,
        fuse_cross=fuse_cross)
    return jnp.concatenate([out_text, out_vid], axis=2)

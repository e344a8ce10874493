"""Context (sequence) parallel attention over the `sp` mesh axis.

The reference has NO sequence parallelism (SURVEY.md §2.9) -- it copes with
53k-token sequences via SWA sparse attention. TPU-native replacement: shard
the video token axis over `sp` and run attention across shards, two ways:

  - all-gather KV ("allgather"): each shard gathers the full K/V and runs
    local flash attention on its query shard. Fully differentiable through
    the existing flash kernel; communication = one all-gather of K and V
    per layer (O(seq * d) over ICI).
  - ring ("ring"): KV shards rotate around the ring via ppermute while each
    chip folds partial attention into running (m, l, acc) statistics --
    communication overlapped with compute, peak memory O(seq/sp). Inference
    path (pairs with the all-gather mode for training).

Both are meant to be called inside shard_map (or used through
`make_sp_attention` which wraps them).
"""
import contextlib
import dataclasses
import functools
import threading
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.attention import attention as attention_op


# -- ambient sequence-parallel scope ------------------------------------------
#
# The model code stays mesh-agnostic: MMDiTBlock routes its joint attention
# through ops.attention.dispatch_attention, which consults this scope. Enter
# `sequence_parallel(mesh)` around jit tracing (pipeline call / train step)
# to shard the token axis over 'sp' and run the Pallas kernel per shard
# inside shard_map.

_SP_SCOPE = threading.local()


@dataclasses.dataclass(frozen=True)
class SPScope:
    mesh: Mesh
    mode: str = "allgather"  # 'allgather' (training) | 'ring' (inference)


def current_sp() -> Optional[SPScope]:
    scope = getattr(_SP_SCOPE, "scope", None)
    if scope is None:
        return None
    if scope.mesh.shape.get("sp", 1) <= 1:
        return None
    return scope


@contextlib.contextmanager
def sequence_parallel(mesh: Mesh, mode: str = "allgather"):
    """Activate sp-sharded attention for code traced inside this block."""
    prev = getattr(_SP_SCOPE, "scope", None)
    _SP_SCOPE.scope = SPScope(mesh=mesh, mode=mode)
    try:
        yield
    finally:
        _SP_SCOPE.scope = prev


def sp_constraint(x, spec_axes):
    """with_sharding_constraint iff an sp scope is active; spec_axes is a
    tuple of mesh-axis names (or None) per dim of x. Axes the dim cannot be
    divided over are dropped (e.g. batch 1 on dp=2)."""
    scope = current_sp()
    if scope is None:
        return x
    axes = tuple(
        a if (a is not None and scope.mesh.shape.get(a, 1) > 1
              and x.shape[i] % scope.mesh.shape[a] == 0) else None
        for i, a in enumerate(spec_axes))
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(scope.mesh, P(*axes)))


def allgather_kv_attention(q, k, v, axis_name: str = "sp", impl: str = "auto"):
    """Per-shard q attends to the all-gathered kv. [B, H, S_shard, D]."""
    k_full = jax.lax.all_gather(k, axis_name, axis=2, tiled=True)
    v_full = jax.lax.all_gather(v, axis_name, axis=2, tiled=True)
    return attention_op(q, k_full, v_full, impl=impl)


def _ring_fwd(q, k, v, axis_name: str, sm_scale: Optional[float]):
    """Ring forward -> (o [B,H,S,D] in q.dtype, lse2 [B,H,S,1] base-2
    global logsumexp). kv shards rotate via ppermute; each hop runs the
    Pallas flash kernel (XLA softmax off-TPU) on the local (q, kv-block)
    pair and the per-block outputs merge through their logsumexp weights:

        o = sum_i o_i * 2^(lse_i - lse_tot),  lse_tot = log2 sum_i 2^lse_i

    Peak memory O(seq/sp); the next block's ppermute is issued before the
    local attention so XLA can overlap the transfer with the matmuls."""
    from ..ops.flash_attention import LOG2E, _flash_fwd

    use_pallas = jax.default_backend() == "tpu"
    s_true = q.shape[2]
    if use_pallas:
        # flash kernels need block-multiple sequences; per-shard interior
        # padding is safe: _flash_fwd's kv_valid removes the pad columns'
        # softmax mass per block, padded q rows are sliced off at the end
        q, k, v, blk = _pad_ring(q, k, v)
    b, h, s, d = q.shape
    if sm_scale is None:
        sm_scale = d ** -0.5
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def partial(kb, vb):
        if use_pallas:
            qf = (q * (sm_scale * LOG2E)).astype(q.dtype).reshape(b * h, s, d)
            o, lse2 = _flash_fwd(qf, kb.reshape(b * h, s, d),
                                 vb.reshape(b * h, s, d), kv_valid=s_true,
                                 block_q=blk, block_kv=blk,
                                 interpret=False, block_kv_inner=min(blk, 512))
            return (o.reshape(b, h, s, d).astype(jnp.float32),
                    lse2.reshape(b, h, s, 1))
        sc = jnp.einsum("bhqd,bhkd->bhqk", q, kb,
                        preferred_element_type=jnp.float32) * sm_scale
        m = jnp.max(sc, axis=-1, keepdims=True)
        p = jnp.exp(sc - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(vb.dtype), vb
                       ).astype(jnp.float32) / jnp.maximum(l, 1e-30)
        return o, (m + jnp.log(jnp.maximum(l, 1e-30))) * LOG2E

    def body(carry, _):
        o_acc, lse_acc, kb, vb = carry
        # issue the rotation first so the collective overlaps the attention
        kb_next = jax.lax.ppermute(kb, axis_name, perm)
        vb_next = jax.lax.ppermute(vb, axis_name, perm)
        o, lse2 = partial(kb, vb)
        lse_new = jnp.logaddexp2(lse_acc, lse2)
        w_old = jnp.exp2(lse_acc - lse_new)
        w_new = jnp.exp2(lse2 - lse_new)
        o_acc = o_acc * w_old + o * w_new
        return (o_acc, lse_new, kb_next, vb_next), None

    o0 = jnp.zeros((b, h, s, d), jnp.float32)
    lse0 = jnp.full((b, h, s, 1), -jnp.inf, jnp.float32)
    (o, lse, _, _), _ = jax.lax.scan(body, (o0, lse0, k, v), None, length=n)
    return o[:, :, :s_true].astype(q.dtype), lse[:, :, :s_true]


def _pad_ring(q, k, v):
    """Zero-pad the shard sequence to a flash-block multiple; returns the
    chosen (equal q/kv) block size."""
    s = q.shape[2]
    blk = 512 if s >= 512 else -(-s // 128) * 128
    sp_ = -(-s // blk) * blk
    if sp_ != s:
        pad = ((0, 0), (0, 0), (0, sp_ - s), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    return q, k, v, blk


def ring_attention(q, k, v, axis_name: str = "sp",
                   sm_scale: Optional[float] = None):
    """Inference entry: ring forward only. q, k, v: [B, H, S_shard, D]."""
    return _ring_fwd(q, k, v, axis_name, sm_scale)[0]


def _ring_bwd(q, k, v, o, lse2, do, axis_name: str,
              sm_scale: Optional[float]):
    """Flash ring backward (VERDICT r2 #3): (k, v, dk, dv) rotate together
    via ppermute; each hop runs the Pallas flash dq/dkv kernels on the
    local q shard against the visiting kv block, using the GLOBAL base-2
    logsumexp saved by the forward (the flash decomposition makes per-block
    contributions with global lse/di sum to the exact gradient). After n
    hops every dk/dv accumulator has visited all devices and is home.

    Peak memory O(seq/sp * seq/sp) per hop -- never materializes a
    [S_shard, S_full] score matrix and performs NO all-gather."""
    from ..ops.flash_attention import LN2, LOG2E, _flash_bwd

    use_pallas = jax.default_backend() == "tpu"
    s_true = q.shape[2]
    if use_pallas:
        q, k, v, blk = _pad_ring(q, k, v)
        pad = q.shape[2] - s_true
        if pad:
            p4 = ((0, 0), (0, 0), (0, pad), (0, 0))
            o, do = jnp.pad(o, p4), jnp.pad(do, p4)
            # pad lse with zeros: padded rows have zero cotangents and
            # zero k, so their p never reaches a gradient
            lse2 = jnp.pad(lse2, ((0, 0), (0, 0), (0, pad), (0, 0)))
    b, h, s, d = q.shape
    scale = (sm_scale if sm_scale is not None else d ** -0.5)
    c = scale * LOG2E
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    qf = (q * c).astype(q.dtype)
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1,
                 keepdims=True)

    def partial(kb, vb):
        """-> (dqf_hop, dk_hop, dv_hop) for this kv block (w.r.t. scaled q)."""
        if use_pallas:
            flat = lambda a: a.reshape(b * h, s, -1)
            dqf, dk, dv = _flash_bwd(
                flat(qf), flat(kb), flat(vb), flat(o), flat(lse2), flat(do),
                block_q=blk, block_kv=blk, interpret=False)
            unflat = lambda a: a.reshape(b, h, s, d)
            return unflat(dqf), unflat(dk), unflat(dv)
        s2 = jnp.einsum("bhqd,bhkd->bhqk", qf.astype(jnp.float32), kb.astype(jnp.float32))
        p = jnp.exp2(s2 - lse2)
        dp = jnp.einsum("bhqd,bhkd->bhqk", do.astype(jnp.float32),
                        vb.astype(jnp.float32))
        ds = p * (dp - di) * LN2
        dqf = jnp.einsum("bhqk,bhkd->bhqd", ds, kb.astype(jnp.float32))
        dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf.astype(jnp.float32))
        dv = jnp.einsum("bhqk,bhqd->bhkd", p, do.astype(jnp.float32))
        return dqf, dk, dv

    def body(carry, _):
        dq_acc, kb, vb, dkb, dvb = carry
        dqf, dk_hop, dv_hop = partial(kb, vb)
        dq_acc = dq_acc + dqf.astype(jnp.float32)
        dkb = dkb + dk_hop.astype(jnp.float32)
        dvb = dvb + dv_hop.astype(jnp.float32)
        # rotate the kv block together with its gradient accumulators; after
        # n hops each accumulator has circled back to its home device
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        dkb = jax.lax.ppermute(dkb, axis_name, perm)
        dvb = jax.lax.ppermute(dvb, axis_name, perm)
        return (dq_acc, kb, vb, dkb, dvb), None

    zeros = jnp.zeros((b, h, s, d), jnp.float32)
    (dq_acc, _, _, dk, dv), _ = jax.lax.scan(
        body, (zeros, k, v, zeros, zeros), None, length=n)
    # chain rule through the sm_scale*log2e fold into q; drop pad rows
    sl = lambda a: a[:, :, :s_true]
    return (sl(dq_acc * c).astype(q.dtype), sl(dk).astype(k.dtype),
            sl(dv).astype(v.dtype))


def ring_attention_diff(q, k, v, axis_name: str = "sp",
                        sm_scale: Optional[float] = None):
    """Differentiable ring attention: ring forward (saving the global
    base-2 logsumexp) + flash ring backward. Both directions are
    O(seq/sp) resident memory with ppermute-only communication -- this is
    what makes the 53k-token pretrain stage (SURVEY §6) trainable."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def _ring(q, k, v, scale):
        return _ring_fwd(q, k, v, axis_name, scale)[0]

    def _fwd(q, k, v, scale):
        o, lse2 = _ring_fwd(q, k, v, axis_name, scale)
        return o, (q, k, v, o, lse2)

    def _bwd(scale, res, g):
        q, k, v, o, lse2 = res
        return _ring_bwd(q, k, v, o, lse2, g, axis_name, scale)

    _ring.defvjp(_fwd, _bwd)
    return _ring(q, k, v, sm_scale)


def head_shard_axes(mesh: Mesh, batch: int, heads: int):
    """(batch_axis, head_axes) for Ulysses head parallelism: batch on 'dp'
    when divisible, heads split over the largest of (tp, sp) / (tp,) / (sp,)
    that divides the head count. head_axes is () when nothing fits."""
    batch_ax = ("dp" if mesh.shape.get("dp", 1) > 1
                and batch % mesh.shape["dp"] == 0 else None)
    head_axes: tuple = ()
    for cand in (("tp", "sp"), ("tp",), ("sp",)):
        size = 1
        for a in cand:
            size *= mesh.shape.get(a, 1)
        if size > 1 and all(mesh.shape.get(a, 1) > 1 for a in cand) \
                and heads % size == 0:
            head_axes = cand
            break
    return batch_ax, head_axes


def head_parallel_call(fn, mesh: Mesh, shape, n_args: int = 3):
    """Ulysses-style head parallelism for attention kernels whose TOKEN axis
    cannot shard (the SWA 6-direction permuted orders): shard_map over
    [B, H, S, D] with batch on dp and HEADS split across (tp, sp); each
    device runs the full token range for its head slice. GSPMD inserts the
    seq-sharded <-> head-sharded reshard (an all-to-all of O(S*H*D/n))
    around the call, so activation memory stays divided by the mesh size --
    which is what sp exists for. Falls back to a plain call when the head
    count does not divide the mesh.

    fn: positional [B, H, S, D] arrays -> [B, H, S, D] (e.g. windowed
    attention with identical per-head treatment -- permutations must be
    applied OUTSIDE at GSPMD level or expressed head-uniformly INSIDE via
    constant gather indices, see ops.swa.swa_attention_streams)."""
    from jax.experimental.shard_map import shard_map

    batch_ax, head_axes = head_shard_axes(mesh, shape[0], shape[1])
    if not head_axes and batch_ax is None:
        return fn
    spec = P(batch_ax, head_axes if head_axes else None, None, None)
    return shard_map(fn, mesh=mesh, in_specs=(spec,) * n_args,
                     out_specs=spec, check_rep=False)


def make_sp_attention(mesh: Mesh, mode: str = "allgather",
                      impl: str = "auto", shape=None):
    """shard_map-wrapped sequence-parallel attention: inputs [B, H, S, D]
    sharded (batch on dp, heads on tp, seq on sp).

    shape: optional (B, H, S, D) used to drop mesh axes the tensor cannot be
    divided over (e.g. CFG batch 2 on dp=1 meshes, odd head counts on tp).
    The seq axis MUST divide by sp."""
    from jax.experimental.shard_map import shard_map

    def axis(name, dim):
        size = mesh.shape.get(name, 1)
        if size <= 1:
            return None
        if shape is not None and shape[dim] % size != 0:
            if name == "sp":
                raise ValueError(
                    f"sequence length {shape[dim]} not divisible by sp={size}")
            return None
        return name

    spec = P(axis("dp", 0), axis("tp", 1), axis("sp", 2), None)

    if mode == "allgather":
        fn = functools.partial(allgather_kv_attention, axis_name="sp",
                               impl=impl)
    elif mode == "ring":
        fn = functools.partial(ring_attention_diff, axis_name="sp")
    else:
        raise ValueError(mode)

    return shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_rep=False)

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


def ring_attention(q, k, v, axis_name: str = "sp",
                   sm_scale: Optional[float] = None):
    """Ring attention: kv shards rotate via ppermute; each hop runs the
    Pallas flash kernel (XLA softmax off-TPU) on the local (q, kv-block)
    pair and the per-block outputs merge through their logsumexp weights:

        o = sum_i o_i * 2^(lse_i - lse_tot),  lse_tot = log2 sum_i 2^lse_i

    Peak memory O(seq/sp); the next block's ppermute is issued before the
    local attention so XLA can overlap the transfer with the matmuls.
    Inference path (the all-gather mode is the differentiable one).

    q, k, v: [B, H, S_shard, D] (this chip's shard).
    """
    from ..ops.flash_attention import LOG2E, _flash_fwd

    b, h, s, d = q.shape
    if sm_scale is None:
        sm_scale = d ** -0.5
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    use_pallas = jax.default_backend() == "tpu"

    def partial(kb, vb):
        if use_pallas:
            qf = (q * (sm_scale * LOG2E)).astype(q.dtype).reshape(b * h, s, d)
            o, lse2 = _flash_fwd(qf, kb.reshape(b * h, s, d),
                                 vb.reshape(b * h, s, d), kv_valid=s,
                                 block_q=min(1024, s), block_kv=min(2048, s),
                                 interpret=False, block_kv_inner=256)
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
    (o, _, _, _), _ = jax.lax.scan(body, (o0, lse0, k, v), None, length=n)
    return o.astype(q.dtype)


def ring_attention_diff(q, k, v, axis_name: str = "sp",
                        sm_scale: Optional[float] = None):
    """Differentiable ring attention: the forward is `ring_attention`
    (rotating KV, O(seq/sp) memory, overlap-friendly); the backward is the
    exact gradient of the same math computed through the all-gather
    formulation at the saved inputs — attention(q, k, v) is identical
    either way, so the VJP is exact while staying simple enough to trust.
    Training at all-gather memory in the backward is the same budget the
    default training mode (`mode="allgather"`) already pays."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def _ring(q, k, v, scale):
        return ring_attention(q, k, v, axis_name=axis_name, sm_scale=scale)

    def _fwd(q, k, v, scale):
        return _ring(q, k, v, scale), (q, k, v)

    def _bwd(scale, res, g):
        q, k, v = res

        def ref(q_, k_, v_):
            kf = jax.lax.all_gather(k_, axis_name, axis=2, tiled=True)
            vf = jax.lax.all_gather(v_, axis_name, axis=2, tiled=True)
            d = q_.shape[-1]
            s = jnp.einsum("bhqd,bhkd->bhqk", q_, kf,
                           preferred_element_type=jnp.float32)
            s = s * (scale if scale is not None else d ** -0.5)
            p = jax.nn.softmax(s, axis=-1)
            return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v_.dtype), vf
                              ).astype(q_.dtype)

        _, vjp = jax.vjp(ref, q, k, v)
        return vjp(g)

    _ring.defvjp(_fwd, _bwd)
    return _ring(q, k, v, sm_scale)


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

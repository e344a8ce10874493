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
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.attention import attention as attention_op


def allgather_kv_attention(q, k, v, axis_name: str = "sp", impl: str = "auto"):
    """Per-shard q attends to the all-gathered kv. [B, H, S_shard, D]."""
    k_full = jax.lax.all_gather(k, axis_name, axis=2, tiled=True)
    v_full = jax.lax.all_gather(v, axis_name, axis=2, tiled=True)
    return attention_op(q, k_full, v_full, impl=impl)


def ring_attention(q, k, v, axis_name: str = "sp",
                   sm_scale: Optional[float] = None):
    """Ring attention with cross-shard online-softmax combination.

    q, k, v: [B, H, S_shard, D] (this chip's shard). Rotates kv blocks with
    ppermute; per-block partials fold via the flash-attention correction.
    """
    d = q.shape[-1]
    if sm_scale is None:
        sm_scale = d ** -0.5
    n = jax.lax.psum(1, axis_name)

    def partial_attn(q, kb, vb):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kb,
                       preferred_element_type=jnp.float32) * sm_scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(vb.dtype), vb
                       ).astype(jnp.float32)
        return o, m, l

    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(carry, _):
        o_acc, m_acc, l_acc, kb, vb = carry
        o, m, l = partial_attn(q, kb, vb)
        m_new = jnp.maximum(m_acc, m)
        alpha = jnp.exp(m_acc - m_new)
        beta = jnp.exp(m - m_new)
        o_acc = o_acc * alpha + o * beta
        l_acc = l_acc * alpha + l * beta
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        return (o_acc, m_new, l_acc, kb, vb), None

    b, h, s, _ = q.shape
    o0 = jnp.zeros((b, h, s, d), jnp.float32)
    m0 = jnp.full((b, h, s, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, s, 1), jnp.float32)
    (o, m, l, _, _), _ = jax.lax.scan(
        body, (o0, m0, l0, k, v), None, length=n)
    return (o / jnp.maximum(l, 1e-30)).astype(q.dtype)


def make_sp_attention(mesh: Mesh, mode: str = "allgather",
                      impl: str = "auto"):
    """shard_map-wrapped sequence-parallel attention: inputs [B, H, S, D]
    sharded (batch on dp, heads on tp, seq on sp)."""
    from jax.experimental.shard_map import shard_map

    spec = P("dp", "tp", "sp", None)

    if mode == "allgather":
        fn = functools.partial(allgather_kv_attention, axis_name="sp",
                               impl=impl)
    elif mode == "ring":
        fn = functools.partial(ring_attention, axis_name="sp")
    else:
        raise ValueError(mode)

    return shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_rep=False)

"""8-bit-state AdamW in optax form (reference `--use_8bit_adam`,
train.py:1186-1194, bitsandbytes AdamW8bit).

Both Adam moments are stored blockwise-quantized to int8 with one fp32
scale per block (bitsandbytes-style blockwise absmax quantization; the
reference's dynamic-tree quantizer is replaced by linear absmax on m and
absmax-of-sqrt on v, which squares the effective dynamic range of the
second moment — a TPU-friendly formulation that is pure vector math).

State per parameter: int8 m, int8 sqrt(v), fp32 scales (2 * n/block_size),
i.e. ~2 bytes/param vs 8 for fp32 Adam.

Note: the quantized leaves are (n_blocks, block) shaped, so ZeRO-style
spec inheritance (mapping parameter PartitionSpecs onto the state) does
not apply; use dp-replicated optimizer state or CAME for sharded runs.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class Adam8bitState(NamedTuple):
    count: jnp.ndarray
    m_q: optax.Updates       # int8 blocks
    m_scale: optax.Updates   # fp32 per-block scales
    v_q: optax.Updates       # int8 blocks of sqrt(v)
    v_scale: optax.Updates


def _blocked(x, block):
    flat = x.reshape(-1).astype(jnp.float32)
    pad = (-flat.size) % block
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat.reshape(-1, block)


def _quantize(xb):
    scale = jnp.max(jnp.abs(xb), axis=-1, keepdims=True) / 127.0
    q = jnp.round(xb / jnp.maximum(scale, 1e-30)).astype(jnp.int8)
    return q, scale[:, 0]


def scale_by_adam8bit(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    block_size: int = 2048,
) -> optax.GradientTransformation:
    def init_fn(params):
        def zeros_q(p):
            n = max(1, -(-p.size // block_size))
            return jnp.zeros((n, block_size), jnp.int8)

        def zeros_s(p):
            n = max(1, -(-p.size // block_size))
            return jnp.zeros((n,), jnp.float32)

        return Adam8bitState(
            count=jnp.zeros((), jnp.int32),
            m_q=jax.tree.map(zeros_q, params),
            m_scale=jax.tree.map(zeros_s, params),
            v_q=jax.tree.map(zeros_q, params),
            v_scale=jax.tree.map(zeros_s, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def one(g, mq, ms, vq, vs):
            gb = _blocked(g, block_size)
            m = mq.astype(jnp.float32) * ms[:, None]
            v_sqrt = vq.astype(jnp.float32) * vs[:, None]
            v = v_sqrt * v_sqrt
            m = b1 * m + (1.0 - b1) * gb
            v = b2 * v + (1.0 - b2) * gb * gb
            mhat = m / bc1
            vhat = v / bc2
            ub = mhat / (jnp.sqrt(vhat) + eps)
            u = ub.reshape(-1)[: g.size].reshape(g.shape).astype(g.dtype)
            mq2, ms2 = _quantize(m)
            vq2, vs2 = _quantize(jnp.sqrt(v))
            return u, mq2, ms2, vq2, vs2

        flat_u, flat_mq, flat_ms, flat_vq, flat_vs = [], [], [], [], []
        leaves, treedef = jax.tree.flatten(updates)
        for g, mq, ms, vq, vs in zip(
            leaves, jax.tree.leaves(state.m_q), jax.tree.leaves(state.m_scale),
            jax.tree.leaves(state.v_q), jax.tree.leaves(state.v_scale)
        ):
            u, mq2, ms2, vq2, vs2 = one(g, mq, ms, vq, vs)
            flat_u.append(u)
            flat_mq.append(mq2)
            flat_ms.append(ms2)
            flat_vq.append(vq2)
            flat_vs.append(vs2)

        unflat = lambda xs: jax.tree.unflatten(treedef, xs)
        return unflat(flat_u), Adam8bitState(
            count=count, m_q=unflat(flat_mq), m_scale=unflat(flat_ms),
            v_q=unflat(flat_vq), v_scale=unflat(flat_vs))

    return optax.GradientTransformation(init_fn, update_fn)


def adamw8bit(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
    block_size: int = 2048,
    mask=None,
) -> optax.GradientTransformation:
    return optax.chain(
        scale_by_adam8bit(b1, b2, eps, block_size),
        optax.add_decayed_weights(weight_decay, mask=mask),
        optax.scale_by_learning_rate(learning_rate),
    )

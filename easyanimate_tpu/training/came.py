"""CAME optimizer (Confidence-guided Adaptive Memory Efficient, Luo et al.
2023) in optax form.

Parity target: the reference's `--use_came` option (train.py:1195-1203,
came_pytorch.CAME). Second moments and the confidence statistics are
rank-1 factored for >=2D parameters (Adafactor-style row/col means), so
optimizer memory is ~O(n) instead of 2n extra.

Algorithm per step (paper Alg. 1):
  u    = g / sqrt(vhat)        vhat: factored EMA of g^2 + eps1
  uhat = u / max(1, RMS(u)/d)  update clipping
  m    = b1 m + (1-b1) uhat
  s    = (uhat - m)^2          instability
  update = m / sqrt(shat)      shat: factored EMA of s + eps2
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class _Factored(NamedTuple):
    row: jnp.ndarray
    col: jnp.ndarray
    full: jnp.ndarray  # used when rank < 2 (shape () placeholder otherwise)


class CAMEState(NamedTuple):
    count: jnp.ndarray
    m: optax.Updates
    v: optax.Updates   # tree of _Factored
    s: optax.Updates   # tree of _Factored


def _init_factored(p):
    if p.ndim >= 2:
        return _Factored(jnp.zeros(p.shape[:-1], jnp.float32),
                         jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32),
                         jnp.zeros((), jnp.float32))
    return _Factored(jnp.zeros(()), jnp.zeros(()),
                     jnp.zeros(p.shape, jnp.float32))


def _update_factored(fac, sq, beta):
    if sq.ndim >= 2:
        row = beta * fac.row + (1 - beta) * jnp.mean(sq, axis=-1)
        col = beta * fac.col + (1 - beta) * jnp.mean(sq, axis=-2)
        return _Factored(row, col, fac.full)
    return _Factored(fac.row, fac.col, beta * fac.full + (1 - beta) * sq)


def _approx(fac, ndim):
    if ndim >= 2:
        r = fac.row[..., None]
        c = fac.col[..., None, :]
        denom = jnp.mean(fac.row, axis=-1, keepdims=True)[..., None]
        return r * c / jnp.maximum(denom, 1e-30)
    return fac.full


def came(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
         b3: float = 0.9999, eps1: float = 1e-30, eps2: float = 1e-16,
         clip_threshold: float = 1.0,
         weight_decay: float = 0.0) -> optax.GradientTransformation:
    def init(params):
        return CAMEState(
            count=jnp.zeros((), jnp.int32),
            m=jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params),
            v=jax.tree.map(_init_factored, params),
            s=jax.tree.map(_init_factored, params),
        )

    def update(grads, state, params=None):
        def per_leaf(g, m, v, s, p):
            g = g.astype(jnp.float32)
            sq = jnp.square(g) + eps1
            v = _update_factored(v, sq, b2)
            u = g * jax.lax.rsqrt(_approx(v, g.ndim) + eps1)
            rms = jnp.sqrt(jnp.mean(jnp.square(u))) + 1e-30
            u = u / jnp.maximum(1.0, rms / clip_threshold)
            m = b1 * m + (1 - b1) * u
            inst = jnp.square(u - m) + eps2
            s = _update_factored(s, inst, b3)
            upd = m * jax.lax.rsqrt(_approx(s, g.ndim) + eps2)
            if weight_decay and p is not None:
                upd = upd + weight_decay * p.astype(jnp.float32)
            return (-learning_rate * upd).astype(g.dtype), m, v, s

        leaves_g, treedef = jax.tree.flatten(grads)
        leaves_m = treedef.flatten_up_to(state.m)
        leaves_v = treedef.flatten_up_to(state.v)
        leaves_s = treedef.flatten_up_to(state.s)
        leaves_p = treedef.flatten_up_to(params) if params is not None else \
            [None] * len(leaves_g)
        out = [per_leaf(g, m, v, s, p) for g, m, v, s, p in
               zip(leaves_g, leaves_m, leaves_v, leaves_s, leaves_p)]
        updates = treedef.unflatten([o[0] for o in out])
        new_m = treedef.unflatten([o[1] for o in out])
        new_v = treedef.unflatten([o[2] for o in out])
        new_s = treedef.unflatten([o[3] for o in out])
        return updates, CAMEState(state.count + 1, new_m, new_v, new_s)

    return optax.GradientTransformation(init, update)

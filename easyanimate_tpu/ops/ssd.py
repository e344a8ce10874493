"""Mamba2 (state-space duality) block in pure JAX.

Parity target: the `mamba_ssm.Mamba2` CUDA module the reference's V4
hybrid_attention blocks import (attention.py:825-848): in_proj -> short
depthwise causal conv + SiLU over (x,B,C) -> selective state recurrence
h_t = exp(dt_t A) h_{t-1} + dt_t B_t x_t^T, y_t = C_t h_t + D x_t ->
gated RMSNorm -> out_proj.

The recurrence runs as a `jax.lax.associative_scan` over (decay, update)
pairs — O(log L) depth on TPU instead of a sequential scan. This is the
parity implementation; a chunked Pallas SSD kernel is the production path
if the mamba variant ever becomes a hot configuration (the published V4
checkpoints use the basic block, so this branch is exercised by tests
only).
"""
import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Mamba2Config:
    d_model: int = 1536
    d_state: int = 64
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    ngroups: int = 1

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def nheads(self) -> int:
        return self.d_inner // self.headdim


def _ssd_scan(x, dt, A, B, C, D):
    """x: (b, l, h, p); dt: (b, l, h); A: (h,); B, C: (b, l, g, n).

    Returns y = C_t · h_t + D x_t with
    h_t = exp(dt_t A_h) h_{t-1} + dt_t B_t x_t^T  (h: (h, p, n) per step).
    """
    b, l, h, p = x.shape
    g = B.shape[2]
    rep = h // g
    Bh = jnp.repeat(B, rep, axis=2)      # (b, l, h, n)
    Ch = jnp.repeat(C, rep, axis=2)
    decay = jnp.exp(dt * A[None, None])  # (b, l, h)
    # update_t = dt_t * x_t ⊗ B_t : (b, l, h, p, n)
    upd = (dt[..., None, None] * x[..., :, None] * Bh[..., None, :])

    def combine(left, right):
        a1, u1 = left
        a2, u2 = right
        return a1 * a2, u1 * a2[..., None, None] + u2

    dec, hs = jax.lax.associative_scan(
        combine, (decay, upd), axis=1)
    y = jnp.einsum("blhpn,blhn->blhp", hs, Ch)
    return y + D[None, None, :, None] * x


class Mamba2Block(nn.Module):
    """Weight layout mirrors mamba_ssm.Mamba2 for checkpoint conversion:
    in_proj/out_proj (no bias), depthwise conv1d over (x,B,C), dt_bias,
    A_log, D, gated RMSNorm."""

    cfg: Mamba2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, u):  # (b, l, d_model)
        cfg = self.cfg
        b, l, _ = u.shape
        di, n, hd = cfg.d_inner, cfg.d_state, cfg.headdim
        nh, g = cfg.nheads, cfg.ngroups
        conv_dim = di + 2 * g * n
        proj = nn.Dense(2 * di + 2 * g * n + nh, use_bias=False,
                        dtype=self.dtype, name="in_proj")(u)
        z, xBC, dt = jnp.split(proj, [di, di + conv_dim], axis=-1)

        # depthwise causal conv over time (d_conv taps)
        kern = self.param("conv1d_weight", nn.initializers.lecun_normal(),
                          (cfg.d_conv, 1, conv_dim), jnp.float32)
        cbias = self.param("conv1d_bias", nn.initializers.zeros,
                           (conv_dim,), jnp.float32)
        xBC = jax.lax.conv_general_dilated(
            xBC.astype(self.dtype), kern.astype(self.dtype),
            window_strides=(1,), padding=[(cfg.d_conv - 1, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=conv_dim) + cbias.astype(self.dtype)
        xBC = nn.silu(xBC)
        x, B, C = jnp.split(xBC, [di, di + g * n], axis=-1)

        dt_bias = self.param("dt_bias", nn.initializers.zeros, (nh,),
                             jnp.float32)
        A_log = self.param("A_log", nn.initializers.zeros, (nh,), jnp.float32)
        D = self.param("D", nn.initializers.ones, (nh,), jnp.float32)
        dt = jax.nn.softplus(dt.astype(jnp.float32) + dt_bias)
        A = -jnp.exp(A_log)

        y = _ssd_scan(x.reshape(b, l, nh, hd).astype(jnp.float32), dt, A,
                      B.reshape(b, l, g, n).astype(jnp.float32),
                      C.reshape(b, l, g, n).astype(jnp.float32), D)
        y = y.reshape(b, l, di)

        # gated RMSNorm (RMSNormGated, norm_before_gate=False)
        w = self.param("norm_weight", nn.initializers.ones, (di,),
                       jnp.float32)
        gated = y * jax.nn.silu(z.astype(jnp.float32))
        var = jnp.mean(gated * gated, axis=-1, keepdims=True)
        y = gated * jax.lax.rsqrt(var + 1e-5) * w
        return nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype,
                        name="out_proj")(y.astype(self.dtype))

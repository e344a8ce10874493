"""Training losses & timestep samplers.

Parity targets in scripts/train.py:
  flow matching: density-weighted sigma sampling (:2022-2030), sigma-interp
  noising x_t=(1-s)x0+s*eps (:2032-2038), target = eps - x0
  custom_mse_loss outlier mask |diff|<=50 (:2059-2076)
  DiscreteSampling rank-banded timesteps (utils/discrete_sampler.py:11-40) -
  here banded by batch index, which is the same partition under GSPMD
  (batch elements are laid out over the dp axis).
"""
import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FlowMatchLossConfig:
    num_train_timesteps: int = 1000
    shift: float = 3.0
    weighting_scheme: str = "logit_normal"  # 'logit_normal'|'mode'|'uniform'
    logit_mean: float = 0.0
    logit_std: float = 1.0
    mode_scale: float = 1.29
    uniform_bands: int = 0   # >0: DiscreteSampling-style banding over batch
    loss_outlier_threshold: float = 50.0


def sample_flow_sigmas(rng: jax.Array, batch: int,
                       cfg: FlowMatchLossConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (sigmas [B], timesteps [B]) with density weighting + shift."""
    if cfg.weighting_scheme == "logit_normal":
        u = jax.random.normal(rng, (batch,)) * cfg.logit_std + cfg.logit_mean
        u = jax.nn.sigmoid(u)
    elif cfg.weighting_scheme == "mode":
        u = jax.random.uniform(rng, (batch,))
        u = 1 - u - cfg.mode_scale * (jnp.cos(jnp.pi * u / 2) ** 2 - 1 + u)
    else:
        u = jax.random.uniform(rng, (batch,))

    if cfg.uniform_bands > 1:
        # band b covers [b/n, (b+1)/n); batch index selects the band
        band = jnp.arange(batch) % cfg.uniform_bands
        u = (band + u) / cfg.uniform_bands

    idx = jnp.clip((u * cfg.num_train_timesteps).astype(jnp.int32), 0,
                   cfg.num_train_timesteps - 1)
    base = (idx.astype(jnp.float32) + 1.0) / cfg.num_train_timesteps
    sigmas = cfg.shift * base / (1 + (cfg.shift - 1) * base)
    timesteps = sigmas * cfg.num_train_timesteps
    return sigmas, timesteps


def flow_noise_and_target(latents: jnp.ndarray, noise: jnp.ndarray,
                          sigmas: jnp.ndarray):
    """x_t = (1-s) x0 + s eps; target = eps - x0 (train.py:2032-2038)."""
    s = sigmas.reshape(sigmas.shape[0], *([1] * (latents.ndim - 1)))
    s = s.astype(jnp.float32)
    x0 = latents.astype(jnp.float32)
    eps = noise.astype(jnp.float32)
    noisy = (1.0 - s) * x0 + s * eps
    target = eps - x0
    return noisy.astype(latents.dtype), target


def masked_mse_loss(pred: jnp.ndarray, target: jnp.ndarray,
                    threshold: float = 50.0,
                    weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """MSE over elements where |pred - target| <= threshold
    (train.py custom_mse_loss)."""
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    mask = (jnp.abs(diff) <= threshold).astype(jnp.float32)
    sq = jnp.square(diff) * mask
    if weights is not None:
        w = weights.reshape(weights.shape[0], *([1] * (diff.ndim - 1)))
        sq = sq * w.astype(jnp.float32)
    return jnp.sum(sq) / jnp.maximum(jnp.sum(mask), 1.0)


def ddpm_sample_timesteps(rng: jax.Array, batch: int, num_train: int = 1000,
                          uniform_bands: int = 0) -> jnp.ndarray:
    if uniform_bands > 1:
        band = jnp.arange(batch) % uniform_bands
        width = num_train // uniform_bands
        off = jax.random.randint(rng, (batch,), 0, width)
        return band * width + off
    return jax.random.randint(rng, (batch,), 0, num_train)


def motion_sub_mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """MSE between temporal deltas of pred and target over the frame axis
    (latents are (B, C, T, H, W); train.py:2078-2081)."""
    dp = pred.astype(jnp.float32)[:, :, 1:] - pred.astype(jnp.float32)[:, :, :-1]
    dt = (target.astype(jnp.float32)[:, :, 1:]
          - target.astype(jnp.float32)[:, :, :-1])
    return jnp.mean(jnp.square(dp - dt))


def with_motion_sub_loss(loss, pred, target, ratio: float):
    """loss*(1-r) + motion_sub_mse*r, active only when T > 2
    (train.py:2078-2082)."""
    if pred.ndim < 5 or pred.shape[2] <= 2:
        return loss
    return loss * (1.0 - ratio) + motion_sub_mse(pred, target) * ratio

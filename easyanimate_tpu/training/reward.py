"""Reward backpropagation (DRaFT / DRTune) for LoRA fine-tuning.

Parity target: scripts/train_reward_lora.py -- the full sampling loop runs
inside autograd (:1515-1560); gradients flow only through steps chosen by a
strategy (last / uniform / random-interval, :1496-1512); DRTune additionally
detaches the latent input of backprop steps (:1527-1530); only the first
`num_decoded_latents` latent frames are decoded (with rematerialized VAE
decode, :1147-1154,1564-1573) and scored by a differentiable reward.

TPU design: the denoise loop is a lax.scan whose body routes noise_pred
through lax.cond(select, identity, stop_gradient) -- cond differentiates
per-branch, so non-selected steps contribute no transformer backward while
the scan carry stays differentiable. Reward models are pluggable callables
`frames (B,T,H,W,C in [0,1]) -> scalar reward` (HPS/PickScore/aesthetic
heads plug in via models/reward once their weights are supplied).
"""
import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.vae import vae_decode
from ..pipeline.schedulers import FlowMatchEulerConfig, flow_match_schedule
from .lora import LoRAConfig, lora_init, merge_lora
from .trainer import TrainState, make_optimizer


@dataclasses.dataclass(frozen=True)
class RewardConfig:
    num_sample_steps: int = 50
    backprop_strategy: str = "last"   # 'last' | 'tail' | 'uniform' | 'random'
    backprop_num_steps: int = 5
    stop_latent_model_input_gradient: bool = False  # DRTune
    num_decoded_latents: int = 1
    guidance_scale: float = 6.0


def backprop_step_mask(cfg: RewardConfig, rng: jax.Array) -> jnp.ndarray:
    """bool[num_sample_steps]; True = gradient flows through that step."""
    n = cfg.num_sample_steps
    idx = jnp.arange(n)
    if cfg.backprop_strategy == "last":
        return idx == n - 1
    if cfg.backprop_strategy == "tail":
        return idx >= n - cfg.backprop_num_steps
    if cfg.backprop_strategy == "uniform":
        stride = max(n // cfg.backprop_num_steps, 1)
        return (idx % stride) == (stride - 1)
    if cfg.backprop_strategy == "random":
        start = jax.random.randint(rng, (), 0, n - cfg.backprop_num_steps + 1)
        return (idx >= start) & (idx < start + cfg.backprop_num_steps)
    raise ValueError(cfg.backprop_strategy)


def make_reward_train_step(
    model,
    vae,
    vae_params: Any,
    base_params: Any,
    reward_fn: Callable[[jnp.ndarray], jnp.ndarray],
    cfg: RewardConfig,
    lora_cfg: LoRAConfig,
    train_cfg,
    scheduler: FlowMatchEulerConfig = FlowMatchEulerConfig(),
    vae_scaling: float = 1.0,
) -> Tuple[Callable, Callable]:
    tx = make_optimizer(train_cfg)
    timesteps, sigmas = flow_match_schedule(scheduler, cfg.num_sample_steps,
                                            mu=1.0)
    per_step = jnp.asarray(
        np.stack([timesteps, sigmas[:-1], sigmas[1:]], axis=1))

    def init_fn(rng):
        lora = lora_init(base_params["params"], lora_cfg, rng)
        return TrainState(step=jnp.zeros((), jnp.int32), params=lora,
                          opt_state=tx.init(lora), ema_params=None)

    def sample_and_reward(lora, batch, rng):
        params = {"params": merge_lora(base_params["params"], lora, lora_cfg)}
        txt = batch["text"]
        neg = batch.get("negative_text", jnp.zeros_like(txt))
        rope = batch.get("rope")
        shape = batch["latent_shape"]
        r_noise, r_sel = jax.random.split(rng)
        latents = jax.random.normal(r_noise, shape, jnp.float32)
        sel = backprop_step_mask(cfg, r_sel)
        txt_cfgd = jnp.concatenate([neg, txt])

        def body(lat, inp):
            step, selected = inp
            t, sigma, sigma_next = step[0], step[1], step[2]
            lat_in = lat
            if cfg.stop_latent_model_input_gradient:  # DRTune
                lat_in = jax.lax.stop_gradient(lat_in)
            both = jnp.concatenate([lat_in, lat_in]).astype(model.cfg.jdtype)
            t_vec = jnp.full((both.shape[0],), t, jnp.float32)
            pred = model.apply(params, both, t_vec, txt_cfgd, rope)
            pred = pred[:, :shape[1]]
            u, c = jnp.split(pred, 2)
            pred = u + cfg.guidance_scale * (c - u)
            pred = jax.lax.cond(selected, lambda p: p,
                                jax.lax.stop_gradient, pred)
            lat = lat + (sigma_next - sigma) * pred.astype(jnp.float32)
            return lat, None

        latents, _ = jax.lax.scan(body, latents, (per_step, sel))
        # decode only the first frames, rematerialized
        lat_dec = latents[:, :, : cfg.num_decoded_latents]
        decode = jax.checkpoint(
            lambda z: vae_decode(vae, vae_params,
                                 (z / vae_scaling).astype(vae.cfg.jdtype)))
        frames = decode(lat_dec)
        frames = jnp.clip(frames.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
        frames = jnp.transpose(frames, (0, 2, 3, 4, 1))  # B,T,H,W,C
        reward = reward_fn(frames)
        return -jnp.mean(reward), jnp.mean(reward)

    def step(state: TrainState, batch, rng):
        (loss, reward), grads = jax.value_and_grad(
            sample_and_reward, has_aux=True)(state.params, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_lora = optax.apply_updates(state.params, updates)
        return (state.replace(step=state.step + 1, params=new_lora,
                              opt_state=new_opt),
                {"loss": loss, "reward": reward,
                 "grad_norm": optax.global_norm(grads)})

    return init_fn, step

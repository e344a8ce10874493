"""SFT train step for the MMDiT (flow matching), GSPMD-shardable.

Replaces the reference's accelerate+DeepSpeed ZeRO-2 loop (train.py:1649-2207)
with one jitted step over a (dp, sp, tp) mesh: gradients/optimizer state are
sharded by GSPMD according to the parameter PartitionSpecs (ZeRO falls out of
the specs), collectives are compiler-inserted.

The step takes *latents* + *text embeds* (VAE/text encoding happen in the
input pipeline or a separate encode program, mirroring the reference's
no-grad VAE encode on side CUDA streams, train.py:1790-1880).
"""
import dataclasses
from typing import Any, Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.mmdit import EasyAnimateTransformer3D
from ..pipeline.t2v import build_rope
from .losses import (
    FlowMatchLossConfig,
    flow_noise_and_target,
    masked_mse_loss,
    sample_flow_sigmas,
)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 2e-5
    weight_decay: float = 3e-2
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-10
    max_grad_norm: float = 0.05
    ema_decay: float = 0.9999
    use_ema: bool = False
    # 'flow' (V5.1), 'ddpm' (plain eps MSE), 'sigma' (IDDPM learned-range VB)
    # -- the reference's three loss modes (train.py:938-942, 2022-2076)
    loss_type: str = "flow"
    loss: FlowMatchLossConfig = dataclasses.field(default_factory=FlowMatchLossConfig)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            cfg.learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2,
            eps=cfg.adam_eps, weight_decay=cfg.weight_decay,
        ),
    )


def create_train_state(params, cfg: TrainConfig) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params["params"]),
        ema_params=jax.tree.map(jnp.copy, params["params"]) if cfg.use_ema else None,
    )


def make_train_step(
    model: EasyAnimateTransformer3D,
    cfg: TrainConfig,
) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics).

    batch: dict with
      latents (B, C, T, H, W)  - VAE-encoded, already scaled
      text    (B, S, D)        - text-encoder hidden states
      rope    (cos, sin)       - prebuilt for the bucket's shape
      optional inpaint_latents / control_latents
    """
    tx = make_optimizer(cfg)

    def apply_model(params, noisy, timesteps, batch):
        return model.apply(
            {"params": params}, noisy, timesteps, batch["text"],
            batch.get("rope"),
            inpaint_latents=batch.get("inpaint_latents"),
            control_latents=batch.get("control_latents"),
        )

    if cfg.loss_type in ("ddpm", "sigma"):
        from ..pipeline.schedulers import DDIMConfig
        from ..utils.diffusion import GaussianDiffusion

        gd = GaussianDiffusion.from_config(DDIMConfig(
            num_train_timesteps=cfg.loss.num_train_timesteps))

    def loss_fn(params, batch, rng):
        latents = batch["latents"]
        b = latents.shape[0]
        rng_sigma, rng_noise = jax.random.split(rng)
        if cfg.loss_type == "flow":
            sigmas, timesteps = sample_flow_sigmas(rng_sigma, b, cfg.loss)
            noise = jax.random.normal(rng_noise, latents.shape, jnp.float32)
            noisy, target = flow_noise_and_target(latents, noise, sigmas)
            pred = apply_model(params, noisy, timesteps, batch)
            loss = masked_mse_loss(pred, target,
                                   cfg.loss.loss_outlier_threshold)
            return loss, {"loss": loss, "mean_sigma": jnp.mean(sigmas)}
        # DDPM-family: uniform/banded integer timesteps
        from .losses import ddpm_sample_timesteps

        t = ddpm_sample_timesteps(rng_sigma, b, cfg.loss.num_train_timesteps,
                                  cfg.loss.uniform_bands)
        loss, aux = gd.training_losses(
            lambda xt, ti: apply_model(params, xt, ti.astype(jnp.float32),
                                       batch),
            latents, t, rng_noise, learn_sigma=cfg.loss_type == "sigma")
        return loss, aux

    def step(state: TrainState, batch, rng) -> Tuple[TrainState, dict]:
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params["params"], batch, rng)
        gnorm = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state,
                                     state.params["params"])
        new_params = optax.apply_updates(state.params["params"], updates)
        ema = state.ema_params
        if ema is not None:
            d = cfg.ema_decay
            ema = jax.tree.map(lambda e, p: d * e + (1 - d) * p, ema, new_params)
        metrics["grad_norm"] = gnorm
        return (
            state.replace(step=state.step + 1,
                          params={"params": new_params},
                          opt_state=new_opt, ema_params=ema),
            metrics,
        )

    return step

"""SFT train step for the MMDiT (flow matching), GSPMD-shardable.

Replaces the reference's accelerate+DeepSpeed ZeRO-2 loop (train.py:1649-2207)
with one jitted step over a (dp, sp, tp) mesh: gradients/optimizer state are
sharded by GSPMD according to the parameter PartitionSpecs (ZeRO falls out of
the specs), collectives are compiler-inserted.

Reference loop features carried over:
  - LR schedules with warmup (train.py:1504-1510, diffusers get_scheduler)
  - trainable-module filter + dual learning rate: params matching
    `trainable_modules` train at lr, `trainable_modules_low_lr` at lr/2,
    everything else is frozen (train.py:1090-1094, 1207-1251)
  - adaptive gradient clipping: the clip threshold linearly decays from
    initial_grad_norm_ratio*max_grad_norm to max_grad_norm over
    abnormal_norm_clip_start steps, and abnormal norms (>5x threshold) are
    clipped up to 10x harder (train.py:2116-2137)
  - gradient accumulation (train.py:881-886; optax.MultiSteps)
  - optimizers: AdamW / CAME / 8-bit AdamW (train.py:1186-1203)

The step takes *latents* + *text embeds* (VAE/text encoding happen in the
input pipeline or a separate encode program, mirroring the reference's
no-grad VAE encode on side CUDA streams, train.py:1790-1880).

Dual-LR/freezing is built from stateless per-leaf update scaling rather than
optax.multi_transform, so `optax.tree_map_params` keeps working for
ZeRO-style optimizer-state sharding (parallel/: state specs inherit param
specs).
"""
import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.mmdit import EasyAnimateTransformer3D
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
    # optimizer family: 'adamw' | 'came' | 'adamw8bit' (train.py:1186-1203)
    optimizer: str = "adamw"
    # LR schedule (train.py:1504-1510): 'constant' | 'linear' | 'cosine'
    lr_scheduler: str = "constant"
    lr_warmup_steps: int = 0
    max_train_steps: int = 10_000  # schedule horizon
    # gradient accumulation (train.py:881-886)
    gradient_accumulation_steps: int = 1
    # trainable-module filter + dual LR (train.py:1090-1094, 1207-1251):
    # substring match over '/'-joined param paths. None = train everything.
    trainable_modules: Optional[Sequence[str]] = None
    trainable_modules_low_lr: Sequence[str] = ()
    # adaptive clip (train.py:2116-2137); False = fixed clip_by_global_norm
    adaptive_grad_clip: bool = False
    initial_grad_norm_ratio: float = 5.0
    abnormal_norm_clip_start: int = 1000
    # motion sub-loss on temporal deltas (train.py:704-707, 2078-2082)
    motion_sub_loss: bool = False
    motion_sub_loss_ratio: float = 0.25


# -- schedules ---------------------------------------------------------------


def make_lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    """diffusers get_scheduler parity for the modes the reference uses.

    Horizon is in OPTIMIZER updates: under MultiSteps the inner schedule
    advances once per gradient_accumulation_steps micro-steps, so the
    micro-step counts divide by k (accelerate counts warmup/total in
    optimizer steps too)."""
    base = cfg.learning_rate
    k = max(cfg.gradient_accumulation_steps, 1)
    warm = cfg.lr_warmup_steps // k
    total = max(cfg.max_train_steps // k, warm + 1)
    if cfg.lr_scheduler == "constant":
        if warm == 0:
            return optax.constant_schedule(base)
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base, warm),
             optax.constant_schedule(base)], [warm])
    if cfg.lr_scheduler == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base, warm),
             optax.linear_schedule(base, 0.0, total - warm)], [warm])
    if cfg.lr_scheduler == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, base, warm, total, end_value=0.0)
    raise ValueError(f"unknown lr_scheduler {cfg.lr_scheduler!r}")


# -- adaptive clip (reference train.py:2116-2137) ----------------------------


def adaptive_clip_by_global_norm(
    max_grad_norm: float, initial_ratio: float, decay_steps: int
) -> optax.GradientTransformation:
    """torch clip_grad_norm_ with the reference's decaying/abnormal rules.

    threshold(step) decays linearly from initial_ratio*max_grad_norm to
    max_grad_norm over decay_steps; once step > decay_steps, a gradient norm
    exceeding 5x the threshold is clipped to threshold/min(norm/threshold,10).
    """

    def init_fn(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros((), jnp.int32))

    def update_fn(updates, state, params=None):
        del params
        step = state.count
        frac = jnp.clip(step.astype(jnp.float32) / max(decay_steps, 1), 0.0, 1.0)
        thresh = (initial_ratio + (1.0 - initial_ratio) * frac) * max_grad_norm
        gnorm = optax.global_norm(updates)
        abnormal = (gnorm / thresh > 5.0) & (step > decay_steps)
        actual = jnp.where(
            abnormal, thresh / jnp.minimum(gnorm / thresh, 10.0), thresh)
        scale = jnp.minimum(1.0, actual / (gnorm + 1e-12))
        updates = jax.tree.map(lambda g: g * scale, updates)
        return updates, optax.ScaleByScheduleState(count=step + 1)

    return optax.GradientTransformation(init_fn, update_fn)


# -- trainable filter + dual LR ----------------------------------------------


def _param_paths(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return ["/".join(str(getattr(k, "key", k)) for k in kp) for kp, _ in flat]


def lr_multiplier_tree(params, cfg: TrainConfig):
    """1.0 for trainable, 0.5 for low-lr modules, 0.0 for frozen.

    Matches the reference's substring semantics: a param trains at full lr
    if its name contains any trainable_modules entry, at lr/2 if it only
    matches trainable_modules_low_lr, else it is frozen. trainable_modules
    None (with no low-lr list) trains everything at full lr.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    high = cfg.trainable_modules
    low = tuple(cfg.trainable_modules_low_lr)
    if high is None and not low:
        return jax.tree.unflatten(treedef, [1.0] * len(flat))
    high = tuple(high or ())
    mults = []
    for kp, _ in flat:
        path = "/".join(str(getattr(k, "key", k)) for k in kp)
        if any(m in path for m in high):
            mults.append(1.0)
        elif any(m in path for m in low):
            mults.append(0.5)
        else:
            mults.append(0.0)
    return jax.tree.unflatten(treedef, mults)


def _scale_by_tree(mult_tree) -> optax.GradientTransformation:
    """Stateless per-leaf update scaling (used for freeze + dual LR)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return jax.tree.map(
            lambda g, m: g * m if m != 1.0 else g, updates, mult_tree), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    cfg: TrainConfig, params=None
) -> optax.GradientTransformation:
    """Build the optimizer chain. `params` is needed whenever a trainable
    filter / dual LR is configured (to resolve paths)."""
    mult = None
    if cfg.trainable_modules is not None or cfg.trainable_modules_low_lr:
        if params is None:
            raise ValueError("trainable-module filtering needs `params`")
        mult = lr_multiplier_tree(params, cfg)
        nonzero = jax.tree.map(lambda m: m > 0, mult)
    else:
        nonzero = None

    schedule = make_lr_schedule(cfg)
    if cfg.adaptive_grad_clip:
        clip = adaptive_clip_by_global_norm(
            cfg.max_grad_norm, cfg.initial_grad_norm_ratio,
            cfg.abnormal_norm_clip_start)
    else:
        clip = optax.clip_by_global_norm(cfg.max_grad_norm)

    parts = []
    if mult is not None:
        # zero frozen grads BEFORE the clip so the global norm is the norm
        # over trainable params only (reference computes total_norm over
        # requires_grad params, train.py:2118)
        parts.append(_scale_by_tree(jax.tree.map(
            lambda m: 1.0 if m > 0 else 0.0, mult)))
    parts.append(clip)

    if cfg.optimizer == "came":
        from .came import came

        # came(1.0) emits already-negated unit-lr updates (reference passes
        # CAME no weight decay, train.py:1195-1203); multiply by +lr
        parts.append(came(1.0))
        if mult is not None:
            parts.append(_scale_by_tree(mult))
        parts.append(optax.scale_by_schedule(schedule))
    else:
        if cfg.optimizer == "adamw8bit":
            from .adam8bit import scale_by_adam8bit

            parts.append(scale_by_adam8bit(cfg.adam_b1, cfg.adam_b2,
                                           max(cfg.adam_eps, 1e-8)))
        elif cfg.optimizer == "adamw":
            parts.append(optax.scale_by_adam(
                b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps))
        else:
            raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
        if cfg.weight_decay:
            parts.append(optax.add_decayed_weights(cfg.weight_decay,
                                                   mask=nonzero))
        if mult is not None:
            # dual LR: low-lr modules step at lr/2 (and frozen at 0, again --
            # weight decay must not move frozen params either, hence the mask)
            parts.append(_scale_by_tree(mult))
        parts.append(optax.scale_by_learning_rate(schedule))

    tx = optax.chain(*parts)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(
            tx, every_k_schedule=cfg.gradient_accumulation_steps)
    return tx


def create_train_state(params, cfg: TrainConfig) -> TrainState:
    tx = make_optimizer(cfg, params["params"])
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params["params"]),
        ema_params=jax.tree.map(jnp.copy, params["params"]) if cfg.use_ema else None,
    )


def make_loss_fn(model: EasyAnimateTransformer3D, cfg: TrainConfig) -> Callable:
    """loss_fn(params, batch, rng) -> (loss, metrics) for cfg.loss_type."""

    def apply_model(params, noisy, timesteps, batch):
        return model.apply(
            {"params": params}, noisy, timesteps, batch["text"],
            batch.get("rope"),
            encoder_hidden_states_t5=batch.get("text_t5"),
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
            if cfg.motion_sub_loss:
                from .losses import with_motion_sub_loss

                loss = with_motion_sub_loss(loss, pred, target,
                                            cfg.motion_sub_loss_ratio)
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

    return loss_fn


def make_train_step(
    model: EasyAnimateTransformer3D,
    cfg: TrainConfig,
    params=None,
) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics).

    batch: dict with
      latents (B, C, T, H, W)  - VAE-encoded, already scaled
      text    (B, S, D)        - text-encoder hidden states
      rope    (cos, sin)       - prebuilt for the bucket's shape
      optional inpaint_latents / control_latents
    """
    tx = make_optimizer(cfg, params)
    loss_fn = make_loss_fn(model, cfg)

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


def make_param_grad_norms(model: EasyAnimateTransformer3D,
                          cfg: TrainConfig) -> Callable:
    """Per-parameter grad-norm reporter for abnormal-norm steps
    (reference report_model_info tensorboard dump, train.py:2128-2137).
    Returns fn(params, batch, rng) -> {"path/to/param": norm} (jitted; pay
    one extra fwd+bwd only on the steps you call it)."""
    from flax import traverse_util

    loss_fn = make_loss_fn(model, cfg)

    @jax.jit
    def norms(params, batch, rng):
        grads = jax.grad(lambda p: loss_fn(p, batch, rng)[0])(params)
        flat = traverse_util.flatten_dict(grads, sep="/")
        return {k: jnp.sqrt(jnp.sum(jnp.square(
            v.astype(jnp.float32)))) for k, v in flat.items()}

    return norms

"""LCM-LoRA distillation (latent consistency models).

Parity target: scripts/train_lcm_lora.py -- DDIMSolver over a skipped
timestep grid (:419), boundary scalings c_skip/c_out (:368-376), frozen
teacher producing a CFG-combined x0 estimate and one ODE step to the target
timestep (:2005-2050), huber consistency loss against the target network
(EMA of the student; the reference uses the frozen teacher+LoRA student with
the target computed through the solver).
"""
import dataclasses
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..pipeline.schedulers import DDIMConfig, make_betas
from .lora import LoRAConfig, lora_init, merge_lora
from .trainer import TrainState, make_optimizer


@dataclasses.dataclass(frozen=True)
class LCMConfig:
    num_ddim_timesteps: int = 50
    w_min: float = 3.0
    w_max: float = 15.0
    timestep_scaling: float = 10.0
    sigma_data: float = 0.5
    huber_c: float = 0.001
    ema_decay: float = 0.95


def boundary_scalings(t: jnp.ndarray, cfg: LCMConfig):
    """c_skip/c_out so the consistency fn is the identity at t=0
    (train_lcm_lora.py:368-376)."""
    ts = t.astype(jnp.float32) * cfg.timestep_scaling
    c_skip = cfg.sigma_data ** 2 / (ts ** 2 + cfg.sigma_data ** 2)
    c_out = ts / jnp.sqrt(ts ** 2 + cfg.sigma_data ** 2)
    return c_skip, c_out


class DDIMSolver:
    """Precomputed x0/eps coefficients on the skipped DDIM grid."""

    def __init__(self, sched: DDIMConfig, cfg: LCMConfig):
        alphas_cumprod = np.cumprod(1 - make_betas(sched))
        step = sched.num_train_timesteps // cfg.num_ddim_timesteps
        self.timesteps = (np.arange(1, cfg.num_ddim_timesteps + 1) * step
                          ).round().astype(np.int64) - 1
        self.prev_timesteps = self.timesteps - step
        ac_prev = np.where(self.prev_timesteps >= 0,
                           alphas_cumprod[np.clip(self.prev_timesteps, 0, None)],
                           1.0)
        self.alphas_cumprod = jnp.asarray(alphas_cumprod, jnp.float32)
        self.ac_prev = jnp.asarray(ac_prev, jnp.float32)

    def step(self, x0, eps, idx):
        """x_{t_prev} = sqrt(ac_prev) x0 + sqrt(1-ac_prev) eps."""
        a = self.ac_prev[idx].reshape(-1, *([1] * (x0.ndim - 1)))
        return jnp.sqrt(a) * x0 + jnp.sqrt(1 - a) * eps


def make_lcm_train_step(
    model,
    teacher_params: Any,
    sched: DDIMConfig,
    lcm_cfg: LCMConfig,
    lora_cfg: LoRAConfig,
    train_cfg,
) -> Tuple[Callable, Callable]:
    """Returns (init_fn, step_fn). Student = teacher + LoRA (only LoRA
    trains); the target network is an EMA copy of the LoRA factors."""
    tx = make_optimizer(train_cfg)
    solver = DDIMSolver(sched, lcm_cfg)
    ac = solver.alphas_cumprod

    def init_fn(rng):
        lora = lora_init(teacher_params["params"], lora_cfg, rng)
        return TrainState(step=jnp.zeros((), jnp.int32), params=lora,
                          opt_state=tx.init(lora),
                          ema_params=jax.tree.map(jnp.copy, lora))

    def pred_x0_eps(params, xt, t, txt, rope, cond):
        out = model.apply(params, xt, t.astype(jnp.float32), txt, rope, **cond)
        c = xt.shape[1]
        eps = out[:, :c].astype(jnp.float32)
        a = ac[t].reshape(-1, *([1] * (xt.ndim - 1)))
        x0 = (xt.astype(jnp.float32) - jnp.sqrt(1 - a) * eps) / jnp.sqrt(a)
        return x0, eps

    def loss_fn(lora, batch, rng):
        latents = batch["latents"].astype(jnp.float32)
        txt = batch["text"]
        neg_txt = batch.get("negative_text", jnp.zeros_like(txt))
        rope = batch.get("rope")
        cond = {}
        b = latents.shape[0]
        r_idx, r_noise, r_w = jax.random.split(rng, 3)
        idx = jax.random.randint(r_idx, (b,), 0, lcm_cfg.num_ddim_timesteps)
        t = jnp.asarray(solver.timesteps)[idx]
        t_prev = jnp.clip(jnp.asarray(solver.prev_timesteps)[idx], 0, None)
        w = jax.random.uniform(r_w, (b,), minval=lcm_cfg.w_min,
                               maxval=lcm_cfg.w_max)
        wb = w.reshape(-1, *([1] * (latents.ndim - 1)))

        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        a = ac[t].reshape(-1, *([1] * (latents.ndim - 1)))
        xt = jnp.sqrt(a) * latents + jnp.sqrt(1 - a) * noise
        xt = xt.astype(batch["latents"].dtype)

        student = {"params": merge_lora(teacher_params["params"], lora, lora_cfg)}
        x0_s, _ = pred_x0_eps(student, xt, t, txt, rope, cond)
        c_skip, c_out = boundary_scalings(t, lcm_cfg)
        cs = c_skip.reshape(-1, *([1] * (latents.ndim - 1)))
        co = c_out.reshape(-1, *([1] * (latents.ndim - 1)))
        model_pred = cs * xt.astype(jnp.float32) + co * x0_s

        # teacher: CFG x0/eps estimate, one ODE step to t_prev
        x0_c, eps_c = pred_x0_eps(teacher_params, xt, t, txt, rope, cond)
        x0_u, eps_u = pred_x0_eps(teacher_params, xt, t, neg_txt, rope, cond)
        x0_t = x0_c + wb * (x0_c - x0_u)
        eps_t = eps_c + wb * (eps_c - eps_u)
        x_prev = solver.step(x0_t, eps_t, idx)
        x_prev = jax.lax.stop_gradient(x_prev)

        # target network (EMA LoRA) at t_prev
        def target_consistency(ema_lora):
            tgt = {"params": merge_lora(teacher_params["params"], ema_lora,
                                        lora_cfg)}
            x0_tn, _ = pred_x0_eps(tgt, x_prev.astype(batch["latents"].dtype),
                                   t_prev, txt, rope, cond)
            cs_p, co_p = boundary_scalings(t_prev, lcm_cfg)
            csp = cs_p.reshape(-1, *([1] * (latents.ndim - 1)))
            cop = co_p.reshape(-1, *([1] * (latents.ndim - 1)))
            return csp * x_prev + cop * x0_tn

        target = jax.lax.stop_gradient(target_consistency(batch["_ema"]))
        # huber
        diff = model_pred - target
        loss = jnp.mean(jnp.sqrt(jnp.square(diff) + lcm_cfg.huber_c ** 2)
                        - lcm_cfg.huber_c)
        return loss

    def step(state: TrainState, batch, rng):
        batch = dict(batch)
        batch["_ema"] = state.ema_params
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_lora = optax.apply_updates(state.params, updates)
        d = lcm_cfg.ema_decay
        new_ema = jax.tree.map(lambda e, p: d * e + (1 - d) * p,
                               state.ema_params, new_lora)
        return (state.replace(step=state.step + 1, params=new_lora,
                              opt_state=new_opt, ema_params=new_ema),
                {"loss": loss, "grad_norm": optax.global_norm(grads)})

    return init_fn, step

"""VAE (MagViT) GAN training: two optimizers, alternating steps.

Parity target: AutoencoderKLMagvit_fromOmnigen.training_step /
configure_optimizers (vae/ldm/models/omnigen_casual3dcnn.py:258-339) -- the
Lightning optimizer_idx alternation becomes two explicit jitted steps
(`ae_step`, `disc_step`) sharing the loss pieces from vae_losses.py. The
adaptive GAN weight uses gradient norms w.r.t. the decoder's final conv, as
in the reference's get_last_layer trick.
"""
import dataclasses
from typing import Any, Callable, Optional, Tuple

import flax
import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.vae import AutoencoderKLMagvit, gaussian_sample
from .vae_losses import (
    Discriminator3D,
    VAELossConfig,
    adaptive_gan_weight,
    hinge_d_loss,
    hinge_g_loss,
    kl_and_outlier_loss,
    reconstruction_loss,
)


@flax.struct.dataclass
class VAETrainState:
    step: jnp.ndarray
    vae_params: Any
    disc_params: Any
    vae_opt: Any
    disc_opt: Any
    ema_params: Any = None


@dataclasses.dataclass(frozen=True)
class VAETrainConfig:
    learning_rate: float = 1e-4
    disc_learning_rate: float = 1e-4
    use_ema: bool = False
    ema_decay: float = 0.9999
    loss: VAELossConfig = dataclasses.field(default_factory=VAELossConfig)


def create_vae_train_state(vae_params, disc_params,
                           cfg: VAETrainConfig) -> VAETrainState:
    vae_tx = optax.adam(cfg.learning_rate, b1=0.5, b2=0.9)
    disc_tx = optax.adam(cfg.disc_learning_rate, b1=0.5, b2=0.9)
    return VAETrainState(
        step=jnp.zeros((), jnp.int32),
        vae_params=vae_params, disc_params=disc_params,
        vae_opt=vae_tx.init(vae_params), disc_opt=disc_tx.init(disc_params),
        ema_params=jax.tree.map(jnp.copy, vae_params) if cfg.use_ema else None)


def make_vae_train_steps(
    vae: AutoencoderKLMagvit,
    disc: Discriminator3D,
    cfg: VAETrainConfig,
    lpips_apply: Optional[Callable] = None,
) -> Tuple[Callable, Callable]:
    """Returns (ae_step, disc_step); batch = {'video': (B,T,H,W,C) in [-1,1]}."""
    vae_tx = optax.adam(cfg.learning_rate, b1=0.5, b2=0.9)
    disc_tx = optax.adam(cfg.disc_learning_rate, b1=0.5, b2=0.9)
    lcfg = cfg.loss

    def reconstruct(vae_params, video, rng):
        moments, _ = vae.apply(vae_params, video, None,
                               method=vae.encode_chunk)
        z = gaussian_sample(moments, rng)
        recon, _ = vae.apply(vae_params, z, None, method=vae.decode_chunk)
        return recon, moments

    def _last_kernel_path(params):
        return ("params", "decoder", "conv_out", "kernel")

    def _split_last(params):
        path = _last_kernel_path(params)
        flat = flax.traverse_util.flatten_dict(params)
        last = flat.pop(path)
        return flat, last, path

    def ae_step(state: VAETrainState, batch, rng):
        video = batch["video"]
        flat, last, path = _split_last(state.vae_params)

        def nll_loss(last_kernel, flat_rest):
            f = dict(flat_rest)
            f[path] = last_kernel
            p = flax.traverse_util.unflatten_dict(f)
            recon, moments = reconstruct(p, video, rng)
            rec, aux = reconstruction_loss(lcfg, video, recon, lpips_apply)
            kl = kl_and_outlier_loss(lcfg, moments)
            return rec + kl, (recon, aux)

        def gan_loss(last_kernel, flat_rest):
            f = dict(flat_rest)
            f[path] = last_kernel
            p = flax.traverse_util.unflatten_dict(f)
            recon, _ = reconstruct(p, video, rng)
            logits = disc.apply(state.disc_params, recon)
            return hinge_g_loss(logits)

        # adaptive weight from last-layer grad norms
        g_nll = jax.grad(lambda lk: nll_loss(lk, flat)[0])(last)
        g_gan = jax.grad(lambda lk: gan_loss(lk, flat))(last)
        d_weight = adaptive_gan_weight(
            jnp.linalg.norm(g_nll), jnp.linalg.norm(g_gan), lcfg.disc_weight)
        disc_on = (state.step >= lcfg.disc_start).astype(jnp.float32)

        def total_loss(params):
            recon, moments = reconstruct(params, video, rng)
            rec, aux = reconstruction_loss(lcfg, video, recon, lpips_apply)
            kl = kl_and_outlier_loss(lcfg, moments)
            g = hinge_g_loss(disc.apply(state.disc_params, recon))
            loss = rec + kl + disc_on * d_weight * g
            aux.update({"kl": kl, "g_loss": g, "d_weight": d_weight,
                        "loss": loss})
            return loss, aux

        (_, aux), grads = jax.value_and_grad(total_loss, has_aux=True)(
            state.vae_params)
        updates, new_opt = vae_tx.update(grads, state.vae_opt, state.vae_params)
        new_params = optax.apply_updates(state.vae_params, updates)
        ema = state.ema_params
        if ema is not None:
            d = cfg.ema_decay
            ema = jax.tree.map(lambda e, p: d * e + (1 - d) * p, ema,
                               new_params)
        return state.replace(step=state.step + 1, vae_params=new_params,
                             vae_opt=new_opt, ema_params=ema), aux

    def disc_step(state: VAETrainState, batch, rng):
        video = batch["video"]
        recon, _ = reconstruct(state.vae_params, video, rng)
        recon = jax.lax.stop_gradient(recon)

        def loss_fn(dp):
            real = disc.apply(dp, video)
            fake = disc.apply(dp, recon)
            return hinge_d_loss(real, fake)

        loss, grads = jax.value_and_grad(loss_fn)(state.disc_params)
        disc_on = (state.step >= cfg.loss.disc_start).astype(jnp.float32)
        grads = jax.tree.map(lambda g: g * disc_on, grads)
        updates, new_opt = disc_tx.update(grads, state.disc_opt,
                                          state.disc_params)
        new_params = optax.apply_updates(state.disc_params, updates)
        return state.replace(disc_params=new_params, disc_opt=new_opt), {
            "disc_loss": loss}

    return ae_step, disc_step

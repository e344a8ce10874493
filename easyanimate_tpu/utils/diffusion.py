"""IDDPM gaussian diffusion math (q/p distributions, learned-range VB loss,
timestep respacing).

Parity target: easyanimate/utils/gaussian_diffusion.py (OpenAI IDDPM port;
training_losses :715-823, _vb_terms_bpd :682) and respace.py (SpacedDiffusion
timestep subsetting). This is the 'sigma' training mode of scripts/train.py
(:938-942) where the model predicts [eps, v] over 2C channels and the VB term
supervises the learned variance interpolation.

All table lookups are gather-by-t and jit/vmap friendly.
"""
import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..pipeline.schedulers import DDIMConfig, make_betas


def _extract(arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """arr[t] broadcast to an ndim-tensor shape (B, 1, 1, ...)."""
    out = arr[t].astype(jnp.float32)
    return out.reshape(t.shape[0], *([1] * (ndim - 1)))


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    betas: Tuple[float, ...]

    @classmethod
    def from_config(cls, cfg: DDIMConfig) -> "GaussianDiffusion":
        return cls(tuple(make_betas(cfg)))

    @classmethod
    def spaced(cls, cfg: DDIMConfig, use_timesteps: Sequence[int]
               ) -> Tuple["GaussianDiffusion", np.ndarray]:
        """SpacedDiffusion: rebuild betas over a timestep subset; returns the
        new diffusion and the original-timestep map (respace.py:12-131)."""
        base = np.cumprod(1.0 - make_betas(cfg))
        use = sorted(use_timesteps)
        new_betas, last = [], 1.0
        for t in use:
            new_betas.append(1 - base[t] / last)
            last = base[t]
        return cls(tuple(new_betas)), np.asarray(use)

    # -- cached tables ------------------------------------------------------

    def _tables(self):
        betas = np.asarray(self.betas, np.float64)
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        ac_prev = np.append(1.0, ac[:-1])
        post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
        post_logvar_clipped = np.log(np.append(post_var[1], post_var[1:]))
        tables = dict(
            betas=betas,
            log_betas=np.log(betas),
            sqrt_ac=np.sqrt(ac),
            sqrt_one_minus_ac=np.sqrt(1 - ac),
            sqrt_recip_ac=np.sqrt(1.0 / ac),
            sqrt_recipm1_ac=np.sqrt(1.0 / ac - 1),
            post_var=post_var,
            post_logvar=post_logvar_clipped,
            post_mean_c0=betas * np.sqrt(ac_prev) / (1.0 - ac),
            post_mean_ct=(1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac),
        )
        return {k: jnp.asarray(v, jnp.float32) for k, v in tables.items()}

    # -- q distributions ----------------------------------------------------

    def q_sample(self, x0, t, noise):
        tb = self._tables()
        nd = x0.ndim
        return (_extract(tb["sqrt_ac"], t, nd) * x0
                + _extract(tb["sqrt_one_minus_ac"], t, nd) * noise)

    def q_posterior(self, x0, xt, t):
        tb = self._tables()
        nd = x0.ndim
        mean = (_extract(tb["post_mean_c0"], t, nd) * x0
                + _extract(tb["post_mean_ct"], t, nd) * xt)
        logvar = _extract(tb["post_logvar"], t, nd)
        return mean, logvar

    def predict_x0_from_eps(self, xt, t, eps):
        tb = self._tables()
        nd = xt.ndim
        return (_extract(tb["sqrt_recip_ac"], t, nd) * xt
                - _extract(tb["sqrt_recipm1_ac"], t, nd) * eps)

    # -- p distribution with learned-range variance ---------------------------

    def p_mean_variance(self, model_out, xt, t, clip_denoised: bool = False):
        """model_out: (B, 2C, ...) -> (mean, logvar, x0). LEARNED_RANGE:
        logvar = frac*log(beta_t) + (1-frac)*log(post_var_t)."""
        tb = self._tables()
        nd = xt.ndim
        c = xt.shape[1]
        eps, var_v = model_out[:, :c], model_out[:, c:]
        min_log = _extract(tb["post_logvar"], t, nd)
        max_log = _extract(tb["log_betas"], t, nd)
        frac = (var_v.astype(jnp.float32) + 1) / 2
        logvar = frac * max_log + (1 - frac) * min_log
        x0 = self.predict_x0_from_eps(xt, t, eps.astype(jnp.float32))
        if clip_denoised:
            x0 = jnp.clip(x0, -1, 1)
        mean, _ = self.q_posterior(x0, xt, t)
        return mean, logvar, x0

    # -- losses ---------------------------------------------------------------

    def vb_terms(self, model_out, x0, xt, t):
        """KL(q(x_{t-1}|x_t,x0) || p(x_{t-1}|x_t)) in bits, with the
        discretized NLL at t=0; mean is stop-gradiented so the VB term only
        trains the variance head (IDDPM trick)."""
        true_mean, true_logvar = self.q_posterior(x0, xt, t)
        c = x0.shape[1]
        frozen_out = jnp.concatenate(
            [jax.lax.stop_gradient(model_out[:, :c]), model_out[:, c:]], axis=1)
        mean, logvar, _ = self.p_mean_variance(frozen_out, xt, t)
        kl = normal_kl(true_mean, true_logvar, mean, logvar)
        kl = jnp.mean(kl, axis=tuple(range(1, kl.ndim))) / jnp.log(2.0)
        nll = -discretized_gaussian_log_likelihood(x0, mean, 0.5 * logvar)
        nll = jnp.mean(nll, axis=tuple(range(1, nll.ndim))) / jnp.log(2.0)
        return jnp.where(t == 0, nll, kl)

    def training_losses(self, model_fn: Callable, x0: jnp.ndarray,
                        t: jnp.ndarray, rng: jax.Array,
                        learn_sigma: bool = True):
        """MSE(eps) + VB; model_fn(xt, t) -> (B, C or 2C, ...)."""
        noise = jax.random.normal(rng, x0.shape, jnp.float32)
        xt = self.q_sample(x0.astype(jnp.float32), t, noise)
        out = model_fn(xt.astype(x0.dtype), t)
        c = x0.shape[1]
        eps_pred = out[:, :c].astype(jnp.float32)
        mse = jnp.mean(jnp.square(eps_pred - noise),
                       axis=tuple(range(1, x0.ndim)))
        total = mse
        aux = {"mse": jnp.mean(mse)}
        if learn_sigma:
            vb = self.vb_terms(out, x0.astype(jnp.float32), xt, t)
            total = total + vb
            aux["vb"] = jnp.mean(vb)
        aux["loss"] = jnp.mean(total)
        return jnp.mean(total), aux

    # -- ancestral sampling step ----------------------------------------------

    def p_sample(self, model_out, xt, t, rng, clip_denoised=True):
        mean, logvar, _ = self.p_mean_variance(model_out, xt, t, clip_denoised)
        noise = jax.random.normal(rng, xt.shape, jnp.float32)
        nonzero = (t != 0).astype(jnp.float32).reshape(-1, *([1] * (xt.ndim - 1)))
        return mean + nonzero * jnp.exp(0.5 * logvar) * noise


def normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + jnp.square(mean1 - mean2) * jnp.exp(-logvar2))


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi)
                                 * (x + 0.044715 * jnp.power(x, 3))))


def discretized_gaussian_log_likelihood(x, means, log_scales):
    """log p(x) for x in [-1,1] discretized to 255 bins (IDDPM)."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.maximum(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.maximum(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.maximum(cdf_delta, 1e-12))))


def space_timesteps(num_timesteps: int, section_counts) -> set:
    """IDDPM respacing spec ('ddimN' or comma counts) -> timestep subset."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            want = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == want:
                    return set(range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {want} steps with ddim")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start, out = 0, []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if count > size:
            raise ValueError(f"cannot divide section of {size} into {count}")
        stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        for _ in range(count):
            out.append(start + round(cur))
            cur += stride
        start += size
    return set(out)

"""IDDPM math tests: posterior identities, VB behavior, respacing."""
import jax
import jax.numpy as jnp
import numpy as np

from easyanimate_tpu.pipeline.schedulers import DDIMConfig
from easyanimate_tpu.utils.diffusion import (
    GaussianDiffusion,
    normal_kl,
    space_timesteps,
)

CFG = DDIMConfig(num_train_timesteps=100, beta_schedule="linear")


def test_q_sample_matches_closed_form(rng):
    gd = GaussianDiffusion.from_config(CFG)
    x0 = jnp.asarray(rng.standard_normal((2, 3, 4, 4)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal(x0.shape).astype(np.float32))
    t = jnp.array([0, 50])
    xt = gd.q_sample(x0, t, noise)
    betas = np.asarray(gd.betas)
    ac = np.cumprod(1 - betas)
    for i, ti in enumerate([0, 50]):
        want = np.sqrt(ac[ti]) * np.asarray(x0[i]) + np.sqrt(1 - ac[ti]) * np.asarray(noise[i])
        np.testing.assert_allclose(np.asarray(xt[i]), want, rtol=1e-5, atol=1e-6)


def test_eps_roundtrip():
    gd = GaussianDiffusion.from_config(CFG)
    x0 = jnp.ones((1, 2, 4, 4)) * 0.3
    noise = jnp.ones_like(x0) * 0.7
    t = jnp.array([33])
    xt = gd.q_sample(x0, t, noise)
    x0_rec = gd.predict_x0_from_eps(xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), rtol=1e-4, atol=1e-5)


def test_vb_zero_when_model_is_true_posterior(rng):
    """If eps_pred == true noise and var_v == -1 (posterior variance), the KL
    term vanishes (for t > 0)."""
    gd = GaussianDiffusion.from_config(CFG)
    x0 = jnp.asarray(rng.standard_normal((1, 2, 4, 4)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal(x0.shape).astype(np.float32))
    t = jnp.array([50])
    xt = gd.q_sample(x0, t, noise)
    model_out = jnp.concatenate([noise, -jnp.ones_like(noise)], axis=1)
    vb = gd.vb_terms(model_out, x0, xt, t)
    assert float(vb[0]) < 1e-5


def test_training_losses_finite_and_vb_gradient_only_on_var(rng):
    gd = GaussianDiffusion.from_config(CFG)
    x0 = jnp.asarray(rng.standard_normal((2, 2, 4, 4)).astype(np.float32))
    t = jnp.array([10, 90])

    def model_fn(xt, t):
        return jnp.concatenate([xt * 0.1, jnp.zeros_like(xt)], axis=1)

    loss, aux = gd.training_losses(model_fn, x0, t, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert aux["vb"] >= 0


def test_spaced_diffusion_preserves_marginals():
    """Respaced alphas_cumprod at kept steps equal the base schedule's."""
    use = sorted(space_timesteps(100, "ddim10"))
    gd_s, t_map = GaussianDiffusion.spaced(CFG, use)
    base = np.cumprod(1 - np.asarray(GaussianDiffusion.from_config(CFG).betas))
    spaced = np.cumprod(1 - np.asarray(gd_s.betas))
    np.testing.assert_allclose(spaced, base[t_map], rtol=1e-10)


def test_space_timesteps_ddim():
    s = space_timesteps(1000, "ddim50")
    assert len(s) == 50 and 0 in s


def test_normal_kl_zero_same_dist():
    kl = normal_kl(jnp.ones(3), jnp.zeros(3), jnp.ones(3), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-7)


def test_p_sample_t0_is_deterministic(rng):
    gd = GaussianDiffusion.from_config(CFG)
    xt = jnp.asarray(rng.standard_normal((1, 2, 4, 4)).astype(np.float32))
    model_out = jnp.concatenate([xt * 0.1, jnp.zeros_like(xt)], axis=1)
    t = jnp.array([0])
    s1 = gd.p_sample(model_out, xt, t, jax.random.PRNGKey(0))
    s2 = gd.p_sample(model_out, xt, t, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)

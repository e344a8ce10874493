"""VAE GAN-training tests on a tiny config."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from easyanimate_tpu.models.vae import AutoencoderKLMagvit, MagvitVAEConfig
from easyanimate_tpu.training.vae_losses import (
    Discriminator2D,
    Discriminator3D,
    LPIPS,
    VAELossConfig,
    hinge_d_loss,
    adaptive_gan_weight,
)
from easyanimate_tpu.training.vae_trainer import (
    VAETrainConfig,
    create_vae_train_state,
    make_vae_train_steps,
)

TINY = MagvitVAEConfig(
    latent_channels=4,
    block_out_channels=(8, 16),
    down_block_types=("SpatialTemporalDownBlock3D", "SpatialDownBlock3D"),
    up_block_types=("SpatialTemporalUpBlock3D", "SpatialUpBlock3D"),
    layers_per_block=1,
    norm_num_groups=4,
    mini_batch_encoder=2,
    chunk_mode="none",
)


def test_discriminators_shapes(rng):
    x3 = jnp.asarray(rng.standard_normal((1, 5, 32, 32, 3)).astype(np.float32))
    d3 = Discriminator3D(base_channels=8, num_layers=2)
    p3 = d3.init(jax.random.PRNGKey(0), x3)
    out3 = d3.apply(p3, x3)
    assert out3.shape[0] == 1 and out3.shape[-1] == 1
    d2 = Discriminator2D(base_channels=8, num_layers=2)
    x2 = x3.reshape(5, 32, 32, 3)
    p2 = d2.init(jax.random.PRNGKey(0), x2)
    assert d2.apply(p2, x2).shape[-1] == 1


def test_hinge_losses():
    real = jnp.array([2.0, 2.0])
    fake = jnp.array([-2.0, -2.0])
    assert float(hinge_d_loss(real, fake)) == 0.0
    assert float(hinge_d_loss(jnp.zeros(2), jnp.zeros(2))) == 1.0


def test_adaptive_weight_clip():
    w = adaptive_gan_weight(jnp.asarray(10.0), jnp.asarray(1e-9), 0.5)
    assert float(w) == 0.5 * 1e4


def test_lpips_zero_for_identical(rng):
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    lp = LPIPS()
    params = lp.init(jax.random.PRNGKey(0), x, x)
    d = lp.apply(params, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
    y = x + 0.5
    d2 = lp.apply(params, x, y)
    assert (np.asarray(d2) > 0).all()


def test_vae_gan_training_steps(rng):
    vae = AutoencoderKLMagvit(TINY)
    vp = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 16, 16, 3)))
    disc = Discriminator3D(base_channels=8, num_layers=2)
    video = jnp.asarray(rng.standard_normal((1, 3, 16, 16, 3)).astype(np.float32))
    dp = disc.init(jax.random.PRNGKey(1), video)

    cfg = VAETrainConfig(loss=VAELossConfig(disc_start=0, perceptual_weight=0.0))
    state = create_vae_train_state(vp, dp, cfg)
    ae_step, disc_step = make_vae_train_steps(vae, disc, cfg, lpips_apply=None)

    batch = {"video": video}
    state, aux = jax.jit(ae_step)(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(aux["loss"]))
    assert np.isfinite(float(aux["d_weight"]))
    state, daux = jax.jit(disc_step)(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(daux["disc_loss"]))
    # a second ae step changes params
    p0 = jax.tree.leaves(state.vae_params)[0]
    state, _ = jax.jit(ae_step)(state, batch, jax.random.PRNGKey(4))
    p1 = jax.tree.leaves(state.vae_params)[0]
    assert np.abs(np.asarray(p1) - np.asarray(p0)).max() > 0

def test_outlier_penalty_matches_reference_semantics(rng):
    """contperceptual.py:56-66: zero for in-distribution values, positive for
    spatial outliers, exact agreement with a numpy re-derivation."""
    from easyanimate_tpu.training.vae_losses import outlier_penalty_loss

    x = rng.standard_normal((2, 3, 8, 8, 4)).astype(np.float32)
    x[0, 0, 0, 0, 0] = 100.0
    got = float(outlier_penalty_loss(jnp.asarray(x), 3.0))
    mean = x.mean(axis=(2, 3), keepdims=True)
    std = x.std(axis=(2, 3), keepdims=True)
    pen = np.maximum(np.abs(x - mean) - 3.0 * std, 0.0)
    want = float((pen.sum(axis=(2, 3)) / (8 * 8)).mean())
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert got > 0
    x2 = rng.standard_normal((1, 2, 8, 8, 4)).astype(np.float32) * 0.01
    assert float(outlier_penalty_loss(jnp.asarray(x2), 3.0)) >= 0.0

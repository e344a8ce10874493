"""LCM distillation + reward-backprop training tests on tiny configs."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from easyanimate_tpu.models.mmdit import PRESETS, EasyAnimateTransformer3D
from easyanimate_tpu.models.vae import AutoencoderKLMagvit, MagvitVAEConfig
from easyanimate_tpu.pipeline.schedulers import DDIMConfig
from easyanimate_tpu.training import TrainConfig
from easyanimate_tpu.training.lcm import (
    DDIMSolver,
    LCMConfig,
    boundary_scalings,
    make_lcm_train_step,
)
from easyanimate_tpu.training.lora import LoRAConfig
from easyanimate_tpu.training.reward import (
    RewardConfig,
    backprop_step_mask,
    make_reward_train_step,
)

TINY_VAE = MagvitVAEConfig(
    latent_channels=4,
    block_out_channels=(8, 16),
    down_block_types=("SpatialTemporalDownBlock3D", "SpatialDownBlock3D"),
    up_block_types=("SpatialTemporalUpBlock3D", "SpatialUpBlock3D"),
    layers_per_block=1,
    norm_num_groups=4,
    mini_batch_encoder=2,
    mini_batch_decoder=1,
    scaling_factor=0.5,
)


def _tiny_model():
    cfg = PRESETS["tiny"]
    model = EasyAnimateTransformer3D(cfg)
    lat = jnp.zeros((1, 4, 2, 8, 8))
    txt = jnp.zeros((1, 5, cfg.text_embed_dim))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt, None)
    return model, cfg, params


def test_boundary_scalings_identity_at_zero():
    cfg = LCMConfig()
    c_skip, c_out = boundary_scalings(jnp.array([0]), cfg)
    np.testing.assert_allclose(float(c_skip[0]), 1.0)
    np.testing.assert_allclose(float(c_out[0]), 0.0, atol=1e-7)


def test_ddim_solver_grid():
    solver = DDIMSolver(DDIMConfig(), LCMConfig(num_ddim_timesteps=50))
    assert solver.timesteps.shape == (50,)
    assert solver.timesteps[-1] == 999
    assert (solver.prev_timesteps == solver.timesteps - 20).all()


def test_lcm_train_step_runs():
    model, cfg, params = _tiny_model()
    init_fn, step_fn = make_lcm_train_step(
        model, params, DDIMConfig(), LCMConfig(num_ddim_timesteps=10),
        LoRAConfig(rank=2), TrainConfig(learning_rate=1e-3))
    state = init_fn(jax.random.PRNGKey(1))
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(2), (1, 4, 2, 8, 8)),
        "text": jax.random.normal(jax.random.PRNGKey(3), (1, 5, cfg.text_embed_dim)),
    }
    state, metrics = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0  # gradient reaches the LoRA


def test_backprop_masks():
    cfg = RewardConfig(num_sample_steps=10, backprop_strategy="last")
    m = backprop_step_mask(cfg, jax.random.PRNGKey(0))
    assert int(m.sum()) == 1 and bool(m[-1])
    cfg = dataclasses.replace(cfg, backprop_strategy="tail", backprop_num_steps=3)
    m = backprop_step_mask(cfg, jax.random.PRNGKey(0))
    assert int(m.sum()) == 3 and bool(m[-1]) and bool(m[-3])
    cfg = dataclasses.replace(cfg, backprop_strategy="random", backprop_num_steps=4)
    m = backprop_step_mask(cfg, jax.random.PRNGKey(1))
    assert int(m.sum()) == 4


def test_reward_train_step_runs_and_grads_flow():
    model, cfg, params = _tiny_model()
    vae = AutoencoderKLMagvit(TINY_VAE)
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 8, 8, 3)))

    def reward_fn(frames):  # differentiable proxy: mean brightness
        return jnp.mean(frames, axis=(1, 2, 3, 4))

    rcfg = RewardConfig(num_sample_steps=3, backprop_strategy="last",
                        num_decoded_latents=1, guidance_scale=2.0)
    init_fn, step_fn = make_reward_train_step(
        model, vae, vp, params, reward_fn, rcfg, LoRAConfig(rank=2),
        TrainConfig(learning_rate=1e-3), vae_scaling=TINY_VAE.scaling_factor)
    state = init_fn(jax.random.PRNGKey(2))
    batch = {
        "text": jax.random.normal(jax.random.PRNGKey(3), (1, 5, cfg.text_embed_dim)),
        "latent_shape": (1, 4, 2, 8, 8),
    }
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0

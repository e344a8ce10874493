"""Sampler zoo tests: Euler / Euler-Ancestral / PNDM step math against
hand-derived formulas, runtime sampler switching (reference ui.py:40-50
scheduler dicts, switch at :472; api.py:97 `sampler_dropdown`), and the
samplers running end-to-end through the tiny pipeline."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easyanimate_tpu.pipeline import (
    DDIMConfig,
    EulerAncestralConfig,
    EulerConfig,
    FlowMatchEulerConfig,
    PNDMConfig,
    make_scheduler,
)
from easyanimate_tpu.pipeline.schedulers import (
    euler_ancestral_step,
    euler_scale_model_input,
    euler_schedule,
    euler_step,
    init_noise_sigma,
    make_betas,
    pndm_prev_sample,
    pndm_schedule,
)

from test_pipeline import _tiny_pipeline


# ---------------------------------------------------------------------------
# schedule / step math
# ---------------------------------------------------------------------------


def test_euler_schedule_sigmas():
    cfg = EulerConfig(timestep_spacing="leading")
    ts, sigmas, init_sigma = euler_schedule(cfg, 10)
    assert ts.shape == (10,) and sigmas.shape == (11,)
    assert sigmas[-1] == 0.0 and np.all(np.diff(sigmas) <= 0)
    # sigma at an exact integer timestep is sqrt((1-a)/a)
    ac = np.cumprod(1.0 - make_betas(cfg))
    t0 = int(ts[0])
    want = ((1.0 - ac[t0]) / ac[t0]) ** 0.5
    np.testing.assert_allclose(sigmas[0], want, rtol=1e-5)
    # leading spacing: init sigma is sqrt(max^2+1) (diffusers rule)
    np.testing.assert_allclose(init_sigma, (sigmas[0] ** 2 + 1) ** 0.5,
                               rtol=1e-6)


def test_euler_step_epsilon_manual():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 8)),
                    jnp.float32)
    eps = jnp.asarray(np.random.default_rng(1).standard_normal(x.shape),
                      jnp.float32)
    sigma, sigma_next = jnp.float32(5.0), jnp.float32(3.0)
    got = euler_step(EulerConfig(), x, eps, sigma, sigma_next)
    # x0 = x - sigma*eps; d = (x - x0)/sigma = eps; prev = x + (s' - s) d
    want = np.asarray(x) + (3.0 - 5.0) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_euler_scale_model_input():
    x = jnp.ones((2, 3), jnp.float32) * 4.0
    out = euler_scale_model_input(x, jnp.float32(3.0))
    np.testing.assert_allclose(np.asarray(out), 4.0 / np.sqrt(10.0),
                               rtol=1e-6)


def test_euler_ancestral_step_manual():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4)),
                    jnp.float32)
    eps = jnp.asarray(np.random.default_rng(1).standard_normal(x.shape),
                      jnp.float32)
    noise = jnp.asarray(np.random.default_rng(2).standard_normal(x.shape),
                        jnp.float32)
    s, sn = 5.0, 3.0
    got = euler_ancestral_step(EulerAncestralConfig(), x, eps,
                               jnp.float32(s), jnp.float32(sn), noise)
    sigma_up = (sn ** 2 * (s ** 2 - sn ** 2) / s ** 2) ** 0.5
    sigma_down = (sn ** 2 - sigma_up ** 2) ** 0.5
    want = (np.asarray(x) + (sigma_down - s) * np.asarray(eps)
            + sigma_up * np.asarray(noise))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
    # terminal step (sigma_next = 0) adds no noise
    got0 = euler_ancestral_step(EulerAncestralConfig(), x, eps,
                                jnp.float32(s), jnp.float32(0.0), noise)
    want0 = np.asarray(x) + (0.0 - s) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(got0), want0, rtol=1e-5, atol=1e-5)


def test_pndm_schedule_structure():
    """PLMS warmup: n+1 evals, duplicated 2nd timestep, orders 1,avg,2,3,4."""
    rows, ac, final_alpha = pndm_schedule(PNDMConfig(), 10)
    assert rows.shape == (11, 6)
    t_eval = rows[:, 0]
    # descending except the duplicated pair
    assert t_eval[1] == t_eval[2]
    orders = rows[:, 3].astype(int).tolist()
    assert orders == [0, 1, 2, 3, 4, 4, 4, 4, 4, 4, 4]
    # counter==1 row: no append, uses cur_sample, steps t+ratio -> t
    assert rows[1, 4] == 0 and rows[1, 5] == 1
    assert rows[1, 1] == rows[0, 0] and rows[1, 2] == rows[1, 0]
    # all other rows append and use the running sample
    assert np.all(rows[2:, 4] == 1) and np.all(rows[2:, 5] == 0)


def test_pndm_prev_sample_formula():
    cfg = PNDMConfig()
    rows, ac, final_alpha = pndm_schedule(cfg, 10)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4)),
                    jnp.float32)
    eps = jnp.asarray(np.random.default_rng(1).standard_normal(x.shape),
                      jnp.float32)
    t, tp = 900, 800
    got = pndm_prev_sample(cfg, x, eps, jnp.int32(t), jnp.int32(tp), ac,
                           final_alpha)
    a_t, a_p = float(ac[t]), float(ac[tp])
    b_t, b_p = 1 - a_t, 1 - a_p
    coeff = (a_p / a_t) ** 0.5
    denom = a_t * b_p ** 0.5 + (a_t * b_t * a_p) ** 0.5
    want = coeff * np.asarray(x) - (a_p - a_t) * np.asarray(eps) / denom
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_init_noise_sigma_families():
    assert init_noise_sigma(FlowMatchEulerConfig(), 10) == 1.0
    assert init_noise_sigma(DDIMConfig(), 10) == 1.0
    assert init_noise_sigma(PNDMConfig(), 10) == 1.0
    assert init_noise_sigma(EulerConfig(), 10) > 10.0  # sigma_max ~ 150


# ---------------------------------------------------------------------------
# registry / switching
# ---------------------------------------------------------------------------


def test_make_scheduler_registry_names():
    # the reference dropdown names (ui.py:44-55)
    for name, cls in [("Euler", EulerConfig),
                      ("Euler A", EulerAncestralConfig),
                      ("PNDM", PNDMConfig), ("DDIM", DDIMConfig),
                      ("Flow", FlowMatchEulerConfig)]:
        assert type(make_scheduler(name)) is cls
    from easyanimate_tpu.pipeline import DPMSolverConfig
    assert type(make_scheduler("DPM++")) is DPMSolverConfig
    with pytest.raises(ValueError):
        make_scheduler("nope")


def test_make_scheduler_preserves_subclass_fields():
    """Re-selecting the current sampler keeps subclass-only fields, and
    switching away copies every shared field (diffusers from_config)."""
    from easyanimate_tpu.pipeline import DPMSolverConfig

    base = DPMSolverConfig(solver_order=1, prediction_type="v_prediction")
    same = make_scheduler("DPM++", base=base)
    assert same.solver_order == 1
    assert same.prediction_type == "v_prediction"
    other = make_scheduler("Euler", base=base)
    assert other.prediction_type == "v_prediction"


def test_make_scheduler_inherits_base_config():
    base = DDIMConfig(prediction_type="v_prediction",
                      beta_schedule="squaredcos_cap_v2")
    new = make_scheduler("Euler A", base=base)
    assert isinstance(new, EulerAncestralConfig)
    assert new.prediction_type == "v_prediction"
    assert new.beta_schedule == "squaredcos_cap_v2"


def test_make_scheduler_carries_config_across_families():
    """Shared fields survive FlowMatch <-> DDIM-family switches too (the
    reference's from_config copies all matching keys regardless of the
    base class)."""
    flow = FlowMatchEulerConfig(num_train_timesteps=500, shift=5.0)
    ddim = make_scheduler("DDIM", base=flow)
    assert ddim.num_train_timesteps == 500
    back = make_scheduler("Flow", base=DDIMConfig(num_train_timesteps=250))
    assert isinstance(back, FlowMatchEulerConfig)
    assert back.num_train_timesteps == 250
    assert back.shift == FlowMatchEulerConfig.shift  # not shared: default
    assert make_scheduler("Flow", base=flow).shift == 5.0  # same family


# ---------------------------------------------------------------------------
# end-to-end through the tiny pipeline
# ---------------------------------------------------------------------------


def _run(pipe, cfg, h, w, vl, steps=4, **kw):
    pos = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.zeros_like(pos)
    return np.asarray(pipe(pos, neg, height=h, width=w, video_length=vl,
                           num_inference_steps=steps, guidance_scale=2.0,
                           output_type="latent", rng=jax.random.PRNGKey(3),
                           **kw))


def test_all_samplers_run_and_differ():
    pipe, cfg, (h, w, vl) = _tiny_pipeline()
    outs = {}
    for name in ["Euler", "Euler A", "PNDM", "DDIM"]:
        pipe.scheduler = make_scheduler(name)
        outs[name] = _run(pipe, cfg, h, w, vl)
        assert np.isfinite(outs[name]).all(), name
    # Euler A and PNDM take genuinely different trajectories
    for a, b in [("Euler", "Euler A"), ("Euler", "PNDM"),
                 ("Euler A", "PNDM"), ("PNDM", "DDIM")]:
        assert np.abs(outs[a] - outs[b]).max() > 1e-3, (a, b)


def test_euler_equals_ddim_exactly():
    """DDIM (eta=0, epsilon prediction) IS Euler on the probability-flow ODE
    re-parameterized to sigma space: x_sig = x_vp / sqrt(abar), and the DDIM
    update divides out to x' = x + (sigma' - sigma) eps. The two independent
    implementations (alpha-space ddim_step vs sigma-space euler_step +
    scale_model_input) must agree to float precision -- a strong
    cross-validation of both."""
    pipe, cfg, (h, w, vl) = _tiny_pipeline()
    pipe.scheduler = make_scheduler("Euler")
    e = _run(pipe, cfg, h, w, vl)
    pipe.scheduler = make_scheduler("DDIM")
    d = _run(pipe, cfg, h, w, vl)
    np.testing.assert_allclose(e, d, atol=5e-5, rtol=1e-5)


def test_euler_ancestral_seed_determinism():
    pipe, cfg, (h, w, vl) = _tiny_pipeline()
    pipe.scheduler = make_scheduler("Euler A")
    a = _run(pipe, cfg, h, w, vl)
    b = _run(pipe, cfg, h, w, vl)
    np.testing.assert_array_equal(a, b)


def test_euler_v2v_strength_path():
    """Partial-denoise (V2V strength) through the inpaint pipeline with the
    Euler sampler: sigma-space add_noise init."""
    import dataclasses as dc

    from easyanimate_tpu.models.mmdit import PRESETS, EasyAnimateTransformer3D
    from easyanimate_tpu.models.vae import AutoencoderKLMagvit
    from easyanimate_tpu.pipeline import EasyAnimateInpaintPipeline
    from test_pipeline import TINY_VAE

    mmdit_cfg = dc.replace(PRESETS["tiny"], in_channels=4, out_channels=4)
    transformer = EasyAnimateTransformer3D(mmdit_cfg)
    vae = AutoencoderKLMagvit(TINY_VAE)
    h = w = 32
    vl = 5
    lat = jnp.zeros((1, 4, 3, h // 2, w // 2))
    txt = jnp.zeros((1, 6, mmdit_cfg.text_embed_dim))
    tp = transformer.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt,
                          None)
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 8, 8, 3)))
    pipe = EasyAnimateInpaintPipeline(
        transformer=transformer, vae=vae, transformer_params=tp,
        vae_params=vp, scheduler=make_scheduler("Euler"))
    pos = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 6, mmdit_cfg.text_embed_dim)).astype(np.float32))
    video = jnp.asarray(np.random.default_rng(2).uniform(
        0, 1, (1, 3, vl, h, w)).astype(np.float32))
    out = pipe(pos, jnp.zeros_like(pos), video=video,
               height=h, width=w, video_length=vl, num_inference_steps=4,
               guidance_scale=2.0, strength=0.5, output_type="latent",
               rng=jax.random.PRNGKey(5))
    assert np.isfinite(np.asarray(out)).all()


def test_sampler_switch_through_controller_changes_output():
    """VERDICT #5 'done' criterion: an API request naming a sampler changes
    the output."""
    from easyanimate_tpu.api.server import infer_forward
    from easyanimate_tpu.ui.controller import EasyAnimateController

    pipe, cfg, (h, w, vl) = _tiny_pipeline()

    def encode_text(prompts):
        rng = np.random.default_rng(abs(hash(prompts[0])) % (2 ** 31))
        return jnp.asarray(rng.standard_normal(
            (1, 6, cfg.text_embed_dim)).astype(np.float32))

    ctrl = EasyAnimateController(pipeline=pipe, encode_text=encode_text)
    payload = dict(prompt_textbox="a cat", sample_step_slider=3,
                   width_slider=w, height_slider=h, length_slider=vl,
                   seed_textbox=7)
    base = infer_forward(ctrl, payload)
    assert base["message"] == "Success"
    assert isinstance(ctrl.pipeline.scheduler, FlowMatchEulerConfig)
    euler = infer_forward(ctrl, {**payload, "sampler_dropdown": "Euler"})
    assert euler["message"] == "Success"
    assert isinstance(ctrl.pipeline.scheduler, EulerConfig)
    assert base["base64_encoding"] != euler["base64_encoding"]


def test_pndm_v_prediction_converts_at_step_time():
    """v_prediction converts the COMBINED output inside pndm_prev_sample
    using the step timestep and transfer sample (diffusers ordering)."""
    cfg = PNDMConfig(prediction_type="v_prediction")
    rows, ac, final_alpha = pndm_schedule(cfg, 10)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4)),
                    jnp.float32)
    v = jnp.asarray(np.random.default_rng(1).standard_normal(x.shape),
                    jnp.float32)
    t, tp = 900, 800
    got = pndm_prev_sample(cfg, x, v, jnp.int32(t), jnp.int32(tp), ac,
                           final_alpha)
    a_t, a_p = float(ac[t]), float(ac[tp])
    eps = np.sqrt(a_t) * np.asarray(v) + np.sqrt(1 - a_t) * np.asarray(x)
    coeff = (a_p / a_t) ** 0.5
    denom = a_t * (1 - a_p) ** 0.5 + (a_t * (1 - a_t) * a_p) ** 0.5
    want = coeff * np.asarray(x) - (a_p - a_t) * eps / denom
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_pndm_timestep_spacing_modes():
    for spacing in ("leading", "linspace", "trailing"):
        rows, _, _ = pndm_schedule(PNDMConfig(timestep_spacing=spacing), 10)
        t_eval = rows[:, 0]
        assert rows.shape == (11, 6), spacing
        assert t_eval[1] == t_eval[2], spacing  # duplicated 2nd step
        assert t_eval[0] > t_eval[-1], spacing
    lead = pndm_schedule(PNDMConfig(timestep_spacing="leading"), 10)[0]
    trail = pndm_schedule(PNDMConfig(timestep_spacing="trailing"), 10)[0]
    assert trail[0, 0] > lead[0, 0]  # trailing starts at n-1


def test_pndm_v_prediction_pipeline_runs():
    pipe, cfg, (h, w, vl) = _tiny_pipeline()
    pipe.scheduler = PNDMConfig(prediction_type="v_prediction")
    out_v = _run(pipe, cfg, h, w, vl)
    assert np.isfinite(out_v).all()
    pipe.scheduler = PNDMConfig()
    out_e = _run(pipe, cfg, h, w, vl)
    assert np.abs(out_v - out_e).max() > 1e-3

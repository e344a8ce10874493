"""Scheduler golden tests vs hand-derived references and an end-to-end tiny
T2V pipeline smoke test (SURVEY.md §4: tiny-config end-to-end sample)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch

from easyanimate_tpu.models.mmdit import PRESETS, EasyAnimateTransformer3D
from easyanimate_tpu.models.vae import AutoencoderKLMagvit, MagvitVAEConfig
from easyanimate_tpu.pipeline import (
    DDIMConfig,
    EasyAnimatePipeline,
    FlowMatchEulerConfig,
    ddim_schedule,
    ddim_step,
    flow_match_schedule,
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


def test_flow_match_schedule_dynamic_shift():
    cfg = FlowMatchEulerConfig()
    ts, sigmas = flow_match_schedule(cfg, 10, mu=1.0)
    assert ts.shape == (10,) and sigmas.shape == (11,)
    # monotonically decreasing, ends at 0
    assert np.all(np.diff(sigmas) < 1e-8) and sigmas[-1] == 0.0
    # dynamic shift formula: sigma' = e/(e + 1/s - 1)
    base = np.linspace(1.0, 1.0 / 1000, 10)
    want = np.exp(1.0) / (np.exp(1.0) + 1.0 / base - 1.0)
    np.testing.assert_allclose(sigmas[:-1], want, rtol=1e-5)
    np.testing.assert_allclose(ts, want * 1000, rtol=1e-5)


def test_ddim_step_matches_manual():
    """DDIM eta=0 epsilon-prediction against the textbook update."""
    cfg = DDIMConfig()
    t_arr, ac, final_alpha = ddim_schedule(cfg, 10)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 2, 8, 8)),
                    jnp.float32)
    eps = jnp.asarray(np.random.default_rng(1).standard_normal(x.shape),
                      jnp.float32)
    t, t_prev = int(t_arr[0]), int(t_arr[1])
    got = ddim_step(cfg, x, eps, jnp.int32(t), jnp.int32(t_prev),
                    jnp.asarray(ac), final_alpha)
    a_t, a_prev = float(ac[t]), float(ac[t_prev])
    x0 = (np.asarray(x) - np.sqrt(1 - a_t) * np.asarray(eps)) / np.sqrt(a_t)
    want = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_ddim_betas_match_torch_linspace():
    cfg = DDIMConfig(beta_schedule="scaled_linear")
    from easyanimate_tpu.pipeline.schedulers import make_betas
    betas = make_betas(cfg)
    want = torch.linspace(0.0001 ** 0.5, 0.02 ** 0.5, 1000,
                          dtype=torch.float64) ** 2
    np.testing.assert_allclose(betas, want.numpy(), rtol=1e-10)


def _tiny_pipeline():
    mmdit_cfg = dataclasses.replace(
        PRESETS["tiny"], in_channels=4, out_channels=4)
    transformer = EasyAnimateTransformer3D(mmdit_cfg)
    vae = AutoencoderKLMagvit(TINY_VAE)

    h = w = 32
    video_length = 5
    lat = jnp.zeros((1, 4, 3, h // 2, w // 2))
    txt = jnp.zeros((1, 6, mmdit_cfg.text_embed_dim))
    tparams = transformer.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt, None)
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 8, 8, 3)))
    return EasyAnimatePipeline(
        transformer=transformer, vae=vae,
        transformer_params=tparams, vae_params=vparams,
    ), mmdit_cfg, (h, w, video_length)


def test_t2v_end_to_end_flow():
    pipe, cfg, (h, w, vl) = _tiny_pipeline()
    pos = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.zeros_like(pos)
    video = pipe(pos, neg, height=h, width=w, video_length=vl,
                 num_inference_steps=3, guidance_scale=5.0, guidance_rescale=0.7,
                 rng=jax.random.PRNGKey(42))
    assert video.shape == (1, 3, vl, h, w)
    assert np.isfinite(video).all()
    assert video.min() >= 0.0 and video.max() <= 1.0


def test_t2v_latent_only_and_determinism():
    pipe, cfg, (h, w, vl) = _tiny_pipeline()
    pos = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.zeros_like(pos)
    kw = dict(height=h, width=w, video_length=vl, num_inference_steps=2,
              guidance_scale=3.0, output_type="latent")
    l1 = pipe(pos, neg, rng=jax.random.PRNGKey(7), **kw)
    l2 = pipe(pos, neg, rng=jax.random.PRNGKey(7), **kw)
    l3 = pipe(pos, neg, rng=jax.random.PRNGKey(8), **kw)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert np.abs(np.asarray(l1) - np.asarray(l3)).max() > 1e-3


def test_t2v_ddim_path():
    pipe, cfg, (h, w, vl) = _tiny_pipeline()
    pipe.scheduler = DDIMConfig()
    pos = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.zeros_like(pos)
    lat = pipe(pos, neg, height=h, width=w, video_length=vl,
               num_inference_steps=2, guidance_scale=2.0,
               output_type="latent", rng=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(lat)).all()


def test_teacache_never_skip_matches_baseline():
    """teacache with an always-calc threshold must equal the plain path."""
    pipe, cfg, (h, w, vl) = _tiny_pipeline()
    pos = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.zeros_like(pos)
    kw = dict(height=h, width=w, video_length=vl, num_inference_steps=3,
              guidance_scale=3.0, output_type="latent",
              rng=jax.random.PRNGKey(1))
    base = pipe(pos, neg, **kw)
    tea = pipe(pos, neg, teacache_threshold=-1e9, **kw)
    np.testing.assert_allclose(np.asarray(tea), np.asarray(base),
                               atol=1e-5, rtol=1e-5)


def test_teacache_skipping_path_runs():
    """A huge threshold makes every interior step reuse the residual."""
    pipe, cfg, (h, w, vl) = _tiny_pipeline()
    pos = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.zeros_like(pos)
    kw = dict(height=h, width=w, video_length=vl, num_inference_steps=4,
              guidance_scale=3.0, output_type="latent",
              rng=jax.random.PRNGKey(1))
    base = pipe(pos, neg, **kw)
    tea = pipe(pos, neg, teacache_threshold=1e9, **kw)
    assert np.isfinite(np.asarray(tea)).all()
    # interior steps were skipped -> outputs differ from the exact path
    assert np.abs(np.asarray(tea) - np.asarray(base)).max() > 1e-6


def test_t2v_dpm_solver_path():
    from easyanimate_tpu.pipeline.schedulers import DPMSolverConfig

    pipe, cfg, (h, w, vl) = _tiny_pipeline()
    pipe.scheduler = DPMSolverConfig()
    pos = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.zeros_like(pos)
    lat = pipe(pos, neg, height=h, width=w, video_length=vl,
               num_inference_steps=4, guidance_scale=2.0,
               output_type="latent", rng=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(lat)).all()

def test_pixart_image_pipeline(rng):
    """V1 image path: Transformer2D + Magvit VAE through
    PixArtMagvitPipeline (pipeline_pixart_magvit.py parity)."""
    import dataclasses as dc

    from easyanimate_tpu.models.transformer3d_legacy import (
        Transformer2D,
        Transformer3DConfig,
    )
    from easyanimate_tpu.pipeline import DDIMConfig, PixArtMagvitPipeline

    cfg = Transformer3DConfig(
        num_attention_heads=2, attention_head_dim=16, in_channels=4,
        out_channels=8, num_layers=2, caption_channels=24,
        basic_block_type="basic", enable_uvit=False, dtype="float32")
    model = Transformer2D(cfg)
    vae = AutoencoderKLMagvit(TINY_VAE)
    lat = jnp.zeros((1, 4, 1, 16, 16))
    txt = jnp.zeros((1, 6, 24))
    tp = model.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt, None)
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 8, 8, 3)))
    pipe = PixArtMagvitPipeline(
        transformer=model, vae=vae, transformer_params=tp, vae_params=vp,
        scheduler=DDIMConfig())
    pos = jnp.asarray(rng.standard_normal((1, 6, 24)).astype(np.float32))
    img = pipe(pos, jnp.zeros_like(pos), height=32, width=32,
               num_inference_steps=2, guidance_scale=3.0)
    assert img.shape == (1, 3, 32, 32)
    assert np.isfinite(img).all()

def test_scan_chunk_equals_full_scan(rng):
    """Chunked denoise segments must be bit-identical to one full scan
    (bounded-runtime device programs for deadline-limited runtimes)."""
    pipe, cfg, (h, w, vl) = _tiny_pipeline()
    pos = jnp.asarray(rng.standard_normal((1, 6, cfg.text_embed_dim))
                      .astype(np.float32))
    neg = jnp.zeros_like(pos)
    kw = dict(height=32, width=32, video_length=5, num_inference_steps=5,
              guidance_scale=3.0, rng=jax.random.PRNGKey(7),
              output_type="latent")
    full = pipe(pos, neg, **kw)
    chunked = pipe(pos, neg, scan_chunk=2, **kw)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               atol=1e-5, rtol=1e-5)
    # TeaCache state threads across segment boundaries too
    full_tc = pipe(pos, neg, teacache_threshold=0.3, **kw)
    chunk_tc = pipe(pos, neg, teacache_threshold=0.3, scan_chunk=2, **kw)
    np.testing.assert_allclose(np.asarray(full_tc), np.asarray(chunk_tc),
                               atol=1e-5, rtol=1e-5)


def test_decode_latents_smooth_seams(rng):
    """smooth_output engages in the decode path (reference
    pipeline_easyanimate.py:706-742): blended decode differs from the raw
    decode only in the middle, and the auto default follows the reference
    gating (on for slice chunk modes, off for cache modes)."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from easyanimate_tpu.models.mmdit import PRESETS, EasyAnimateTransformer3D
    from easyanimate_tpu.models.vae import AutoencoderKLMagvit, MagvitVAEConfig
    from easyanimate_tpu.pipeline import EasyAnimatePipeline

    vae_cfg = MagvitVAEConfig(
        latent_channels=4, block_out_channels=(8, 16),
        down_block_types=("SpatialTemporalDownBlock3D", "SpatialDownBlock3D"),
        up_block_types=("SpatialTemporalUpBlock3D", "SpatialUpBlock3D"),
        layers_per_block=1, norm_num_groups=4, mini_batch_encoder=2,
        mini_batch_decoder=1, scaling_factor=0.5)
    cfg = PRESETS["tiny"]
    transformer = EasyAnimateTransformer3D(cfg)
    vae = AutoencoderKLMagvit(vae_cfg)
    lat = jnp.zeros((1, 4, 2, 8, 8))
    txt = jnp.zeros((1, 4, cfg.text_embed_dim))
    tp = transformer.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt, None)
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 8, 8, 3)))
    pipe = EasyAnimatePipeline(transformer=transformer, vae=vae,
                               transformer_params=tp, vae_params=vp)
    latents = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 5, 8, 8))
    raw = pipe.decode_latents(latents, smooth=False)
    smoothed = pipe.decode_latents(latents, smooth=True)
    assert raw.shape == smoothed.shape
    assert np.abs(raw - smoothed).max() > 1e-6  # seams actually blended
    # untouched head half-chunk is identical
    np.testing.assert_allclose(raw[:, :, :1], smoothed[:, :, :1], atol=1e-6)

    # auto gating follows the reference decode_latents branch
    for mode, expect in [("slice_mag", True), ("slice_compression", True),
                         ("cache_mag", False), ("cache_compression", False)]:
        p2 = EasyAnimatePipeline(
            transformer=transformer,
            vae=AutoencoderKLMagvit(_dc.replace(vae_cfg, chunk_mode=mode)),
            transformer_params=tp, vae_params=vp)
        assert p2.smooth_default() == expect, mode


def test_swa_plus_teacache_stacked(rng):
    """The benched flagship fast path (bench.py): SWA layers + TeaCache in
    one pipeline run, finite outputs, and never-skip TeaCache equals the
    plain SWA run bit-for-bit."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from easyanimate_tpu.models.mmdit import PRESETS, EasyAnimateTransformer3D
    from easyanimate_tpu.models.vae import AutoencoderKLMagvit, MagvitVAEConfig
    from easyanimate_tpu.pipeline import EasyAnimatePipeline

    cfg = _dc.replace(PRESETS["tiny"], num_layers=2, swa_layers=(1,))
    vae_cfg = MagvitVAEConfig(
        latent_channels=4, block_out_channels=(8, 16),
        down_block_types=("SpatialTemporalDownBlock3D", "SpatialDownBlock3D"),
        up_block_types=("SpatialTemporalUpBlock3D", "SpatialUpBlock3D"),
        layers_per_block=1, norm_num_groups=4, mini_batch_encoder=2,
        mini_batch_decoder=1, scaling_factor=0.5)
    transformer = EasyAnimateTransformer3D(cfg)
    vae = AutoencoderKLMagvit(vae_cfg)
    lat = jnp.zeros((1, 4, 2, 16, 16))
    txt = jnp.zeros((1, 8, cfg.text_embed_dim))
    tp_ = transformer.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt,
                           None)
    vp_ = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 8, 8, 3)))
    pipe = EasyAnimatePipeline(transformer=transformer, vae=vae,
                               transformer_params=tp_, vae_params=vp_)
    pos = jnp.asarray(rng.standard_normal((1, 8, cfg.text_embed_dim)),
                      jnp.float32)
    neg = jnp.zeros_like(pos)
    kw = dict(height=32, width=32, video_length=5, num_inference_steps=4,
              guidance_scale=3.0, rng=jax.random.PRNGKey(3), decode=False,
              output_type="latent")
    plain = np.asarray(pipe(pos, neg, **kw))
    stacked = np.asarray(pipe(pos, neg, teacache_threshold=-1e9, **kw))
    skipping = np.asarray(pipe(pos, neg, teacache_threshold=1e9, **kw))
    np.testing.assert_allclose(stacked, plain, atol=1e-5)
    assert np.isfinite(skipping).all()
    assert np.abs(skipping - plain).max() > 1e-6  # skipping actually engaged


def test_cfg_split_matches_batched_cfg(rng):
    """Sequential-CFG (memory mode) produces the same video as the batched
    CFG path."""
    import dataclasses as _dc

    from easyanimate_tpu.models.mmdit import (
        PRESETS,
        EasyAnimateTransformer3D,
    )
    from easyanimate_tpu.models.vae import AutoencoderKLMagvit
    from easyanimate_tpu.pipeline import EasyAnimatePipeline

    cfg = _dc.replace(PRESETS["tiny"], attn_impl="xla")
    transformer = EasyAnimateTransformer3D(cfg)
    vae = AutoencoderKLMagvit(TINY_VAE)
    lat = jnp.zeros((1, 4, 2, 8, 8))
    txt = jnp.zeros((1, 5, cfg.text_embed_dim))
    tp = transformer.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt,
                          None)
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 8, 8, 3)))
    pipe = EasyAnimatePipeline(transformer=transformer, vae=vae,
                               transformer_params=tp, vae_params=vp)
    pos = jnp.asarray(
        rng.standard_normal((1, 5, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.zeros_like(pos)
    kw = dict(height=32, width=32, video_length=5, num_inference_steps=3,
              guidance_scale=4.0, decode=False, output_type="latent")
    a = pipe(pos, neg, rng=jax.random.PRNGKey(3), **kw)
    b = pipe(pos, neg, rng=jax.random.PRNGKey(3), cfg_split=True, **kw)
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32), atol=1e-4,
                               rtol=1e-3)


def test_decode_latents_uint8_matches_float():
    """to_uint8 rounds on device: equals round(float*255) exactly."""
    pipe, cfg, (h, w, vl) = _tiny_pipeline()
    lat = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, 4, 3, h // 2, w // 2)).astype(np.float32))
    f = pipe.decode_latents(lat)
    u = pipe.decode_latents(lat, to_uint8=True)
    assert u.dtype == np.uint8
    np.testing.assert_array_equal(u, np.round(f * 255.0).astype(np.uint8))


def test_decode_latents_yuv420_matches_host_reference():
    """Device-side 4:2:0 output == the same BT.601 conversion applied
    host-side to the float RGB decode (within quantization), and
    yuv420_to_rgb reconstructs RGB up to ordinary chroma subsampling."""
    from easyanimate_tpu.utils.media import yuv420_to_rgb

    pipe, cfg, (h, w, vl) = _tiny_pipeline()
    lat = jnp.asarray(np.random.default_rng(7).standard_normal(
        (1, 4, 3, h // 2, w // 2)).astype(np.float32))
    f = pipe.decode_latents(lat)  # float RGB [0,1], (B,3,T,H,W)
    y, u, v = pipe.decode_latents_yuv420(lat)
    assert y.dtype == u.dtype == v.dtype == np.uint8
    assert y.shape == (f.shape[0], f.shape[2], f.shape[3], f.shape[4])
    assert u.shape == y.shape[:2] + (y.shape[2] // 2, y.shape[3] // 2)

    r, g, b = (f[:, i].astype(np.float64) for i in range(3))
    y_ref = 0.299 * r + 0.587 * g + 0.114 * b
    u_ref = -0.168736 * r - 0.331264 * g + 0.5 * b + 0.5
    v_ref = 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5
    sub = lambda p: 0.25 * (p[..., 0::2, 0::2] + p[..., 1::2, 0::2]
                            + p[..., 0::2, 1::2] + p[..., 1::2, 1::2])
    to8 = lambda p: np.round(np.clip(p, 0, 1) * 255).astype(np.int32)
    assert np.max(np.abs(y.astype(np.int32) - to8(y_ref))) <= 1
    assert np.max(np.abs(u.astype(np.int32) - to8(sub(u_ref)))) <= 1
    assert np.max(np.abs(v.astype(np.int32) - to8(sub(v_ref)))) <= 1

    # round trip: matches the host reference reconstruction to +-2 counts
    up = lambda p: np.repeat(np.repeat(p, 2, axis=-2), 2, axis=-1)
    uf, vf = up(sub(u_ref)) - 0.5, up(sub(v_ref)) - 0.5
    rgb_ref = np.stack([y_ref + 1.402 * vf,
                        y_ref - 0.344136 * uf - 0.714136 * vf,
                        y_ref + 1.772 * uf], axis=1)
    rgb_ref = np.clip(np.round(rgb_ref * 255), 0, 255).astype(np.int32)
    got = yuv420_to_rgb(y, u, v).astype(np.int32)
    assert got.shape == f.shape
    assert np.max(np.abs(got - rgb_ref)) <= 2


def test_decode_latents_overlapped_matches_serial():
    """The per-chunk overlapped-fetch decode is the same math as the
    single-program decode_latents (cache threads exact conv state); only
    float reassociation from different chunk groupings differs."""
    pipe, cfg, (h, w, vl) = _tiny_pipeline()
    lat = jnp.asarray(np.random.default_rng(5).standard_normal(
        (1, 4, 5, h // 2, w // 2)).astype(np.float32))
    want = pipe.decode_latents(lat, to_uint8=True)
    got = pipe.decode_latents_overlapped(lat, to_uint8=True)
    assert got.dtype == np.uint8 and got.shape == want.shape
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1


# -- cfg_skip_ratio (beyond-ref deterministic step-cost lever; the authors'
# follow-up VideoX-Fun ships the same knob) ---------------------------------

def _cfg_skip_setup():
    pipe, cfg, (h, w, vl) = _tiny_pipeline()
    g = np.random.default_rng(11)
    pos = jnp.asarray(
        g.standard_normal((1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.asarray(
        g.standard_normal((1, 6, cfg.text_embed_dim)).astype(np.float32))
    kw = dict(height=h, width=w, video_length=vl, num_inference_steps=4,
              decode=False, output_type="latent")
    return pipe, pos, neg, kw


def test_cfg_skip_full_equals_guidance_off():
    """ratio=1.0 runs every step cond-only == a guidance-free run."""
    pipe, pos, neg, kw = _cfg_skip_setup()
    a = pipe(pos, neg, guidance_scale=4.0, cfg_skip_ratio=1.0,
             rng=jax.random.PRNGKey(7), **kw)
    b = pipe(pos, guidance_scale=1.0, rng=jax.random.PRNGKey(7), **kw)
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32), atol=1e-6)


def test_cfg_skip_zero_equals_plain_and_partial_differs():
    pipe, pos, neg, kw = _cfg_skip_setup()
    r7 = jax.random.PRNGKey(7)
    plain = pipe(pos, neg, guidance_scale=4.0, rng=r7, **kw)
    zero = pipe(pos, neg, guidance_scale=4.0, cfg_skip_ratio=0.0, rng=r7, **kw)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(zero))
    half = pipe(pos, neg, guidance_scale=4.0, cfg_skip_ratio=0.5, rng=r7, **kw)
    full = pipe(pos, neg, guidance_scale=4.0, cfg_skip_ratio=1.0, rng=r7, **kw)
    # the mixed run is a genuine mixture: unlike either endpoint
    assert np.abs(np.asarray(half) - np.asarray(plain)).max() > 1e-4
    assert np.abs(np.asarray(half) - np.asarray(full)).max() > 1e-4


def test_cfg_skip_scan_chunk_bit_identical():
    """Chunked segments cross the cfg->cond-only boundary unchanged."""
    pipe, pos, neg, kw = _cfg_skip_setup()
    a = pipe(pos, neg, guidance_scale=4.0, cfg_skip_ratio=0.5,
             rng=jax.random.PRNGKey(9), **kw)
    b = pipe(pos, neg, guidance_scale=4.0, cfg_skip_ratio=0.5, scan_chunk=1,
             rng=jax.random.PRNGKey(9), **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cfg_skip_composes_with_teacache():
    """TeaCache carry slices to the positive half at the boundary."""
    pipe, pos, neg, kw = _cfg_skip_setup()
    out = pipe(pos, neg, guidance_scale=4.0, cfg_skip_ratio=0.5,
               teacache_threshold=0.05, rng=jax.random.PRNGKey(5), **kw)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_teacache_gate_matches_reference_simulation(rng):
    """Pin the jittable TeaCache gate (teacache_gate) against a NumPy
    re-derivation of the reference control flow (transformer3d.py:1564-1584:
    endpoints force compute and reset WITHOUT a polynomial contribution;
    middle steps accumulate poly1d(rel_l1) and a threshold crossing resets)
    using the published 12B coefficients, over a structured synthetic
    modulated-input trajectory."""
    import jax.numpy as jnp

    from easyanimate_tpu.pipeline.t2v import (
        TEACACHE_COEFFICIENTS, get_teacache_coefficients, teacache_gate)

    # coefficient tables must equal the reference lists verbatim
    np.testing.assert_allclose(
        get_teacache_coefficients("EasyAnimateV5.1-12b-zh-InP"),
        [-10.47857366, 8.33844143, -0.78477557, 0.68798618, 0.0136149])
    np.testing.assert_allclose(
        get_teacache_coefficients("EasyAnimateV5.1-7b-zh"),
        [1.07862322, -4.19362456, 3.06725828, 0.33161686, 0.02374758])
    assert get_teacache_coefficients("V5-motion-module") is None

    n_steps, thresh = 25, 0.1
    base = rng.standard_normal((1, 64, 16)).astype(np.float32)
    # structured trajectory: smooth drift + per-step jitter so rel-L1 is
    # non-degenerate and varies across steps
    mods = [base * (1.0 + 0.08 * np.sin(i / 3.0))
            + 0.02 * rng.standard_normal(base.shape).astype(np.float32)
            for i in range(n_steps)]

    # reference-faithful simulation (np.poly1d, python control flow)
    poly = np.poly1d(list(TEACACHE_COEFFICIENTS))
    acc, prev, want = 0.0, None, []
    for cnt in range(n_steps):
        if cnt == 0 or cnt == n_steps - 1:
            should, acc = True, 0.0
        else:
            rel = (np.abs(mods[cnt] - prev).mean()
                   / np.abs(prev).mean())
            acc += float(poly(rel))
            should = acc >= thresh
            if should:
                acc = 0.0
        prev = mods[cnt]
        want.append(should)

    # repo gate, iterated the way the denoise scan does
    got, accs = [], []
    acc_j = jnp.zeros((), jnp.float32)
    prev_j = jnp.zeros_like(jnp.asarray(mods[0]))
    for i, m in enumerate(mods):
        should, _, acc_j = teacache_gate(
            jnp.asarray(m), prev_j, acc_j, i, n_steps, thresh,
            TEACACHE_COEFFICIENTS)
        prev_j = jnp.asarray(m)
        got.append(bool(should))
        accs.append(float(acc_j))

    assert got == want, (got, want)
    # the run must be non-degenerate: some skips AND some computes
    assert any(got) and not all(got)


def test_teacache_skip_counter_exposed():
    """The pipeline reports how many steps the gate skipped
    (last_teacache_skips) — the measured artifact bench.py publishes."""
    pipe, cfg, (h, w, vl) = _tiny_pipeline()
    pos = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.zeros_like(pos)
    n = 4
    kw = dict(height=h, width=w, video_length=vl, num_inference_steps=n,
              guidance_scale=3.0, output_type="latent",
              rng=jax.random.PRNGKey(1))
    pipe(pos, neg, teacache_threshold=1e9, **kw)   # middle steps all skip
    assert int(pipe.last_teacache_skips) == n - 2
    pipe(pos, neg, teacache_threshold=-1e9, **kw)  # never skip
    assert int(pipe.last_teacache_skips) == 0

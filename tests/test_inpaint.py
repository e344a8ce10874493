"""Inpaint (I2V/V2V) pipeline tests on tiny configs."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from easyanimate_tpu.models.mmdit import PRESETS, EasyAnimateTransformer3D
from easyanimate_tpu.models.vae import AutoencoderKLMagvit, MagvitVAEConfig
from easyanimate_tpu.pipeline.inpaint import (
    EasyAnimateInpaintPipeline,
    add_noise_to_reference_video,
    resize_mask_to_latent,
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


def test_resize_mask_first_frame_special_matches_torch(rng):
    mask = rng.random((1, 1, 5, 16, 16)).astype(np.float32)
    latent_shape = (1, 4, 3, 8, 8)
    got = resize_mask_to_latent(jnp.asarray(mask), latent_shape, True)
    m = torch.from_numpy(mask)
    first = F.interpolate(m[:, :, :1], size=(1, 8, 8), mode="trilinear",
                          align_corners=False)
    rest = F.interpolate(m[:, :, 1:], size=(2, 8, 8), mode="trilinear",
                         align_corners=False)
    want = torch.cat([first, rest], dim=2).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-4)


def test_noise_aug_keeps_masked_pixels():
    video = jnp.full((1, 3, 2, 4, 4), -1.0)
    out = add_noise_to_reference_video(video, jax.random.PRNGKey(0), ratio=1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(video))


def _tiny_inpaint_pipe():
    # in_channels = latent 4 + mask 1 + masked 4 = 9
    mmdit_cfg = dataclasses.replace(PRESETS["tiny"], in_channels=9,
                                    out_channels=4)
    transformer = EasyAnimateTransformer3D(mmdit_cfg)
    vae = AutoencoderKLMagvit(TINY_VAE)
    h = w = 32
    lat = jnp.zeros((1, 4, 3, h // 2, w // 2))
    inp = jnp.zeros((1, 5, 3, h // 2, w // 2))
    txt = jnp.zeros((1, 6, mmdit_cfg.text_embed_dim))
    tp = transformer.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt,
                          None, inpaint_latents=inp)
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 8, 8, 3)))
    return EasyAnimateInpaintPipeline(
        transformer=transformer, vae=vae, transformer_params=tp,
        vae_params=vp), mmdit_cfg, (h, w, 5)


def test_i2v_inpaint_end_to_end(rng):
    pipe, cfg, (h, w, vl) = _tiny_inpaint_pipe()
    pos = jnp.asarray(rng.standard_normal((1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.zeros_like(pos)
    video = jnp.asarray(rng.random((1, 3, vl, h, w)).astype(np.float32))
    # first frame given, rest generated
    mask = np.ones((1, 1, vl, h, w), np.float32)
    mask[:, :, 0] = 0.0
    out = pipe(pos, neg, video=video, mask_video=jnp.asarray(mask),
               height=h, width=w, video_length=vl, num_inference_steps=2,
               guidance_scale=3.0, rng=jax.random.PRNGKey(5))
    assert out.shape == (1, 3, vl, h, w)
    assert np.isfinite(out).all()


def test_i2v_inpaint_cfg_split_matches(rng):
    """Sequential CFG slices the CFG-batched cond latents correctly:
    identical output to the batched path through the inpaint pipeline."""
    pipe, cfg, (h, w, vl) = _tiny_inpaint_pipe()
    pos = jnp.asarray(
        rng.standard_normal((1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.zeros_like(pos)
    video = jnp.asarray(rng.random((1, 3, vl, h, w)).astype(np.float32))
    mask = np.ones((1, 1, vl, h, w), np.float32)
    mask[:, :, 0] = 0.0
    kw = dict(video=video, mask_video=jnp.asarray(mask), height=h, width=w,
              video_length=vl, num_inference_steps=2, guidance_scale=3.0,
              output_type="latent")
    a = pipe(pos, neg, rng=jax.random.PRNGKey(5), **kw)
    b = pipe(pos, neg, rng=jax.random.PRNGKey(5), cfg_split=True, **kw)
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32), atol=1e-4,
                               rtol=1e-3)


def test_t2v_through_inpaint_model(rng):
    """Pure T2V with an inpaint checkpoint: zero mask/masked latents."""
    pipe, cfg, (h, w, vl) = _tiny_inpaint_pipe()
    pos = jnp.asarray(rng.standard_normal((1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.zeros_like(pos)
    lat = pipe(pos, neg, height=h, width=w, video_length=vl,
               num_inference_steps=2, guidance_scale=3.0,
               output_type="latent", rng=jax.random.PRNGKey(5))
    assert lat.shape == pipe.latent_shape(1, vl, h, w)
    assert np.isfinite(np.asarray(lat)).all()


def test_v2v_strength_partial_denoise(rng):
    pipe, cfg, (h, w, vl) = _tiny_inpaint_pipe()
    pos = jnp.asarray(rng.standard_normal((1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.zeros_like(pos)
    video = jnp.asarray(rng.random((1, 3, vl, h, w)).astype(np.float32))
    mask = jnp.ones((1, 1, vl, h, w))
    lat = pipe(pos, neg, video=video, mask_video=mask, strength=0.5,
               height=h, width=w, video_length=vl, num_inference_steps=4,
               guidance_scale=3.0, output_type="latent",
               rng=jax.random.PRNGKey(5))
    assert np.isfinite(np.asarray(lat)).all()


def test_control_pipeline_with_ref(rng):
    import dataclasses as dc
    from easyanimate_tpu.pipeline.control import EasyAnimateControlPipeline
    # in = latent 4 + control 4 + ref 4 = 12
    cfg = dc.replace(PRESETS["tiny"], in_channels=12, out_channels=4,
                     add_ref_latent_in_control_model=True)
    transformer = EasyAnimateTransformer3D(cfg)
    vae = AutoencoderKLMagvit(TINY_VAE)
    h = w = 32
    lat = jnp.zeros((1, 4, 3, h // 2, w // 2))
    ctl = jnp.zeros((1, 8, 3, h // 2, w // 2))
    txt = jnp.zeros((1, 6, cfg.text_embed_dim))
    tp = transformer.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt,
                          None, control_latents=ctl)
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 8, 8, 3)))
    pipe = EasyAnimateControlPipeline(
        transformer=transformer, vae=vae, transformer_params=tp, vae_params=vp)
    pos = jnp.asarray(rng.standard_normal((1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.zeros_like(pos)
    control_video = jnp.asarray(rng.random((1, 3, 5, h, w)).astype(np.float32))
    ref = jnp.asarray(rng.random((1, 3, 1, h, w)).astype(np.float32))
    out = pipe(pos, neg, control_video=control_video, ref_image=ref,
               height=h, width=w, video_length=5, num_inference_steps=2,
               guidance_scale=3.0, output_type="latent",
               rng=jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(out)).all()


def test_control_pipeline_camera(rng):
    import dataclasses as dc
    from easyanimate_tpu.pipeline.control import EasyAnimateControlPipeline
    # camera: 6ch plucker resized (not encoded) + ref -> in = 4 + 6 + 4 = 14
    cfg = dc.replace(PRESETS["tiny"], in_channels=14, out_channels=4,
                     add_ref_latent_in_control_model=True)
    transformer = EasyAnimateTransformer3D(cfg)
    vae = AutoencoderKLMagvit(TINY_VAE)
    h = w = 32
    lat = jnp.zeros((1, 4, 3, h // 2, w // 2))
    ctl = jnp.zeros((1, 10, 3, h // 2, w // 2))
    txt = jnp.zeros((1, 6, cfg.text_embed_dim))
    tp = transformer.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt,
                          None, control_latents=ctl)
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 8, 8, 3)))
    pipe = EasyAnimateControlPipeline(
        transformer=transformer, vae=vae, transformer_params=tp, vae_params=vp)
    pos = jnp.asarray(rng.standard_normal((1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.zeros_like(pos)
    cam = jnp.asarray(rng.standard_normal((1, 6, 5, h, w)).astype(np.float32))
    out = pipe(pos, neg, control_camera_video=cam, height=h, width=w,
               video_length=5, num_inference_steps=2, guidance_scale=3.0,
               output_type="latent", rng=jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(out)).all()

def test_v4_hunyuan_i2v_pipeline_with_clip(rng):
    """V4 end-to-end: Hunyuan inpaint transformer + CLIP image branch through
    the inpaint pipeline (pipeline_easyanimate_inpaint.py:1277-1310)."""
    from easyanimate_tpu.models.hunyuan import HunyuanConfig, HunyuanTransformer3D

    # in_channels = latent 4 + mask 4 + masked 4 (VAE-encoded mask)
    cfg = HunyuanConfig(
        num_attention_heads=2, attention_head_dim=16, in_channels=12,
        out_channels=4, learn_sigma=False, num_layers=2,
        cross_attention_dim=32, cross_attention_dim_t5=48,
        pooled_projection_dim=32, text_len=6, text_len_t5=5,
        n_query=4, projection_dim=12, dtype="float32")
    transformer = HunyuanTransformer3D(cfg)
    vae = AutoencoderKLMagvit(TINY_VAE)
    h = w = 32
    lat = jnp.zeros((1, 12, 3, h // 2, w // 2))  # TINY_VAE compression 2
    bert = jnp.zeros((1, 6, 32))
    t5 = jnp.zeros((1, 5, 48))
    clip = jnp.zeros((1, 16, 12))
    from easyanimate_tpu.pipeline.t2v import build_rope
    rope = build_rope(cfg, h, w, 3, vae_scale=2)
    tp = transformer.init(
        jax.random.PRNGKey(0), lat[:, :4], jnp.array([1.0]), bert, rope,
        encoder_hidden_states_t5=t5, inpaint_latents=lat[:, 4:],
        clip_encoder_hidden_states=clip, clip_attention_mask=jnp.ones((1, 4)))
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 8, 8, 3)))
    pipe = EasyAnimateInpaintPipeline(
        transformer=transformer, vae=vae, transformer_params=tp,
        vae_params=vp)
    video = jnp.asarray(rng.random((1, 3, 5, h, w)).astype(np.float32))
    mask = jnp.ones((1, 1, 5, h, w)).at[:, :, 0].set(0.0)
    out = pipe(
        bert, jnp.zeros_like(bert), video=video, mask_video=mask,
        height=h, width=w, video_length=5, num_inference_steps=2,
        guidance_scale=2.0,
        prompt_embeds_t5=t5, negative_prompt_embeds_t5=jnp.zeros_like(t5),
        clip_encoder_hidden_states=clip,
        clip_attention_mask=jnp.ones((1, 4)))
    assert out.shape == (1, 3, 5, h, w)
    assert np.isfinite(np.asarray(out)).all()


def test_inpaint_teacache_never_skip_matches_baseline(rng):
    """TeaCache threaded through the inpaint pipeline (reference enables it
    transformer-level so EVERY pipeline accelerates, transformer3d.py:
    1485-1491): an always-calc threshold must reproduce the plain path."""
    pipe, cfg, (h, w, vl) = _tiny_inpaint_pipe()
    pos = jnp.asarray(
        rng.standard_normal((1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.zeros_like(pos)
    video = jnp.asarray(rng.random((1, 3, vl, h, w)).astype(np.float32))
    mask = np.ones((1, 1, vl, h, w), np.float32)
    mask[:, :, 0] = 0.0
    kw = dict(video=video, mask_video=jnp.asarray(mask), height=h, width=w,
              video_length=vl, num_inference_steps=3, guidance_scale=3.0,
              output_type="latent")
    base = pipe(pos, neg, rng=jax.random.PRNGKey(5), **kw)
    tea = pipe(pos, neg, rng=jax.random.PRNGKey(5),
               teacache_threshold=-1e9, **kw)
    np.testing.assert_allclose(np.asarray(tea), np.asarray(base),
                               atol=1e-5, rtol=1e-5)
    # and the skipping path runs + diverges (interior steps reuse residual)
    skip = pipe(pos, neg, rng=jax.random.PRNGKey(5),
                teacache_threshold=1e9, **kw)
    assert np.isfinite(np.asarray(skip)).all()
    assert np.abs(np.asarray(skip) - np.asarray(base)).max() > 1e-6


def test_control_teacache_never_skip_matches_baseline(rng):
    import dataclasses as dc
    from easyanimate_tpu.pipeline.control import EasyAnimateControlPipeline
    cfg = dc.replace(PRESETS["tiny"], in_channels=8, out_channels=4)
    transformer = EasyAnimateTransformer3D(cfg)
    vae = AutoencoderKLMagvit(TINY_VAE)
    h = w = 32
    lat = jnp.zeros((1, 4, 3, h // 2, w // 2))
    ctl = jnp.zeros((1, 4, 3, h // 2, w // 2))
    txt = jnp.zeros((1, 6, cfg.text_embed_dim))
    tp = transformer.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt,
                          None, control_latents=ctl)
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 8, 8, 3)))
    pipe = EasyAnimateControlPipeline(
        transformer=transformer, vae=vae, transformer_params=tp, vae_params=vp)
    pos = jnp.asarray(
        rng.standard_normal((1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.zeros_like(pos)
    control_video = jnp.asarray(rng.random((1, 3, 5, h, w)).astype(np.float32))
    kw = dict(control_video=control_video, height=h, width=w, video_length=5,
              num_inference_steps=3, guidance_scale=3.0, output_type="latent")
    base = pipe(pos, neg, rng=jax.random.PRNGKey(2), **kw)
    tea = pipe(pos, neg, rng=jax.random.PRNGKey(2),
               teacache_threshold=-1e9, **kw)
    np.testing.assert_allclose(np.asarray(tea), np.asarray(base),
                               atol=1e-5, rtol=1e-5)


def test_inpaint_cfg_skip_full_equals_guidance_off(rng):
    """cfg_skip_ratio=1.0 slices the CFG-duplicated cond dict (masks,
    inpaint latents) to its positive half: equals a guidance-free run."""
    pipe, cfg, (h, w, vl) = _tiny_inpaint_pipe()
    pos = jnp.asarray(
        rng.standard_normal((1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.asarray(
        rng.standard_normal((1, 6, cfg.text_embed_dim)).astype(np.float32))
    video = jnp.asarray(rng.random((1, 3, vl, h, w)).astype(np.float32))
    mask = np.ones((1, 1, vl, h, w), np.float32)
    mask[:, :, 0] = 0.0
    kw = dict(video=video, mask_video=jnp.asarray(mask), height=h, width=w,
              video_length=vl, num_inference_steps=2, output_type="latent",
              rng=jax.random.PRNGKey(5))
    a = pipe(pos, neg, guidance_scale=3.0, cfg_skip_ratio=1.0, **kw)
    b = pipe(pos, guidance_scale=1.0, **kw)
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32), atol=1e-6)

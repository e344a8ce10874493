"""V1-V4 legacy model-generation tests (tiny configs)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easyanimate_tpu.models.hunyuan import HunyuanConfig, HunyuanTransformer3D
from easyanimate_tpu.models.transformer3d_legacy import (
    MotionModuleConfig,
    Transformer3D,
    Transformer3DConfig,
)
from easyanimate_tpu.ops.rope import get_2d_rotary_pos_embed

TINY_V3 = Transformer3DConfig(
    num_attention_heads=2, attention_head_dim=16, in_channels=4,
    out_channels=8, num_layers=16, caption_channels=24,
    basic_block_type="global_motionmodule", enable_uvit=True,
    motion_module_even=MotionModuleConfig(num_attention_heads=2),
    motion_module_odd=MotionModuleConfig(
        num_attention_heads=2,
        attention_block_types=("Temporal_Self", "Global_Self")),
    dtype="float32",
)


def test_transformer3d_v3_forward(rng):
    model = Transformer3D(TINY_V3)
    lat = jnp.asarray(rng.standard_normal((1, 4, 3, 8, 8)).astype(np.float32))
    txt = jnp.asarray(rng.standard_normal((1, 6, 24)).astype(np.float32))
    mask = jnp.ones((1, 6))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.array([7.0]), txt,
                        None, mask)
    out = model.apply(params, lat, jnp.array([7.0]), txt, None, mask)
    assert out.shape == (1, 8, 3, 8, 8)  # learned sigma doubles channels
    assert np.isfinite(np.asarray(out)).all()
    # uvit long-skip linears exist and are zero-init
    import flax
    flat = flax.traverse_util.flatten_dict(params["params"], sep="/")
    assert "long_connect_fc0/kernel" in flat
    assert float(np.abs(flat["long_connect_fc0/kernel"]).max()) == 0.0
    # motion-module proj_out zero-init (reference zero_initialize)
    mm_out = [v for k, v in flat.items()
              if "attn_temporal/proj_out/kernel" in k]
    assert mm_out and all(float(np.abs(v).max()) == 0.0 for v in mm_out)


def test_transformer3d_basic_block(rng):
    cfg = dataclasses.replace(TINY_V3, basic_block_type="basic",
                              enable_uvit=False, num_layers=2)
    model = Transformer3D(cfg)
    lat = jnp.zeros((1, 4, 2, 8, 8))
    txt = jnp.zeros((1, 6, 24))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt, None)
    out = model.apply(params, lat, jnp.array([1.0]), txt, None)
    assert out.shape == (1, 8, 2, 8, 8)


TINY_V4 = HunyuanConfig(
    num_attention_heads=2, attention_head_dim=16, in_channels=4,
    num_layers=6, cross_attention_dim=32, cross_attention_dim_t5=48,
    pooled_projection_dim=32, text_len=6, text_len_t5=8, dtype="float32",
)


@pytest.mark.parametrize("block_type", ["basic", "kvcompression_basic",
                                        "hybrid_attention"])
def test_hunyuan_forward(rng, block_type):
    cfg = dataclasses.replace(TINY_V4, basic_block_type=block_type)
    model = HunyuanTransformer3D(cfg)
    f, hh, ww = 4, 8, 8
    lat = jnp.asarray(rng.standard_normal((1, 4, f, hh, ww)).astype(np.float32))
    bert = jnp.asarray(rng.standard_normal((1, 6, 32)).astype(np.float32))
    t5 = jnp.asarray(rng.standard_normal((1, 8, 48)).astype(np.float32))
    m1, m2 = jnp.ones((1, 6)), jnp.ones((1, 8))
    cos, sin = get_2d_rotary_pos_embed(cfg.attention_head_dim,
                                       ((0, 0), (4, 4)), (4, 4))
    rope = (jnp.asarray(cos), jnp.asarray(sin))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.array([5.0]), bert,
                        rope, t5, m1, m2)
    out = model.apply(params, lat, jnp.array([5.0]), bert, rope, t5, m1, m2)
    assert out.shape == (1, 8, f, hh, ww)  # learn_sigma -> 2x channels
    assert np.isfinite(np.asarray(out)).all()

def _tiny_patch_cfg(**kw):
    return dataclasses.replace(
        TINY_V3, basic_block_type="motionmodule", enable_uvit=False,
        num_layers=2, **kw)


def test_patch_3d_forward(rng):
    cfg = _tiny_patch_cfg(patch_mode="3d", time_patch_size=2)
    model = Transformer3D(cfg)
    lat = jnp.asarray(rng.standard_normal((1, 4, 4, 8, 8)).astype(np.float32))
    txt = jnp.zeros((1, 6, 24))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt, None)
    out = model.apply(params, lat, jnp.array([1.0]), txt, None)
    # time patchify 2 then unpatchify 2: frames round-trip
    assert out.shape == (1, 8, 4, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_fake_3d_forward(rng):
    cfg = _tiny_patch_cfg(patch_mode="fake_3d")
    model = Transformer3D(cfg)
    lat = jnp.asarray(rng.standard_normal((1, 4, 4, 8, 8)).astype(np.float32))
    txt = jnp.zeros((1, 6, 24))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt, None)
    out = model.apply(params, lat, jnp.array([1.0]), txt, None)
    # temporal Patch1D stride p=2 then UnPatch1D 2x: frames round-trip
    assert out.shape == (1, 8, 4, 8, 8)
    assert np.isfinite(np.asarray(out)).all()
    # Patch1D conv is average-initialised (patch.py:83-88)
    import flax
    flat = flax.traverse_util.flatten_dict(params["params"], sep="/")
    k = np.asarray(flat["pos_embed_proj_t/kernel"])  # (p, dim, dim)
    assert np.allclose(k.sum(0), np.eye(k.shape[-1]))


def test_casual_3d_forward(rng):
    # f=5, tp=2 -> f'=3 tokens; one mid-stack TemporalUpsampler3D -> 5 frames
    cfg = _tiny_patch_cfg(patch_mode="casual_3d", time_patch_size=2,
                          casual_3d_upsampler_index=(1,))
    model = Transformer3D(cfg)
    lat = jnp.asarray(rng.standard_normal((1, 4, 5, 8, 8)).astype(np.float32))
    txt = jnp.zeros((1, 6, 24))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt, None)
    out = model.apply(params, lat, jnp.array([1.0]), txt, None)
    assert out.shape == (1, 8, 5, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_patch_mode_from_yaml_flags():
    from easyanimate_tpu.utils.config import build_transformer

    base = dict(transformer_type="Transformer3DModel",
                num_attention_heads=2, attention_head_dim=16,
                num_layers=2, caption_channels=24, enable_uvit=False,
                basic_block_type="basic")
    _, cfg = build_transformer(dict(base, patch_3d=True, fake_3d=False,
                                    time_patch_size=2))
    assert cfg.patch_mode == "3d" and cfg.t_patch == 2
    _, cfg = build_transformer(dict(base, patch_3d=True, fake_3d=True))
    assert cfg.patch_mode == "fake_3d"
    _, cfg = build_transformer(dict(base, casual_3d=True,
                                    casual_3d_upsampler_index=[16, 20]))
    assert cfg.patch_mode == "casual_3d"
    assert cfg.casual_3d_upsampler_index == (16, 20)
    _, cfg = build_transformer(dict(base, patch_3d=False, fake_3d=False))
    assert cfg.patch_mode == "2d"

def test_hunyuan_clip_image_branch(rng):
    cfg = dataclasses.replace(TINY_V4, n_query=4, projection_dim=12)
    model = HunyuanTransformer3D(cfg)
    lat = jnp.asarray(rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32))
    bert = jnp.zeros((1, 7, cfg.cross_attention_dim))
    t5 = jnp.zeros((1, 5, cfg.cross_attention_dim_t5))
    clip = jnp.asarray(rng.standard_normal((1, 16, 12)).astype(np.float32))
    mask = jnp.ones((1, 4))
    kw = dict(clip_encoder_hidden_states=clip, clip_attention_mask=mask)
    params = model.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), bert,
                        None, t5, **kw)
    out = model.apply(params, lat, jnp.array([1.0]), bert, None, t5, **kw)
    assert out.shape == (1, 8, 2, 8, 8)
    assert np.isfinite(np.asarray(out)).all()
    # padding table replaces masked resampler tokens: all-zero mask must
    # change the output
    out2 = model.apply(params, lat, jnp.array([1.0]), bert, None, t5,
                       clip_encoder_hidden_states=clip,
                       clip_attention_mask=jnp.zeros((1, 4)))
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    import flax
    flat = flax.traverse_util.flatten_dict(params["params"], sep="/")
    assert "clip_projection/query" in flat
    assert flat["clip_padding"].shape == (4, cfg.cross_attention_dim)
    assert "block0/attn_clip/to_q/kernel" in flat

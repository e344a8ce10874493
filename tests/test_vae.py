"""MagViT VAE tests: causal-conv golden parity vs torch, chunk-cache
equivalence (the functional replacement for the reference's padding-flag
protocol), and encode/decode shape/roundtrip checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from easyanimate_tpu.models.vae import (
    AutoencoderKLMagvit,
    MagvitVAEConfig,
    latent_frame_count,
    vae_decode,
    vae_encode,
)
from easyanimate_tpu.models.vae.layers import CausalConv3d

TINY = MagvitVAEConfig(
    latent_channels=4,
    block_out_channels=(8, 16),
    down_block_types=("SpatialTemporalDownBlock3D", "SpatialDownBlock3D"),
    up_block_types=("SpatialTemporalUpBlock3D", "SpatialUpBlock3D"),
    layers_per_block=1,
    norm_num_groups=4,
    mini_batch_encoder=2,
    mini_batch_decoder=1,
    spatial_group_norm=True,
)


def _torch_causal_conv(x_np, k_np, b_np, stride, spad):
    """x: (B,T,H,W,C) numpy; k: (T,H,W,I,O). Returns (B,T,H,W,C)."""
    x = torch.from_numpy(x_np).permute(0, 4, 1, 2, 3)  # BCTHW
    w = torch.from_numpy(k_np).permute(4, 3, 0, 1, 2)  # OITHW
    t_pad = k_np.shape[0] - 1
    (pt, pb), (pl, pr) = spad
    x = F.pad(x, (pl, pr, pt, pb, 0, 0))
    x = F.pad(x, (0, 0, 0, 0, t_pad, 0), mode="replicate")
    y = F.conv3d(x, w, torch.from_numpy(b_np), stride=stride)
    return y.permute(0, 2, 3, 4, 1).numpy()


@pytest.mark.parametrize("stride,spad", [
    ((1, 1, 1), ((1, 1), (1, 1))),
    ((2, 2, 2), ((0, 1), (0, 1))),
    ((2, 1, 1), ((1, 1), (1, 1))),
])
def test_causal_conv3d_matches_torch(rng, stride, spad):
    b, t, h, w, ci, co = 1, 9, 8, 8, 3, 5
    x = rng.standard_normal((b, t, h, w, ci)).astype(np.float32)
    conv = CausalConv3d(co, (3, 3, 3), stride, spad)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y, _ = conv.apply(params, jnp.asarray(x))
    k = np.asarray(params["params"]["kernel"])
    bias = np.asarray(params["params"]["bias"])
    want = _torch_causal_conv(x, k, bias, stride, spad)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("stride", [(1, 1, 1), (2, 1, 1)])
def test_causal_conv3d_chunked_equals_full(rng, stride):
    """Chunked evaluation with the cache must reproduce full-sequence
    evaluation exactly (the core property replacing reference flags 3/4)."""
    b, t, h, w, c = 1, 9, 4, 4, 3
    x = rng.standard_normal((b, t, h, w, c)).astype(np.float32)
    conv = CausalConv3d(6, (3, 3, 3), stride)
    params = conv.init(jax.random.PRNGKey(1), jnp.asarray(x))
    full, _ = conv.apply(params, jnp.asarray(x))

    # chunks: [1, 4, 4] like cache_mag_vae
    outs, cache = [], None
    for sl in [slice(0, 1), slice(1, 5), slice(5, 9)]:
        y, cache = conv.apply(params, jnp.asarray(x[:, sl]), cache)
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, np.asarray(full), atol=1e-5, rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_vae():
    vae = AutoencoderKLMagvit(TINY)
    x = jnp.zeros((1, 1, 16, 16, 3))
    params = vae.init(jax.random.PRNGKey(0), x)
    return vae, params


def test_encode_shapes_and_frame_remap(tiny_vae, rng):
    vae, params = tiny_vae
    t = 9
    video = jnp.asarray(rng.standard_normal((1, 3, t, 16, 16)).astype(np.float32))
    moments = vae_encode(vae, params, video)
    lt = latent_frame_count(t, TINY)
    assert lt == (t - 1) // 2 + 1 == 5
    assert moments.shape == (1, 2 * TINY.latent_channels, lt, 8, 8)
    assert np.isfinite(np.asarray(moments)).all()


def test_encode_chunked_equals_full(tiny_vae, rng):
    """With spatial_group_norm + spatial mid attention (the V5.1 setup),
    chunked cache_mag encoding equals whole-clip encoding."""
    vae, params = tiny_vae
    video = jnp.asarray(rng.standard_normal((1, 3, 9, 16, 16)).astype(np.float32))
    chunked = vae_encode(vae, params, video)
    import dataclasses
    full_cfg = dataclasses.replace(TINY, chunk_mode="none")
    vae_full = AutoencoderKLMagvit(full_cfg)
    full = vae_encode(vae_full, params, video)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               atol=2e-4, rtol=2e-4)


def test_decode_chunked_equals_full(tiny_vae, rng):
    vae, params = tiny_vae
    z = jnp.asarray(rng.standard_normal((1, 4, 3, 8, 8)).astype(np.float32))
    chunked = vae_decode(vae, params, z)
    import dataclasses
    full_cfg = dataclasses.replace(TINY, chunk_mode="none")
    vae_full = AutoencoderKLMagvit(full_cfg)
    full = vae_decode(vae_full, params, z)
    assert chunked.shape == full.shape == (1, 3, 5, 16, 16)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               atol=2e-4, rtol=2e-4)


def test_roundtrip_jit_and_finite(tiny_vae, rng):
    vae, params = tiny_vae
    video = jnp.asarray(rng.standard_normal((1, 3, 5, 16, 16)).astype(np.float32))

    @jax.jit
    def roundtrip(v):
        m = vae_encode(vae, params, v)
        mean = m[:, : TINY.latent_channels]
        return vae_decode(vae, params, mean)

    out = roundtrip(video)
    assert out.shape == video.shape
    assert np.isfinite(np.asarray(out)).all()


def test_tiled_encode_decode_close_to_untiled(tiny_vae, rng):
    """Tiling changes values only near seams; interiors must match closely
    and shapes exactly."""
    import dataclasses
    from easyanimate_tpu.models.vae import vae_decode_tiled, vae_encode_tiled

    vae, params = tiny_vae
    cfg = dataclasses.replace(TINY, tile_sample_min_size=16,
                              tile_overlap_factor=0.25)
    vae_t = AutoencoderKLMagvit(cfg)
    video = jnp.asarray(rng.standard_normal((1, 3, 3, 32, 32)).astype(np.float32))
    m_t = vae_encode_tiled(vae_t, params, video)
    m = vae_encode(vae_t, params, video)
    assert m_t.shape == m.shape
    # tiling is approximate (mid-block spatial attention is per-tile); the
    # outputs must still be strongly correlated with the untiled encode
    a, b = np.asarray(m_t).ravel(), np.asarray(m).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.9, corr

    z = jnp.asarray(rng.standard_normal((1, 4, 2, 16, 16)).astype(np.float32))
    d_t = vae_decode_tiled(vae_t, params, z)
    d = vae_decode(vae_t, params, z)
    assert d_t.shape == d.shape
    assert np.isfinite(np.asarray(d_t)).all()


def test_smooth_output_runs(tiny_vae, rng):
    from easyanimate_tpu.models.vae import smooth_output

    vae, params = tiny_vae
    video = jnp.asarray(rng.standard_normal((1, 3, 9, 16, 16)).astype(np.float32))
    out = smooth_output(vae, params, video)
    assert out.shape == video.shape
    assert np.isfinite(np.asarray(out)).all()

def test_gc_block_gates_and_preserves_shape(rng):
    """GlobalContextBlock (gc_block.py:7-80): sigmoid-gated per-frame
    modulation, near-closed gate at init (bias -10)."""
    import dataclasses as dc

    from easyanimate_tpu.models.vae.blocks import GlobalContextBlock

    gc = GlobalContextBlock(8)
    x = jnp.asarray(rng.standard_normal((1, 3, 4, 4, 8)).astype(np.float32))
    params = gc.init(jax.random.PRNGKey(0), x)
    y = gc.apply(params, x)
    assert y.shape == x.shape
    # init bias -10 -> sigmoid ~ 4.5e-5: output is a heavily gated copy
    assert float(jnp.abs(y).max()) < 1e-3 * float(jnp.abs(x).max()) + 1e-4

    cfg = dc.replace(TINY, use_gc_blocks=(True, False))
    vae = AutoencoderKLMagvit(cfg)
    vid = jnp.zeros((1, 3, 16, 16, 3))
    vp = vae.init(jax.random.PRNGKey(0), vid)
    import flax

    flat = flax.traverse_util.flatten_dict(vp["params"], sep="/")
    assert any("down0/gc_block" in k for k in flat)
    assert not any("down1/gc_block" in k for k in flat)
    assert any("up1/gc_block" in k for k in flat)   # mirrored order
    out = vae.apply(vp, vid)
    assert np.isfinite(np.asarray(out)).all()

def test_compression_chunk_modes(rng):
    """V3/V4 slicevae protocols (omnigen_enc_dec.py:296-327 encode,
    :630-667 decode): non-causal chunk encode, cached-uniform decode
    (cache_compression) and neighbour-context decode (slice_compression)."""
    import dataclasses as dc

    from easyanimate_tpu.models.vae import latent_frame_count, vae_decode, vae_encode

    for mode in ("cache_compression", "slice_compression"):
        cfg = dc.replace(TINY, chunk_mode=mode, mini_batch_encoder=4,
                         mini_batch_decoder=1)
        vae = AutoencoderKLMagvit(cfg)
        vp = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 16, 16, 3)))
        x = jnp.asarray(rng.standard_normal((1, 9, 16, 16, 3))
                        .astype(np.float32))
        mom = vae_encode(vae, vp, x, channels_first=False)
        # 9 frames odd: 1 + 2 chunks of 4 -> 1 + 2*1 = 3 latents (tc=2 on
        # TINY halves each 4-frame chunk twice? TINY temporal compression)
        assert mom.shape[1] == latent_frame_count(9, cfg)
        vid = vae_decode(vae, vp, mom[..., :cfg.latent_channels],
                         channels_first=False)
        assert np.isfinite(np.asarray(vid)).all()
        assert vid.shape[2:] == (16, 16, 3)

    # slice_compression context decode really uses the neighbours: output of
    # a middle chunk changes when the next chunk changes
    cfg = dc.replace(TINY, chunk_mode="slice_compression",
                     mini_batch_encoder=4, mini_batch_decoder=2)
    vae = AutoencoderKLMagvit(cfg)
    vp = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 16, 16, 3)))
    z = jnp.asarray(rng.standard_normal((1, 6, 8, 8, 4)).astype(np.float32))
    v1 = vae_decode(vae, vp, z, channels_first=False)
    z2 = z.at[:, 4:].add(3.0)   # perturb only the LAST chunk
    v2 = vae_decode(vae, vp, z2, channels_first=False)
    t_first_chunk = v1.shape[1] // 3
    mid = np.asarray(v1)[:, t_first_chunk: 2 * t_first_chunk]
    mid2 = np.asarray(v2)[:, t_first_chunk: 2 * t_first_chunk]
    assert not np.allclose(mid, mid2)   # context flows across chunks


def test_decode_chunk_frames_matches_reference_chunking(rng):
    """decode_chunk_frames is a pure performance knob: any decode pass size
    must reproduce the mini_batch_decoder=1 output (the cache_mag causal
    cache threads exact conv state across passes; only float reassociation
    from the different conv batching differs, ~1e-6)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from easyanimate_tpu.models.vae import (AutoencoderKLMagvit,
                                            MagvitVAEConfig, vae_decode)

    base = MagvitVAEConfig(
        latent_channels=4, block_out_channels=(8, 16),
        down_block_types=("SpatialTemporalDownBlock3D", "SpatialDownBlock3D"),
        up_block_types=("SpatialTemporalUpBlock3D", "SpatialUpBlock3D"),
        layers_per_block=1, norm_num_groups=4, mini_batch_encoder=2,
        mini_batch_decoder=1)
    vae = AutoencoderKLMagvit(base)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 8, 8, 3)))
    lat = jnp.asarray(rng.standard_normal((1, 4, 5, 4, 4)).astype(np.float32))
    want = np.asarray(vae_decode(vae, params, lat))
    for chunk in (2, 4, 5):
        vae_c = AutoencoderKLMagvit(
            dataclasses.replace(base, decode_chunk_frames=chunk))
        got = np.asarray(vae_decode(vae_c, params, lat))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # tiled decode (the path real resolutions take) honors the knob too
    from easyanimate_tpu.models.vae import vae_decode_tiled

    tiled_base = dataclasses.replace(base, tile_sample_min_size=8)
    lat_big = jnp.asarray(
        rng.standard_normal((1, 4, 5, 4, 6)).astype(np.float32))
    want_t = np.asarray(vae_decode_tiled(
        AutoencoderKLMagvit(tiled_base), params, lat_big))
    got_t = np.asarray(vae_decode_tiled(
        AutoencoderKLMagvit(
            dataclasses.replace(tiled_base, decode_chunk_frames=4)),
        params, lat_big))
    np.testing.assert_allclose(got_t, want_t, atol=1e-5, rtol=1e-5)

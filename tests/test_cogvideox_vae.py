"""CogVideoX VAE: shapes, frame math, chunk protocol, converter structure."""
import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easyanimate_tpu.models.convert import convert_cogvideox_state_dict
from easyanimate_tpu.models.vae import (
    AutoencoderKLCogVideoX,
    CogVideoXVAEConfig,
    cog_latent_frame_count,
    gaussian_mode,
    vae_decode,
    vae_encode,
)
from easyanimate_tpu.models.vae.cogvideox import (
    _temporal_pool2,
    _temporal_up2,
    chunked_apply_cog,
)

TINY = CogVideoXVAEConfig(
    latent_channels=4, block_out_channels=(8, 16, 16, 32),
    layers_per_block=1, norm_num_groups=4,
    mini_batch_encoder=4, mini_batch_decoder=2)


@pytest.fixture(scope="module")
def vae_and_params():
    vae = AutoencoderKLCogVideoX(TINY)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 32, 32, 3)))
    return vae, params


def test_roundtrip_shapes(vae_and_params, rng):
    vae, params = vae_and_params
    x = jnp.asarray(rng.standard_normal((1, 9, 32, 32, 3)).astype(np.float32))
    mom = vae_encode(vae, params, x, channels_first=False)
    assert mom.shape == (1, 3, 4, 4, 8)   # 8x spatial, 2+1 latent frames
    lat = gaussian_mode(mom, axis=-1)
    vid = vae_decode(vae, params, lat, channels_first=False)
    assert vid.shape == (1, 9, 32, 32, 3)
    assert np.isfinite(np.asarray(vid)).all()


def test_latent_frame_count():
    # headline workload: 49 pixel frames -> 13 latents (4x temporal)
    assert cog_latent_frame_count(49, TINY) == 13
    assert cog_latent_frame_count(9, TINY) == 3
    assert cog_latent_frame_count(1, TINY) == 1


def test_temporal_pool_and_up_odd_even():
    x = jnp.arange(5, dtype=jnp.float32).reshape(1, 5, 1, 1, 1)
    p = np.asarray(_temporal_pool2(x)).ravel()
    np.testing.assert_allclose(p, [0.0, 1.5, 3.5])     # first kept, pairs avg
    x4 = jnp.arange(4, dtype=jnp.float32).reshape(1, 4, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(_temporal_pool2(x4)).ravel(),
                               [0.5, 2.5])
    u = np.asarray(_temporal_up2(jnp.asarray([[5.0, 7.0]]).reshape(
        1, 2, 1, 1, 1))).ravel()
    np.testing.assert_allclose(u, [5, 5, 7, 7])
    u3 = np.asarray(_temporal_up2(jnp.asarray([[5.0, 7.0, 9.0]]).reshape(
        1, 3, 1, 1, 1))).ravel()
    np.testing.assert_allclose(u3, [5, 7, 7, 9, 9])    # first frame kept


def test_chunk_protocol_first_chunk_absorbs_remainder():
    calls = []

    def apply_fn(x, cache):
        calls.append((x.shape[1], cache is None))
        return x, jnp.zeros(()) if cache is None else cache

    x = jnp.zeros((1, 13, 2, 2, 4))
    chunked_apply_cog(apply_fn, x, 2)
    assert calls[0] == (3, True)           # 2 + 13%2
    assert all(c == (2, False) for c in calls[1:])


def test_converter_structure_roundtrip(vae_and_params):
    vae, params = vae_and_params
    flat = flax.traverse_util.flatten_dict(params["params"], sep="/")

    # build a fake diffusers state dict by inverting each transform
    sd = {}
    inv3d = lambda w: np.transpose(np.asarray(w), (4, 3, 0, 1, 2))
    for dst, v in flat.items():
        v = np.asarray(v)
        parts = dst.split("/")
        pre = parts[0]
        if parts[-2:] == ["conv_y", "kernel"] or parts[-2:] == ["conv_b", "kernel"]:
            src = None  # handled via spatial-norm naming below
        if "norm_layer" in dst or "conv_y" in dst or "conv_b" in dst:
            mod = parts[-2]
            leaf = parts[-1]
            mid = ".".join(_src_name(p) for p in parts[1:-2])
            if mod == "norm_layer":
                sd[f"{pre}.{mid}.norm_layer.{'weight' if leaf == 'scale' else 'bias'}"] = v
            else:
                if leaf == "kernel":
                    sd[f"{pre}.{mid}.{mod}.conv.weight"] = v.T[:, :, None, None, None]
                else:
                    sd[f"{pre}.{mid}.{mod}.conv.bias"] = v
        elif dst.endswith("conv_shortcut/kernel"):
            mid = ".".join(_src_name(p) for p in parts[1:-2])
            sd[f"{pre}.{mid}.conv_shortcut.weight"] = v.T[:, :, None, None, None]
        elif dst.endswith("conv_shortcut/bias"):
            mid = ".".join(_src_name(p) for p in parts[1:-2])
            sd[f"{pre}.{mid}.conv_shortcut.bias"] = v
        elif "downsampler/conv" in dst or "upsampler/conv" in dst:
            mid = ".".join(_src_name(p) for p in parts[1:-2])
            if dst.endswith("kernel"):
                sd[f"{pre}.{mid}.conv.weight"] = np.transpose(v[0], (3, 2, 0, 1))
            else:
                sd[f"{pre}.{mid}.conv.bias"] = v
        elif parts[-2].startswith("norm") and not parts[-2].startswith("norm_layer"):
            mid = ".".join(_src_name(p) for p in parts[1:-2] + [parts[-2]])
            sd[f"{pre}.{mid}.{'weight' if parts[-1] == 'scale' else 'bias'}"] = v
        elif dst.endswith("kernel"):
            mid = ".".join(_src_name(p) for p in parts[1:-1])
            sd[f"{pre}.{mid}.conv.weight"] = inv3d(v)
        else:
            mid = ".".join(_src_name(p) for p in parts[1:-1])
            sd[f"{pre}.{mid}.conv.bias"] = v

    got = convert_cogvideox_state_dict(sd, TINY)
    got_flat = flax.traverse_util.flatten_dict(got["params"], sep="/")
    assert set(got_flat) == set(flat)
    for k in flat:
        np.testing.assert_allclose(np.asarray(got_flat[k]),
                                   np.asarray(flat[k]), atol=0,
                                   err_msg=k)


def _src_name(p):
    """my module path element -> diffusers path element."""
    import re

    m = re.fullmatch(r"(down|up)(\d+)_res(\d+)", p)
    if m:
        kind = "down_blocks" if m.group(1) == "down" else "up_blocks"
        return f"{kind}.{m.group(2)}.resnets.{m.group(3)}"
    m = re.fullmatch(r"mid_res(\d+)", p)
    if m:
        return f"mid_block.resnets.{m.group(1)}"
    m = re.fullmatch(r"(down|up)(\d+)_(down|up)sampler", p)
    if m:
        kind = "down_blocks" if m.group(1) == "down" else "up_blocks"
        return f"{kind}.{m.group(2)}.{m.group(3)}samplers.0"
    return p


def test_cog_tiled_decode(vae_and_params, rng):
    """Generic spatial tiling works over the cog chunk protocol."""
    import dataclasses

    from easyanimate_tpu.models.vae import vae_decode_tiled

    vae, params = vae_and_params
    cfg = dataclasses.replace(TINY, tile_sample_min_size=32,
                              tile_overlap_factor=0.25)
    from easyanimate_tpu.models.vae import AutoencoderKLCogVideoX

    vae_t = AutoencoderKLCogVideoX(cfg)
    lat = jnp.asarray(rng.standard_normal((1, 3, 6, 6, 4)).astype(np.float32))
    vid = vae_decode_tiled(vae_t, params, lat, channels_first=False)
    assert vid.shape == (1, 9, 48, 48, 3)
    assert np.isfinite(np.asarray(vid)).all()

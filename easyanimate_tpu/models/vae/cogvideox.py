"""CogVideoX 3D causal VAE — the reference's alternative video autoencoder.

Parity target: easyanimate/vae/ldm/models/cogvideox_enc_dec.py (encoder
:28-166, decoder :168-311) + the AutoencoderKLCogVideoX wrapper
(easyanimate/models/autoencoder_magvit.py:525-943) whose "fake context
parallel" per-conv frame cache and frame-batched encode(4)/decode(2)
chunking (:746-804) become the same functional `(x, cache) -> (y, cache)`
protocol used by the MagViT VAE here (layers.py).

Architectural differences from MagViT:
  * temporal down/up sampling is pooling/nearest-interp around spatial-only
    convs (CogVideoXDownsample3D/CogVideoXUpsample3D), with an odd-length
    first-frame special case per chunk, instead of strided causal convs;
  * decoder resnets normalize with SpatialNorm3D conditioned on the latents
    (zq), nearest-resized to the feature grid;
  * GroupNorm runs over the whole chunk (not per frame), so chunked decode
    is *by design* only chunk-locally normalized — exactly the reference
    behaviour.

Layout: channels-last (B, T, H, W, C); wrappers convert from (B, C, T, H, W).
"""
import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import CausalConv3d, Conv1x1x1, GroupNorm
from .magvit import gaussian_mode, gaussian_sample  # noqa: F401 (re-export)


def _sub(cache, name):
    return None if cache is None else cache.get(name)


@dataclasses.dataclass(frozen=True)
class CogVideoXVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    layers_per_block: int = 3
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    temporal_compression_ratio: int = 4
    use_quant_conv: bool = False
    scaling_factor: float = 1.15258426
    # frame-batched chunking (autoencoder_magvit.py:754,788)
    mini_batch_encoder: int = 4            # pixel frames per encode chunk
    mini_batch_decoder: int = 2            # latent frames per decode chunk
    chunk_mode: str = "cog"
    tile_sample_min_size: int = 512
    tile_overlap_factor: float = 0.2
    dtype: str = "float32"

    @property
    def temporal_compress_level(self) -> int:
        import math

        return int(math.log2(self.temporal_compression_ratio))

    @property
    def spatial_compression(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @property
    def temporal_compression(self) -> int:
        return self.temporal_compression_ratio

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


class CogSpatialNorm3D(nn.Module):
    """SpatialNorm3D: GroupNorm(f) modulated by pointwise convs of the
    latents zq, nearest-resized to f's grid with the odd-first-frame split."""

    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f, zq):
        b, t, h, w, _ = f.shape
        tz = zq.shape[1]
        if t > 1 and t % 2 == 1 and t != tz:
            zf, zr = zq[:, :1], zq[:, 1:]
            zf = jax.image.resize(zf, (b, 1, h, w, zq.shape[-1]), "nearest")
            zr = jax.image.resize(zr, (b, t - 1, h, w, zq.shape[-1]),
                                  "nearest")
            zq = jnp.concatenate([zf, zr], axis=1)
        else:
            zq = jax.image.resize(zq, (b, t, h, w, zq.shape[-1]), "nearest")
        normed = GroupNorm(self.groups, 1e-6, spatial=False,
                           name="norm_layer")(f)
        y = Conv1x1x1(f.shape[-1], dtype=self.dtype, name="conv_y")(zq)
        bch = Conv1x1x1(f.shape[-1], dtype=self.dtype, name="conv_b")(zq)
        return normed * y + bch


class CogResnetBlock3D(nn.Module):
    features: int
    groups: int = 32
    spatial_norm: bool = False            # decoder blocks condition on zq
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, zq=None, cache=None):
        new_cache = {}
        if self.spatial_norm:
            h = CogSpatialNorm3D(self.groups, self.dtype, name="norm1")(x, zq)
        else:
            h = GroupNorm(self.groups, 1e-6, spatial=False, name="norm1")(x)
        h = nn.silu(h)
        h, new_cache["conv1"] = CausalConv3d(
            self.features, dtype=self.dtype, name="conv1")(
            h, _sub(cache, "conv1"))
        if self.spatial_norm:
            h = CogSpatialNorm3D(self.groups, self.dtype, name="norm2")(h, zq)
        else:
            h = GroupNorm(self.groups, 1e-6, spatial=False, name="norm2")(h)
        h = nn.silu(h)
        h, new_cache["conv2"] = CausalConv3d(
            self.features, dtype=self.dtype, name="conv2")(
            h, _sub(cache, "conv2"))
        shortcut = x
        if x.shape[-1] != self.features:
            shortcut = Conv1x1x1(self.features, dtype=self.dtype,
                                 name="conv_shortcut")(x)
        return shortcut + h, new_cache


def _temporal_pool2(x):
    """avg-pool pairs over time, keeping an odd chunk's first frame intact
    (CogVideoXDownsample3D.compress_time)."""
    t = x.shape[1]
    if t % 2 == 1:
        first, rest = x[:, :1], x[:, 1:]
        if rest.shape[1] > 0:
            rest = 0.5 * (rest[:, 0::2] + rest[:, 1::2])
        return jnp.concatenate([first, rest], axis=1)
    return 0.5 * (x[:, 0::2] + x[:, 1::2])


def _temporal_up2(x):
    """nearest 2x over time with the odd-first-frame special
    (CogVideoXUpsample3D.compress_time)."""
    t = x.shape[1]
    if t > 1 and t % 2 == 1:
        first, rest = x[:, :1], x[:, 1:]
        rest = jnp.repeat(rest, 2, axis=1)
        return jnp.concatenate([first, rest], axis=1)
    if t > 1:
        return jnp.repeat(x, 2, axis=1)
    return x


class CogDownsample3D(nn.Module):
    """optional temporal pair-pool, then per-frame conv stride 2 with the
    asymmetric (0,1,0,1) pad."""

    features: int
    compress_time: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.compress_time:
            x = _temporal_pool2(x)
        y, _ = CausalConv3d(self.features, kernel_size=(1, 3, 3),
                            stride=(1, 2, 2),
                            spatial_padding=((0, 1), (0, 1)),
                            dtype=self.dtype, name="conv")(x)
        return y


class CogUpsample3D(nn.Module):
    """nearest 2x spatial (and optionally temporal), then per-frame conv."""

    features: int
    compress_time: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        x = jax.image.resize(x, (b, t, 2 * h, 2 * w, c), "nearest")
        if self.compress_time:
            x = _temporal_up2(x)
        y, _ = CausalConv3d(self.features, kernel_size=(1, 3, 3),
                            dtype=self.dtype, name="conv")(x)
        return y


class CogEncoder3D(nn.Module):
    cfg: CogVideoXVAEConfig

    @nn.compact
    def __call__(self, x, cache=None):
        cfg = self.cfg
        dt = cfg.jdtype
        new_cache = {}
        x, new_cache["conv_in"] = CausalConv3d(
            cfg.block_out_channels[0], dtype=dt, name="conv_in")(
            x, _sub(cache, "conv_in"))
        n = len(cfg.block_out_channels)
        for i in range(n):
            bname = f"down{i}"
            bcache = {}
            for j in range(cfg.layers_per_block):
                rname = f"res{j}"
                x, bcache[rname] = CogResnetBlock3D(
                    cfg.block_out_channels[i], cfg.norm_num_groups,
                    dtype=dt, name=f"{bname}_{rname}")(
                    x, cache=_sub(_sub(cache, bname), rname))
            if i < n - 1:
                x = CogDownsample3D(
                    cfg.block_out_channels[i],
                    compress_time=i < cfg.temporal_compress_level,
                    dtype=dt, name=f"{bname}_downsampler")(x)
            new_cache[bname] = bcache
        mcache = {}
        for j in range(2):
            x, mcache[f"res{j}"] = CogResnetBlock3D(
                cfg.block_out_channels[-1], cfg.norm_num_groups,
                dtype=dt, name=f"mid_res{j}")(
                x, cache=_sub(_sub(cache, "mid"), f"res{j}"))
        new_cache["mid"] = mcache
        x = GroupNorm(cfg.norm_num_groups, 1e-6, spatial=False,
                      name="norm_out")(x)
        x = nn.silu(x)
        x, new_cache["conv_out"] = CausalConv3d(
            2 * cfg.latent_channels, dtype=dt, name="conv_out")(
            x, _sub(cache, "conv_out"))
        return x, new_cache


class CogDecoder3D(nn.Module):
    cfg: CogVideoXVAEConfig

    @nn.compact
    def __call__(self, z, cache=None):
        cfg = self.cfg
        dt = cfg.jdtype
        zq = z
        new_cache = {}
        rev = list(reversed(cfg.block_out_channels))
        x, new_cache["conv_in"] = CausalConv3d(
            rev[0], dtype=dt, name="conv_in")(z, _sub(cache, "conv_in"))
        mcache = {}
        for j in range(2):
            x, mcache[f"res{j}"] = CogResnetBlock3D(
                rev[0], cfg.norm_num_groups, spatial_norm=True,
                dtype=dt, name=f"mid_res{j}")(
                x, zq, cache=_sub(_sub(cache, "mid"), f"res{j}"))
        new_cache["mid"] = mcache
        n = len(rev)
        for i in range(n):
            bname = f"up{i}"
            bcache = {}
            for j in range(cfg.layers_per_block + 1):
                rname = f"res{j}"
                x, bcache[rname] = CogResnetBlock3D(
                    rev[i], cfg.norm_num_groups, spatial_norm=True,
                    dtype=dt, name=f"{bname}_{rname}")(
                    x, zq, cache=_sub(_sub(cache, bname), rname))
            if i < n - 1:
                x = CogUpsample3D(
                    rev[i], compress_time=i < cfg.temporal_compress_level,
                    dtype=dt, name=f"{bname}_upsampler")(x)
            new_cache[bname] = bcache
        x = CogSpatialNorm3D(cfg.norm_num_groups, dt, name="norm_out")(x, zq)
        x = nn.silu(x)
        x, new_cache["conv_out"] = CausalConv3d(
            cfg.out_channels, dtype=dt, name="conv_out")(
            x, _sub(cache, "conv_out"))
        return x, new_cache


class AutoencoderKLCogVideoX(nn.Module):
    """Same encode_chunk/decode_chunk surface as AutoencoderKLMagvit, so
    vae_encode/vae_decode dispatch on cfg.chunk_mode == 'cog'."""

    cfg: CogVideoXVAEConfig

    def setup(self):
        self.encoder = CogEncoder3D(self.cfg, name="encoder")
        self.decoder = CogDecoder3D(self.cfg, name="decoder")
        if self.cfg.use_quant_conv:
            self.quant_conv = Conv1x1x1(2 * self.cfg.latent_channels,
                                        dtype=self.cfg.jdtype,
                                        name="quant_conv")
            self.post_quant_conv = Conv1x1x1(self.cfg.latent_channels,
                                             dtype=self.cfg.jdtype,
                                             name="post_quant_conv")

    def encode_chunk(self, x, cache=None):
        h, cache = self.encoder(x, cache)
        if self.cfg.use_quant_conv:
            h = self.quant_conv(h)
        return h, cache

    def decode_chunk(self, z, cache=None):
        if self.cfg.use_quant_conv:
            z = self.post_quant_conv(z)
        return self.decoder(z, cache)

    def __call__(self, x):
        moments, _ = self.encode_chunk(x)
        mean, _ = jnp.split(moments, 2, axis=-1)
        dec, _ = self.decode_chunk(mean)
        return dec


def chunked_apply_cog(apply_fn, x, chunk: int):
    """CogVideoX frame batching (autoencoder_magvit.py:754-764): the FIRST
    chunk absorbs the remainder (chunk + t%chunk frames), the rest are
    uniform `chunk`-frame windows run under lax.scan with the conv cache
    threaded through."""
    b, t = x.shape[0], x.shape[1]
    if t <= chunk:
        y, _ = apply_fn(x, None)
        return y
    first = chunk + t % chunk
    y0, cache = apply_fn(x[:, :first], None)
    rest = x[:, first:]
    n = (t - first) // chunk
    outs = [y0]
    if n > 0:
        chunks = rest.reshape(b, n, chunk, *rest.shape[2:])
        chunks = jnp.moveaxis(chunks, 1, 0)

        def step(c, xc):
            y, c = apply_fn(xc, c)
            return c, y

        _, ys = jax.lax.scan(step, cache, chunks)
        ys = jnp.moveaxis(ys, 0, 1)
        outs.append(ys.reshape(b, -1, *ys.shape[3:]))
    return jnp.concatenate(outs, axis=1)


def cog_latent_frame_count(frames: int, cfg: CogVideoXVAEConfig) -> int:
    """pixel frames -> latent frames under the chunked causal encode."""
    chunk = cfg.mini_batch_encoder
    if frames <= chunk:
        return _causal_pooled_len(frames, cfg.temporal_compress_level)
    first = chunk + frames % chunk
    n = (frames - first) // chunk
    return (_causal_pooled_len(first, cfg.temporal_compress_level)
            + n * (chunk // cfg.temporal_compression_ratio))


def _causal_pooled_len(t: int, levels: int) -> int:
    for _ in range(levels):
        t = 1 + (t - 1 + 1) // 2 if t % 2 == 1 else t // 2
    return t

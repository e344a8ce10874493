"""AutoencoderKLMagvit: the MagViT-v2-style 3D causal video VAE, TPU-native.

Parity target: easyanimate/models/autoencoder_magvit.py:59-505 +
easyanimate/vae/ldm/models/omnigen_enc_dec.py. The reference's stateful
padding-flag protocol becomes functional chunk caches (see layers.py); the
chunk loops (`cache_mag_vae`: frame 0 alone, then mini-batches,
omnigen_enc_dec.py:283-291/:621-629) compile to a single `lax.scan` over
equal-size chunks.

Layout: public API is reference-compatible (B, C, T, H, W); everything
internal is channels-last (B, T, H, W, C).
"""
import dataclasses
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import DownBlock3D, MidBlock3D, UpBlock3D, _sub
from .layers import CausalConv3d, Conv1x1x1, GroupNorm

_DOWN_KIND = {
    "SpatialDownBlock3D": "spatial",
    "TemporalDownBlock3D": "temporal",
    "SpatialTemporalDownBlock3D": "spatial_temporal",
    "DownBlock3D": None,
}
_UP_KIND = {
    "SpatialUpBlock3D": "spatial",
    "TemporalUpBlock3D": "temporal",
    "SpatialTemporalUpBlock3D": "spatial_temporal",
    "UpBlock3D": None,
}


@dataclasses.dataclass(frozen=True)
class MagvitVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    down_block_types: Sequence[str] = (
        "SpatialDownBlock3D",
        "SpatialTemporalDownBlock3D",
        "SpatialTemporalDownBlock3D",
        "SpatialTemporalDownBlock3D",
    )
    up_block_types: Sequence[str] = (
        "SpatialUpBlock3D",
        "SpatialTemporalUpBlock3D",
        "SpatialTemporalUpBlock3D",
        "SpatialTemporalUpBlock3D",
    )
    layers_per_block: int = 2
    norm_num_groups: int = 32
    mid_block_attention_type: str = "spatial"
    mid_block_use_attention: bool = True
    spatial_group_norm: bool = True
    # per-block GlobalContextBlock toggle (omnigen_enc_dec.py:88-93)
    use_gc_blocks: Optional[Tuple[bool, ...]] = None
    mini_batch_encoder: int = 4
    mini_batch_decoder: int = 1
    # decode-side PERFORMANCE chunking only: latent frames fed per decoder
    # pass in cache_mag mode. mini_batch_decoder stays the SEMANTIC remap
    # parameter (latent_frame_count); the causal-cache protocol makes the
    # pass size mathematically irrelevant (chunked==full tests), so larger
    # passes trade VMEM for fewer, better-utilized device programs.
    # None = mini_batch_decoder (reference behavior).
    decode_chunk_frames: Optional[int] = None
    scaling_factor: float = 0.7119
    # chunking mode: 'cache_mag' (V5/V5.1), 'slice_mag' (independent chunks),
    # or 'none' (whole clip at once)
    chunk_mode: str = "cache_mag"
    # spatial tiling for large resolutions
    tile_sample_min_size: int = 384
    tile_overlap_factor: float = 0.25
    dtype: str = "float32"

    @property
    def temporal_compression(self) -> int:
        # the final down block carries no downsampler (reference
        # is_final_block, omnigen_enc_dec.py:106-118)
        return 2 ** sum(
            1 for t in self.down_block_types[:-1] if "Temporal" in t
        )

    @property
    def spatial_compression(self) -> int:
        return 2 ** sum(
            1 for t in self.down_block_types[:-1] if "Spatial" in t
        )

    @property
    def encoder_tmode(self) -> str:
        # slice/cache_compression encode chunks with symmetric (non-causal)
        # temporal padding — reference flags 1/2 (omnigen_enc_dec.py:296-327,
        # common.py:173-179); magvit modes stay causal
        return ("sym" if self.chunk_mode in ("slice_compression",
                                             "cache_compression")
                else "causal")

    @property
    def up_rule(self) -> str:
        return {"cache_compression": "always",
                "slice_compression": "chunk"}.get(self.chunk_mode, "magvit")

    @property
    def decoder_tmode(self) -> str:
        # cache_compression DECODES with the cached causal protocol
        # (flags 5/6, omnigen_enc_dec.py:630-647); slice_compression decodes
        # non-causally with neighbour-context chunks (:648-667)
        return "sym" if self.chunk_mode == "slice_compression" else "causal"

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


class Encoder(nn.Module):
    cfg: MagvitVAEConfig

    @nn.compact
    def __call__(self, x, cache=None):
        cfg = self.cfg
        dt = cfg.jdtype
        new_cache = {}
        tm = cfg.encoder_tmode
        x, new_cache["conv_in"] = CausalConv3d(
            cfg.block_out_channels[0], temporal_mode=tm, dtype=dt,
            name="conv_in")(x, _sub(cache, "conv_in"))
        for i, block_type in enumerate(cfg.down_block_types):
            is_final = i == len(cfg.block_out_channels) - 1
            name = f"down{i}"
            x, new_cache[name] = DownBlock3D(
                cfg.block_out_channels[i],
                num_layers=cfg.layers_per_block,
                downsample=None if is_final else _DOWN_KIND[block_type],
                norm_num_groups=cfg.norm_num_groups,
                spatial_norm=cfg.spatial_group_norm,
                add_gc_block=bool(cfg.use_gc_blocks[i]
                                  if cfg.use_gc_blocks else False),
                tmode=tm,
                dtype=dt,
                name=name,
            )(x, _sub(cache, name))
        x, new_cache["mid"] = MidBlock3D(
            num_layers=cfg.layers_per_block,
            attention_type=(cfg.mid_block_attention_type
                            if cfg.mid_block_use_attention else "none"),
            norm_num_groups=cfg.norm_num_groups,
            spatial_norm=cfg.spatial_group_norm,
            tmode=tm,
            dtype=dt,
            name="mid",
        )(x, _sub(cache, "mid"))
        x = GroupNorm(cfg.norm_num_groups, 1e-6, cfg.spatial_group_norm,
                      name="conv_norm_out")(x)
        x = nn.silu(x)
        x, new_cache["conv_out"] = CausalConv3d(
            2 * cfg.latent_channels, temporal_mode=tm, dtype=dt,
            name="conv_out")(x, _sub(cache, "conv_out"))
        return x, new_cache


class Decoder(nn.Module):
    cfg: MagvitVAEConfig

    @nn.compact
    def __call__(self, z, cache=None, prev=None, after=None):
        """prev/after: neighbouring latent chunks for slice_compression
        context decoding (omnigen_enc_dec.py:555-575): they widen the
        temporal window through conv_in + mid, then the middle is cropped
        before the up blocks."""
        cfg = self.cfg
        dt = cfg.jdtype
        new_cache = {}
        tm = cfg.decoder_tmode
        rev = list(reversed(cfg.block_out_channels))
        t_prev = 0 if prev is None else prev.shape[1]
        t_mid = z.shape[1]
        if prev is not None or after is not None:
            parts = [p for p in (prev, z, after) if p is not None]
            z = jnp.concatenate(parts, axis=1)
        z, new_cache["conv_in"] = CausalConv3d(
            rev[0], temporal_mode=tm, dtype=dt, name="conv_in"
        )(z, _sub(cache, "conv_in"))
        z, new_cache["mid"] = MidBlock3D(
            num_layers=cfg.layers_per_block,
            attention_type=(cfg.mid_block_attention_type
                            if cfg.mid_block_use_attention else "none"),
            norm_num_groups=cfg.norm_num_groups,
            spatial_norm=cfg.spatial_group_norm,
            tmode=tm,
            dtype=dt,
            name="mid",
        )(z, _sub(cache, "mid"))
        if prev is not None or after is not None:
            z = z[:, t_prev:t_prev + t_mid]
        for i, block_type in enumerate(cfg.up_block_types):
            is_final = i == len(cfg.block_out_channels) - 1
            name = f"up{i}"
            z, new_cache[name] = UpBlock3D(
                rev[i],
                num_layers=cfg.layers_per_block + 1,
                upsample=None if is_final else _UP_KIND[block_type],
                norm_num_groups=cfg.norm_num_groups,
                spatial_norm=cfg.spatial_group_norm,
                add_gc_block=bool(cfg.use_gc_blocks[-(i + 1)]
                                  if cfg.use_gc_blocks else False),
                tmode=tm,
                up_rule=cfg.up_rule,
                dtype=dt,
                name=name,
            )(z, _sub(cache, name))
        z = GroupNorm(cfg.norm_num_groups, 1e-6, cfg.spatial_group_norm,
                      name="conv_norm_out")(z)
        z = nn.silu(z)
        z, new_cache["conv_out"] = CausalConv3d(
            cfg.out_channels, temporal_mode=tm, dtype=dt, name="conv_out"
        )(z, _sub(cache, "conv_out"))
        return z, new_cache


class AutoencoderKLMagvit(nn.Module):
    cfg: MagvitVAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")
        self.quant_conv = Conv1x1x1(2 * self.cfg.latent_channels,
                                    dtype=self.cfg.jdtype, name="quant_conv")
        self.post_quant_conv = Conv1x1x1(self.cfg.latent_channels,
                                         dtype=self.cfg.jdtype,
                                         name="post_quant_conv")

    def encode_chunk(self, x, cache=None):
        h, cache = self.encoder(x, cache)
        return self.quant_conv(h), cache

    def decode_chunk(self, z, cache=None, prev=None, after=None):
        z = self.post_quant_conv(z)
        if prev is not None:
            prev = self.post_quant_conv(prev)
        if after is not None:
            after = self.post_quant_conv(after)
        return self.decoder(z, cache, prev=prev, after=after)

    def __call__(self, x):
        """Single-shot encode->sample-mode->decode (init/training path)."""
        moments, _ = self.encode_chunk(x)
        mean, _ = jnp.split(moments, 2, axis=-1)
        dec, _ = self.decode_chunk(mean)
        return dec


# ---------------------------------------------------------------------------
# Chunked drivers (pure functions over params; scan over steady-state chunks)
# ---------------------------------------------------------------------------


def _chunked_apply(apply_fn, x, chunk: int):
    """cache_mag protocol: frame 0 alone, then chunks of `chunk` frames,
    threading the conv cache; steady-state chunks run under lax.scan."""
    b = x.shape[0]
    t = x.shape[1]
    y0, cache = apply_fn(x[:, :1], None)
    if t == 1:
        return y0
    rest = x[:, 1:]
    n_full = (t - 1) // chunk
    outs = [y0]
    if n_full > 0:
        body = rest[:, : n_full * chunk]
        # (B, n, chunk, H, W, C) -> scan over n
        chunks = body.reshape(b, n_full, chunk, *body.shape[2:])
        chunks = jnp.moveaxis(chunks, 1, 0)

        def step(c, xc):
            y, c = apply_fn(xc, c)
            return c, y

        cache, ys = jax.lax.scan(step, cache, chunks)
        # ys: (n, B, t_out, ...) -> (B, n * t_out, ...)
        ys = jnp.moveaxis(ys, 0, 1)
        outs.append(ys.reshape(b, -1, *ys.shape[3:]))
    tail = (t - 1) % chunk
    if tail:
        y_tail, cache = apply_fn(rest[:, n_full * chunk:], cache)
        outs.append(y_tail)
    return jnp.concatenate(outs, axis=1)


def _slice_apply(apply_fn, x, chunk: int):
    """slice_mag protocol: independent chunks, each replicate-padded."""
    t = x.shape[1]
    outs = []
    for i in range(0, t, chunk):
        y, _ = apply_fn(x[:, i: i + chunk], None)
        outs.append(y)
    return jnp.concatenate(outs, axis=1)


def _compression_encode(apply_fn, x, chunk: int):
    """slice/cache_compression encode (omnigen_enc_dec.py:296-327): a lone
    first frame when f is odd, then independent non-causal chunks (the
    encoder convs run in 'sym' mode, so caches are inert)."""
    b, t = x.shape[0], x.shape[1]
    outs = []
    start = 0
    if t % 2 != 0:
        y0, _ = apply_fn(x[:, :1], None)
        outs.append(y0)
        start = 1
    rest = x[:, start:]
    n = rest.shape[1] // chunk
    if n > 0:
        chunks = jnp.moveaxis(
            rest[:, : n * chunk].reshape(b, n, chunk, *rest.shape[2:]), 1, 0)

        def step(c, xc):
            y, _ = apply_fn(xc, None)
            return c, y

        _, ys = jax.lax.scan(step, jnp.zeros(()), chunks)
        ys = jnp.moveaxis(ys, 0, 1)
        outs.append(ys.reshape(b, -1, *ys.shape[3:]))
    tail = rest.shape[1] - n * chunk
    if tail:
        y, _ = apply_fn(rest[:, n * chunk:], None)
        outs.append(y)
    return jnp.concatenate(outs, axis=1)


def _cached_uniform_decode(apply_fn, z, chunk: int):
    """cache_compression decode (omnigen_enc_dec.py:630-647): the first
    `chunk` latents replicate-padded (flag 5), later chunks prepend the conv
    cache (flag 6)."""
    b, t = z.shape[0], z.shape[1]
    if t <= chunk:
        return apply_fn(z, None)[0]
    y0, cache = apply_fn(z[:, :chunk], None)
    outs = [y0]
    rest = z[:, chunk:]
    n = rest.shape[1] // chunk
    if n > 0:
        chunks = jnp.moveaxis(
            rest[:, : n * chunk].reshape(b, n, chunk, *rest.shape[2:]), 1, 0)

        def step(c, zc):
            y, c = apply_fn(zc, c)
            return c, y

        cache, ys = jax.lax.scan(step, cache, chunks)
        ys = jnp.moveaxis(ys, 0, 1)
        outs.append(ys.reshape(b, -1, *ys.shape[3:]))
    tail = rest.shape[1] - n * chunk
    if tail:
        y, _ = apply_fn(rest[:, n * chunk:], cache)
        outs.append(y)
    return jnp.concatenate(outs, axis=1)


def _context_slice_decode(decode_ctx_fn, z, chunk: int):
    """slice_compression decode (omnigen_enc_dec.py:648-667): each chunk is
    decoded with the raw neighbouring latent chunks as temporal context;
    lone first frame when f is odd."""
    t = z.shape[1]
    outs = []
    start = 0
    if t % 2 != 0:
        outs.append(decode_ctx_fn(z[:, :1], None, None))
        start = 1
    prev = None
    i = start
    while i < t:
        cur = z[:, i: i + chunk]
        after = (z[:, i + chunk: i + 2 * chunk]
                 if i + chunk < t else None)
        outs.append(decode_ctx_fn(cur, prev, after))
        prev = cur
        i += chunk
    return jnp.concatenate(outs, axis=1)


def vae_encode(vae: AutoencoderKLMagvit, params, video: jnp.ndarray,
               channels_first: bool = True) -> jnp.ndarray:
    """video -> latent distribution moments (mean, logvar concat on C).

    video: (B, C, T, H, W) if channels_first else (B, T, H, W, C).
    Returns moments in the same channel convention.
    """
    from .kl2d import AutoencoderKL

    if isinstance(vae, AutoencoderKL):  # V1 2D VAE: frame-batched, chunkless
        if not channels_first:
            video = jnp.transpose(video, (0, 4, 1, 2, 3))
        moments = vae.apply(params, video, method=AutoencoderKL.encode)
        return moments if channels_first else jnp.transpose(
            moments, (0, 2, 3, 4, 1))
    cfg = vae.cfg
    if channels_first:
        video = jnp.transpose(video, (0, 2, 3, 4, 1))
    apply_fn = lambda x, c: vae.apply(params, x, c, method=vae.encode_chunk)
    if cfg.chunk_mode == "cache_mag":
        moments = _chunked_apply(apply_fn, video, cfg.mini_batch_encoder)
    elif cfg.chunk_mode == "slice_mag":
        moments = _slice_apply(apply_fn, video, cfg.mini_batch_encoder)
    elif cfg.chunk_mode == "cog":
        from .cogvideox import chunked_apply_cog

        moments = chunked_apply_cog(apply_fn, video, cfg.mini_batch_encoder)
    elif cfg.chunk_mode in ("slice_compression", "cache_compression"):
        moments = _compression_encode(apply_fn, video,
                                      cfg.mini_batch_encoder)
    else:
        moments, _ = apply_fn(video, None)
    if channels_first:
        moments = jnp.transpose(moments, (0, 4, 1, 2, 3))
    return moments


def vae_decode(vae: AutoencoderKLMagvit, params, latents: jnp.ndarray,
               channels_first: bool = True) -> jnp.ndarray:
    """latents -> pixels in [-1, 1] (no scaling_factor handling here)."""
    from .kl2d import AutoencoderKL

    if isinstance(vae, AutoencoderKL):
        if not channels_first:
            latents = jnp.transpose(latents, (0, 4, 1, 2, 3))
        video = vae.apply(params, latents, method=AutoencoderKL.decode)
        return video if channels_first else jnp.transpose(
            video, (0, 2, 3, 4, 1))
    cfg = vae.cfg
    if channels_first:
        latents = jnp.transpose(latents, (0, 2, 3, 4, 1))
    apply_fn = lambda z, c: vae.apply(params, z, c, method=vae.decode_chunk)
    if cfg.chunk_mode == "cache_mag":
        video = _chunked_apply(apply_fn, latents,
                               cfg.decode_chunk_frames
                               or cfg.mini_batch_decoder)
    elif cfg.chunk_mode == "slice_mag":
        video = _slice_apply(apply_fn, latents, cfg.mini_batch_decoder)
    elif cfg.chunk_mode == "cog":
        from .cogvideox import chunked_apply_cog

        video = chunked_apply_cog(apply_fn, latents, cfg.mini_batch_decoder)
    elif cfg.chunk_mode == "cache_compression":
        video = _cached_uniform_decode(apply_fn, latents,
                                       cfg.mini_batch_decoder)
    elif cfg.chunk_mode == "slice_compression":
        ctx_fn = lambda z, p, a: vae.apply(
            params, z, None, prev=p, after=a, method=vae.decode_chunk)[0]
        video = _context_slice_decode(ctx_fn, latents,
                                      cfg.mini_batch_decoder)
    else:
        video, _ = apply_fn(latents, None)
    if channels_first:
        video = jnp.transpose(video, (0, 4, 1, 2, 3))
    return video


# ---------------------------------------------------------------------------
# Spatial tiling (reference autoencoder_magvit.py:339-448) + seam smoothing
# ---------------------------------------------------------------------------


def _blend_v(a, b, extent):
    """Blend bottom rows of a into top rows of b along H (axis 2, BTHWC)."""
    extent = min(a.shape[2], b.shape[2], extent)
    w = (jnp.arange(extent) / extent).reshape(1, 1, extent, 1, 1).astype(b.dtype)
    mixed = a[:, :, -extent:] * (1 - w) + b[:, :, :extent] * w
    return b.at[:, :, :extent].set(mixed)


def _blend_h(a, b, extent):
    extent = min(a.shape[3], b.shape[3], extent)
    w = (jnp.arange(extent) / extent).reshape(1, 1, 1, extent, 1).astype(b.dtype)
    mixed = a[:, :, :, -extent:] * (1 - w) + b[:, :, :, :extent] * w
    return b.at[:, :, :, :extent].set(mixed)


def _tile_starts(dim: int, tile: int, stride: int) -> List[int]:
    """Even-cover tile starts: fixed stride, last tile end-aligned. Unlike
    the reference's `range(0, dim, stride)` grid (autoencoder_magvit.py:
    392-417) this never produces degenerate tail tiles -- at 48x84 latents
    the reference layout runs 6 tiles + a corner re-decode where 2 suffice
    (1.6x redundant conv FLOPs, measured 4.4 s vs 3.2 s decode on v5e)."""
    if dim <= tile:
        return [0]
    starts = list(range(0, dim - tile + 1, stride))
    if starts[-1] != dim - tile:
        starts.append(dim - tile)
    return starts


def _tiled(apply_chunked, x, tile_in: int, tile_out: int,
           overlap_factor: float):
    """Shared tiled evaluation: overlapping input tiles, linear seam blends
    over each pair's actual overlap (end-aligned tiles make the last
    overlap wider than the interior ones)."""
    stride = int(tile_in * (1 - overlap_factor))
    out_px = lambda e: e * tile_out // tile_in
    si = _tile_starts(x.shape[2], tile_in, stride)
    sj = _tile_starts(x.shape[3], tile_in, stride)
    rows = [[apply_chunked(x[:, :, i: i + tile_in, j: j + tile_in])
             for j in sj] for i in si]
    out_rows = []
    for ii, i in enumerate(si):
        out_row = []
        for jj, j in enumerate(sj):
            tile = rows[ii][jj]
            if ii > 0:
                tile = _blend_v(rows[ii - 1][jj], tile,
                                out_px(si[ii - 1] + tile_in - i))
            if jj > 0:
                tile = _blend_h(rows[ii][jj - 1], tile,
                                out_px(sj[jj - 1] + tile_in - j))
            hi = (tile.shape[2] if ii == len(si) - 1
                  else out_px(si[ii + 1] - i))
            wi = (tile.shape[3] if jj == len(sj) - 1
                  else out_px(sj[jj + 1] - j))
            out_row.append(tile[:, :, :hi, :wi])
        out_rows.append(jnp.concatenate(out_row, axis=3))
    return jnp.concatenate(out_rows, axis=2)


def vae_encode_tiled(vae: AutoencoderKLMagvit, params, video: jnp.ndarray,
                     channels_first: bool = True) -> jnp.ndarray:
    """Spatially tiled encode for resolutions above tile_sample_min_size."""
    cfg = vae.cfg
    if channels_first:
        video = jnp.transpose(video, (0, 2, 3, 4, 1))
    tile_in = cfg.tile_sample_min_size
    tile_out = tile_in // cfg.spatial_compression
    apply_fn = lambda x, c: vae.apply(params, x, c, method=vae.encode_chunk)
    run = lambda tile: _run_chunk_mode(apply_fn, tile, cfg,
                                       cfg.mini_batch_encoder)
    moments = _tiled(run, video, tile_in, tile_out, cfg.tile_overlap_factor)
    if channels_first:
        moments = jnp.transpose(moments, (0, 4, 1, 2, 3))
    return moments


def vae_decode_tiled(vae: AutoencoderKLMagvit, params, latents: jnp.ndarray,
                     channels_first: bool = True) -> jnp.ndarray:
    """Tiled decode. The reference's lower-right corner re-decode
    (autoencoder_magvit.py:419-443) exists because its fixed-grid layout
    leaves a degenerate corner tile; the even-cover layout end-aligns the
    last row/column, so the corner is already decoded from a full
    corner-aligned tile and no extra pass is needed."""
    cfg = vae.cfg
    if channels_first:
        latents = jnp.transpose(latents, (0, 2, 3, 4, 1))
    tile_out_px = cfg.tile_sample_min_size
    tile_in = tile_out_px // cfg.spatial_compression
    apply_fn = lambda z, c: vae.apply(params, z, c, method=vae.decode_chunk)
    ctx_fn = lambda z, p, a: vae.apply(
        params, z, None, prev=p, after=a, method=vae.decode_chunk)[0]
    # decode_chunk_frames only applies under the cache protocol, where the
    # pass size is mathematically irrelevant (see MagvitVAEConfig); slice
    # modes decode independent chunks so their size is semantic.
    dec_chunk = (cfg.decode_chunk_frames or cfg.mini_batch_decoder
                 if cfg.chunk_mode == "cache_mag" else cfg.mini_batch_decoder)
    run = lambda tile: _run_chunk_mode(apply_fn, tile, cfg, dec_chunk,
                                       decoding=True, ctx_fn=ctx_fn)
    dec = _tiled(run, latents, tile_in, tile_out_px, cfg.tile_overlap_factor)
    if channels_first:
        dec = jnp.transpose(dec, (0, 4, 1, 2, 3))
    return dec


def _run_chunk_mode(apply_fn, x, cfg, chunk, decoding=False, ctx_fn=None):
    if cfg.chunk_mode == "cache_mag":
        return _chunked_apply(apply_fn, x, chunk)
    if cfg.chunk_mode == "slice_mag":
        return _slice_apply(apply_fn, x, chunk)
    if cfg.chunk_mode == "cog":
        from .cogvideox import chunked_apply_cog

        return chunked_apply_cog(apply_fn, x, chunk)
    if cfg.chunk_mode == "cache_compression":
        if decoding:
            return _cached_uniform_decode(apply_fn, x, chunk)
        return _compression_encode(apply_fn, x, chunk)
    if cfg.chunk_mode == "slice_compression":
        if decoding:
            return _context_slice_decode(ctx_fn, x, chunk)
        return _compression_encode(apply_fn, x, chunk)
    return apply_fn(x, None)[0]


def smooth_output(vae: AutoencoderKLMagvit, params, video: jnp.ndarray,
                  channels_first: bool = True) -> jnp.ndarray:
    """Slice-mode chunk-seam smoothing: re-encode/decode the video shifted by
    half a chunk and average (pipeline_easyanimate.py:706-742)."""
    cfg = vae.cfg
    mbe = cfg.mini_batch_encoder
    t_axis = 2 if channels_first else 1
    if video.shape[t_axis] <= mbe:
        return video
    before = mbe // 2
    after = mbe - before
    sl = (slice(None),) * t_axis + (slice(before, -after),)
    middle = video[sl]
    moments = vae_encode(vae, params, middle, channels_first)
    z = gaussian_mode(moments, axis=1 if channels_first else -1)
    redec = vae_decode(vae, params, z, channels_first)
    return video.at[sl].set((middle + redec) / 2)


# ---------------------------------------------------------------------------
# Diagonal Gaussian
# ---------------------------------------------------------------------------


def gaussian_sample(moments: jnp.ndarray, rng: jax.Array,
                    axis: int = -1) -> jnp.ndarray:
    mean, logvar = jnp.split(moments, 2, axis=axis)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)


def gaussian_mode(moments: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    mean, _ = jnp.split(moments, 2, axis=axis)
    return mean


def gaussian_kl(moments: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """KL(q || N(0, I)) per sample, summed over non-batch dims."""
    mean, logvar = jnp.split(moments, 2, axis=axis)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    var = jnp.exp(logvar)
    kl = 0.5 * (jnp.square(mean) + var - 1.0 - logvar)
    return jnp.sum(kl, axis=tuple(range(1, kl.ndim)))


def latent_frame_count(pixel_frames: int, cfg: MagvitVAEConfig) -> int:
    """Reference frame remap: (f-1)//mini_batch_encoder*mini_batch_decoder+1
    (pipeline_easyanimate.py:677-688)."""
    from .kl2d import KL2DConfig

    if isinstance(cfg, KL2DConfig):  # V1 2D VAE: one latent per frame
        return pixel_frames
    if cfg.chunk_mode == "cache_mag":
        return (pixel_frames - 1) // cfg.mini_batch_encoder * cfg.mini_batch_decoder + 1
    if cfg.chunk_mode in ("slice_compression", "cache_compression"):
        # lone first frame when odd, then non-causal chunks of mbe frames,
        # each compressed by the network's temporal factor
        per_chunk = cfg.mini_batch_encoder // cfg.temporal_compression
        if pixel_frames % 2 != 0:
            return (pixel_frames - 1) // cfg.mini_batch_encoder * per_chunk + 1
        return pixel_frames // cfg.mini_batch_encoder * per_chunk
    return pixel_frames // cfg.temporal_compression

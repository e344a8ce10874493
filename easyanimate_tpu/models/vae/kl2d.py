"""AutoencoderKL: the SD-style 2D image VAE used by the V1 edition.

Parity target: the reference builds diffusers' `AutoencoderKL` when
`vae_kwargs.vae_type == "AutoencoderKL"` (config/easyanimate_video_v1_
motion_module.yaml; easyanimate/utils/utils.py model build) and runs video
through it frame-by-frame. Architecture: conv_in -> 4 DownEncoderBlock2D
(2 resnets each, stride-2 downsample between) -> mid (resnet, attention,
resnet) -> GroupNorm/SiLU/conv_out -> quant_conv, and the mirrored decoder
with post_quant_conv. Weight layout matches diffusers so published SD VAE
checkpoints convert 1:1 (`convert_kl2d_state_dict`).

TPU design: frames fold into the batch axis (one big conv program, no
Python frame loop); attention in the mid block is a single dense softmax
over h*w tokens (32x32 latent grid at 256p -- tiny).
"""
import dataclasses
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class KL2DConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    dtype: str = "float32"

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @property
    def spatial_compression(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    # duck-type parity with MagvitVAEConfig so pipelines treat the 2D VAE
    # as a chunkless, seamless, never-tiled member of the family
    @property
    def temporal_compression(self) -> int:
        return 1

    @property
    def chunk_mode(self) -> str:
        return "none"

    @property
    def tile_sample_min_size(self) -> int:
        return 1 << 30  # frame-batched 2D convs: no spatial tiling needed

    @property
    def mini_batch_encoder(self) -> int:
        return 1

    @property
    def mini_batch_decoder(self) -> int:
        return 1


class _Resnet(nn.Module):
    out_ch: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm1",
                         dtype=jnp.float32)(x)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(nn.silu(h))
        h = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm2",
                         dtype=jnp.float32)(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(nn.silu(h))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class _MidAttention(nn.Module):
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = nn.GroupNorm(self.groups, epsilon=1e-6, name="group_norm",
                         dtype=jnp.float32)(x).reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        s = jnp.einsum("bqc,bkc->bqk", q, k,
                       preferred_element_type=jnp.float32) * (c ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bqk,bkc->bqc", p, v)
        o = nn.Dense(c, dtype=self.dtype, name="to_out")(o)
        return x + o.reshape(b, h, w, c)


class Encoder2D(nn.Module):
    cfg: KL2DConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = cfg.jdtype
        chans = cfg.block_out_channels
        h = nn.Conv(chans[0], (3, 3), padding=1, dtype=dt, name="conv_in")(x)
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block):
                h = _Resnet(ch, cfg.norm_num_groups, dt,
                            name=f"down_{i}_res_{j}")(h)
            if i < len(chans) - 1:
                # diffusers Downsample2D: asymmetric (0,1) pad + stride 2
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=2, padding="VALID",
                            dtype=dt, name=f"down_{i}_downsample")(h)
        h = _Resnet(chans[-1], cfg.norm_num_groups, dt, name="mid_res_0")(h)
        h = _MidAttention(cfg.norm_num_groups, dt, name="mid_attn")(h)
        h = _Resnet(chans[-1], cfg.norm_num_groups, dt, name="mid_res_1")(h)
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6,
                         name="conv_norm_out", dtype=jnp.float32)(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=dt,
                       name="conv_out")(nn.silu(h))


class Decoder2D(nn.Module):
    cfg: KL2DConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        dt = cfg.jdtype
        chans = list(reversed(cfg.block_out_channels))
        h = nn.Conv(chans[0], (3, 3), padding=1, dtype=dt, name="conv_in")(z)
        h = _Resnet(chans[0], cfg.norm_num_groups, dt, name="mid_res_0")(h)
        h = _MidAttention(cfg.norm_num_groups, dt, name="mid_attn")(h)
        h = _Resnet(chans[0], cfg.norm_num_groups, dt, name="mid_res_1")(h)
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block + 1):
                h = _Resnet(ch, cfg.norm_num_groups, dt,
                            name=f"up_{i}_res_{j}")(h)
            if i < len(chans) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                h = nn.Conv(ch, (3, 3), padding=1, dtype=dt,
                            name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6,
                         name="conv_norm_out", dtype=jnp.float32)(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=dt,
                       name="conv_out")(nn.silu(h))


class AutoencoderKL(nn.Module):
    """Frame-batched 2D KL VAE with the 3D VAEs' (B, C, T, H, W) API."""

    cfg: KL2DConfig = KL2DConfig()

    def setup(self):
        self.encoder = Encoder2D(self.cfg)
        self.decoder = Decoder2D(self.cfg)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  dtype=self.cfg.jdtype)
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       dtype=self.cfg.jdtype)

    def _fold(self, x):  # (B, C, T, H, W) -> (B*T, H, W, C)
        b, c, t, h, w = x.shape
        return (jnp.transpose(x, (0, 2, 3, 4, 1)).reshape(b * t, h, w, c),
                b, t)

    def _unfold(self, y, b, t):  # (B*T, H, W, C) -> (B, C, T, H, W)
        bt, h, w, c = y.shape
        return jnp.transpose(y.reshape(b, t, h, w, c), (0, 4, 1, 2, 3))

    def encode(self, video):
        """(B, 3, T, H, W) -> moments (B, 2*latent, T, H/8, W/8)."""
        x, b, t = self._fold(video.astype(self.cfg.jdtype))
        return self._unfold(self.quant_conv(self.encoder(x)), b, t)

    def decode(self, latents):
        z, b, t = self._fold(latents.astype(self.cfg.jdtype))
        return self._unfold(self.decoder(self.post_quant_conv(z)), b, t)

    def __call__(self, video):
        moments = self.encode(video)
        mean = moments[:, : self.cfg.latent_channels]
        return self.decode(mean)


# -- diffusers checkpoint conversion ------------------------------------------


def _conv(sd, key):
    # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
    return {"kernel": np.transpose(np.asarray(sd.pop(key + ".weight"),
                                              np.float32), (2, 3, 1, 0)),
            "bias": np.asarray(sd.pop(key + ".bias"), np.float32)}


def _norm(sd, key):
    return {"scale": np.asarray(sd.pop(key + ".weight"), np.float32),
            "bias": np.asarray(sd.pop(key + ".bias"), np.float32)}


def _dense(sd, key):
    return {"kernel": np.asarray(sd.pop(key + ".weight"), np.float32).T,
            "bias": np.asarray(sd.pop(key + ".bias"), np.float32)}


def _resnet(sd, pre):
    out = {"norm1": _norm(sd, pre + ".norm1"),
           "conv1": _conv(sd, pre + ".conv1"),
           "norm2": _norm(sd, pre + ".norm2"),
           "conv2": _conv(sd, pre + ".conv2")}
    if pre + ".conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, pre + ".conv_shortcut")
    return out


def _attn(sd, pre):
    return {"group_norm": _norm(sd, pre + ".group_norm"),
            "to_q": _dense(sd, pre + ".to_q"),
            "to_k": _dense(sd, pre + ".to_k"),
            "to_v": _dense(sd, pre + ".to_v"),
            "to_out": _dense(sd, pre + ".to_out.0")}


def convert_kl2d_state_dict(sd: Dict[str, np.ndarray],
                            cfg: KL2DConfig = KL2DConfig()) -> Dict:
    """diffusers AutoencoderKL state dict -> flax params tree."""
    sd = dict(sd)
    n = len(cfg.block_out_channels)

    enc: Dict = {"conv_in": _conv(sd, "encoder.conv_in"),
                 "conv_out": _conv(sd, "encoder.conv_out"),
                 "conv_norm_out": _norm(sd, "encoder.conv_norm_out"),
                 "mid_res_0": _resnet(sd, "encoder.mid_block.resnets.0"),
                 "mid_res_1": _resnet(sd, "encoder.mid_block.resnets.1"),
                 "mid_attn": _attn(sd, "encoder.mid_block.attentions.0")}
    for i in range(n):
        for j in range(cfg.layers_per_block):
            enc[f"down_{i}_res_{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if i < n - 1:
            enc[f"down_{i}_downsample"] = _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")

    dec: Dict = {"conv_in": _conv(sd, "decoder.conv_in"),
                 "conv_out": _conv(sd, "decoder.conv_out"),
                 "conv_norm_out": _norm(sd, "decoder.conv_norm_out"),
                 "mid_res_0": _resnet(sd, "decoder.mid_block.resnets.0"),
                 "mid_res_1": _resnet(sd, "decoder.mid_block.resnets.1"),
                 "mid_attn": _attn(sd, "decoder.mid_block.attentions.0")}
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            dec[f"up_{i}_res_{j}"] = _resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if i < n - 1:
            dec[f"up_{i}_upsample"] = _conv(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")

    params = {"encoder": enc, "decoder": dec,
              "quant_conv": _conv(sd, "quant_conv"),
              "post_quant_conv": _conv(sd, "post_quant_conv")}
    leftover = [k for k in sd if not k.endswith("num_batches_tracked")]
    if leftover:
        raise ValueError(f"unconsumed KL2D checkpoint keys: {leftover[:6]}")
    return params

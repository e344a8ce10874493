"""AutoencoderKL (V1 2D image VAE) vs an independent torch implementation
of the diffusers architecture, through the converter."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from easyanimate_tpu.models.vae.kl2d import (
    AutoencoderKL,
    KL2DConfig,
    convert_kl2d_state_dict,
)

CFG = KL2DConfig(block_out_channels=(8, 16, 16), layers_per_block=1,
                 latent_channels=4, norm_num_groups=4)


class _TRes(tnn.Module):
    def __init__(self, cin, cout, groups):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = tnn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (tnn.Conv2d(cin, cout, 1)
                              if cin != cout else None)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class _TAttn(tnn.Module):
    def __init__(self, c, groups):
        super().__init__()
        self.group_norm = tnn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = tnn.Linear(c, c)
        self.to_k = tnn.Linear(c, c)
        self.to_v = tnn.Linear(c, c)
        self.to_out = tnn.ModuleList([tnn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).reshape(b, c, h * w).permute(0, 2, 1)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        s = torch.softmax(q @ k.transpose(1, 2) * (c ** -0.5), dim=-1)
        o = self.to_out[0](s @ v)
        return x + o.permute(0, 2, 1).reshape(b, c, h, w)


def _build_torch(cfg):
    g = torch.Generator().manual_seed(0)
    chans = list(cfg.block_out_channels)
    rev = list(reversed(chans))
    mods = {}
    mods["encoder.conv_in"] = tnn.Conv2d(cfg.in_channels, chans[0], 3,
                                         padding=1)
    prev = chans[0]
    for i, ch in enumerate(chans):
        for j in range(cfg.layers_per_block):
            mods[f"encoder.down_blocks.{i}.resnets.{j}"] = _TRes(
                prev, ch, cfg.norm_num_groups)
            prev = ch
        if i < len(chans) - 1:
            mods[f"encoder.down_blocks.{i}.downsamplers.0.conv"] = tnn.Conv2d(
                ch, ch, 3, stride=2)
    mods["encoder.mid_block.resnets.0"] = _TRes(prev, prev,
                                                cfg.norm_num_groups)
    mods["encoder.mid_block.attentions.0"] = _TAttn(prev,
                                                    cfg.norm_num_groups)
    mods["encoder.mid_block.resnets.1"] = _TRes(prev, prev,
                                                cfg.norm_num_groups)
    mods["encoder.conv_norm_out"] = tnn.GroupNorm(cfg.norm_num_groups, prev,
                                                  eps=1e-6)
    mods["encoder.conv_out"] = tnn.Conv2d(prev, 2 * cfg.latent_channels, 3,
                                          padding=1)
    mods["quant_conv"] = tnn.Conv2d(2 * cfg.latent_channels,
                                    2 * cfg.latent_channels, 1)
    mods["post_quant_conv"] = tnn.Conv2d(cfg.latent_channels,
                                         cfg.latent_channels, 1)
    mods["decoder.conv_in"] = tnn.Conv2d(cfg.latent_channels, rev[0], 3,
                                         padding=1)
    mods["decoder.mid_block.resnets.0"] = _TRes(rev[0], rev[0],
                                                cfg.norm_num_groups)
    mods["decoder.mid_block.attentions.0"] = _TAttn(rev[0],
                                                    cfg.norm_num_groups)
    mods["decoder.mid_block.resnets.1"] = _TRes(rev[0], rev[0],
                                                cfg.norm_num_groups)
    prev = rev[0]
    for i, ch in enumerate(rev):
        for j in range(cfg.layers_per_block + 1):
            mods[f"decoder.up_blocks.{i}.resnets.{j}"] = _TRes(
                prev, ch, cfg.norm_num_groups)
            prev = ch
        if i < len(rev) - 1:
            mods[f"decoder.up_blocks.{i}.upsamplers.0.conv"] = tnn.Conv2d(
                ch, ch, 3, padding=1)
    mods["decoder.conv_norm_out"] = tnn.GroupNorm(cfg.norm_num_groups, prev,
                                                  eps=1e-6)
    mods["decoder.conv_out"] = tnn.Conv2d(prev, cfg.out_channels, 3,
                                          padding=1)
    for m in mods.values():
        for p in m.parameters():
            p.data = torch.randn(p.shape, generator=g) * 0.15
    return mods


def _torch_forward(mods, cfg, video_bcthw):
    chans = list(cfg.block_out_channels)
    rev = list(reversed(chans))
    b, c, t, hh, ww = video_bcthw.shape
    x = video_bcthw.permute(0, 2, 1, 3, 4).reshape(b * t, c, hh, ww)
    with torch.no_grad():
        h = mods["encoder.conv_in"](x)
        for i in range(len(chans)):
            for j in range(cfg.layers_per_block):
                h = mods[f"encoder.down_blocks.{i}.resnets.{j}"](h)
            if i < len(chans) - 1:
                h = F.pad(h, (0, 1, 0, 1))
                h = mods[f"encoder.down_blocks.{i}.downsamplers.0.conv"](h)
        h = mods["encoder.mid_block.resnets.0"](h)
        h = mods["encoder.mid_block.attentions.0"](h)
        h = mods["encoder.mid_block.resnets.1"](h)
        h = mods["encoder.conv_out"](F.silu(mods["encoder.conv_norm_out"](h)))
        moments = mods["quant_conv"](h)
        mean = moments[:, : cfg.latent_channels]
        z = mods["post_quant_conv"](mean)
        h = mods["decoder.conv_in"](z)
        h = mods["decoder.mid_block.resnets.0"](h)
        h = mods["decoder.mid_block.attentions.0"](h)
        h = mods["decoder.mid_block.resnets.1"](h)
        for i in range(len(rev)):
            for j in range(cfg.layers_per_block + 1):
                h = mods[f"decoder.up_blocks.{i}.resnets.{j}"](h)
            if i < len(rev) - 1:
                h = F.interpolate(h, scale_factor=2.0, mode="nearest")
                h = mods[f"decoder.up_blocks.{i}.upsamplers.0.conv"](h)
        out = mods["decoder.conv_out"](
            F.silu(mods["decoder.conv_norm_out"](h)))
    to5d = lambda y: y.reshape(b, t, y.shape[1], y.shape[2], y.shape[3]
                               ).permute(0, 2, 1, 3, 4)
    return to5d(moments), to5d(out)


def test_kl2d_golden_roundtrip(rng):
    video = torch.from_numpy(
        rng.standard_normal((2, 3, 3, 32, 32)).astype(np.float32))
    mods = _build_torch(CFG)
    moments_t, out_t = _torch_forward(mods, CFG, video)

    sd = {}
    for name, m in mods.items():
        for k, v in m.state_dict().items():
            sd[f"{name}.{k}"] = v.numpy()
    params = convert_kl2d_state_dict(sd, CFG)

    vae = AutoencoderKL(CFG)
    jv = jnp.asarray(video.numpy())
    moments = vae.apply({"params": params}, jv,
                        method=AutoencoderKL.encode)
    np.testing.assert_allclose(np.asarray(moments), moments_t.numpy(),
                               atol=2e-4, rtol=2e-3)
    out = vae.apply({"params": params}, jv)
    assert out.shape == video.shape
    np.testing.assert_allclose(np.asarray(out), out_t.numpy(),
                               atol=5e-4, rtol=5e-3)


def test_kl2d_init_matches_converter_structure(rng):
    vae = AutoencoderKL(CFG)
    video = jnp.zeros((1, 3, 2, 32, 32))
    init = vae.init(jax.random.PRNGKey(0), video)["params"]
    mods = _build_torch(CFG)
    sd = {f"{n}.{k}": v.numpy() for n, m in mods.items()
          for k, v in m.state_dict().items()}
    conv = convert_kl2d_state_dict(sd, CFG)
    from flax import traverse_util

    fi = traverse_util.flatten_dict(init)
    fc = traverse_util.flatten_dict(conv)
    assert set(fi) == set(fc), (set(fi) ^ set(fc))
    for k in fi:
        assert fi[k].shape == np.shape(fc[k]), k


def test_v1_pipeline_with_kl2d_vae(rng):
    """EasyAnimatePipeline runs end-to-end over the V1 2D image VAE
    (frame-batched decode, no chunk protocol, no seams)."""
    from easyanimate_tpu.models.mmdit import (
        PRESETS,
        EasyAnimateTransformer3D,
    )
    from easyanimate_tpu.pipeline import EasyAnimatePipeline

    cfg = dataclasses.replace(PRESETS["tiny"], in_channels=4, out_channels=4)
    transformer = EasyAnimateTransformer3D(cfg)
    vae = AutoencoderKL(CFG)  # latent_channels=4, 3 blocks -> /4 spatial

    h = w = 32
    frames = 3
    lat = jnp.zeros((1, 4, frames, h // CFG.spatial_compression,
                     w // CFG.spatial_compression))
    txt = jnp.zeros((1, 5, cfg.text_embed_dim))
    tp = transformer.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt,
                          None)
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 1, h, w)))

    pipe = EasyAnimatePipeline(transformer=transformer, vae=vae,
                               transformer_params=tp, vae_params=vp)
    pos = jnp.asarray(
        rng.standard_normal((1, 5, cfg.text_embed_dim)).astype(np.float32))
    out = pipe(pos, jnp.zeros_like(pos), height=h, width=w,
               video_length=frames, num_inference_steps=2,
               guidance_scale=2.0, rng=jax.random.PRNGKey(2))
    assert out.shape == (1, 3, frames, h, w)
    assert np.isfinite(np.asarray(out)).all()

"""VAE training losses: LPIPS + KL + patch-GAN with adaptive weight.

Parity target: vae/ldm/modules/losses/contperceptual.py (LPIPSWithDiscriminator:
L1+L2 recon, perceptual term, KL with posterior-outlier penalty, adaptive
GAN weight from last-layer gradient norms, disc_start gating) and
vaemodules/discriminator.py (PatchGAN Discriminator2D/3D with blur-pooled
stride-2 blocks).

LPIPS is a flax VGG16-feature distance; pretrained VGG/lin weights load via
`convert_lpips_state_dict` (torch `lpips` package layout). With random
weights the loss is still well-defined (tests run structure + gradients).
"""
import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# LPIPS (VGG16 features + linear heads)
# ---------------------------------------------------------------------------

_VGG_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512)
_FEATURE_TAPS = (1, 4, 8, 12, 16)  # conv indices after which features are read
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = []
        conv_i = 0
        for c in _VGG_CFG:
            if c == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(c, (3, 3), padding=1, name=f"conv{conv_i}")(x)
                x = nn.relu(x)
                if conv_i in _FEATURE_TAPS:
                    feats.append(x)
                conv_i += 1
        return feats


class LPIPS(nn.Module):
    """Perceptual distance; inputs (B, H, W, 3) in [-1, 1]."""

    @nn.compact
    def __call__(self, x, y):
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        norm_in = lambda a: (a - shift) / scale
        vgg = VGG16Features(name="vgg")
        fx = vgg(norm_in(x))
        fy = vgg(norm_in(y))
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
            b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
            d = jnp.square(a - b)
            w = self.param(f"lin{i}", nn.initializers.ones, (d.shape[-1],),
                           jnp.float32)
            d = jnp.sum(d * jnp.abs(w), axis=-1, keepdims=True)
            total = total + jnp.mean(d, axis=(1, 2, 3))
        return total  # (B,)


def convert_lpips_state_dict(sd, include_vgg=True):
    """torch `lpips.LPIPS(net='vgg')` state dict -> flax tree."""
    import flax
    import numpy as np

    flat = {}
    conv_i = 0
    for k in sorted(sd):
        if k.startswith("net.slice") and k.endswith(".weight") and include_vgg:
            pass
    # torchvision vgg16.features indices for conv layers
    tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for ci, ti in enumerate(tv_idx[: len([c for c in _VGG_CFG if c != "M"])]):
        wk, bk = None, None
        for cand in (f"net.features.{ti}.weight", f"features.{ti}.weight"):
            if cand in sd:
                wk, bk = cand, cand.replace("weight", "bias")
        if wk is None:
            continue
        flat[f"vgg/conv{ci}/kernel"] = np.transpose(np.asarray(sd[wk]), (2, 3, 1, 0))
        flat[f"vgg/conv{ci}/bias"] = np.asarray(sd[bk])
    for i in range(5):
        for cand in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if cand in sd:
                flat[f"lin{i}"] = np.asarray(sd[cand])[0, :, 0, 0]
    return {"params": flax.traverse_util.unflatten_dict(flat, sep="/")}


# ---------------------------------------------------------------------------
# PatchGAN discriminators
# ---------------------------------------------------------------------------


class Discriminator2D(nn.Module):
    """PatchGAN over frames: (B*T, H, W, C) -> logits map."""

    base_channels: int = 64
    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.base_channels, (4, 4), strides=(2, 2), padding=1,
                    name="conv_in")(x)
        x = nn.leaky_relu(x, 0.2)
        ch = self.base_channels
        for i in range(1, self.num_layers + 1):
            ch = min(self.base_channels * (2 ** i), 512)
            stride = 2 if i < self.num_layers else 1
            x = nn.Conv(ch, (4, 4), strides=(stride, stride), padding=1,
                        use_bias=False, name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=min(32, ch), name=f"norm{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (4, 4), padding=1, name="conv_out")(x)


class Discriminator3D(nn.Module):
    """PatchGAN over clips: (B, T, H, W, C) -> logits map."""

    base_channels: int = 64
    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.base_channels, (3, 4, 4), strides=(1, 2, 2),
                    padding=((1, 1), (1, 1), (1, 1)), name="conv_in")(x)
        x = nn.leaky_relu(x, 0.2)
        ch = self.base_channels
        for i in range(1, self.num_layers + 1):
            ch = min(self.base_channels * (2 ** i), 512)
            st = (1, 2, 2) if i < self.num_layers else (1, 1, 1)
            x = nn.Conv(ch, (3, 4, 4), strides=st,
                        padding=((1, 1), (1, 1), (1, 1)), use_bias=False,
                        name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=min(32, ch), name=f"norm{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (3, 4, 4), padding=((1, 1), (1, 1), (1, 1)),
                       name="conv_out")(x)


def hinge_d_loss(real_logits, fake_logits):
    return 0.5 * (jnp.mean(nn.relu(1.0 - real_logits))
                  + jnp.mean(nn.relu(1.0 + fake_logits)))


def hinge_g_loss(fake_logits):
    return -jnp.mean(fake_logits)


# ---------------------------------------------------------------------------
# Combined AE loss
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class VAELossConfig:
    kl_weight: float = 1e-6
    l1_weight: float = 1.0
    l2_weight: float = 0.1
    perceptual_weight: float = 1.0
    disc_weight: float = 0.5
    disc_start: int = 50001
    outlier_penalty: float = 1e5  # weight (contperceptual.py:13)
    outlier_penalty_r: float = 3.0  # std multiples before penalty kicks in


def reconstruction_loss(cfg: VAELossConfig, inputs, recon,
                        lpips_fn=None) -> Tuple[jnp.ndarray, dict]:
    """inputs/recon: (B, T, H, W, C) in [-1, 1]."""
    diff = inputs.astype(jnp.float32) - recon.astype(jnp.float32)
    l1 = jnp.abs(diff)
    l2 = jnp.square(diff)
    rec = cfg.l1_weight * l1 + cfg.l2_weight * l2
    aux = {"l1": jnp.mean(l1), "l2": jnp.mean(l2)}
    if lpips_fn is not None and cfg.perceptual_weight > 0:
        b, t = inputs.shape[:2]
        p = lpips_fn(inputs.reshape(b * t, *inputs.shape[2:]),
                     recon.reshape(b * t, *recon.shape[2:]))
        rec = rec + cfg.perceptual_weight * jnp.mean(p)
        aux["perceptual"] = jnp.mean(p)
    return jnp.mean(rec), aux


def outlier_penalty_loss(x, r: float) -> jnp.ndarray:
    """Posterior-mode outlier penalty (contperceptual.py:56-66): per-frame
    spatial mean/std, penalize |x - mean| beyond r stds, spatial average.
    x: (B, T, H, W, C) posterior mode."""
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=(2, 3), keepdims=True)
    std = jnp.std(x, axis=(2, 3), keepdims=True)
    penalty = nn.relu(jnp.abs(x - mean) - r * std)
    return jnp.mean(jnp.sum(penalty, axis=(2, 3))
                    / (x.shape[2] * x.shape[3]))


def kl_and_outlier_loss(cfg: VAELossConfig, moments) -> jnp.ndarray:
    """KL vs N(0,I) plus the reference's posterior-outlier penalty on the
    posterior mode (contperceptual.py:56-66, :104)."""
    mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    kl = 0.5 * jnp.sum(jnp.square(mean) + jnp.exp(logvar) - 1.0 - logvar,
                       axis=tuple(range(1, mean.ndim)))
    outlier = outlier_penalty_loss(mean, cfg.outlier_penalty_r)
    return cfg.kl_weight * jnp.mean(kl) + cfg.outlier_penalty * outlier


def adaptive_gan_weight(nll_grad_norm, gan_grad_norm,
                        disc_weight: float) -> jnp.ndarray:
    """d_weight = ||grad nll|| / ||grad gan|| clipped to [0, 1e4]
    (contperceptual.py:43-54)."""
    w = nll_grad_norm / (gan_grad_norm + 1e-4)
    return jnp.clip(w, 0.0, 1e4) * disc_weight

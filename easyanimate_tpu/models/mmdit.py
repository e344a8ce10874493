"""EasyAnimateTransformer3D: the flagship MMDiT video denoiser (V5/V5.1).

Parity target: reference transformer3d.py:1347-1689. Forward spine:
  time sinusoid (inner_dim) -> 2-layer MLP -> temb           (:1519-1520)
  channel-concat of inpaint/control latents                  (:1523-1526)
  per-frame Conv2d patchify -> (t,h,w) row-major tokens      (:1528-1531)
  text_proj (+ optional t5 branch, optional pre-RMSNorm)     (:1533-1536)
  optional ref/clip conditioning branches                    (:1538-1561)
  N x dual-stream MMDiT blocks with 3D RoPE on video slice
  final LayerNorm over concat(text, video), slice video      (:1673-1675)
  AdaLayerNorm (shift/scale from temb) -> proj_out -> unpatchify (:1678-1685)

TPU design:
  - layers are homogeneous for V5.1, so the block stack compiles as one
    `nn.scan` over stacked parameters (single compile of the layer body,
    optionally rematerialized); RoPE tables are host-built constants.
  - the forward is split into embed / backbone / head methods so the
    pipeline can wrap the backbone in `lax.cond` for TeaCache step skipping
    (reference TeaCache, transformer3d.py:90-137,1563-1636): the reference
    caches (post-norm_out hidden - post-embed hidden) as the residual, which
    is exactly backbone(embed(x)) - embed(x) here.
"""
import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.norms import fp32_layer_norm, fp32_rms_norm
from .blocks import MMDiTBlock
from .embeddings import (
    PatchEmbed2D,
    TimestepEmbedding,
    sinusoidal_timestep_embedding,
    unpatchify,
)


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    num_attention_heads: int = 48
    attention_head_dim: int = 64
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    num_layers: int = 48
    mmdit_layers: int = 10000  # layers >= this index share stream params
    swa_layers: Optional[Sequence[int]] = None
    time_embed_dim: int = 512
    text_embed_dim: int = 3584        # Qwen2-VL hidden size (V5.1)
    text_embed_dim_t5: Optional[int] = None
    add_norm_text_encoder: bool = False
    after_norm: bool = False
    norm_eps: float = 1e-5
    time_position_encoding_type: str = "3d_rope"
    qk_norm: bool = True
    # extra conditioning channels (control/ref models)
    ref_channels: Optional[int] = None
    clip_channels: Optional[int] = None
    add_ref_latent_in_control_model: bool = False
    resize_inpaint_mask_directly: bool = True
    add_noise_in_inpaint_model: bool = True
    # TPU options
    scan_layers: bool = True
    remat: bool = True
    attn_impl: str = "auto"
    dtype: str = "bfloat16"
    # W8A8 int8 block linears (opt-in fast mode; ops/quant.py): ~1.5x MXU
    # throughput on the projections/FFNs; weights stored int8 + f32 scales
    linear_quant: "Optional[str]" = None
    # RoPE base grid (pipeline_easyanimate.py:1002-1006)
    rope_base_height: int = 480
    rope_base_width: int = 720
    vae_scale_factor: int = 8

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @property
    def homogeneous(self) -> bool:
        return self.mmdit_layers >= self.num_layers and not self.swa_layers

    def segments(self):
        """Runs of identical consecutive layers [(is_mmdit, is_swa, count)].
        Each multi-layer run compiles as ONE nn.scan body, so e.g. the V5.1
        SWA variant (dense layer 0 + 47 windowed layers) costs two block
        compilations instead of 48."""
        swa = set(self.swa_layers or ())
        runs = []
        for i in range(self.num_layers):
            key = (i < self.mmdit_layers, i in swa)
            if runs and runs[-1][0] == key:
                runs[-1][1] += 1
            else:
                runs.append([key, 1])
        return [(m, s, c) for (m, s), c in runs]


PRESETS: Dict[str, MMDiTConfig] = {
    # Flagship: ~11.8B dual-stream parameters (marketing "12B").
    "v5.1-12b": MMDiTConfig(),
    "v5.1-12b-inpaint": MMDiTConfig(in_channels=16 + 1 + 16),
    "v5.1-7b": MMDiTConfig(num_attention_heads=40, num_layers=40),
    # tiny config for tests / CI
    "tiny": MMDiTConfig(
        num_attention_heads=2, attention_head_dim=16, in_channels=4,
        out_channels=4, num_layers=2, time_embed_dim=32, text_embed_dim=24,
        dtype="float32",
    ),
}


class _ScanBlock(nn.Module):
    """Carry-signature adapter so a run of identical blocks compiles as a
    single nn.scan layer body (one compilation per segment)."""

    block_kwargs: Any
    is_mmdit: bool = True
    is_swa: bool = False

    @nn.compact
    def __call__(self, carry, temb, rope, grid_size):
        vid, txt = carry
        vid, txt = MMDiTBlock(**self.block_kwargs, is_mmdit=self.is_mmdit,
                              is_swa=self.is_swa, name="block")(
            vid, txt, temb, rope, grid_size)
        return (vid, txt), None


class EasyAnimateTransformer3D(nn.Module):
    cfg: MMDiTConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.jdtype
        self.time_embedding = TimestepEmbedding(cfg.time_embed_dim, dtype=dt)
        self.proj = PatchEmbed2D(cfg.inner_dim, cfg.patch_size, dtype=dt)
        self.text_proj = nn.Dense(cfg.inner_dim, dtype=dt)
        if cfg.text_embed_dim_t5 is not None:
            self.text_proj_t5 = nn.Dense(cfg.inner_dim, dtype=dt)
        if cfg.add_norm_text_encoder:
            self.text_norm_scale = self.param(
                "text_norm_scale", nn.initializers.ones,
                (cfg.text_embed_dim,), jnp.float32)
            if cfg.text_embed_dim_t5 is not None:
                self.text_norm_t5_scale = self.param(
                    "text_norm_t5_scale", nn.initializers.ones,
                    (cfg.text_embed_dim_t5,), jnp.float32)
        if cfg.ref_channels is not None or cfg.add_ref_latent_in_control_model:
            self.ref_proj = PatchEmbed2D(cfg.inner_dim, cfg.patch_size, dtype=dt)
        if cfg.clip_channels is not None:
            self.clip_proj = nn.Dense(cfg.inner_dim, dtype=dt)

        block_kwargs = dict(
            dim=cfg.inner_dim, num_heads=cfg.num_attention_heads,
            head_dim=cfg.attention_head_dim, qk_norm=cfg.qk_norm,
            after_norm=cfg.after_norm, norm_eps=cfg.norm_eps,
            attn_impl=cfg.attn_impl, dtype=dt, quant=cfg.linear_quant,
        )
        block_cls = _ScanBlock
        if cfg.remat:
            # grid_size (arg 4 incl. self) is a static tuple -- SWA kernels
            # need concrete grid dims
            block_cls = nn.remat(block_cls, prevent_cse=False,
                                 static_argnums=(4,))

        def make_scan(count, is_mmdit, is_swa, name):
            return nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                length=count,
            )(block_kwargs=block_kwargs, is_mmdit=is_mmdit, is_swa=is_swa,
              name=name)

        if cfg.scan_layers and cfg.homogeneous:
            self.blocks = make_scan(cfg.num_layers, True, False, "blocks")
        elif cfg.scan_layers:
            # heterogeneous stacks (e.g. the SWA variant: 1 dense + 47
            # windowed layers) compile one scan body PER RUN of identical
            # layers instead of one body per layer
            mods, scanned = [], []
            layer = 0
            for k, (is_mmdit, is_swa, count) in enumerate(cfg.segments()):
                if count > 1:
                    mods.append(make_scan(count, is_mmdit, is_swa,
                                          f"blocks_seg{k}"))
                else:
                    mods.append(MMDiTBlock(
                        **block_kwargs, is_mmdit=is_mmdit, is_swa=is_swa,
                        name=f"block{layer}"))
                scanned.append(count > 1)
                layer += count
            self.seg_blocks = mods
            self.seg_scanned = scanned
        else:
            swa = set(cfg.swa_layers or ())
            self.loop_blocks = [
                MMDiTBlock(**block_kwargs, is_mmdit=i < cfg.mmdit_layers,
                           is_swa=i in swa, name=f"block{i}")
                for i in range(cfg.num_layers)
            ]

        self.norm_final_scale = self.param(
            "norm_final_scale", nn.initializers.ones, (cfg.inner_dim,), jnp.float32)
        self.norm_final_bias = self.param(
            "norm_final_bias", nn.initializers.zeros, (cfg.inner_dim,), jnp.float32)
        self.norm_out = nn.Dense(2 * cfg.inner_dim, dtype=dt)
        self.norm_out_scale = self.param(
            "norm_out_scale", nn.initializers.ones, (cfg.inner_dim,), jnp.float32)
        self.norm_out_bias = self.param(
            "norm_out_bias", nn.initializers.zeros, (cfg.inner_dim,), jnp.float32)
        self.proj_out = nn.Dense(
            cfg.patch_size * cfg.patch_size * cfg.out_channels, dtype=dt)

    # -- stages ---------------------------------------------------------------

    def embed(
        self,
        hidden_states: jnp.ndarray,
        timestep: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        encoder_hidden_states_t5: Optional[jnp.ndarray] = None,
        inpaint_latents: Optional[jnp.ndarray] = None,
        control_latents: Optional[jnp.ndarray] = None,
        ref_latents: Optional[jnp.ndarray] = None,
        clip_encoder_hidden_states: Optional[jnp.ndarray] = None,
    ):
        """-> (vid_tokens, txt_tokens, temb)."""
        cfg = self.cfg
        dt = cfg.jdtype

        temb = sinusoidal_timestep_embedding(timestep, cfg.inner_dim)
        temb = self.time_embedding(temb.astype(dt))

        if inpaint_latents is not None:
            hidden_states = jnp.concatenate([hidden_states, inpaint_latents], axis=1)
        if control_latents is not None:
            hidden_states = jnp.concatenate([hidden_states, control_latents], axis=1)
        x = jnp.transpose(hidden_states, (0, 2, 3, 4, 1)).astype(dt)  # BTHWC
        vid = self.proj(x)

        txt_in = encoder_hidden_states.astype(dt)
        if cfg.add_norm_text_encoder:
            txt_in = fp32_rms_norm(txt_in, self.text_norm_scale)
        txt = self.text_proj(txt_in)
        if encoder_hidden_states_t5 is not None:
            t5 = encoder_hidden_states_t5.astype(dt)
            if cfg.add_norm_text_encoder:
                t5 = fp32_rms_norm(t5, self.text_norm_t5_scale)
            txt = jnp.concatenate([txt, self.text_proj_t5(t5)], axis=1)

        if ref_latents is not None:
            rb, rc, rt, rh, rw = ref_latents.shape
            ref = jnp.transpose(ref_latents, (0, 2, 3, 4, 1)).astype(dt)
            ref = self.ref_proj(ref)
            pos = _sincos_2d(cfg.inner_dim, rh // cfg.patch_size,
                             rw // cfg.patch_size)
            ref = ref + jnp.asarray(pos, dt)[None]
            txt = ref
        if clip_encoder_hidden_states is not None:
            clip = self.clip_proj(clip_encoder_hidden_states.astype(dt))
            txt = jnp.concatenate([clip, txt], axis=1)
        return vid, txt, temb

    def backbone(self, vid, txt, temb, rope=None, grid_size=None):
        """Block stack + final norms + AdaLN-out. Returns video tokens ready
        for proj_out; `backbone(...) - vid` is the TeaCache residual."""
        cfg = self.cfg
        if cfg.scan_layers and cfg.homogeneous:
            (vid2, txt2), _ = self.blocks((vid, txt), temb, rope, grid_size)
        elif cfg.scan_layers:
            vid2, txt2 = vid, txt
            for mod, is_scan in zip(self.seg_blocks, self.seg_scanned):
                if is_scan:
                    (vid2, txt2), _ = mod((vid2, txt2), temb, rope, grid_size)
                elif cfg.remat:
                    vid2, txt2 = nn.remat(
                        lambda m, *a: m(*a), prevent_cse=False,
                        static_argnums=(5,)
                    )(mod, vid2, txt2, temb, rope, grid_size)
                else:
                    vid2, txt2 = mod(vid2, txt2, temb, rope, grid_size)
        else:
            vid2, txt2 = vid, txt
            for block in self.loop_blocks:
                if cfg.remat:
                    vid2, txt2 = nn.remat(
                        lambda m, *a: m(*a), prevent_cse=False, static_argnums=(5,)
                    )(block, vid2, txt2, temb, rope, grid_size)
                else:
                    vid2, txt2 = block(vid2, txt2, temb, rope, grid_size)

        st = txt2.shape[1]
        joint = jnp.concatenate([txt2, vid2], axis=1)
        vid2 = fp32_layer_norm(joint, self.norm_final_scale,
                               self.norm_final_bias, cfg.norm_eps)[:, st:]

        mods = self.norm_out(nn.silu(temb))
        shift, scale = jnp.split(mods, 2, axis=-1)
        vid2 = fp32_layer_norm(vid2, self.norm_out_scale, self.norm_out_bias,
                               cfg.norm_eps)
        return vid2 * (1 + scale[:, None]) + shift[:, None]

    def head(self, vid_tokens, t: int, h: int, w: int):
        """proj_out + unpatchify; (t, h, w) are latent-grid sizes."""
        cfg = self.cfg
        p = cfg.patch_size
        out = self.proj_out(vid_tokens)
        return unpatchify(out, t, h // p, w // p, p, cfg.out_channels)

    def modulated_input(self, vid, txt, temb):
        """Block-0 norm1 modulation of the video stream -- the TeaCache skip
        signal (reference transformer3d.py:1563-1590)."""
        cfg = self.cfg
        params = self.variables["params"]
        if cfg.scan_layers and cfg.homogeneous:
            p = params["blocks"]["block"]
            sl = lambda x: x[0]
        elif cfg.scan_layers and cfg.segments()[0][2] > 1:
            p = params["blocks_seg0"]["block"]
            sl = lambda x: x[0]
        else:
            p = params["block0"]
            sl = lambda x: x
        n1 = p["norm1"]
        mods = (nn.silu(temb) @ sl(n1["linear"]["kernel"]).astype(temb.dtype)
                + sl(n1["linear"]["bias"]).astype(temb.dtype))
        d = cfg.inner_dim
        shift, scale = mods[:, :d], mods[:, d: 2 * d]
        normed = fp32_layer_norm(vid, sl(n1["norm_scale"]), sl(n1["norm_bias"]),
                                 cfg.norm_eps)
        return normed * (1 + scale[:, None]) + shift[:, None]

    def __call__(
        self,
        hidden_states: jnp.ndarray,            # (B, C, T, H, W) latents
        timestep: jnp.ndarray,                 # (B,)
        encoder_hidden_states: jnp.ndarray,    # (B, S_txt, text_embed_dim)
        rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        encoder_hidden_states_t5: Optional[jnp.ndarray] = None,
        inpaint_latents: Optional[jnp.ndarray] = None,
        control_latents: Optional[jnp.ndarray] = None,
        ref_latents: Optional[jnp.ndarray] = None,
        clip_encoder_hidden_states: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b, c, t, hh, ww = hidden_states.shape
        vid, txt, temb = self.embed(
            hidden_states, timestep, encoder_hidden_states,
            encoder_hidden_states_t5, inpaint_latents, control_latents,
            ref_latents, clip_encoder_hidden_states)
        p = self.cfg.patch_size
        vid = self.backbone(vid, txt, temb, rope,
                            grid_size=(t, hh // p, ww // p))
        return self.head(vid, t, hh, ww)


def _sincos_2d(dim: int, h: int, w: int):
    """2D sin-cos position table (diffusers get_2d_sincos_pos_embed)."""
    import numpy as np

    def one_axis(d, pos):
        omega = 1.0 / (10000.0 ** (np.arange(d // 2, dtype=np.float64) / (d / 2.0)))
        out = np.einsum("m,d->md", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gh = np.arange(h, dtype=np.float32)
    gw = np.arange(w, dtype=np.float32)
    grid = np.meshgrid(gw, gh)  # w goes first
    grid = np.stack(grid, axis=0).reshape(2, -1)
    emb_w = one_axis(dim // 2, grid[0])
    emb_h = one_axis(dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)

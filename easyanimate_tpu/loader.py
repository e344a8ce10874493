"""Checkpoint loader: reference model directories -> TPU pipelines.

Consumes the same on-disk layout the reference downloads from HF
(alibaba-pai/EasyAnimateV5.1-*): transformer/config.json +
diffusion_pytorch_model*.safetensors, vae/..., scheduler/scheduler_config.json
(predict_t2v.py:91-254 load spine). Weights convert through
models/convert.py; no torch needed (safetensors numpy).
"""
import glob
import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .models.convert import convert_mmdit_state_dict, convert_vae_state_dict
from .models.mmdit import EasyAnimateTransformer3D, MMDiTConfig
from .models.vae import AutoencoderKLMagvit, MagvitVAEConfig
from .pipeline import (
    DDIMConfig,
    EasyAnimateControlPipeline,
    EasyAnimateInpaintPipeline,
    EasyAnimatePipeline,
    FlowMatchEulerConfig,
)

_PIPELINES = {
    "t2v": EasyAnimatePipeline,
    "inpaint": EasyAnimateInpaintPipeline,
    "control": EasyAnimateControlPipeline,
}


def _read_json(path):
    with open(path) as f:
        return json.load(f)


def _load_safetensors_dir(path: str):
    from safetensors.numpy import load_file

    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors under {path}")
    sd = {}
    for f in files:
        sd.update(load_file(f))
    return sd


def _override_state_dict(base_sd: dict, ckpt_path: Optional[str],
                         what: str) -> dict:
    """Overlay a component checkpoint file onto a base state dict
    (reference predict_t2v.py:110-119 `load_state_dict(state_dict,
    strict=False)`): keys present in the file override, keys missing keep
    the base weights, unexpected keys are reported and dropped."""
    if ckpt_path is None:
        return base_sd
    from safetensors.numpy import load_file

    if not ckpt_path.endswith("safetensors"):
        raise ValueError(f"{what}_path must be a .safetensors file "
                         f"(got {ckpt_path!r})")
    sd = load_file(ckpt_path)
    unexpected = [k for k in sd if k not in base_sd]
    missing = sum(1 for k in base_sd if k not in sd)
    print(f"From checkpoint: {ckpt_path} ({what}) — "
          f"missing keys: {missing}, unexpected keys: {len(unexpected)}")
    return {**base_sd, **{k: v for k, v in sd.items() if k in base_sd}}


def mmdit_config_from_json(cfg: dict, dtype: str = "bfloat16") -> MMDiTConfig:
    """Map a reference transformer config.json to MMDiTConfig."""
    return MMDiTConfig(
        num_attention_heads=cfg.get("num_attention_heads", 48),
        attention_head_dim=cfg.get("attention_head_dim", 64),
        in_channels=cfg.get("in_channels", 16),
        out_channels=cfg.get("out_channels", 16),
        patch_size=cfg.get("patch_size", 2),
        num_layers=cfg.get("num_layers", 48),
        mmdit_layers=cfg.get("mmdit_layers", 10000),
        swa_layers=cfg.get("swa_layers"),
        time_embed_dim=cfg.get("time_embed_dim", 512),
        text_embed_dim=cfg.get("text_embed_dim", 3584),
        text_embed_dim_t5=cfg.get("text_embed_dim_t5"),
        add_norm_text_encoder=cfg.get("add_norm_text_encoder", False),
        after_norm=cfg.get("after_norm", False),
        norm_eps=cfg.get("norm_eps", 1e-5),
        time_position_encoding_type=cfg.get(
            "time_position_encoding_type", "3d_rope"),
        ref_channels=cfg.get("ref_channels"),
        clip_channels=cfg.get("clip_channels"),
        add_ref_latent_in_control_model=cfg.get(
            "add_ref_latent_in_control_model", False),
        resize_inpaint_mask_directly=cfg.get(
            "resize_inpaint_mask_directly", True),
        add_noise_in_inpaint_model=cfg.get("add_noise_in_inpaint_model", True),
        dtype=dtype,
    )


def vae_config_from_json(cfg: dict, dtype: str = "bfloat16") -> MagvitVAEConfig:
    chunk_mode = "none"
    if cfg.get("cache_mag_vae"):
        chunk_mode = "cache_mag"
    elif cfg.get("slice_mag_vae"):
        chunk_mode = "slice_mag"
    elif cfg.get("cache_compression_vae"):
        chunk_mode = "cache_compression"
    elif cfg.get("slice_compression_vae"):
        chunk_mode = "slice_compression"
    return MagvitVAEConfig(
        in_channels=cfg.get("in_channels", 3),
        out_channels=cfg.get("out_channels", 3),
        latent_channels=cfg.get("latent_channels", 16),
        block_out_channels=tuple(cfg.get("block_out_channels",
                                         (128, 256, 512, 512))),
        down_block_types=tuple(_parse_types(cfg.get("down_block_types"))),
        up_block_types=tuple(_parse_types(cfg.get("up_block_types"))),
        layers_per_block=cfg.get("layers_per_block", 2),
        norm_num_groups=cfg.get("norm_num_groups", 32),
        mid_block_attention_type=cfg.get("mid_block_attention_type", "spatial"),
        mid_block_use_attention=cfg.get("mid_block_use_attention", True),
        spatial_group_norm=cfg.get("spatial_group_norm", True),
        mini_batch_encoder=cfg.get("mini_batch_encoder", 4),
        mini_batch_decoder=cfg.get("mini_batch_decoder", 1),
        scaling_factor=cfg.get("scaling_factor", 0.7119),
        chunk_mode=chunk_mode,
        # serving default: 4 latent frames per cache_mag decoder pass --
        # bit-identical to mini_batch_decoder passes (the causal cache
        # threads exact conv state; tests/test_vae.py) and the measured
        # decode optimum on v5e (benchmarks/vae_decode_bench.py). Other
        # chunk modes ignore the knob (pass size is semantic there).
        decode_chunk_frames=cfg.get("decode_chunk_frames",
                                    4 if chunk_mode == "cache_mag" else None),
        tile_sample_min_size=cfg.get("tile_sample_min_size", 384),
        tile_overlap_factor=cfg.get("tile_overlap_factor", 0.25),
        dtype=dtype,
    )


def _parse_types(v):
    if v is None:
        return ("SpatialDownBlock3D", "SpatialTemporalDownBlock3D",
                "SpatialTemporalDownBlock3D", "SpatialTemporalDownBlock3D")
    if isinstance(v, str):  # the reference stores a python-tuple string
        return tuple(x.strip().strip("'\"")
                     for x in v.strip("()").split(",") if x.strip())
    return tuple(v)


def load_text_encoders(
    model_path: Optional[str] = None,
    text_encoder_path: Optional[str] = None,
    text_encoder_2_path: Optional[str] = None,
    max_length: int = 256,
):
    """Build the prompt-encoding callable for a model directory.

    Detects the edition's text stack from text_encoder/config.json (the
    reference's load spine, predict_t2v.py:91-254 / ui.py:368-430):
      qwen2 / qwen2_vl  (V5.1 "replace_t5_to_llm")  -> single stream
      bert (+ text_encoder_2 mT5, V4/V5 multi-text) -> dual stream

    Returns encode(prompts) -> {"text": [B,S,D], optional "text_t5"}.
    """
    te = text_encoder_path or (model_path and
                               os.path.join(model_path, "text_encoder"))
    if not te or not os.path.isdir(te):
        raise FileNotFoundError(
            f"no text encoder at {te!r}; pass text_encoder_path")
    te2 = text_encoder_2_path or (model_path and
                                  os.path.join(model_path, "text_encoder_2"))
    cfg = _read_json(os.path.join(te, "config.json"))
    model_type = cfg.get("model_type", "")

    from .models.text.encoders import build_text_encoder

    if model_type.startswith("qwen2"):
        enc = build_text_encoder("qwen2_vl", te, max_length=max_length)

        def encode(prompts):
            emb, _ = enc(list(prompts))
            return {"text": emb}

        return encode

    if model_type == "bert":
        bert = build_text_encoder("bert", te)
        if not (te2 and os.path.isdir(te2)):
            raise FileNotFoundError(
                "bert text encoder needs the mT5 text_encoder_2 directory")
        mt5 = build_text_encoder("mt5", te2, max_length=max_length)

        def encode(prompts):
            emb, _ = bert(list(prompts))
            emb2, _ = mt5(list(prompts))
            return {"text": emb, "text_t5": emb2}

        return encode

    if model_type in ("t5", "mt5", "umt5"):  # V1-V3 single T5 stream
        mt5 = build_text_encoder("mt5", te, max_length=max_length)

        def encode(prompts):
            emb, _ = mt5(list(prompts))
            return {"text": emb}

        return encode

    raise ValueError(f"unrecognized text encoder model_type {model_type!r}")


def _strict_check(transformer, cfg, tparams):
    """All checkpoint keys consumed AND all model params initialized."""
    import jax.numpy as jnp

    from .models.convert import assert_params_complete
    from .pipeline.t2v import build_rope

    t, h, w = 2, 16, 16
    lat = jnp.zeros((1, cfg.in_channels, t, h, w), cfg.jdtype)
    ts = jnp.zeros((1,), jnp.float32)
    txt = jnp.zeros((1, 4, cfg.text_embed_dim), cfg.jdtype)
    kw = {}
    if cfg.text_embed_dim_t5 is not None:
        kw["encoder_hidden_states_t5"] = jnp.zeros(
            (1, 4, cfg.text_embed_dim_t5), cfg.jdtype)
    if cfg.ref_channels is not None or cfg.add_ref_latent_in_control_model:
        kw["ref_latents"] = jnp.zeros(
            (1, cfg.ref_channels or cfg.out_channels, 1, h, w), cfg.jdtype)
    if cfg.clip_channels is not None:
        kw["clip_encoder_hidden_states"] = jnp.zeros(
            (1, 4, cfg.clip_channels), cfg.jdtype)
    rope = build_rope(cfg, h * 8, w * 8, t)
    assert_params_complete(tparams, transformer, lat, ts, txt, rope, **kw)


def load_pipeline(
    model_path: str,
    pipeline_type: str = "t2v",
    dtype: str = "bfloat16",
    fp8_weights: bool = False,
    int8_linears: bool = False,
    int4_weights: bool = False,
    int4_compute: str = "int8",
    scheduler: Optional[str] = None,
    strict: bool = True,
    transformer_path: Optional[str] = None,
    vae_path: Optional[str] = None,
):
    """Build a ready pipeline from a reference-format model directory.

    strict=True verifies the converted transformer tree against the model's
    expected parameter inventory (fail-loud on layout drift).
    int8_linears=True quantizes the block linears to W8A8 int8
    (ops/quant.py; ~1.5x MXU throughput on v5e) -- composes with
    fp8_weights for the non-block remainder.
    int4_weights=True stores the block linears as group-128 packed int4
    (~6 GB resident for the 12B: fits 576x1008x49f on one 16 GB chip) --
    mutually exclusive with int8_linears. int4_compute picks the matmul
    path: "int8" (default, W4A8 -- int4 memory at int8-MXU throughput,
    ops/quant.py::int4_matmul_a8) or "bf16" (W4A16 dequant matmul).
    transformer_path / vae_path overlay a component safetensors checkpoint
    on the base model dir (reference predict scripts' same-named knobs)."""
    if int8_linears and int4_weights:
        raise ValueError("int8_linears and int4_weights are exclusive")
    if int4_compute not in ("int8", "bf16"):
        raise ValueError(f"int4_compute must be int8|bf16, got {int4_compute}")
    int4_mode = "w4a8" if int4_compute == "int8" else "int4"
    quant = "int8" if int8_linears else (int4_mode if int4_weights else None)
    tcfg_json = _read_json(os.path.join(model_path, "transformer", "config.json"))
    vcfg_json = _read_json(os.path.join(model_path, "vae", "config.json"))
    mmdit_cfg = mmdit_config_from_json(tcfg_json, dtype)
    vae_cfg = vae_config_from_json(vcfg_json, dtype)
    if quant:
        import dataclasses

        mmdit_cfg = dataclasses.replace(mmdit_cfg, linear_quant=quant)

    transformer = EasyAnimateTransformer3D(mmdit_cfg)
    vae = AutoencoderKLMagvit(vae_cfg)

    tsd = _load_safetensors_dir(os.path.join(model_path, "transformer"))
    vsd = _load_safetensors_dir(os.path.join(model_path, "vae"))
    # component checkpoint overrides (reference predict_t2v.py:110-119,
    # 146-157: a safetensors file load_state_dict'ed strict=False over the
    # base model — keys present override, missing keys keep base weights)
    tsd = _override_state_dict(tsd, transformer_path, "transformer")
    vsd = _override_state_dict(vsd, vae_path, "vae")
    tparams = convert_mmdit_state_dict(tsd, mmdit_cfg)
    vparams = convert_vae_state_dict(vsd, vae_cfg)
    if quant == "int8":
        from .ops.quant import quantize_params_int8

        tparams = quantize_params_int8(tparams)
    elif quant in ("int4", "w4a8"):
        from .ops.quant import quantize_params_int4

        tparams = quantize_params_int4(tparams)
    if strict:
        _strict_check(transformer, mmdit_cfg, tparams)
    cast = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    wdt = jnp.float8_e4m3fn if fp8_weights else cast

    def to_dev(path, t):
        t = jnp.asarray(t)
        if not jnp.issubdtype(t.dtype, jnp.floating):
            return t  # int8 kernels stay int8
        name = getattr(path[-1], "key", "")
        if name == "scale" or t.ndim < 2:
            return t.astype(jnp.float32)  # quant scales / norms / biases
        return t.astype(wdt)

    import jax

    tparams = jax.tree_util.tree_map_with_path(to_dev, tparams)
    vparams = jax.tree.map(lambda t: jnp.asarray(t, cast if np.ndim(t) >= 2
                                                 else jnp.float32), vparams)

    sched_path = os.path.join(model_path, "scheduler", "scheduler_config.json")
    if scheduler == "flow" or (scheduler is None and os.path.exists(sched_path)
                               and "FlowMatch" in _read_json(sched_path).get(
                                   "_class_name", "")):
        scfg = _read_json(sched_path) if os.path.exists(sched_path) else {}
        sched = FlowMatchEulerConfig(
            num_train_timesteps=scfg.get("num_train_timesteps", 1000),
            shift=scfg.get("shift", 3.0),
            use_dynamic_shifting=scfg.get("use_dynamic_shifting", True),
        )
    elif scheduler == "ddim" or scheduler is None:
        scfg = _read_json(sched_path) if os.path.exists(sched_path) else {}
        sched = DDIMConfig(
            num_train_timesteps=scfg.get("num_train_timesteps", 1000),
            beta_start=scfg.get("beta_start", 0.0001),
            beta_end=scfg.get("beta_end", 0.02),
            beta_schedule=scfg.get("beta_schedule", "scaled_linear"),
            prediction_type=scfg.get("prediction_type", "epsilon"),
        )
    else:
        sched = FlowMatchEulerConfig()

    cls = _PIPELINES[pipeline_type]
    pipe = cls(transformer=transformer, vae=vae, transformer_params=tparams,
               vae_params=vparams, scheduler=sched)
    # per-model TeaCache polynomial from the checkpoint name (reference
    # get_teacache_coefficients keyed by model path, ui.py:477)
    from .pipeline.t2v import get_teacache_coefficients

    # reference matches a lowercase substring of the FULL model path
    # (ui.py:477 passes self.base_model_path); unmatched models get None and
    # the pipeline refuses to enable TeaCache rather than silently running a
    # foreign polynomial
    pipe.teacache_coefficients = get_teacache_coefficients(model_path)
    return pipe

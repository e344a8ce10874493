"""Checkpoint conversion: reference PyTorch state dicts -> flax param trees.

Key layouts being mapped (reference module definitions):
  MMDiT     transformer3d.py:1347-1483 + attention.py:1027-1100 +
            norm.py:135-166 (diffusers Attention/FeedForward submodule names)
  MagViT    omnigen_enc_dec.py + vaemodules/* (Conv3d weights OITHW)

Conventions:
  torch Linear weight (out, in)    -> flax Dense kernel (in, out)      [T]
  torch Conv2d weight (O, I, H, W) -> flax Conv kernel (H, W, I, O)
  torch Conv3d weight (O, I, T, H, W) -> CausalConv3d kernel (T, H, W, I, O)
  per-layer block weights are stacked on a leading axis when the flax model
  uses the nn.scan layout (cfg.scan_layers).
Weights are accepted as numpy arrays (load safetensors with
`safetensors.numpy.load_file`, no torch required).
"""
from typing import Dict

import numpy as np

from .mmdit import MMDiTConfig
from .vae.magvit import MagvitVAEConfig


def _t(w):  # linear
    return np.ascontiguousarray(np.transpose(w))


def _conv2d(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _conv3d(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _conv1x1x1(w):
    """torch Conv3d 1x1x1 weight (O, I, 1, 1, 1) -> Dense kernel (I, O)."""
    return _t(w[:, :, 0, 0, 0])


# inverse transforms (flax layout -> torch layout), keyed by the forward fn
_INVERSE = {
    None: lambda w: np.ascontiguousarray(w),
    _t: _t,
    _conv2d: lambda w: np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1))),
    _conv3d: lambda w: np.ascontiguousarray(np.transpose(w, (4, 3, 0, 1, 2))),
    _conv1x1x1: lambda w: np.ascontiguousarray(
        np.transpose(w)[:, :, None, None, None]),
}


def _nest(flat: Dict[str, np.ndarray]):
    import flax

    return flax.traverse_util.unflatten_dict(flat, sep="/")


# ---------------------------------------------------------------------------
# MMDiT
# ---------------------------------------------------------------------------


def _block_mapping(src_prefix: str):
    """reference block key suffix -> (our key suffix, transform)."""
    m = {
        "norm1.linear.weight": ("norm1/linear/kernel", _t),
        "norm1.linear.bias": ("norm1/linear/bias", None),
        "norm1.norm.weight": ("norm1/norm_scale", None),
        "norm1.norm.bias": ("norm1/norm_bias", None),
        "norm2.linear.weight": ("norm2/linear/kernel", _t),
        "norm2.linear.bias": ("norm2/linear/bias", None),
        "norm2.norm.weight": ("norm2/norm_scale", None),
        "norm2.norm.bias": ("norm2/norm_bias", None),
        "ff.net.0.proj.weight": ("ff/wi/kernel", _t),
        "ff.net.0.proj.bias": ("ff/wi/bias", None),
        "ff.net.2.weight": ("ff/wo/kernel", _t),
        "ff.net.2.bias": ("ff/wo/bias", None),
        "txt_ff.net.0.proj.weight": ("txt_ff/wi/kernel", _t),
        "txt_ff.net.0.proj.bias": ("txt_ff/wi/bias", None),
        "txt_ff.net.2.weight": ("txt_ff/wo/kernel", _t),
        "txt_ff.net.2.bias": ("txt_ff/wo/bias", None),
        "norm3.weight": ("norm3_scale", None),
        "norm3.bias": ("norm3_bias", None),
    }
    for attn in ("attn1", "attn2"):
        for p in ("q", "k", "v"):
            m[f"{attn}.to_{p}.weight"] = (f"{attn}/to_{p}/kernel", _t)
            m[f"{attn}.to_{p}.bias"] = (f"{attn}/to_{p}/bias", None)
        m[f"{attn}.norm_q.weight"] = (f"{attn}/norm_q_scale", None)
        m[f"{attn}.norm_q.bias"] = (f"{attn}/norm_q_bias", None)
        m[f"{attn}.norm_k.weight"] = (f"{attn}/norm_k_scale", None)
        m[f"{attn}.norm_k.bias"] = (f"{attn}/norm_k_bias", None)
        m[f"{attn}.to_out.0.weight"] = (f"{attn}_out/kernel", _t)
        m[f"{attn}.to_out.0.bias"] = (f"{attn}_out/bias", None)
    return {src_prefix + k: v for k, v in m.items()}


def _mmdit_top_mapping(cfg: MMDiTConfig) -> Dict[str, tuple]:
    """reference non-block key -> (flax tree key, forward transform)."""
    top = {
        "time_embedding.linear_1.weight": ("time_embedding/linear_1/kernel", _t),
        "time_embedding.linear_1.bias": ("time_embedding/linear_1/bias", None),
        "time_embedding.linear_2.weight": ("time_embedding/linear_2/kernel", _t),
        "time_embedding.linear_2.bias": ("time_embedding/linear_2/bias", None),
        "proj.weight": ("proj/proj/kernel", _conv2d),
        "proj.bias": ("proj/proj/bias", None),
        "norm_final.weight": ("norm_final_scale", None),
        "norm_final.bias": ("norm_final_bias", None),
        "norm_out.linear.weight": ("norm_out/kernel", _t),
        "norm_out.linear.bias": ("norm_out/bias", None),
        "norm_out.norm.weight": ("norm_out_scale", None),
        "norm_out.norm.bias": ("norm_out_bias", None),
        "proj_out.weight": ("proj_out/kernel", _t),
        "proj_out.bias": ("proj_out/bias", None),
        "clip_proj.weight": ("clip_proj/kernel", _t),
        "clip_proj.bias": ("clip_proj/bias", None),
        "ref_proj.weight": ("ref_proj/proj/kernel", _conv2d),
        "ref_proj.bias": ("ref_proj/proj/bias", None),
    }
    if cfg.add_norm_text_encoder:
        top.update({
            "text_proj.0.weight": ("text_norm_scale", None),
            "text_proj.1.weight": ("text_proj/kernel", _t),
            "text_proj.1.bias": ("text_proj/bias", None),
            "text_proj_t5.0.weight": ("text_norm_t5_scale", None),
            "text_proj_t5.1.weight": ("text_proj_t5/kernel", _t),
            "text_proj_t5.1.bias": ("text_proj_t5/bias", None),
        })
    else:
        top.update({
            "text_proj.weight": ("text_proj/kernel", _t),
            "text_proj.bias": ("text_proj/bias", None),
            "text_proj_t5.weight": ("text_proj_t5/kernel", _t),
            "text_proj_t5.bias": ("text_proj_t5/bias", None),
        })
    return top


def convert_mmdit_state_dict(sd: Dict[str, np.ndarray], cfg: MMDiTConfig):
    """-> {'params': ...} flax variables for EasyAnimateTransformer3D."""
    flat: Dict[str, np.ndarray] = {}
    top = _mmdit_top_mapping(cfg)

    consumed = set()
    for src, (dst, fn) in top.items():
        if src in sd:
            flat[dst] = fn(sd[src]) if fn else np.asarray(sd[src])
            consumed.add(src)

    def stack_layers(first, count, prefix):
        """Stack transformer_blocks.[first, first+count) under prefix."""
        per_key: Dict[str, list] = {}
        for i in range(first, first + count):
            mapping = _block_mapping(f"transformer_blocks.{i}.")
            for src, (dst, fn) in mapping.items():
                if src in sd:
                    per_key.setdefault(dst, []).append(
                        fn(sd[src]) if fn else np.asarray(sd[src]))
                    consumed.add(src)
        for dst, stack in per_key.items():
            assert len(stack) == count, (dst, len(stack))
            flat[f"{prefix}/{dst}"] = np.stack(stack)

    def copy_layer(i, prefix):
        mapping = _block_mapping(f"transformer_blocks.{i}.")
        for src, (dst, fn) in mapping.items():
            if src in sd:
                flat[f"{prefix}/{dst}"] = fn(sd[src]) if fn \
                    else np.asarray(sd[src])
                consumed.add(src)

    if cfg.scan_layers and cfg.homogeneous:
        stack_layers(0, cfg.num_layers, "blocks/block")
    elif cfg.scan_layers:
        # segmented scan stacks (heterogeneous layer runs, models/mmdit.py)
        layer = 0
        for k, (_, _, count) in enumerate(cfg.segments()):
            if count > 1:
                stack_layers(layer, count, f"blocks_seg{k}/block")
            else:
                copy_layer(layer, f"block{layer}")
            layer += count
    else:
        for i in range(cfg.num_layers):
            copy_layer(i, f"block{i}")

    leftover = set(sd) - consumed
    if leftover:
        raise ValueError(f"unmapped reference keys: {sorted(leftover)[:8]}...")
    return {"params": _nest(flat)}


# ---------------------------------------------------------------------------
# MagViT VAE
# ---------------------------------------------------------------------------


def _vae_res(src, dst):
    return {
        f"{src}.norm1.weight": (f"{dst}/norm1/scale", None),
        f"{src}.norm1.bias": (f"{dst}/norm1/bias", None),
        f"{src}.conv1.weight": (f"{dst}/conv1/kernel", _conv3d),
        f"{src}.conv1.bias": (f"{dst}/conv1/bias", None),
        f"{src}.norm2.weight": (f"{dst}/norm2/scale", None),
        f"{src}.norm2.bias": (f"{dst}/norm2/bias", None),
        f"{src}.conv2.weight": (f"{dst}/conv2/kernel", _conv3d),
        f"{src}.conv2.bias": (f"{dst}/conv2/bias", None),
        f"{src}.shortcut.weight": (f"{dst}/shortcut/kernel", _conv1x1x1),
        f"{src}.shortcut.bias": (f"{dst}/shortcut/bias", None),
    }


def _vae_attn(src, dst):
    m = {
        f"{src}.group_norm.weight": (f"{dst}/group_norm/scale", None),
        f"{src}.group_norm.bias": (f"{dst}/group_norm/bias", None),
        f"{src}.to_out.weight": (f"{dst}/to_out/kernel", _t),
        f"{src}.to_out.bias": (f"{dst}/to_out/bias", None),
    }
    for p in ("q", "k", "v"):
        m[f"{src}.to_{p}.weight"] = (f"{dst}/to_{p}/kernel", _t)
        m[f"{src}.to_{p}.bias"] = (f"{dst}/to_{p}/bias", None)
    return m


def _magvit_mapping(cfg: MagvitVAEConfig) -> Dict[str, tuple]:
    """reference state-dict key -> (flax tree key, forward transform)."""
    mapping: Dict[str, tuple] = {}

    def half(side: str, block_types, n_blocks_name):
        pre = side  # 'encoder' | 'decoder'
        mapping.update({
            f"{pre}.conv_in.weight": (f"{pre}/conv_in/kernel", _conv3d),
            f"{pre}.conv_in.bias": (f"{pre}/conv_in/bias", None),
            f"{pre}.conv_norm_out.weight": (f"{pre}/conv_norm_out/scale", None),
            f"{pre}.conv_norm_out.bias": (f"{pre}/conv_norm_out/bias", None),
            f"{pre}.conv_out.weight": (f"{pre}/conv_out/kernel", _conv3d),
            f"{pre}.conv_out.bias": (f"{pre}/conv_out/bias", None),
        })
        # mid block
        for j in range(cfg.layers_per_block):
            mapping.update(_vae_res(f"{pre}.mid_block.convs.{j}",
                                    f"{pre}/mid/res{j}"))
        for j in range(cfg.layers_per_block - 1):
            if cfg.mid_block_attention_type == "spatial_temporal":
                mapping.update(_vae_attn(f"{pre}.mid_block.attentions.{j}.0",
                                         f"{pre}/mid/attn{j+1}_spatial"))
                mapping.update(_vae_attn(f"{pre}.mid_block.attentions.{j}.1",
                                         f"{pre}/mid/attn{j+1}_temporal"))
            else:
                mapping.update(_vae_attn(f"{pre}.mid_block.attentions.{j}",
                                         f"{pre}/mid/attn{j+1}"))
        # down/up blocks
        kind = "down_blocks" if side == "encoder" else "up_blocks"
        short = "down" if side == "encoder" else "up"
        n_res = cfg.layers_per_block if side == "encoder" else cfg.layers_per_block + 1
        for i in range(len(block_types)):
            for j in range(n_res):
                mapping.update(_vae_res(f"{pre}.{kind}.{i}.convs.{j}",
                                        f"{pre}/{short}{i}/res{j}"))
            is_final = i == len(block_types) - 1
            if not is_final:
                if side == "encoder":
                    mapping.update({
                        f"{pre}.{kind}.{i}.downsampler.conv.weight":
                            (f"{pre}/{short}{i}/down/conv/kernel", _conv3d),
                        f"{pre}.{kind}.{i}.downsampler.conv.bias":
                            (f"{pre}/{short}{i}/down/conv/bias", None),
                    })
                else:
                    bt = block_types[i]
                    if "SpatialTemporal" in bt:
                        dstc = f"{pre}/{short}{i}/up/conv"
                    else:
                        dstc = f"{pre}/{short}{i}/up_conv"
                    mapping.update({
                        f"{pre}.{kind}.{i}.upsampler.conv.weight":
                            (f"{dstc}/kernel", _conv3d),
                        f"{pre}.{kind}.{i}.upsampler.conv.bias":
                            (f"{dstc}/bias", None),
                    })

    half("encoder", cfg.down_block_types, "down")
    half("decoder", cfg.up_block_types, "up")
    mapping.update({
        "quant_conv.weight": ("quant_conv/kernel", _conv1x1x1),
        "quant_conv.bias": ("quant_conv/bias", None),
        "post_quant_conv.weight": ("post_quant_conv/kernel", _conv1x1x1),
        "post_quant_conv.bias": ("post_quant_conv/bias", None),
    })
    return mapping


def convert_vae_state_dict(sd: Dict[str, np.ndarray], cfg: MagvitVAEConfig):
    """-> {'params': ...} for AutoencoderKLMagvit."""
    mapping = _magvit_mapping(cfg)
    flat, consumed = {}, set()
    for src, (dst, fn) in mapping.items():
        if src in sd:
            flat[dst] = fn(sd[src]) if fn else np.asarray(sd[src])
            consumed.add(src)
    leftover = set(sd) - consumed
    if leftover:
        raise ValueError(f"unmapped VAE keys: {sorted(leftover)[:8]}...")
    return {"params": _nest(flat)}


def assert_params_complete(converted, model, *example_args, **example_kw):
    """Strict mode: every parameter the flax model expects must be present
    in the converted tree with the exact shape, and the tree must contain
    nothing extra. Fails loud on real checkpoint layout drift (a silent key
    mismatch on a 12B checkpoint would produce garbage output, not an
    error). Reference layout: transformer3d.py:1347-1689."""
    import jax

    expected = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *example_args, **example_kw))

    def flatten(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {
            "/".join(str(getattr(k, "key", k)) for k in kp):
                tuple(np.shape(leaf))
            for kp, leaf in flat
        }

    exp, got = flatten(expected), flatten(converted)
    missing = sorted(set(exp) - set(got))
    extra = sorted(set(got) - set(exp))
    bad = sorted(k for k in set(exp) & set(got) if exp[k] != got[k])
    if missing or extra or bad:
        lines = []
        if missing:
            lines.append(f"missing {len(missing)}: {missing[:6]}")
        if extra:
            lines.append(f"unexpected {len(extra)}: {extra[:6]}")
        if bad:
            lines.append("shape mismatches: " + "; ".join(
                f"{k}: ckpt{got[k]} != model{exp[k]}" for k in bad[:6]))
        raise ValueError("checkpoint/model parameter mismatch -- "
                         + " | ".join(lines))


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return load_file(path)


def convert_cogvideox_state_dict(sd: Dict[str, np.ndarray], cfg):
    """diffusers AutoencoderKLCogVideoX weights -> AutoencoderKLCogVideoX
    (cogvideox.py) tree. Key layout per
    diffusers/models/autoencoders/autoencoder_kl_cogvideox.py (the reference
    imports these blocks at vae/ldm/models/cogvideox_enc_dec.py:20-22)."""
    mapping: Dict[str, tuple] = {}

    def spatial_norm(src, dst):
        return {
            f"{src}.norm_layer.weight": (f"{dst}/norm_layer/scale", None),
            f"{src}.norm_layer.bias": (f"{dst}/norm_layer/bias", None),
            f"{src}.conv_y.conv.weight":
                (f"{dst}/conv_y/kernel", lambda w: _t(w[:, :, 0, 0, 0])),
            f"{src}.conv_y.conv.bias": (f"{dst}/conv_y/bias", None),
            f"{src}.conv_b.conv.weight":
                (f"{dst}/conv_b/kernel", lambda w: _t(w[:, :, 0, 0, 0])),
            f"{src}.conv_b.conv.bias": (f"{dst}/conv_b/bias", None),
        }

    def res(src, dst, spatial):
        out = {
            f"{src}.conv1.conv.weight": (f"{dst}/conv1/kernel", _conv3d),
            f"{src}.conv1.conv.bias": (f"{dst}/conv1/bias", None),
            f"{src}.conv2.conv.weight": (f"{dst}/conv2/kernel", _conv3d),
            f"{src}.conv2.conv.bias": (f"{dst}/conv2/bias", None),
            f"{src}.conv_shortcut.weight":
                (f"{dst}/conv_shortcut/kernel",
                 lambda w: _t(w[:, :, 0, 0, 0])),
            f"{src}.conv_shortcut.bias": (f"{dst}/conv_shortcut/bias", None),
        }
        for n in ("norm1", "norm2"):
            if spatial:
                out.update(spatial_norm(f"{src}.{n}", f"{dst}/{n}"))
            else:
                out[f"{src}.{n}.weight"] = (f"{dst}/{n}/scale", None)
                out[f"{src}.{n}.bias"] = (f"{dst}/{n}/bias", None)
        return out

    n = len(cfg.block_out_channels)
    for pre, short, kind, n_res, spatial in (
            ("encoder", "down", "down_blocks", cfg.layers_per_block, False),
            ("decoder", "up", "up_blocks", cfg.layers_per_block + 1, True)):
        mapping.update({
            f"{pre}.conv_in.conv.weight": (f"{pre}/conv_in/kernel", _conv3d),
            f"{pre}.conv_in.conv.bias": (f"{pre}/conv_in/bias", None),
            f"{pre}.conv_out.conv.weight": (f"{pre}/conv_out/kernel", _conv3d),
            f"{pre}.conv_out.conv.bias": (f"{pre}/conv_out/bias", None),
        })
        if pre == "encoder":
            mapping.update({
                "encoder.norm_out.weight": ("encoder/norm_out/scale", None),
                "encoder.norm_out.bias": ("encoder/norm_out/bias", None),
            })
        else:
            mapping.update(spatial_norm("decoder.norm_out",
                                        "decoder/norm_out"))
        for j in range(2):
            mapping.update(res(f"{pre}.mid_block.resnets.{j}",
                               f"{pre}/mid_res{j}", spatial))
        for i in range(n):
            for j in range(n_res):
                mapping.update(res(f"{pre}.{kind}.{i}.resnets.{j}",
                                   f"{pre}/{short}{i}_res{j}", spatial))
            if i < n - 1:
                samp = ("downsamplers" if pre == "encoder" else "upsamplers")
                # per-frame Conv2d (OIHW) -> (1, kh, kw, I, O)
                mapping.update({
                    f"{pre}.{kind}.{i}.{samp}.0.conv.weight":
                        (f"{pre}/{short}{i}_{samp[:-1]}/conv/kernel",
                         lambda w: _conv2d(w)[None]),
                    f"{pre}.{kind}.{i}.{samp}.0.conv.bias":
                        (f"{pre}/{short}{i}_{samp[:-1]}/conv/bias", None),
                })
    if cfg.use_quant_conv:
        mapping.update({
            "quant_conv.weight": ("quant_conv/kernel",
                                  lambda w: _t(w[:, :, 0, 0, 0])),
            "quant_conv.bias": ("quant_conv/bias", None),
            "post_quant_conv.weight": ("post_quant_conv/kernel",
                                       lambda w: _t(w[:, :, 0, 0, 0])),
            "post_quant_conv.bias": ("post_quant_conv/bias", None),
        })

    flat, consumed = {}, set()
    for src, (dst, fn) in mapping.items():
        if src in sd:
            flat[dst] = fn(sd[src]) if fn else np.asarray(sd[src])
            consumed.add(src)
    leftover = set(sd) - consumed
    if leftover:
        raise ValueError(f"unmapped CogVideoX keys: {sorted(leftover)[:8]}...")
    return {"params": _nest(flat)}


# ---------------------------------------------------------------------------
# Export: flax param trees -> reference (diffusers-layout) state dicts.
# The reference ecosystem consumes diffusers-format safetensors shards
# (scripts/train.py:1121-1167 save hooks; transformer3d.py:1691-1809 layout),
# so a model trained here exports losslessly back to it.
# ---------------------------------------------------------------------------


def _flatten_params(variables) -> Dict[str, np.ndarray]:
    import flax

    params = variables.get("params", variables)
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    out = {}
    for k, v in flat.items():
        v = np.asarray(v)
        if v.dtype == np.dtype("bfloat16"):
            v = v.astype(np.float32)
        out[k] = v
    return out


def export_mmdit_state_dict(variables, cfg: MMDiTConfig) -> Dict[str, np.ndarray]:
    """EasyAnimateTransformer3D params -> reference transformer state dict
    (inverse of convert_mmdit_state_dict; exact key-set round trip).

    int8-serving trees (linear_quant='int8') are not exportable -- train/EMA
    trees are float; quantization is a serving-time transform."""
    if cfg.linear_quant:
        raise ValueError("export needs a float tree; int8 serving params "
                         "cannot be converted back losslessly")
    flat = _flatten_params(variables)
    out: Dict[str, np.ndarray] = {}

    for src, (dst, fn) in _mmdit_top_mapping(cfg).items():
        if dst in flat:
            out[src] = _INVERSE[fn](flat.pop(dst))

    def unstack_layers(first: int, count: int, prefix: str):
        mapping = _block_mapping("")
        for src_suffix, (dst_suffix, fn) in mapping.items():
            key = f"{prefix}/{dst_suffix}"
            if key not in flat:
                continue
            stack = flat.pop(key)
            assert stack.shape[0] == count, (key, stack.shape, count)
            for i in range(count):
                out[f"transformer_blocks.{first + i}.{src_suffix}"] = (
                    _INVERSE[fn](stack[i]))

    def copy_layer(i: int, prefix: str):
        mapping = _block_mapping("")
        for src_suffix, (dst_suffix, fn) in mapping.items():
            key = f"{prefix}/{dst_suffix}"
            if key in flat:
                out[f"transformer_blocks.{i}.{src_suffix}"] = (
                    _INVERSE[fn](flat.pop(key)))

    if cfg.scan_layers and cfg.homogeneous:
        unstack_layers(0, cfg.num_layers, "blocks/block")
    elif cfg.scan_layers:
        layer = 0
        for k, (_, _, count) in enumerate(cfg.segments()):
            if count > 1:
                unstack_layers(layer, count, f"blocks_seg{k}/block")
            else:
                copy_layer(layer, f"block{layer}")
            layer += count
    else:
        for i in range(cfg.num_layers):
            copy_layer(i, f"block{i}")

    if flat:
        raise ValueError(
            f"unexported flax params: {sorted(flat)[:8]}... -- the export "
            "mapping must cover the whole tree")
    return out


def export_vae_state_dict(variables, cfg: MagvitVAEConfig) -> Dict[str, np.ndarray]:
    """AutoencoderKLMagvit params -> reference VAE state dict (inverse of
    convert_vae_state_dict)."""
    flat = _flatten_params(variables)
    out: Dict[str, np.ndarray] = {}
    for src, (dst, fn) in _magvit_mapping(cfg).items():
        if dst in flat:
            out[src] = _INVERSE[fn](flat.pop(dst))
    if flat:
        raise ValueError(f"unexported VAE params: {sorted(flat)[:8]}...")
    return out


# ---------------------------------------------------------------------------
# LoRA export/import (kohya / sd-webui format).
# The reference trains and ships LoRAs as `lora_unet_<module>.lora_up.weight`
# / `.lora_down.weight` / `.alpha` safetensors (utils/lora_utils.py:158-341:
# LoRANetwork names every Linear child of the transformer
# `lora_unet_` + module path with dots replaced by underscores;
# scripts/train_lora.py:1552 saves `lora_diffusion_pytorch_model.safetensors`)
# and merges them as W += multiplier * (alpha/r) * up @ down
# (lora_utils.py:416-432). Our LoRA tree (training/lora.py) keys flax kernel
# paths to {'down': (..., in, r), 'up': (..., r, out)} factors -- merge
# kernel += (alpha/r) * down @ up is the same delta transposed, so the
# factors map 1:1: lora_down.weight = down.T, lora_up.weight = up.T.
# PermutedDense applies its RoPE de-interleave at apply time, so stored
# kernels (and therefore LoRA factors) are already in reference feature
# order -- no permutation is needed here.
# ---------------------------------------------------------------------------

LORA_PREFIX_TRANSFORMER = "lora_unet"  # lora_utils.py:161


def _kohya_name(module_path: str) -> str:
    return LORA_PREFIX_TRANSFORMER + "_" + module_path.replace(".", "_")


def _block_linear_suffixes() -> Dict[str, str]:
    """flax block kernel suffix -> reference Linear module path suffix."""
    out = {}
    for src, (dst, fn) in _block_mapping("").items():
        if fn is _t and dst.endswith("/kernel"):
            out[dst] = src[:-len(".weight")]
    return out


def _top_linear_map(cfg: MMDiTConfig) -> Dict[str, str]:
    """flax top-level kernel path -> reference Linear module path."""
    out = {}
    for src, (dst, fn) in _mmdit_top_mapping(cfg).items():
        if fn is _t and dst.endswith("/kernel"):
            out[dst] = src[:-len(".weight")]
    return out


def _mmdit_layer_regions(cfg: MMDiTConfig):
    """[(flax prefix, first global layer, layer count, stacked)] mirroring
    the scan-segment layout used by convert/export_mmdit_state_dict."""
    if cfg.scan_layers and cfg.homogeneous:
        return [("blocks/block", 0, cfg.num_layers, True)]
    if cfg.scan_layers:
        regions, layer = [], 0
        for k, (_, _, count) in enumerate(cfg.segments()):
            if count > 1:
                regions.append((f"blocks_seg{k}/block", layer, count, True))
            else:
                regions.append((f"block{layer}", layer, 1, False))
            layer += count
        return regions
    return [(f"block{i}", i, 1, False) for i in range(cfg.num_layers)]


def export_lora_state_dict(lora, alpha: float,
                           cfg: MMDiTConfig) -> Dict[str, np.ndarray]:
    """LoRA factor tree -> kohya state dict the reference ecosystem consumes
    (merge_lora in utils/lora_utils.py, sd-webui-additional-networks).
    Scan-stacked (L, ., .) factors unstack to per-layer modules."""
    suffixes = _block_linear_suffixes()
    top = _top_linear_map(cfg)
    regions = _mmdit_layer_regions(cfg)
    alpha_arr = np.asarray(alpha, np.float32)
    out: Dict[str, np.ndarray] = {}

    def emit(module_path, down, up):
        name = _kohya_name(module_path)
        out[name + ".lora_down.weight"] = _t(down)
        out[name + ".lora_up.weight"] = _t(up)
        out[name + ".alpha"] = alpha_arr

    for path, fac in sorted(lora.items()):
        down = np.asarray(fac["down"], np.float32)
        up = np.asarray(fac["up"], np.float32)
        region = next((r for r in regions if path.startswith(r[0] + "/")),
                      None)
        if region is not None:
            prefix, first, count, stacked = region
            mod = suffixes.get(path[len(prefix) + 1:])
            if mod is None:
                raise ValueError(f"no reference module for LoRA path {path}")
            if stacked:
                assert down.shape[0] == count, (path, down.shape, count)
                for i in range(count):
                    emit(f"transformer_blocks.{first + i}.{mod}",
                         down[i], up[i])
            else:
                emit(f"transformer_blocks.{first}.{mod}", down, up)
        elif path in top:
            emit(top[path], down, up)
        else:
            raise ValueError(f"no reference module for LoRA path {path}")
    return out


def convert_lora_state_dict(sd: Dict[str, np.ndarray], cfg: MMDiTConfig,
                            skip_text_encoder: bool = True):
    """kohya LoRA state dict -> (LoRA factor tree, LoRAConfig).

    Text-encoder factors (`lora_te_*`, lora_utils.py:162) are skipped by
    default -- the repo trains/merges transformer LoRAs; pass
    skip_text_encoder=False to fail loud instead. For scan-stacked kernel
    regions every covered layer must be present (partial per-layer LoRAs
    on a stacked region are rejected rather than silently zero-filled)."""
    from ..training.lora import LoRAConfig

    # kohya name -> (flax kernel path, slot index or None, region layer count)
    table = {}
    suffixes = _block_linear_suffixes()
    for prefix, first, count, stacked in _mmdit_layer_regions(cfg):
        for dst, mod in suffixes.items():
            for i in range(count):
                table[_kohya_name(f"transformer_blocks.{first + i}.{mod}")] \
                    = (f"{prefix}/{dst}", i if stacked else None, count)
    for dst, mod in _top_linear_map(cfg).items():
        table[_kohya_name(mod)] = (dst, None, 1)

    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for key, v in sd.items():
        for kind in (".lora_down.weight", ".lora_up.weight", ".alpha"):
            if key.endswith(kind):
                name = key[:-len(kind)]
                break
        else:
            raise ValueError(f"unrecognised LoRA key {key}")
        if name.startswith("lora_te"):
            if skip_text_encoder:
                continue
            raise ValueError(f"text-encoder LoRA not supported: {name}")
        if name not in table:
            raise ValueError(f"LoRA module {name} has no kernel in this "
                             "model config")
        groups.setdefault(name, {})[kind] = np.asarray(v)

    slots: Dict[str, Dict[int, tuple]] = {}
    ranks, alphas = set(), set()
    for name, g in groups.items():
        missing = {".lora_down.weight", ".lora_up.weight"} - set(g)
        if missing:
            raise ValueError(f"{name} missing {missing}")
        down = _t(g[".lora_down.weight"].astype(np.float32))  # (in, r)
        up = _t(g[".lora_up.weight"].astype(np.float32))      # (r, out)
        rank = down.shape[1]
        ranks.add(rank)
        # kohya convention: absent alpha means alpha == rank (scale 1)
        alphas.add(float(g.get(".alpha", rank)))
        path, slot, count = table[name]
        slots.setdefault(path, {})[0 if slot is None else slot] = (down, up)

    if len(ranks) > 1:
        raise ValueError(f"mixed LoRA ranks {sorted(ranks)} unsupported")
    if len(alphas) > 1:
        raise ValueError(f"mixed LoRA alphas {sorted(alphas)} unsupported")

    import jax.numpy as jnp

    lora = {}
    for path, per_slot in slots.items():
        count = next(c for (p, s, c) in table.values() if p == path)
        if count > 1:
            have = sorted(per_slot)
            if have != list(range(count)):
                raise ValueError(
                    f"scan-stacked kernel {path} needs all {count} layers; "
                    f"got slots {have[:6]}...")
            down = np.stack([per_slot[i][0] for i in range(count)])
            up = np.stack([per_slot[i][1] for i in range(count)])
        else:
            down, up = per_slot[0]
        lora[path] = {"down": jnp.asarray(down), "up": jnp.asarray(up)}
    if not lora:
        raise ValueError("state dict contained no transformer LoRA modules")
    rank = next(iter(ranks))
    return lora, LoRAConfig(rank=rank, alpha=next(iter(alphas)))


def save_lora_reference(path: str, lora, alpha: float, cfg: MMDiTConfig):
    """Write a kohya-format LoRA safetensors file (the reference's
    `lora_diffusion_pytorch_model.safetensors`, scripts/train_lora.py:1552)."""
    from safetensors.numpy import save_file

    save_file(export_lora_state_dict(lora, alpha, cfg), path)


def _mmdit_config_json(cfg: MMDiTConfig) -> Dict:
    """MMDiTConfig -> reference transformer config.json fields (the inverse
    of loader.mmdit_config_from_json)."""
    return {
        "_class_name": "EasyAnimateTransformer3DModel",
        "num_attention_heads": cfg.num_attention_heads,
        "attention_head_dim": cfg.attention_head_dim,
        "in_channels": cfg.in_channels,
        "out_channels": cfg.out_channels,
        "patch_size": cfg.patch_size,
        "num_layers": cfg.num_layers,
        "mmdit_layers": cfg.mmdit_layers,
        "swa_layers": list(cfg.swa_layers) if cfg.swa_layers else None,
        "time_embed_dim": cfg.time_embed_dim,
        "text_embed_dim": cfg.text_embed_dim,
        "text_embed_dim_t5": cfg.text_embed_dim_t5,
        "add_norm_text_encoder": cfg.add_norm_text_encoder,
        "after_norm": cfg.after_norm,
        "norm_eps": cfg.norm_eps,
        "time_position_encoding_type": cfg.time_position_encoding_type,
        "ref_channels": cfg.ref_channels,
        "clip_channels": cfg.clip_channels,
        "add_ref_latent_in_control_model": cfg.add_ref_latent_in_control_model,
        "resize_inpaint_mask_directly": cfg.resize_inpaint_mask_directly,
        "add_noise_in_inpaint_model": cfg.add_noise_in_inpaint_model,
    }


def save_reference_checkpoint(directory: str, state_dict: Dict[str, np.ndarray],
                              config_json: Dict = None,
                              max_shard_bytes: int = 30 * 10 ** 9,
                              weights_name: str =
                              "diffusion_pytorch_model.safetensors"):
    """Write a diffusers-layout folder: config.json + safetensors shard(s)
    with the standard `.index.json` weight map when sharded (reference
    save_pretrained(max_shard_size="30GB"), scripts/train.py:1126)."""
    import json
    import os

    from safetensors.numpy import save_file

    os.makedirs(directory, exist_ok=True)
    if config_json is not None:
        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump(config_json, f, indent=2)

    shards, cur, cur_bytes = [], {}, 0
    for k in sorted(state_dict):
        v = state_dict[k]
        if cur and cur_bytes + v.nbytes > max_shard_bytes:
            shards.append(cur)
            cur, cur_bytes = {}, 0
        cur[k] = v
        cur_bytes += v.nbytes
    shards.append(cur)

    if len(shards) == 1:
        save_file(shards[0], os.path.join(directory, weights_name))
        return [weights_name]
    stem, ext = weights_name.rsplit(".", 1)
    names, weight_map, total = [], {}, 0
    for i, shard in enumerate(shards):
        name = f"{stem}-{i + 1:05d}-of-{len(shards):05d}.{ext}"
        save_file(shard, os.path.join(directory, name))
        names.append(name)
        for k, v in shard.items():
            weight_map[k] = name
            total += v.nbytes
    with open(os.path.join(directory, f"{weights_name}.index.json"), "w") as f:
        json.dump({"metadata": {"total_size": total},
                   "weight_map": weight_map}, f, indent=2)
    return names

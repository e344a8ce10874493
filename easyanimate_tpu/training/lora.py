"""LoRA as parameter-tree surgery (kohya-style semantics, TPU-native form).

Parity target: utils/lora_utils.py -- the reference injects forward hooks on
Linear modules inside the DiT blocks (`create_network` targets
EasyAnimateDiTBlock etc.) and offers merge/unmerge weight fusion. Here a LoRA
is a parallel pytree of (down, up) factors for every matching kernel; merging
is `kernel + scale * alpha/rank * down @ up`, which works identically for
scan-stacked (L, in, out) kernels via batched matmul. No module wrappers:
`merge_lora(params, lora)` returns a param tree usable by any pipeline, and
training differentiates w.r.t. the LoRA tree only.
"""
import dataclasses
import re
from typing import Any, Callable, Optional, Tuple

import flax
import jax
import jax.numpy as jnp

# default targets: all attention + FFN kernels inside DiT blocks
DEFAULT_TARGETS = r"(attn1|attn2)/to_[qkv]/kernel$|(attn1_out|attn2_out)/kernel$|(txt_ff|ff)/(wi|wo)/kernel$"


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 32
    alpha: float = 16.0
    targets: str = DEFAULT_TARGETS
    init_std: float = 0.01


def _flat(params):
    return flax.traverse_util.flatten_dict(params, sep="/")


def _unflat(flat):
    return flax.traverse_util.unflatten_dict(flat, sep="/")


def lora_init(params: Any, cfg: LoRAConfig, rng: jax.Array) -> Any:
    """Build the LoRA factor tree for kernels matching cfg.targets.

    Each entry: {'down': (..., in, r), 'up': (..., r, out)}; up is
    zero-initialised so merge(params, lora) == params at step 0.
    """
    flat = _flat(params)
    out = {}
    keys = jax.random.split(rng, max(len(flat), 1))
    for (path, leaf), key in zip(sorted(flat.items()), keys):
        if not re.search(cfg.targets, path):
            continue
        *lead, d_in, d_out = leaf.shape
        down = cfg.init_std * jax.random.normal(
            key, (*lead, d_in, cfg.rank), jnp.float32)
        up = jnp.zeros((*lead, cfg.rank, d_out), jnp.float32)
        out[path] = {"down": down, "up": up}
    return out


def merge_lora(params: Any, lora: Any, cfg: LoRAConfig,
               scale: float = 1.0) -> Any:
    """kernel' = kernel + scale * (alpha/rank) * down @ up.

    Quantized kernels (ops/quant.py) merge in dequantized space and
    requantize, refreshing the quant scales — merge/unmerge round-trips
    then carry only quantization error, not raw-int corruption. Both W8A8
    int8 kernels ([in, out] + per-out "scale") and packed-int4 kernels
    ([in//2, out] + per-group "scale") are handled; they are told apart by
    the packed kernel having half the contraction rows of the delta."""
    flat = dict(_flat(params))
    coef = scale * cfg.alpha / cfg.rank
    for path, fac in lora.items():
        delta = jnp.matmul(fac["down"], fac["up"]) * coef
        kern = flat[path]
        if kern.dtype == jnp.int8:
            from ..ops.quant import (dequantize_int4, quantize_weight_int4,
                                     quantize_weight_int8)

            assert path.endswith("kernel"), path
            spath = path[:-len("kernel")] + "scale"
            wscale = flat[spath]
            if kern.shape[-2] * 2 == delta.shape[-2]:  # packed int4
                w = dequantize_int4(kern, wscale) + delta
                flat[path], flat[spath] = quantize_weight_int4(w)
            else:
                w = kern.astype(jnp.float32) * wscale[..., None, :] + delta
                flat[path], flat[spath] = quantize_weight_int8(w)
        else:
            flat[path] = (kern.astype(jnp.float32) + delta).astype(kern.dtype)
    return _unflat(flat)


def unmerge_lora(params: Any, lora: Any, cfg: LoRAConfig,
                 scale: float = 1.0) -> Any:
    return merge_lora(params, lora, cfg, scale=-scale)


def make_lora_train_step(model, train_cfg, lora_cfg: LoRAConfig,
                         base_params: Any) -> Tuple[Callable, Callable]:
    """Returns (init_fn, step_fn) where only LoRA factors are trained.

    step(lora_state, batch, rng) -> (lora_state, metrics); lora_state is a
    TrainState whose params are the LoRA tree. The frozen base params are
    captured (stay on device; never updated).
    """
    import optax

    from .losses import (flow_noise_and_target, masked_mse_loss,
                         sample_flow_sigmas)
    from .trainer import TrainState, make_optimizer

    tx = make_optimizer(train_cfg)

    def init_fn(rng):
        lora = lora_init(base_params["params"], lora_cfg, rng)
        return TrainState(step=jnp.zeros((), jnp.int32), params=lora,
                          opt_state=tx.init(lora), ema_params=None)

    def loss_fn(lora, batch, rng):
        merged = {"params": merge_lora(base_params["params"], lora, lora_cfg)}
        latents = batch["latents"]
        rng_s, rng_n = jax.random.split(rng)
        sigmas, timesteps = sample_flow_sigmas(rng_s, latents.shape[0],
                                               train_cfg.loss)
        noise = jax.random.normal(rng_n, latents.shape, jnp.float32)
        noisy, target = flow_noise_and_target(latents, noise, sigmas)
        pred = model.apply(merged, noisy, timesteps, batch["text"],
                           batch.get("rope"),
                           encoder_hidden_states_t5=batch.get("text_t5"),
                           inpaint_latents=batch.get("inpaint_latents"),
                           control_latents=batch.get("control_latents"))
        return masked_mse_loss(pred, target,
                               train_cfg.loss.loss_outlier_threshold)

    def step(state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_lora = optax.apply_updates(state.params, updates)
        return (state.replace(step=state.step + 1, params=new_lora,
                              opt_state=new_opt),
                {"loss": loss, "grad_norm": optax.global_norm(grads)})

    return init_fn, step


def save_lora(path: str, lora: Any, cfg: LoRAConfig):
    """Persist as a flat .npz (plus config in a sidecar json)."""
    import json

    import numpy as np

    flat = {}
    for p, fac in lora.items():
        flat[p + "/down"] = np.asarray(fac["down"])
        flat[p + "/up"] = np.asarray(fac["up"])
    np.savez(path, **flat)
    with open(path + ".json", "w") as f:
        json.dump({"rank": cfg.rank, "alpha": cfg.alpha,
                   "targets": cfg.targets}, f)


def load_lora(path: str) -> Tuple[Any, LoRAConfig]:
    import json

    import numpy as np

    data = np.load(path if path.endswith(".npz") else path + ".npz")
    with open((path if path.endswith(".npz") else path + ".npz") + ".json") as f:
        meta = json.load(f)
    lora = {}
    for k in data.files:
        p, kind = k.rsplit("/", 1)
        lora.setdefault(p, {})[kind] = jnp.asarray(data[k])
    return lora, LoRAConfig(rank=meta["rank"], alpha=meta["alpha"],
                            targets=meta["targets"])

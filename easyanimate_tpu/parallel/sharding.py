"""Parameter and activation PartitionSpecs for the MMDiT + VAE.

Rules are path-based (regex over the flattened param path), so model code
stays sharding-agnostic. Megatron-style layout:
  qkv / ffn-in kernels  : output dim on 'tp'
  attn-out / ffn-out    : input dim on 'tp'
  everything else       : replicated (optionally fsdp-sharded over 'dp')
Scan-stacked block params carry a leading layer axis (never sharded).
"""
import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over '/'-joined param path, spec builder given array rank)
# Specs are for the *trailing* dims; leading (layer-stack) dims padded None.
_MMDIT_RULES = [
    # attention qkv + ffn in: shard last dim (output features)
    (r"(attn1|attn2)/to_[qkv]/kernel$", ("tp", -1)),
    (r"ff/wi/kernel$", ("tp", -1)),
    (r"txt_ff/wi/kernel$", ("tp", -1)),
    # attention out + ffn out: shard second-to-last dim (input features)
    (r"(attn1_out|attn2_out)/kernel$", ("tp", -2)),
    (r"ff/wo/kernel$", ("tp", -2)),
    (r"txt_ff/wo/kernel$", ("tp", -2)),
    # biases + int8 per-out-channel quant scales of tp-sharded outputs
    # (ops/quant.py W8A8: "scale" follows the kernel's output dim; wo /
    # attn_out scales are over non-sharded output features -> replicated)
    (r"(attn1|attn2)/to_[qkv]/(bias|scale)$", ("tp", -1)),
    (r"ff/wi/(bias|scale)$", ("tp", -1)),
    (r"txt_ff/wi/(bias|scale)$", ("tp", -1)),
]


def _spec_for(path: str, ndim: int, rules) -> P:
    for pat, (axis, dim) in rules:
        if re.search(pat, path):
            dim = ndim + dim if dim < 0 else dim
            spec = [None] * ndim
            spec[dim] = axis
            return P(*spec)
    return P()  # replicated


def mmdit_param_specs(params) -> dict:
    """PartitionSpec pytree matching a transformer param tree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(
            getattr(k, "key", getattr(k, "idx", str(k))) if not isinstance(k, str) else k
            for k in [getattr(p, "key", str(p)) for p in kp]
        )

    specs = {}
    for kp, leaf in flat:
        p = path_str(kp)
        specs[p] = _spec_for(p, np.ndim(leaf), _MMDIT_RULES)
    # rebuild tree
    treedef = jax.tree_util.tree_structure(params)
    leaves = [specs[path_str(kp)] for kp, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def named_sharding(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def shard_params(params, mesh: Mesh):
    """Place a param tree onto the mesh per the MMDiT rules."""
    specs = mmdit_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    ), specs


def zero_param_specs(params, mesh: Mesh, zero_axes=("dp", "sp")) -> dict:
    """ZeRO-2-equivalent specs for OPTIMIZER STATE (and EMA): each moment
    inherits its parameter's tp spec PLUS sharding of its largest
    still-unsharded, divisible dimension over the data axes.

    The reference trains under DeepSpeed ZeRO stage-2
    (config/zero_stage2_config.json; scripts/README_TRAIN.md:83): optimizer
    state is partitioned across data-parallel ranks while params stay
    replicated per rank. This is the GSPMD form of the same contract:
    moments/EMA are elementwise state, so ANY extra sharding is valid; the
    partitioner inserts the ZeRO comm pattern itself (reduce-scatter of
    grads into the moment shards, all-gather of the param update). Without
    this, dp and sp replicate the 94 GB 12B Adam state that tp alone only
    halves — the per-device memory gate in __graft_entry__ caught exactly
    that.

    Apply to opt_state via optax.tree_map_params and to ema_params
    directly; keep plain mmdit_param_specs for the params themselves
    (ZeRO-2 keeps them replicated across data ranks; sharding them too
    would be FSDP/ZeRO-3, a different wall-clock trade)."""
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    axes = tuple(a for a in zero_axes if sizes.get(a, 1) > 1)
    factor = int(np.prod([sizes[a] for a in axes])) if axes else 1
    base = mmdit_param_specs(params)

    def extend(leaf, spec):
        if factor == 1:
            return spec
        shape = np.shape(leaf)
        parts = list(spec) + [None] * (len(shape) - len(spec))
        # largest unsharded divisible dim gets the data axes
        for i in sorted(range(len(shape)), key=lambda i: -shape[i]):
            if parts[i] is None and shape[i] % factor == 0:
                parts[i] = axes if len(axes) > 1 else axes[0]
                return P(*parts)
        return P(*parts)

    return jax.tree.map(extend, params, base)


def data_spec(kind: str) -> P:
    """Activation specs.

    latents (B,C,T,H,W): batch on dp, frames on sp (video tokens sequence-
    sharded along the temporal axis - clean for patchify and attention
    all-gather); text (B,S,D): batch on dp.
    """
    if kind == "latents":
        return P("dp", None, "sp", None, None)
    if kind == "text":
        return P("dp", None, None)
    if kind == "video":
        return P("dp", None, "sp", None, None)
    if kind == "timesteps":
        return P("dp")
    raise ValueError(kind)

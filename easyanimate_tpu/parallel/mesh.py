"""Device mesh construction for GSPMD training/inference.

The reference's distributed story is DDP+ZeRO-2 over NCCL (SURVEY.md §2.9).
TPU-native replacement: one mesh with three axes
  dp  - data parallel (batch)
  sp  - sequence/context parallel (video tokens of one sample)
  tp  - tensor parallel (attention heads / FFN hidden)
ZeRO-style optimizer sharding falls out of GSPMD: optimizer state inherits
the parameter PartitionSpecs, and fsdp-style weight sharding is a spec
change, not a new runtime.
"""
import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("dp", "sp", "tp")


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = -1   # -1: absorb remaining devices
    sp: int = 1
    tp: int = 1


def create_mesh(cfg: MeshConfig = MeshConfig(),
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    dp = cfg.dp
    if dp == -1:
        assert n % (cfg.sp * cfg.tp) == 0, (n, cfg)
        dp = n // (cfg.sp * cfg.tp)
    need = dp * cfg.sp * cfg.tp
    assert need <= n, (dp, cfg.sp, cfg.tp, n)
    # explicit sizes smaller than the device count run on a sub-mesh
    # (e.g. --mesh dp=1,sp=1,tp=1 on a multi-device host)
    arr = np.asarray(devices[:need]).reshape(dp, cfg.sp, cfg.tp)
    return Mesh(arr, AXES)

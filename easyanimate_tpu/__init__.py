"""EasyAnimate-TPU: a TPU-native (JAX/XLA/Pallas/pjit) text/image/video -> video
generation framework with the capabilities of aigc-apps/EasyAnimate.

Built from scratch for TPU: Pallas flash-attention kernels, functional
(scan-carried) causal-conv VAE caches, GSPMD sharding over device meshes,
and samplers compiled as single `lax.scan` denoise loops.

Layer map (mirrors the reference's capability surface, re-designed TPU-first):
  ops/       Pallas kernels + numerics (flash attention, RoPE, norms)
  models/    MMDiT denoisers (V5/V5.1 flagship), MagViT 3D causal VAE
  pipeline/  T2V / I2V-inpaint / control pipelines, schedulers
  parallel/  mesh + GSPMD sharding rules (dp / sp / tp)
  training/  flow-matching & IDDPM losses, LoRA, EMA, checkpoints
  data/      aspect-bucket datasets, masks, camera/Plucker embeds
  utils/     config system, video IO helpers
"""

__version__ = "0.1.0"

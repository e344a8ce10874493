from .schedulers import (
    DDIMConfig,
    FlowMatchEulerConfig,
    ddim_add_noise,
    ddim_schedule,
    ddim_step,
    flow_match_add_noise,
    flow_match_schedule,
    flow_match_step,
    rescale_noise_cfg,
)
from .t2v import EasyAnimatePipeline, build_rope
from .inpaint import EasyAnimateInpaintPipeline
from .control import EasyAnimateControlPipeline
from .pixart import PixArtMagvitPipeline

__all__ = [
    "DDIMConfig",
    "FlowMatchEulerConfig",
    "EasyAnimatePipeline",
    "EasyAnimateInpaintPipeline",
    "EasyAnimateControlPipeline",
    "PixArtMagvitPipeline",
    "build_rope",
    "ddim_add_noise",
    "ddim_schedule",
    "ddim_step",
    "flow_match_add_noise",
    "flow_match_schedule",
    "flow_match_step",
    "rescale_noise_cfg",
]

from .losses import (
    FlowMatchLossConfig,
    ddpm_sample_timesteps,
    flow_noise_and_target,
    masked_mse_loss,
    sample_flow_sigmas,
)
from .trainer import TrainConfig, TrainState, create_train_state, make_train_step

__all__ = [
    "FlowMatchLossConfig",
    "TrainConfig",
    "TrainState",
    "create_train_state",
    "ddpm_sample_timesteps",
    "flow_noise_and_target",
    "make_train_step",
    "masked_mse_loss",
    "sample_flow_sigmas",
]

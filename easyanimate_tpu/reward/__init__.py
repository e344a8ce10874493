from .reward_fn import (
    AestheticReward,
    CLIPScoreReward,
    HPSReward,
    PickScoreReward,
)

__all__ = [
    "AestheticReward",
    "CLIPScoreReward",
    "HPSReward",
    "PickScoreReward",
]

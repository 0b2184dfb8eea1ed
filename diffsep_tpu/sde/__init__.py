from .base import SDE, SDERegistry, batch_broadcast, reverse_discretize, reverse_sde
from .mixsde import MixSDE, PriorMixSDE, mix_mats
from .ouve import OUVESDE, OUVPSDE

__all__ = [
    "SDE",
    "SDERegistry",
    "batch_broadcast",
    "reverse_sde",
    "reverse_discretize",
    "MixSDE",
    "PriorMixSDE",
    "mix_mats",
    "OUVESDE",
    "OUVPSDE",
]

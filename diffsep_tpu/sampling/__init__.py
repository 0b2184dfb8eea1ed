from .correctors import Corrector, CorrectorRegistry
from .pc import fibonaccispace, get_pc_sampler, make_timesteps, ode_sample, pc_sample
from .predictors import Predictor, PredictorRegistry

__all__ = [
    "Predictor",
    "PredictorRegistry",
    "Corrector",
    "CorrectorRegistry",
    "pc_sample",
    "get_pc_sampler",
    "ode_sample",
    "make_timesteps",
    "fibonaccispace",
]

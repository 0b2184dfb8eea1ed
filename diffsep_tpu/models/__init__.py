from .cdiffuse import DiffuSE
from .dptnet import DPTNet
from .ncsnpp import NCSNpp
from .score_model import ScoreModelNCSNpp
from .score_model_diffuse import ScoreModelDiffuSE
from .tcn import TemporalConvNet

__all__ = [
    "NCSNpp",
    "ScoreModelNCSNpp",
    "ScoreModelDiffuSE",
    "DiffuSE",
    "TemporalConvNet",
    "DPTNet",
]

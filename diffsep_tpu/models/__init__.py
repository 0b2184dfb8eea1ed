from .ncsnpp import NCSNpp
from .score_model import ScoreModelNCSNpp

__all__ = ["NCSNpp", "ScoreModelNCSNpp"]

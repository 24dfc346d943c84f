"""Auto-tuning: search space, strategies, tuning loop (the Active Harmony
re-expression; SURVEY.md §2b)."""

from .layers import (
    FilterLayer,
    Layer,
    PenaltyLayer,
    TransformLayer,
)
from .space import Dimension, SearchSpace, build_space
from .strategies import (
    STRATEGIES,
    BruteStrategy,
    NelderMead,
    PROStrategy,
    RandomStrategy,
    make_strategy,
)
from .tuner import Tuner, TuneResult, tune

__all__ = [
    "STRATEGIES", "BruteStrategy", "Dimension", "FilterLayer", "Layer",
    "NelderMead", "PROStrategy", "PenaltyLayer", "RandomStrategy",
    "SearchSpace", "TransformLayer", "Tuner", "TuneResult", "build_space",
    "make_strategy", "tune",
]

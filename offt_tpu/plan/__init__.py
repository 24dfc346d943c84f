"""Plans: parameter space, feasibility, persistent cache, public API."""

from . import cache
from .api import Plan, fft3d, ifft3d, irfft3d, plan, rfft3d
from .params import (
    PlanParams,
    ProblemSpec,
    default_params,
    infeasible_reason,
    is_feasible,
    p1_candidates,
    w_from_reference,
)

__all__ = [
    "Plan", "PlanParams", "ProblemSpec", "cache", "default_params",
    "fft3d", "ifft3d", "infeasible_reason", "irfft3d", "is_feasible",
    "p1_candidates", "plan", "rfft3d", "w_from_reference",
]

"""Adaptive multi-fidelity sparse-grid surrogate engine (amisc-equivalent).

Leja-knot tensor-product Lagrange interpolants + MISC index-set combination +
cost-aware greedy refinement + SVD field compression (SURVEY.md §2.4, §7 step 5).
"""

from hallthrusterpem_tpu.surrogate.knots import leja_sequence, knots_for_level, barycentric_weights
from hallthrusterpem_tpu.surrogate.interpolate import TensorInterpolant, tensor_grid_points
from hallthrusterpem_tpu.surrogate.misc import (
    combination_coefficients,
    candidate_neighbors,
    is_downward_closed,
)
from hallthrusterpem_tpu.surrogate.component import ComponentSurrogate
from hallthrusterpem_tpu.surrogate.train import fit_system, relative_l2

__all__ = [
    "leja_sequence",
    "knots_for_level",
    "barycentric_weights",
    "TensorInterpolant",
    "tensor_grid_points",
    "combination_coefficients",
    "candidate_neighbors",
    "is_downward_closed",
    "ComponentSurrogate",
    "fit_system",
    "relative_l2",
]

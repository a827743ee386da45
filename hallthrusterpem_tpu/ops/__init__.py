"""Numerical building blocks: special functions, quadrature, tridiagonal solvers,
interpolation, SVD compression, and Pallas TPU kernels for the solver hot loop."""

from hallthrusterpem_tpu.ops.special import erfi, dawson
from hallthrusterpem_tpu.ops.integrate import simpson_weights, simpson
from hallthrusterpem_tpu.ops.tridiag import tridiag_solve, thomas_solve
from hallthrusterpem_tpu.ops.interp import interp1d
from hallthrusterpem_tpu.ops.svd import svd_rank

__all__ = [
    "erfi",
    "dawson",
    "simpson_weights",
    "simpson",
    "tridiag_solve",
    "thomas_solve",
    "interp1d",
    "svd_rank",
]

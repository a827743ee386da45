"""Uncertainty-quantification drivers: Monte Carlo forward UQ, DRAM MCMC Bayesian
calibration, Sobol' sensitivity analysis, and the uqtils-parity helper surface the
reference's analysis scripts rely on (SURVEY.md §2.4 "uqtils", §3.4-3.5).

TPU-first: every posterior/QoI evaluation is a jitted batched surrogate (or true
model) call; Saltelli matrices and MC ensembles evaluate as single fused batches
instead of executor fan-outs.
"""

from hallthrusterpem_tpu.uq.mcmc import dram, stretch, autocorrelation, integrated_autocorr_time, ess, read_mcmc_chain
from hallthrusterpem_tpu.uq.sobol import sobol_sa
from hallthrusterpem_tpu.uq.montecarlo import run_mc, mc_percentiles
from hallthrusterpem_tpu.uq.utils import (
    approx_hess,
    is_positive_definite,
    nearest_positive_definite,
    normal_sample,
    laplace_approximation,
    run_mle,
)
from hallthrusterpem_tpu.surrogate.train import relative_l2

__all__ = [
    "dram",
    "stretch",
    "autocorrelation",
    "integrated_autocorr_time",
    "ess",
    "read_mcmc_chain",
    "sobol_sa",
    "run_mc",
    "mc_percentiles",
    "approx_hess",
    "is_positive_definite",
    "nearest_positive_definite",
    "normal_sample",
    "laplace_approximation",
    "run_mle",
    "relative_l2",
]

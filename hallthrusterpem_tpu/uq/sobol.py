"""Sobol' sensitivity analysis via Saltelli sampling — one fused batched eval.

Capability parity with ``uq.sobol_sa`` as used by the reference
(``scripts/pem_v0/sobol.py:46-118``: S1 + ST per QoI). The N*(d+2) Saltelli
evaluations go through the model/surrogate as a single batch — on TPU that is one
sharded SPMD call instead of the reference's sample loop.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

__all__ = ["sobol_sa", "saltelli_matrices"]


def saltelli_matrices(sampler: Callable, n: int, d: int, seed: int = 0):
    """Build A, B, and the d AB_i matrices from an i.i.d. sampler ``sampler(n, key)
    -> (n, d)``."""
    A = np.asarray(sampler(n, seed))
    B = np.asarray(sampler(n, seed + 1))
    assert A.shape == (n, d) and B.shape == (n, d)
    ABs = []
    for i in range(d):
        AB = A.copy()
        AB[:, i] = B[:, i]
        ABs.append(AB)
    return A, B, ABs


def sobol_sa(
    fn: Callable,
    sampler: Callable,
    n_samples: int,
    d: int,
    qoi_names: Optional[Sequence[str]] = None,
    seed: int = 0,
    compute_s2: bool = False,
):
    """First-order (S1) and total-order (ST) Sobol' indices.

    :param fn: batched model: (N, d) -> (N,) or (N, q) or dict of (N,)-arrays
    :param sampler: ``sampler(n, seed) -> (n, d)`` i.i.d. input sampler
    :returns: dict with 'S1' (d, q), 'ST' (d, q), 'qois', 'variance'
    """
    A, B, ABs = saltelli_matrices(sampler, n_samples, d, seed)
    big = np.concatenate([A, B] + ABs, axis=0)  # (N*(d+2), d) -> ONE batched eval
    out = fn(big)

    if isinstance(out, dict):
        names = list(qoi_names or out.keys())
        cols = [np.asarray(out[k], dtype=np.float64).reshape(big.shape[0], -1)[:, 0] for k in names]
        Y = np.stack(cols, axis=-1)
    else:
        Y = np.asarray(out, dtype=np.float64)
        if Y.ndim == 1:
            Y = Y[:, None]
        names = list(qoi_names or [f"qoi{i}" for i in range(Y.shape[1])])

    n = n_samples
    fA = Y[:n]
    fB = Y[n : 2 * n]
    fABs = [Y[(2 + i) * n : (3 + i) * n] for i in range(d)]

    # NaN-robust (failed samples masked — SURVEY.md §5.3 rejection semantics)
    valid = np.isfinite(fA) & np.isfinite(fB)
    for fAB in fABs:
        valid &= np.isfinite(fAB)

    fall = np.concatenate([np.where(valid, fA, np.nan), np.where(valid, fB, np.nan)])
    mean = np.nanmean(fall, axis=0)
    var = np.nanvar(fall, axis=0)
    var = np.maximum(var, 1e-300)

    S1 = np.empty((d, Y.shape[1]))
    ST = np.empty((d, Y.shape[1]))
    for i, fAB in enumerate(fABs):
        dB = np.where(valid, fB * (fAB - fA), np.nan)  # Saltelli 2010 S1 estimator
        dT = np.where(valid, (fA - fAB) ** 2, np.nan)  # Jansen ST estimator
        S1[i] = np.nanmean(dB, axis=0) / var
        ST[i] = 0.5 * np.nanmean(dT, axis=0) / var

    return {"S1": S1, "ST": ST, "qois": names, "variance": var, "mean": mean}

"""SVD rank selection for field compression (host-side, NumPy).

The projection maps produced here feed :class:`~hallthrusterpem_tpu.core.variables.Compression`,
whose encode/decode are jittable matmuls. Rank-selection semantics follow the
reference's amisc usage (``scripts/gen_data.py:287-291``): either a fixed ``rank``,
an ``energy_tol`` (cumulative energy fraction), or a ``reconstruction_tol``
(relative Frobenius reconstruction error, the pem_v0 default of 0.01 at
``pem_v0_SPT-100.yml:211-214``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def svd_rank(
    data_matrix: np.ndarray,
    rank: Optional[int] = None,
    energy_tol: Optional[float] = None,
    reconstruction_tol: Optional[float] = 0.01,
) -> tuple[np.ndarray, int]:
    """Compute left singular vectors of ``(grid, snapshots)`` and the retained rank.

    :returns: ``(U, r)`` with ``U`` of shape ``(grid, min(grid, snapshots))``.
    """
    A = np.asarray(data_matrix, dtype=np.float64)
    # drop non-finite snapshots (failed samples are NaN rows by convention)
    good = np.isfinite(A).all(axis=0)
    if not good.all():
        A = A[:, good]
    if A.shape[1] == 0:
        raise ValueError("no finite snapshots to build a compression map from")
    U, s, _ = np.linalg.svd(A, full_matrices=False)
    energy = s**2
    total = float(np.sum(energy))
    if total <= 0:
        return U, 1

    if rank is not None:
        r = int(min(rank, U.shape[1]))
    elif energy_tol is not None:
        frac = np.cumsum(energy) / total
        r = int(np.searchsorted(frac, 1.0 - 1e-15 if energy_tol >= 1 else energy_tol) + 1)
    else:
        tol = 0.01 if reconstruction_tol is None else reconstruction_tol
        # residual relative Frobenius error after keeping r modes
        tail = np.sqrt(np.maximum(total - np.cumsum(energy), 0.0) / total)
        r = int(np.searchsorted(-tail, -tol) + 1)
    r = max(1, min(r, U.shape[1]))
    return U, r

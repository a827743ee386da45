"""Fixed-grid quadrature as dot products (jittable, MXU/VPU-friendly).

The reference integrates plume profiles with ``scipy.integrate.simpson``
(``src/hallmd/models/plume.py:122-123``); on TPU a Simpson rule over a *static*
grid is just a precomputed weight vector contracted against the integrand.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def simpson_weights(x: np.ndarray) -> np.ndarray:
    """Composite-Simpson weights for samples at (possibly non-uniform) points ``x``.

    Matches ``scipy.integrate.simpson`` for both even and odd sample counts
    (scipy's 'avg' ... default handling: for an even number of intervals, plain
    composite Simpson; for odd, Simpson on the first n-1 intervals plus a
    trapezoid-corrected last interval following scipy's asymmetric correction).
    """
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    w = np.zeros(n)
    if n == 1:
        return w
    if n == 2:
        h = x[1] - x[0]
        return np.array([h / 2, h / 2])

    def _simpson_block(w, i0):
        # Simpson rule over points i0, i0+1, i0+2 with uneven spacing
        h0 = x[i0 + 1] - x[i0]
        h1 = x[i0 + 2] - x[i0 + 1]
        hsum = h0 + h1
        w[i0] += hsum / 6.0 * (2.0 - h1 / h0)
        w[i0 + 1] += hsum / 6.0 * hsum**2 / (h0 * h1)
        w[i0 + 2] += hsum / 6.0 * (2.0 - h0 / h1)

    n_intervals = n - 1
    last_full = n_intervals - (n_intervals % 2)
    for i0 in range(0, last_full - 1, 2):
        _simpson_block(w, i0)
    if n_intervals % 2 == 1:
        # scipy's correction for the trailing odd interval (Cartwright formula)
        h0 = x[-2] - x[-3]
        h1 = x[-1] - x[-2]
        w[-1] += (2 * h1**2 + 3 * h0 * h1) / (6 * (h0 + h1))
        w[-2] += (h1**2 + 3 * h1 * h0) / (6 * h0)
        w[-3] -= h1**3 / (6 * h0 * (h0 + h1))
    return w


def simpson(y, x=None, weights=None, axis: int = -1):
    """Integrate ``y`` along ``axis`` with precomputed or on-the-fly Simpson weights."""
    if weights is None:
        if x is None:
            raise ValueError("provide x or weights")
        weights = simpson_weights(np.asarray(x))
    w = jnp.asarray(weights, dtype=jnp.result_type(y))
    y = jnp.asarray(y)
    return jnp.tensordot(y, w, axes=[[axis if axis >= 0 else y.ndim + axis], [0]])


def trapz_weights(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    w = np.zeros_like(x)
    dx = np.diff(x)
    w[:-1] += dx / 2
    w[1:] += dx / 2
    return w

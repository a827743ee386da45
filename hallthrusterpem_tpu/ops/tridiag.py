"""Batched tridiagonal solvers.

The implicit electron-energy update of the thruster solver needs one tridiagonal
solve per timestep per sample. A sequential Thomas sweep is O(N) *serial* steps —
poison inside a ``lax.scan`` timestep on TPU. We instead use **parallel cyclic
reduction (PCR)**: log2(N) sweeps of pure elementwise VPU ops over the whole
(batch, N) array, which XLA fuses into a handful of vector instructions.

The reference delegates this to HallThruster.jl's internal Thomas solver (Julia,
out-of-process); here it is an in-process jittable primitive (SURVEY.md §7 step 4).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _shifted(arr, k: int, fill: float):
    """arr shifted so out[i] = arr[i+k], filling out-of-range with ``fill`` (last axis)."""
    if k == 0:
        return arr
    pad = [(0, 0)] * (arr.ndim - 1)
    if k > 0:
        padded = jnp.pad(arr, pad + [(0, k)], constant_values=fill)
        return padded[..., k:]
    padded = jnp.pad(arr, pad + [(-k, 0)], constant_values=fill)
    return padded[..., :k]


def tridiag_solve(a, b, c, d):
    """Solve tridiagonal systems ``a[i] x[i-1] + b[i] x[i] + c[i] x[i+1] = d[i]``
    along the last axis via parallel cyclic reduction. Fully batched and jittable.

    :param a: sub-diagonal, shape (..., N); ``a[..., 0]`` is ignored
    :param b: main diagonal, shape (..., N)
    :param c: super-diagonal, shape (..., N); ``c[..., -1]`` is ignored
    :param d: right-hand side, shape (..., N)
    :returns: x, shape (..., N)
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    d = jnp.asarray(d)
    n = a.shape[-1]
    # zero the unused corner entries so reduction stays consistent
    a = a.at[..., 0].set(0.0)
    c = c.at[..., -1].set(0.0)
    # row-normalize: keeps every PCR intermediate O(row magnitude) — essential for
    # float32 robustness when coefficient scales span many decades
    inv = 1.0 / b
    a = a * inv
    c = c * inv
    d = d * inv
    b = jnp.ones_like(b)

    steps = max(1, math.ceil(math.log2(n))) if n > 1 else 0
    k = 1
    for _ in range(steps):
        am = _shifted(a, -k, 0.0)  # a[i-k]
        bm = _shifted(b, -k, 1.0)  # b[i-k]
        cm = _shifted(c, -k, 0.0)
        dm = _shifted(d, -k, 0.0)
        ap = _shifted(a, k, 0.0)  # a[i+k]
        bp = _shifted(b, k, 1.0)
        cp = _shifted(c, k, 0.0)
        dp = _shifted(d, k, 0.0)

        alpha = -a / bm
        beta = -c / bp
        a = alpha * am
        c = beta * cp
        b = b + alpha * cm + beta * ap
        d = d + alpha * dm + beta * dp
        k *= 2
    return d / b


def thomas_solve(a, b, c, d):
    """Sequential Thomas algorithm via ``lax.scan`` (reference/validation path;
    O(N) serial — prefer :func:`tridiag_solve` inside TPU hot loops). Batched over
    leading axes."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    d = jnp.asarray(d)

    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        ai, bi, ci, di = inp
        denom = bi - ai * cp_prev
        cp = ci / denom
        dp = (di - ai * dp_prev) / denom
        return (cp, dp), (cp, dp)

    # move solve axis to front for scan
    aT = jnp.moveaxis(a, -1, 0)
    bT = jnp.moveaxis(b, -1, 0)
    cT = jnp.moveaxis(c, -1, 0)
    dT = jnp.moveaxis(d, -1, 0)
    zeros = jnp.zeros_like(bT[0])
    (_, _), (cps, dps) = jax.lax.scan(fwd, (zeros, zeros), (aT, bT, cT, dT))

    def bwd(x_next, inp):
        cp, dp = inp
        x = dp - cp * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, zeros, (cps, dps), reverse=True)
    return jnp.moveaxis(xs, 0, -1)

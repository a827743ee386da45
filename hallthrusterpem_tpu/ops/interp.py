"""Jittable 1-D linear interpolation (static query grids, batched values).

Used for B-field resampling onto the solver grid and field-profile regridding
(the reference leaves this to HallThruster.jl / scipy ``interp1d``)."""

from __future__ import annotations

import jax.numpy as jnp


def interp1d(xq, xp, fp, left=None, right=None):
    """Linear interpolation of ``fp`` (defined at sorted points ``xp``) at ``xq``.

    Batched over leading axes of ``fp`` (last axis must match ``xp``). Clamps to the
    endpoint values unless ``left``/``right`` fill values are given.
    """
    xq = jnp.asarray(xq)
    xp = jnp.asarray(xp)
    fp = jnp.asarray(fp)
    idx = jnp.clip(jnp.searchsorted(xp, xq, side="right") - 1, 0, xp.shape[0] - 2)
    x0 = xp[idx]
    x1 = xp[idx + 1]
    w = jnp.where(x1 > x0, (xq - x0) / (x1 - x0), 0.0)
    w = jnp.clip(w, 0.0, 1.0)
    f0 = fp[..., idx]
    f1 = fp[..., idx + 1]
    out = f0 * (1 - w) + f1 * w
    if left is not None:
        out = jnp.where(xq < xp[0], left, out)
    if right is not None:
        out = jnp.where(xq > xp[-1], right, out)
    return out

"""Trace post-processing: breathing-cycle-aware time averaging.

The discharge breathes (a ~10-30 kHz ionization limit cycle for the SPT-100);
a fixed averaging window [t0, T] cuts the last cycle at an arbitrary phase, so
window-averaged QoIs carry an O(amplitude / n_cycles) phase noise — the "window
fragility" that polluted surrogate training labels (docs/validation.md round-2
"Surrogate accuracy floor"). Averaging between the first and last *upward mean
crossings* of the I_d(t) trace integrates over an integer number of cycles and
removes that term. (HallThruster.jl itself time-averages over a fixed window —
reference ``src/hallmd/models/thruster.py:356-375`` consumes its averaged
output — so this is an extension, exposed as ``postprocess.cycle_average``.)
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["cycle_averaged_current"]


def cycle_averaged_current(trace, times, t_start: float):
    """Cycle-aligned mean of a discharge-current trace.

    :param trace: (..., n) I_d(t) samples (NaN rows propagate to NaN)
    :param times: (n,) or (..., n) sample times
    :param t_start: start of the averaging window (``cfg.average_start_time``)
    :returns: (...,) mean between the first and last upward crossings of the
        window mean — an integer number of breathing cycles — falling back to
        the plain window mean when fewer than two crossings exist (steady
        discharge, or fewer than ~2 cycles in the window).

    Jit-compatible: fixed shapes, no data-dependent control flow.
    """
    x = jnp.asarray(trace)
    t = jnp.broadcast_to(jnp.asarray(times), x.shape)
    w = (t >= t_start).astype(x.dtype)
    n_w = jnp.maximum(jnp.sum(w, axis=-1), 1.0)
    win_mean = jnp.sum(x * w, axis=-1) / n_w

    d = x - win_mean[..., None]
    # upward mean crossing between samples i and i+1 (both inside the window)
    up = (d[..., :-1] <= 0) & (d[..., 1:] > 0) & (w[..., :-1] > 0) & (w[..., 1:] > 0)
    n = x.shape[-1]
    idx = jnp.arange(n - 1)
    big = n + 1
    first = jnp.min(jnp.where(up, idx, big), axis=-1) + 1  # first sample past first crossing
    last = jnp.max(jnp.where(up, idx, -1), axis=-1) + 1  # first sample past last crossing
    j = jnp.arange(n)
    cw = ((j >= first[..., None]) & (j < last[..., None])).astype(x.dtype)
    n_c = jnp.maximum(jnp.sum(cw, axis=-1), 1.0)
    cyc_mean = jnp.sum(x * cw, axis=-1) / n_c

    n_up = jnp.sum(up, axis=-1)
    return jnp.where(n_up >= 2, cyc_mean, win_mean)

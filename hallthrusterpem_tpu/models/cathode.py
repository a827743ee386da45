"""Cathode coupling model (Jorns 2021) — pressure-dependent coupling voltage.

Behavioral parity with reference ``src/hallmd/models/cathode.py:16-38``:
``V_cc = V_vac + T_e ln(1 + P/P_T) - T_e P / (P_T + P*)``, clamped to ``[0, V_a]``.
Pure ``jnp`` — jittable, batched, differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

from hallthrusterpem_tpu.constants import TORR_2_PA
from hallthrusterpem_tpu.core.dataset import Dataset

__all__ = ["cathode_coupling"]


def cathode_coupling(inputs: Dataset) -> Dataset:
    """Compute cathode coupling voltage vs. background pressure.

    :param inputs: arrays (any common broadcast shape) — ``P_b`` background pressure
        (Torr), ``V_a`` anode voltage (V), ``T_e`` cathode electron temperature (eV),
        ``V_vac`` vacuum coupling voltage (V), ``Pstar`` and ``P_T`` model pressures (Torr).
    :returns: ``{'V_cc': ...}`` cathode coupling voltage (V).
    """
    PB = jnp.asarray(inputs["P_b"]) * TORR_2_PA
    Va = jnp.asarray(inputs["V_a"])
    Te = jnp.asarray(inputs["T_e"])
    V_vac = jnp.asarray(inputs["V_vac"])
    Pstar = jnp.asarray(inputs["Pstar"]) * TORR_2_PA
    PT = jnp.asarray(inputs["P_T"]) * TORR_2_PA

    V_cc = V_vac + Te * jnp.log1p(PB / PT) - (Te / (PT + Pstar)) * PB
    V_cc = jnp.clip(V_cc, 0.0, Va)
    return {"V_cc": jnp.atleast_1d(V_cc)}

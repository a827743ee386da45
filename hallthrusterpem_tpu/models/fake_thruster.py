"""Closed-form fake thruster — the cheap stand-in for the full 1-D solver.

Re-expresses the reference's Julia mock ``tests/sim_hallthruster.jl:36-48`` as a
batched jittable function honoring the same input/output schema as
:func:`hallthrusterpem_tpu.models.thruster.hallthruster_jl`. The reference uses its
mock to exercise the subprocess/JSON machinery (``tests/test_thruster.py:70-114``);
here it exercises the System DAG, batching, sharding, and surrogate plumbing without
paying for the real solver.
"""

from __future__ import annotations

import jax.numpy as jnp

from hallthrusterpem_tpu.constants import FUNDAMENTAL_CHARGE
from hallthrusterpem_tpu.core.dataset import Dataset

__all__ = ["fake_thruster"]

_M_ION = 2.18e-25  # kg (matches sim_hallthruster.jl:37)


def fake_thruster(inputs: Dataset, num_cells: int = 100, domain=(0.0, 0.08), **_unused) -> Dataset:
    """Analytic mock of the thruster component (sim_hallthruster.jl:36-48 math).

    :param inputs: ``V_a`` (V), ``V_cc`` (V), ``mdot_a`` (kg/s), ``a_1`` anomalous
        coefficient; arrays of any common batch shape.
    :returns: full thruster output schema — ``T``, ``I_B0``, ``I_d``, ``eta_c``,
        ``eta_m``, ``eta_v``, ``eta_a``, ``u_ion``, ``u_ion_coords``.
    """
    V_a = jnp.asarray(inputs["V_a"])
    V_cc = jnp.asarray(inputs.get("V_cc", 0.0 * V_a))
    mdot_a = jnp.asarray(inputs["mdot_a"])
    a_1 = jnp.asarray(inputs.get("a_1", 0.00625 + 0.0 * V_a))

    q = FUNDAMENTAL_CHARGE
    beam_current = (q / _M_ION) * mdot_a
    current_eff = 1 - a_1 * 2
    discharge_current = beam_current / current_eff
    v_exh = jnp.sqrt(2 * q * (V_a - V_cc) / _M_ION)
    thrust = mdot_a * v_exh
    mass_eff = 1 - a_1 * 5
    voltage_eff = 1 - a_1 * 2
    anode_eff = 0.5 * thrust**2 / (mdot_a * V_a * discharge_current)

    z = jnp.linspace(domain[0], domain[1], num_cells)
    u_ion = v_exh[..., None] / (1 + jnp.exp(-100.0 * (z - 0.04)))
    batch = jnp.shape(thrust)

    return {
        "T": thrust,
        "I_B0": beam_current,
        "I_d": discharge_current,
        "eta_c": current_eff,
        "eta_m": mass_eff,
        "eta_v": voltage_eff,
        "eta_a": anode_eff,
        "u_ion": u_ion,
        "u_ion_coords": jnp.broadcast_to(z, batch + (num_cells,)),
    }

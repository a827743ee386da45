"""Fused coupled PEM: cathode -> thruster -> plume as ONE jittable XLA program.

This is the TPU-native answer to the reference's ``System.predict`` fan-out
(``amisc`` feed-forward with a subprocess per thruster sample, SURVEY.md §3.2):
the entire coupled model — analytic cathode, 1-D discharge solve, analytic plume —
traces into a single program, vmapped over operating conditions and shardable over
a device mesh. ``System``/``Component`` (core/) remain the flexible host-side API;
this module is the speed-of-light path used by the benchmarks and UQ hot loops.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from hallthrusterpem_tpu.models.cathode import cathode_coupling
from hallthrusterpem_tpu.models.plume import current_density
from hallthrusterpem_tpu.models.thruster.config import SolverConfig, make_params
from hallthrusterpem_tpu.models.thruster.solver import _simulate_one
from hallthrusterpem_tpu.utils import load_thruster

__all__ = ["CoupledPEM", "default_coupled_inputs"]

#: nominal pem_v0 SPT-100 input set (reference pem_v0_SPT-100.yml variable map;
#: u_n/a_1/a_2 are the round-5 frac-0.55 re-tuned values,
#: runs/r5/tune_d_refine.json idx 184)
_NOMINALS = {
    "P_b": 1e-5, "V_a": 300.0, "mdot_a": 5e-6,
    "T_e": 1.32721, "V_vac": 31.61135, "Pstar": 34.63406e-6, "P_T": 10.19193e-6,
    "u_n": 145.40052, "l_t": 1.87915e-3, "a_1": 0.00561226, "a_2": 41.1918,
    # dz nominal 0.2 = this solver's shift-convention equivalent of the
    # reference's 0.4 (see pem_v0_SPT-100.yml note + docs/validation.md round 4)
    "dz": 0.2, "z0": -0.03104, "p0": 56.86006e-6,
    # plume c0..c5: round-5 least-squares fit of the Diamant 2014 Faraday
    # sweeps (3 pressures, r = 1 m) at the solver's I_B0 — rel-L2
    # 0.14/0.12/0.43 by pressure (high pressure is model-form limited; see
    # scripts/anchors.py JION tolerances)
    "c0": 0.15936, "c1": 0.87594, "c2": 0.48206, "c3": 0.35883,
    "c4": 3.1186e20, "c5": 1.2786e17, "sigma_cex": 55.0e-20,
}


def default_coupled_inputs(batch: int, key=None, spread: float = 0.1) -> dict:
    """A (batch,)-shaped input dict around the pem_v0 nominal operating point."""
    key = key if key is not None else jax.random.PRNGKey(0)
    keys = jax.random.split(key, len(_NOMINALS))
    out = {}
    for (name, nom), k in zip(_NOMINALS.items(), keys):
        lo, hi = nom * (1 - spread), nom * (1 + spread)
        lo, hi = min(lo, hi), max(lo, hi)
        out[name] = jax.random.uniform(k, (batch,), minval=lo, maxval=hi, dtype=jnp.float32)
    return out


class CoupledPEM:
    """Callable fused PEM for a fixed device + solver configuration.

    >>> pem = CoupledPEM(thruster="SPT-100", model_fidelity=(2, 2))
    >>> outputs = pem(inputs)   # inputs: dict of (batch,) arrays
    """

    def __init__(
        self,
        thruster="SPT-100",
        model_fidelity: tuple = (2, 2),
        sweep_radius: float = 1.0,
        config: Optional[dict] = None,
        simulation: Optional[dict] = None,
        anom_model: str = "TwoZoneBohm",
        pressure_shift: str = "LogisticPressureShift",
        duration: float = 1e-3,
        average_start_time: Optional[float] = None,
        solve_plume: bool = True,
        apply_thrust_divergence_correction: bool = True,
    ):
        from hallthrusterpem_tpu.models.thruster.mapping import default_model_fidelity

        device = load_thruster(thruster) if isinstance(thruster, str) else thruster
        geom = device.get("geometry", {})
        from hallthrusterpem_tpu.models.thruster.config import Geometry

        fid = default_model_fidelity(tuple(model_fidelity), {"config": config or {}})
        sim = dict(simulation or {})
        self.cfg = SolverConfig(
            num_cells=int(sim.get("num_cells", fid["num_cells"])),
            ncharge=int((config or {}).get("ncharge", fid["ncharge"])),
            dt=float(sim.get("dt", fid["dt"])),
            duration=float(sim.get("duration", duration)),
            average_start_time=float(
                average_start_time if average_start_time is not None else 0.5 * float(sim.get("duration", duration))
            ),
            geometry=Geometry(
                channel_length=float(geom.get("channel_length", 0.025)),
                inner_radius=float(geom.get("inner_radius", 0.0345)),
                outer_radius=float(geom.get("outer_radius", 0.05)),
            ),
            anom_model=anom_model,
            pressure_shift=pressure_shift,
            # the reference pem_v0 config enables both (pem_v0_SPT-100.yml)
            solve_plume=bool((config or {}).get("solve_plume", solve_plume)),
            apply_thrust_divergence_correction=bool(
                (config or {}).get("apply_thrust_divergence_correction", apply_thrust_divergence_correction)
            ),
        )
        from hallthrusterpem_tpu.models.thruster import _load_bfield

        self.base_B = jnp.asarray(_load_bfield(device, self.cfg), jnp.float32)
        self.sweep_radius = sweep_radius
        self._jitted = jax.jit(partial(_coupled_forward, cfg=self.cfg))
        self._pre = jax.jit(partial(_coupled_pre, cfg=self.cfg))
        self._post = jax.jit(partial(_coupled_post, cfg=self.cfg))

    def __call__(self, inputs: dict, chunk_steps: Optional[int] = None) -> dict:
        """Evaluate the coupled PEM. On TPU the solver time loop is dispatched in
        chunks by default (robust on shared workers; numerically identical) —
        pass ``chunk_steps=0`` to force the single fused program."""
        import os

        if chunk_steps is None:
            chunk_steps = int(os.environ.get("HTPEM_CHUNK_STEPS", "2000"))
            if jax.default_backend() != "tpu":
                chunk_steps = 0
        from hallthrusterpem_tpu.models.thruster import solver_backend

        backend, _ = solver_backend(self.cfg)
        if backend == "pallas":
            from hallthrusterpem_tpu.models.thruster.pallas_step import simulate_batch_pallas_multi

            solver_params, v_cc = self._pre(inputs)
            sol = simulate_batch_pallas_multi(solver_params, self.base_B, self.cfg)
            return self._post(inputs, v_cc, sol, sweep_radius=self.sweep_radius)
        if chunk_steps and self.cfg.num_steps > chunk_steps:
            from hallthrusterpem_tpu.models.thruster.solver import (
                _finalize_batch,
                _init_batch,
                _segment_batch,
            )

            solver_params, v_cc = self._pre(inputs)
            carry = _init_batch(solver_params, self.base_B, self.cfg)
            for _ in range(-(-self.cfg.num_steps // chunk_steps)):
                carry = _segment_batch(solver_params, self.base_B, carry, self.cfg, chunk_steps)
            sol = _finalize_batch(solver_params, carry, self.base_B, self.cfg)
            return self._post(inputs, v_cc, sol, sweep_radius=self.sweep_radius)
        return self._jitted(inputs, base_B=self.base_B, sweep_radius=self.sweep_radius)

    @property
    def fn(self):
        """The underlying jittable function (for sharding/compile checks)."""
        return self._jitted

    def example_inputs(self, batch: int = 16, key=None) -> dict:
        return default_coupled_inputs(batch, key)


def _coupled_pre(inputs: dict, cfg: SolverConfig):
    """Stage 1: cathode model + solver parameter assembly."""
    x = {k: jnp.asarray(v, jnp.float32) for k, v in inputs.items()}
    v_cc = cathode_coupling(
        {"P_b": x["P_b"], "V_a": x["V_a"], "T_e": x["T_e"],
         "V_vac": x["V_vac"], "Pstar": x["Pstar"], "P_T": x["P_T"]}
    )["V_cc"]
    solver_params = make_params(
        {
            "V_d": x["V_a"], "V_cc": v_cc, "mdot_a": x["mdot_a"], "P_b": x["P_b"],
            "T_e_cath": x["T_e"], "u_n": x["u_n"], "l_t": x["l_t"],
            "a1": x["a_1"], "a2": x["a_1"] * x["a_2"],  # PEM a_2 is a ratio (thruster.py:265-273)
            "shift_dz": x["dz"], "shift_z0": x["z0"], "shift_pstar": x["p0"],
        },
        batch_shape=x["V_a"].shape,
    )
    return solver_params, v_cc


def _coupled_post(inputs: dict, v_cc, sol: dict, sweep_radius, cfg: SolverConfig) -> dict:
    """Stage 3: plume model + output assembly from solver results."""
    x = {k: jnp.asarray(v, jnp.float32) for k, v in inputs.items()}
    plume = current_density(
        {"P_b": x["P_b"], "c0": x["c0"], "c1": x["c1"], "c2": x["c2"], "c3": x["c3"],
         "c4": x["c4"], "c5": x["c5"], "sigma_cex": x["sigma_cex"],
         "I_B0": sol["ion_current"], "T": sol["thrust"]},
        sweep_radius=sweep_radius,
    )
    return {
        "V_cc": v_cc,
        "T": sol["thrust"],
        "I_d": sol["discharge_current"],
        "I_B0": sol["ion_current"],
        "eta_c": sol["current_eff"],
        "eta_m": sol["mass_eff"],
        "eta_v": sol["voltage_eff"],
        "eta_a": sol["anode_eff"],
        "u_ion": sol["ui"][:, 0, :] if sol["ui"].ndim == 3 else sol["ui"][0],
        "u_ion_coords": jnp.broadcast_to(sol["z"], sol["ui"].shape[:-2] + (cfg.nc,)),
        "j_ion": plume["j_ion"],
        "j_ion_coords": plume["j_ion_coords"],
        "div_angle": plume["div_angle"],
        "T_c": plume["T_c"],
        "I_d_std": sol["discharge_current_std"],
    }


def _coupled_forward(inputs: dict, base_B, sweep_radius, cfg: SolverConfig) -> dict:
    """cathode -> thruster -> plume, fully traced as ONE program (no host hops)."""
    solver_params, v_cc = _coupled_pre(inputs, cfg)
    sol = jax.vmap(lambda q: _simulate_one(q, base_B, cfg))(solver_params)
    return _coupled_post(inputs, v_cc, sol, sweep_radius, cfg)

"""Fused CoupledPEM tests (CPU, small configs) + solver model-variant smoke tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from hallthrusterpem_tpu.models.thruster.config import SolverConfig, make_params
from hallthrusterpem_tpu.models.thruster.solver import simulate_batch
from hallthrusterpem_tpu.pem import CoupledPEM, default_coupled_inputs


@pytest.fixture(scope="module")
def pem():
    return CoupledPEM(thruster="SPT-100", model_fidelity=(0, 0), duration=6e-5)


def test_coupled_pem_outputs(pem):
    out = pem(default_coupled_inputs(8, spread=0.05))
    assert out["T"].shape == (8,)
    assert out["j_ion"].shape == (8, 91)
    assert out["u_ion"].shape == (8, pem.cfg.nc)
    t = np.asarray(out["T"])
    assert np.all(np.isfinite(t)) and np.all(t > 0)
    # corrected thrust is reduced by the divergence cosine
    assert np.all(np.asarray(out["T_c"]) <= t + 1e-9)
    assert np.all(np.asarray(out["V_cc"]) >= 0)


def test_coupled_pem_chunked_equals_fused(pem):
    # fused and chunked are the SAME step function, but compiled as different
    # XLA programs: on the 8-virtual-device CPU platform the two compilations
    # reassociate float32 reductions differently, and the (now default)
    # plume-expansion physics amplifies that to ~3e-4 over thousands of steps.
    # The invariant being tested is chunking mechanics (accumulation gating,
    # carry round trips), not bit-identical codegen.
    inp = default_coupled_inputs(4, spread=0.05)
    fused = np.asarray(pem(inp, chunk_steps=0)["T"])
    chunked = np.asarray(pem(inp, chunk_steps=1000)["T"])
    assert np.allclose(fused, chunked, rtol=3e-3)
    # chunk-size invariance within the chunked path (same compiled segment
    # machinery) stays tight
    chunked2 = np.asarray(pem(inp, chunk_steps=500)["T"])
    assert np.allclose(chunked, chunked2, rtol=1e-3)


def _quick_cfg(**kw):
    base = dict(num_cells=60, ncharge=1, dt=8e-9, duration=1.2e-4, average_start_time=0.6e-4)
    base.update(kw)
    return SolverConfig(**base)


def _bfield(cfg):
    z = cfg.cell_centers()
    s = np.where(z < 0.025, 0.011, 0.018)
    return jnp.asarray(0.016 * np.exp(-0.5 * ((z - 0.025) / s) ** 2), jnp.float32)


def test_gaussian_bohm_with_simple_shift():
    cfg = _quick_cfg(anom_model="GaussianBohm", pressure_shift="SimpleLogisticShift")
    params = make_params(
        {"V_d": np.full(2, 300.0), "V_cc": 30.0, "mdot_a": 5e-6, "P_b": np.array([1e-6, 5e-5]),
         "hall_min": 0.00625, "hall_max": 0.0625, "center": 0.028, "width": 0.006},
    )
    out = simulate_batch(params, _bfield(cfg), cfg)
    t = np.asarray(out["thrust"])
    assert np.all(np.isfinite(t)) and np.all(t > 0)
    # the anomalous profile must dip near the barrier center
    nu = np.asarray(out["nu_anom"])[0]
    z = cfg.cell_centers()
    omega = np.asarray(out["B"])[0] * 1.602176634e-19 / 9.1093837015e-31
    alpha = nu / omega
    assert alpha[np.argmin(np.abs(z - 0.028))] < 0.8 * alpha[-1]


def test_krypton_propellant():
    cfg = _quick_cfg(propellant="Krypton")
    params = make_params({"V_d": np.full(2, 300.0), "V_cc": 30.0, "mdot_a": 4e-6, "P_b": 1e-5})
    out = simulate_batch(params, _bfield(cfg), cfg)
    t = np.asarray(out["thrust"])
    assert np.all(np.isfinite(t)) and np.all(t > 0)
    # lighter propellant -> faster exhaust than xenon at the same voltage
    u_exit = np.asarray(out["ui"])[0, 0, -2]
    assert u_exit > 1.2e4


def test_three_charge_states():
    cfg = _quick_cfg(ncharge=3)
    params = make_params({"V_d": np.full(2, 300.0), "V_cc": 30.0, "mdot_a": 5e-6, "P_b": 1e-5})
    out = simulate_batch(params, _bfield(cfg), cfg)
    assert np.asarray(out["ui"]).shape == (2, 3, cfg.nc)
    t = np.asarray(out["thrust"])
    assert np.all(np.isfinite(t)) and np.all(t > 0)
    # higher charge states are progressively less abundant at the exit
    ne_contrib = [np.asarray(out["ui"])[0, z, -2] for z in range(3)]
    assert all(np.isfinite(v) for v in ne_contrib)


def test_logistic_pressure_shift_moves_upstream_with_pressure():
    """The anomalous-transport profile must move UPSTREAM (toward the anode) as
    facility pressure rises — the experimentally observed direction (LIF
    acceleration-region studies; reference pem_v0 LogisticPressureShift
    calibration). The mapping's limits: vacuum at ``(z0+dz) L_ch`` downstream of
    the exit (LIF: mid-acceleration ~+5 mm at 1e-5 Torr), high pressure at
    ``z0 L_ch`` (just inside the channel). The barrier well and anode plateau are
    disabled so the two-zone mid-crossing is a monotone function of z."""
    from hallthrusterpem_tpu.models.thruster.solver import anomalous_profile

    cfg = SolverConfig(pressure_shift="LogisticPressureShift",
                       anode_alpha=0.0, anom_barrier_width=0.0)
    z = jnp.asarray(cfg.cell_centers(), jnp.float32)

    def transition_z(P_b):
        p = {k: v[0] for k, v in make_params(
            {"P_b": np.float32(P_b), "shift_dz": 0.4, "shift_z0": -0.03104,
             "shift_pstar": 56.86e-6, "shift_alpha": 15.0,
             "a1": 0.0068, "a2": 0.0996, "anom_depth": 0.0}, batch_shape=(1,)).items()}
        alpha = np.asarray(anomalous_profile(p, z, cfg))
        mid = 0.5 * (alpha[0] + alpha[-1])
        return float(np.interp(mid, alpha, np.asarray(z)))

    z_vac = transition_z(1e-6)   # vacuum limit: (z0+dz)*L downstream of the exit
    z_hi = transition_z(3e-4)    # high-pressure limit: z0*L (just inside)
    z_ch = cfg.geometry.channel_length
    assert z_hi < z_vac, "transition must move upstream as pressure rises"
    assert abs(z_vac - (z_ch + (0.4 - 0.03104) * z_ch)) < 2e-3, \
        "vacuum limit ~9 mm downstream at dz=0.4 (LIF-matching +4 mm at dz=0.2)"
    assert abs(z_hi - (z_ch - 0.03104 * z_ch)) < 2e-3, "high-pressure limit ~z0*L"

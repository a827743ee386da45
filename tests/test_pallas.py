"""Pallas fused-step kernel vs the pure-lax solver (interpret mode on CPU).

The kernel must reproduce the lax path's physics: identical discretization, so the
time-averaged QoIs agree to float32 tolerance (rates differ only by the in-kernel
log-polynomial fit of the same tables, <~2%)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hallthrusterpem_tpu.models.thruster.config import SolverConfig, make_params
from hallthrusterpem_tpu.models.thruster.solver import simulate_batch
from hallthrusterpem_tpu.models.thruster.pallas_step import (
    TILE_B,
    simulate_batch_pallas,
    simulate_batch_pallas_multi,
)


@pytest.mark.parametrize("ncharge", [1, 2])
def test_pallas_matches_lax(ncharge):
    B = TILE_B
    nsteps = 3000
    cfg = SolverConfig(
        num_cells=60, ncharge=ncharge, dt=8e-9, duration=nsteps * 8e-9,
        average_start_time=nsteps // 2 * 8e-9,
    )
    z = cfg.cell_centers()
    s = np.where(z < 0.025, 0.011, 0.018)
    base_B = jnp.asarray(0.016 * np.exp(-0.5 * ((z - 0.025) / s) ** 2), jnp.float32)
    vd = np.linspace(280, 320, B).astype(np.float32)
    params = make_params({"V_d": vd, "V_cc": 30.0, "mdot_a": 5e-6, "P_b": 1e-5})

    ref = {k: np.asarray(v) for k, v in simulate_batch(params, base_B, cfg).items()}
    got = {k: np.asarray(v) for k, v in
           simulate_batch_pallas(params, base_B, cfg, interpret=True).items()}

    assert not np.isnan(got["thrust"]).any()
    for key, tol in [("thrust", 0.05), ("discharge_current", 0.08), ("ion_current", 0.05)]:
        rel = np.abs(got[key] - ref[key]) / np.abs(ref[key])
        assert np.max(rel) < tol, (key, got[key], ref[key])
    # profiles agree in shape and broad magnitude
    assert got["ui"].shape == ref["ui"].shape
    u_rel = np.abs(got["ui"][:, 0, -2] - ref["ui"][:, 0, -2]) / np.abs(ref["ui"][:, 0, -2])
    assert np.max(u_rel) < 0.05
    te_rel = abs(got["Tev"].max() - ref["Tev"].max()) / ref["Tev"].max()
    assert te_rel < 0.25


def test_multistep_kernel_matches_lax():
    """K-step VMEM-resident kernel with in-kernel accumulation — exact parity even
    with an odd K and step-count overshoot (accumulation gating)."""
    B = 11  # deliberately not a TILE_B multiple: exercises batch padding
    nsteps = 2500
    cfg = SolverConfig(num_cells=60, ncharge=1, dt=8e-9, duration=nsteps * 8e-9,
                       average_start_time=nsteps // 2 * 8e-9)
    z = cfg.cell_centers()
    s = np.where(z < 0.025, 0.011, 0.018)
    base_B = jnp.asarray(0.016 * np.exp(-0.5 * ((z - 0.025) / s) ** 2), jnp.float32)
    vd = np.linspace(285, 315, B).astype(np.float32)
    params = make_params({"V_d": vd, "V_cc": 30.0, "mdot_a": 5e-6, "P_b": 1e-5})

    ref = {k: np.asarray(v) for k, v in simulate_batch(params, base_B, cfg).items()}
    got = {k: np.asarray(v) for k, v in simulate_batch_pallas_multi(
        params, base_B, cfg, inner_steps=37, calls_per_dispatch=9, interpret=True).items()}
    for key in ("thrust", "discharge_current", "ion_current"):
        rel = np.max(np.abs(got[key] - ref[key]) / np.abs(ref[key]))
        assert rel < 0.01, (key, rel)
    assert got["thrust"].shape == (B,)
    assert not np.isnan(got["thrust"]).any()


def test_two_group_kernel_matches_lax():
    """Two-group neutral model in the fused K-step kernel vs the lax solver
    (round-5 port; previously a silent 48x lax fallback)."""
    B = TILE_B
    nsteps = 2500
    cfg = SolverConfig(num_cells=60, ncharge=1, neutral_groups=2, dt=8e-9,
                       duration=nsteps * 8e-9, average_start_time=nsteps // 2 * 8e-9)
    z = cfg.cell_centers()
    s = np.where(z < 0.025, 0.011, 0.018)
    base_B = jnp.asarray(0.016 * np.exp(-0.5 * ((z - 0.025) / s) ** 2), jnp.float32)
    vd = np.linspace(285, 315, B).astype(np.float32)
    params = make_params({"V_d": vd, "V_cc": 30.0, "mdot_a": 5e-6, "P_b": 1e-5})

    ref = {k: np.asarray(v) for k, v in simulate_batch(params, base_B, cfg).items()}
    got = {k: np.asarray(v) for k, v in simulate_batch_pallas_multi(
        params, base_B, cfg, inner_steps=37, calls_per_dispatch=9, interpret=True).items()}
    assert not np.isnan(got["thrust"]).any()
    for key in ("thrust", "discharge_current", "ion_current"):
        rel = np.max(np.abs(got[key] - ref[key]) / np.abs(ref[key]))
        assert rel < 0.02, (key, rel)
    # the two-group physics must actually differ from single-group (guards
    # against the kernel silently ignoring the second group)
    cfg1 = SolverConfig(num_cells=60, ncharge=1, neutral_groups=1, dt=8e-9,
                        duration=nsteps * 8e-9, average_start_time=nsteps // 2 * 8e-9)
    got1 = {k: np.asarray(v) for k, v in simulate_batch_pallas_multi(
        params, base_B, cfg1, inner_steps=37, calls_per_dispatch=9, interpret=True).items()}
    assert np.max(np.abs(got["discharge_current"] - got1["discharge_current"])
                  / np.abs(got1["discharge_current"])) > 1e-3


def test_two_group_multicharge_step_kernel():
    """Two-group wiring in the SINGLE-step kernel path and with ncharge=2:
    short-horizon agreement with lax pins the state-slot layout (rho_n2 is
    appended last) across both kernel variants."""
    B = TILE_B
    nsteps = 900
    cfg = SolverConfig(num_cells=60, ncharge=2, neutral_groups=2, dt=8e-9,
                       duration=nsteps * 8e-9, average_start_time=nsteps // 3 * 8e-9)
    z = cfg.cell_centers()
    s = np.where(z < 0.025, 0.011, 0.018)
    base_B = jnp.asarray(0.016 * np.exp(-0.5 * ((z - 0.025) / s) ** 2), jnp.float32)
    vd = np.linspace(290, 310, B).astype(np.float32)
    params = make_params({"V_d": vd, "V_cc": 30.0, "mdot_a": 5e-6, "P_b": 1e-5})

    ref = {k: np.asarray(v) for k, v in simulate_batch(params, base_B, cfg).items()}
    one = {k: np.asarray(v) for k, v in
           simulate_batch_pallas(params, base_B, cfg, interpret=True).items()}
    multi = {k: np.asarray(v) for k, v in simulate_batch_pallas_multi(
        params, base_B, cfg, inner_steps=30, calls_per_dispatch=10, interpret=True).items()}
    for got, tol in ((one, 0.05), (multi, 0.02)):
        assert not np.isnan(got["thrust"]).any()
        for key in ("thrust", "discharge_current", "ion_current"):
            rel = np.max(np.abs(got[key] - ref[key]) / np.abs(ref[key]))
            assert rel < tol, (key, rel)


def test_large_tile_padding_consistency():
    """tile_b_for(B>16) pads the batch to 32 sublanes — padded rows must be
    dropped and results must match a small-tile run of the same samples."""
    from hallthrusterpem_tpu.models.thruster.pallas_step import tile_b_for

    assert tile_b_for(8) == 8
    assert tile_b_for(16) == 8
    assert tile_b_for(17) == 32
    assert tile_b_for(1024) == 64  # round-4 plateau default (kernel_profile.json)

    B = 17  # forces tile 32 with 15 padded rows
    nsteps = 800
    cfg = SolverConfig(num_cells=60, ncharge=1, dt=8e-9, duration=nsteps * 8e-9,
                       average_start_time=nsteps // 2 * 8e-9)
    z = cfg.cell_centers()
    s = np.where(z < 0.025, 0.011, 0.018)
    base_B = jnp.asarray(0.016 * np.exp(-0.5 * ((z - 0.025) / s) ** 2), jnp.float32)
    vd = np.linspace(290, 310, B).astype(np.float32)
    params = make_params({"V_d": vd, "V_cc": 30.0, "mdot_a": 5e-6, "P_b": 1e-5})

    big = simulate_batch_pallas_multi(params, base_B, cfg, inner_steps=25,
                                      calls_per_dispatch=8, interpret=True)
    small = {k: np.asarray(v)[:8] for k, v in simulate_batch_pallas_multi(
        {k: v[:8] for k, v in params.items()}, base_B, cfg, inner_steps=25,
        calls_per_dispatch=8, interpret=True).items()}
    assert big["thrust"].shape == (B,)
    np.testing.assert_allclose(np.asarray(big["thrust"])[:8], small["thrust"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(big["discharge_current"])[:8],
                               small["discharge_current"], rtol=1e-5)


def test_pallas_solve_plume_parity():
    """Quasi-1D plume expansion (solve_plume + divergence correction): the kernel
    lane-cumsum stream-tube geometry must reproduce the lax path bit-closely."""
    B = TILE_B
    nsteps = 2000
    cfg = SolverConfig(num_cells=60, ncharge=1, dt=8e-9, duration=nsteps * 8e-9,
                       average_start_time=nsteps // 2 * 8e-9,
                       solve_plume=True, apply_thrust_divergence_correction=True)
    z = cfg.cell_centers()
    s = np.where(z < 0.025, 0.011, 0.018)
    base_B = jnp.asarray(0.016 * np.exp(-0.5 * ((z - 0.025) / s) ** 2), jnp.float32)
    vd = np.linspace(280, 320, B).astype(np.float32)
    params = make_params({"V_d": vd, "V_cc": 30.0, "mdot_a": 5e-6, "P_b": 1e-5})

    ref = {k: np.asarray(v) for k, v in simulate_batch(params, base_B, cfg).items()}
    for runner in (simulate_batch_pallas, simulate_batch_pallas_multi):
        got = {k: np.asarray(v) for k, v in runner(params, base_B, cfg, interpret=True).items()}
        assert not np.isnan(got["thrust"]).any()
        for key in ("thrust", "discharge_current", "ion_current"):
            rel = np.abs(got[key] - ref[key]) / np.abs(ref[key])
            assert np.max(rel) < 0.02, (runner.__name__, key, got[key], ref[key])

    # the expansion must actually do something: same config without the plume
    # model yields a different (higher-current) solution
    cfg_off = SolverConfig(num_cells=60, ncharge=1, dt=8e-9, duration=nsteps * 8e-9,
                           average_start_time=nsteps // 2 * 8e-9)
    off = {k: np.asarray(v) for k, v in simulate_batch(params, base_B, cfg_off).items()}
    assert np.any(np.abs(off["discharge_current"] - ref["discharge_current"])
                  / np.abs(off["discharge_current"]) > 0.01)


def test_multistep_kernel_trace_matches_lax():
    """num_save I_d(t) traces captured in spare accumulator lanes at kernel
    speed must match the lax path's per-step trace (same subsampling)."""
    B = TILE_B
    nsteps = 1200
    cfg = SolverConfig(num_cells=60, ncharge=1, dt=8e-9, duration=nsteps * 8e-9,
                       average_start_time=nsteps // 2 * 8e-9, num_save=40)
    z = cfg.cell_centers()
    s = np.where(z < 0.025, 0.011, 0.018)
    base_B = jnp.asarray(0.016 * np.exp(-0.5 * ((z - 0.025) / s) ** 2), jnp.float32)
    vd = np.linspace(285, 315, B).astype(np.float32)
    params = make_params({"V_d": vd, "V_cc": 30.0, "mdot_a": 5e-6, "P_b": 1e-5})

    ref = {k: np.asarray(v) for k, v in simulate_batch(params, base_B, cfg).items()}
    got = {k: np.asarray(v) for k, v in
           simulate_batch_pallas_multi(params, base_B, cfg, interpret=True).items()}
    assert "discharge_current_trace" in got
    assert got["discharge_current_trace"].shape == (B, 40)
    assert np.allclose(got["trace_times"][0], ref["trace_times"], rtol=1e-6)
    r, g = ref["discharge_current_trace"], got["discharge_current_trace"]
    rel = np.abs(g - r) / np.maximum(np.abs(r), 1e-3)
    assert np.nanmax(rel) < 0.05, (np.nanmax(rel),)

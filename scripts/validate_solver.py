"""Solver physics validation sweep: SPT-100 characteristics vs published trends.

Runs the discharge solver across discharge voltage and mass flow rate at nominal
anomalous-transport settings and prints the performance map (thrust, currents,
efficiencies). Published SPT-100 anchors (Sankovic et al. 1993 test data;
reference tests assert 0 < T < 0.2 N, 0 < I_d < 10 A at 300 V / 5.16 mg/s):
T ~= 83 mN, I_d ~= 4.5 A at 300 V / 5.16 mg/s, thrust roughly ~ mdot*sqrt(V).

Usage: python validate_solver.py [--duration 8e-4] [--cells 100] [--tpu]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root

import argparse
import time

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--duration", type=float, default=6e-4)
parser.add_argument("--cells", type=int, default=100)
parser.add_argument("--ncharge", type=int, default=1)
parser.add_argument("--cpu", action="store_true", help="force CPU backend")


def main(argv=None):
    args = parser.parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from hallthrusterpem_tpu.models.thruster import dispatch_solver, _load_bfield
    from hallthrusterpem_tpu.models.thruster.config import SolverConfig, make_params
    from hallthrusterpem_tpu.utils import load_thruster

    device = load_thruster("SPT-100")
    # CFL-consistent dt (the wrapper's default_model_fidelity rule): Xe at
    # ncharge fully accelerated must stay below ~0.2 dz/dt
    dz = 0.08 / (args.cells + 1)
    u_fast = float(np.sqrt(2 * args.ncharge * 1.602e-19 * 400.0 / 2.18e-25))
    dt = min(5e-9, 0.2 * dz / u_fast)
    cfg = SolverConfig(
        num_cells=args.cells, ncharge=args.ncharge, dt=dt, duration=args.duration,
        average_start_time=args.duration / 2,
        # round-2 physics defaults matching the reference pem_v0 config surface:
        # quasi-1D plume expansion + divergence correction + the published
        # LogisticPressureShift anomalous-transport profile
        solve_plume=True, apply_thrust_divergence_correction=True,
        pressure_shift="LogisticPressureShift",
    )
    base_B = jnp.asarray(_load_bfield(device, cfg), jnp.float32)

    # sweep grid: V_d x mdot
    vds = np.array([200.0, 250.0, 300.0, 350.0, 400.0])
    mdots = np.array([3.5e-6, 5.16e-6])
    VD, MD = np.meshgrid(vds, mdots, indexing="ij")
    params = make_params({
        "V_d": VD.ravel().astype(np.float32),
        "mdot_a": MD.ravel().astype(np.float32),
        "V_cc": 31.9, "P_b": 1e-5,
        # the pem_v0 NOMINAL calibration parameters (pem_v0_SPT-100.yml inputs;
        # round-3: no hand-picked pocket — the three-region anomalous profile +
        # implicit inelastic sink make the nominal map itself steady, see
        # docs/validation.md round-3 study)
        "u_n": 141.24234, "c_w": 1.0, "l_t": 1.87915e-3, "T_e_cath": 1.32721,
        "a1": 0.00680237, "a2": 14.645 * 0.00680237,
        "shift_dz": 0.4, "shift_z0": -0.03104, "shift_pstar": 56.86006e-6,
        # cathode-line facility filter (pem_v0_SPT-100.yml config.circuit)
        "circuit_R": 0.5,
    })

    t0 = time.time()
    out = {k: np.asarray(v) for k, v in dispatch_solver(params, base_B, cfg).items()}
    wall = time.time() - t0

    # apply the wrapper's physicality guards (the PEM NaN-masks these rows;
    # dispatch_solver is below that layer): negative beam/discharge current or
    # mass efficiency, or beam current above the fully-stripped mass-flow limit,
    # mark a sample that fell into a pathological mode (deep-breathing window
    # artifact or the cold-dense attractor)
    from hallthrusterpem_tpu.constants import FUNDAMENTAL_CHARGE

    i_max = 1.5 * cfg.ncharge * FUNDAMENTAL_CHARGE * MD.ravel() / cfg.mi
    bad = ((out["ion_current"] < 0) | (out["discharge_current"] < 0)
           | (out["mass_eff"] < 0) | (out["ion_current"] > i_max)
           | ~np.isfinite(out["thrust"]))

    print(f"# {VD.size} operating points, {cfg.num_steps} steps each, {wall:.1f}s wall "
          f"({jax.default_backend()})")
    print(f"{'V_d':>6} {'mdot':>9} {'T[mN]':>8} {'I_d[A]':>7} {'I_B0[A]':>8} "
          f"{'eta_m':>6} {'eta_a':>6} {'u_exit[km/s]':>12}")
    for i in range(VD.size):
        u_exit = out["ui"][i, 0, -2] / 1e3
        flag = "  <- FAILED (physicality guards; NaN-masked by the PEM)" if bad[i] else ""
        print(f"{VD.ravel()[i]:6.0f} {MD.ravel()[i]:9.2e} {out['thrust'][i]*1e3:8.1f} "
              f"{out['discharge_current'][i]:7.2f} {out['ion_current'][i]:8.2f} "
              f"{out['mass_eff'][i]:6.2f} {out['anode_eff'][i]:6.2f} {u_exit:12.1f}{flag}")

    # trend assertions over the physical rows: thrust increases with V_d / mdot
    T = np.where(bad, np.nan, out["thrust"]).reshape(VD.shape)
    col = T[:, 1][np.isfinite(T[:, 1])]
    assert np.all(np.diff(col) > -5e-3), "thrust should broadly increase with V_d"
    both = np.isfinite(T[:, 1]) & np.isfinite(T[:, 0])
    assert np.all(T[both, 1] > T[both, 0]), "thrust should increase with mass flow"
    print(f"# trend checks passed over {int(np.isfinite(T).sum())}/{T.size} physical points"
          + (f" ({int(bad.sum())} masked)" if bad.any() else ""))


if __name__ == "__main__":
    main()

"""Anomalous-profile shape sweep: what controls the u_ion(z) acceleration width?

The round-4 u_ion probe (scripts/probe_uion.py) shows the model's acceleration
layer is a ~2 mm near-discontinuity at the shifted barrier location while the
MacDonald-Tenenbaum LIF reconstructions accelerate over ~20 mm. The candidate
knobs are the TwoZoneBohm transition length ``l_t`` (pem_v0 nominal 1.88 mm,
prior up to 20 mm) and the transport-barrier well depth ``barrier_scale``
(anom_depth, default 0.98 with a fixed 2.5 mm width). This sweep runs one
batched solve over a small design, reporting u_ion rel-L2 against the
1e-5 Torr LIF profile AND the scalar anchors (T, I_d, I_B0) so profile-shape
fixes can't silently trade away the round-3 anchor wins.

Usage: python scripts/probe_anom_shape.py [-o runs/r4/anom_shape]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root

import argparse
import json
from pathlib import Path

import numpy as np

REPO = _Path(__file__).resolve().parents[1]
DATA = REPO / "hallthrusterpem_tpu" / "data" / "spt100"

# pem_v0 nominal calibration (scripts/pem_v0/pem_v0_SPT-100.yml)
NOM = dict(l_t=1.87915e-3, a1=0.00680237, a2_mult=14.645, dz=0.2, z0=-0.03104,
           pstar=56.86006e-6, alpha=15.0, u_n=141.24234, depth=0.98)

# sweep design: (name, l_t [m], barrier depth, barrier 1-sigma width [m], shift dz)
# Round-4 sweep 2: the dominant profile error is the structure sitting ~4 mm
# too far downstream (yml nominal dz=0.4 vs prior mean 0.2 — exactly -4.2 mm)
# plus u~0 across the 20-32 mm ionization zone (E=0 there: slow newborn ions
# mass-load the mean velocity). Move the structure upstream (dz) and widen the
# well so E overlaps the ionization zone.
W0 = 2.5e-3  # static default (SolverConfig.anom_barrier_width)
CASES = [
    ("nominal", NOM["l_t"], NOM["depth"], W0, 0.4),
    ("dz0.2", NOM["l_t"], NOM["depth"], W0, 0.2),
    ("dz0.2_w5", NOM["l_t"], NOM["depth"], 5e-3, 0.2),
    ("dz0.2_w8", NOM["l_t"], NOM["depth"], 8e-3, 0.2),
    ("dz0.2_w8_d0.9", NOM["l_t"], 0.9, 8e-3, 0.2),
    ("dz0.15_w8", NOM["l_t"], NOM["depth"], 8e-3, 0.15),
    ("dz0.3_w5", NOM["l_t"], NOM["depth"], 5e-3, 0.3),
    ("dz0.2_w12_d0.95", NOM["l_t"], 0.95, 12e-3, 0.2),
    ("dz0.25_w8_d0.95", NOM["l_t"], 0.95, 8e-3, 0.25),
    ("dz0.2_lt10_w5", 10e-3, NOM["depth"], 5e-3, 0.2),
    ("dz0.3", NOM["l_t"], NOM["depth"], W0, 0.3),
    ("dz0.25_w5", NOM["l_t"], NOM["depth"], 5e-3, 0.25),
]

# anchors at 300 V / 5.16 mg/s, P_b = 1e-5 Torr (Diamant interpolation,
# scripts/anchors.py)
ANCHOR = {"T": 81.7e-3, "I_d": 4.60, "I_B0": 3.6}


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-o", "--output", default="runs/r4/anom_shape")
    parser.add_argument("--pb", type=float, default=1e-5)
    args = parser.parse_args(argv)

    from hallthrusterpem_tpu.models.thruster import run_simulation
    from hallthrusterpem_tpu.utils import load_thruster

    n = len(CASES)
    lt = np.array([c[1] for c in CASES])
    depth = np.array([c[2] for c in CASES])
    width = np.array([c[3] for c in CASES])
    dz = np.array([c[4] for c in CASES])

    tree = {
        "config": {
            "thruster": load_thruster("SPT-100"),
            "discharge_voltage": 300.0,
            "anode_mass_flow_rate": 5.16e-6,
            "background_pressure_Torr": args.pb,
            "cathode_coupling_voltage": 31.8,
            "cathode_Tev": 2.23,
            "neutral_velocity": NOM["u_n"],
            "transition_length": lt,
            "ncharge": 3,
            "domain": (0.0, 0.08),
            "ion_wall_losses": True,
            "solve_plume": True,
            "apply_thrust_divergence_correction": True,
            "circuit": {"R": 0.5, "L": 0.0},
            "anom_model": {
                "type": "LogisticPressureShift",
                "dz": dz,
                "z0": NOM["z0"],
                "pstar": NOM["pstar"],
                "alpha": NOM["alpha"],
                "model": {"type": "TwoZoneBohm", "c1": NOM["a1"],
                          "c2": NOM["a1"] * NOM["a2_mult"], "barrier_scale": depth,
                          "barrier_width": width},
            },
        },
        "simulation": {
            "adaptive": True, "dt": 1e-9, "min_dt": 1e-10, "max_dt": 1e-7,
            "duration": 2e-3, "num_save": 1000,
            "grid": {"type": "EvenGrid", "num_cells": 200},
        },
        "postprocess": {"average_start_time": 1e-3, "cycle_average": True},
    }

    out = run_simulation(tree)["output"]["average"]

    lif = np.genfromtxt(DATA / "uion_macdonald2019.csv", delimiter=",", skip_header=1)
    rows = lif[np.isclose(lif[:, 0], args.pb)]
    if not len(rows):
        rows = lif[np.isclose(lif[:, 0], 1e-5)]
    z_obs, u_obs = rows[:, 3], rows[:, 4]

    z = np.asarray(out["z"])
    ui = np.asarray(out["ui"][0])
    report = []
    print(f"{'case':>16} {'relL2':>6} {'T_err':>7} {'Id_err':>7} {'IB0_err':>7}")
    for i, (name, *_formal) in enumerate(CASES):
        zrow = z[i] if z.ndim > 1 else z
        u_int = np.interp(z_obs, zrow, ui[i])
        rel = float(np.linalg.norm(u_int - u_obs) / np.linalg.norm(u_obs))
        errs = {q: float(np.asarray(out[{"T": "thrust", "I_d": "discharge_current",
                                          "I_B0": "ion_current"}[q]])[i] / ANCHOR[q] - 1)
                for q in ANCHOR}
        report.append({"case": name, "l_t_mm": lt[i] * 1e3, "depth": depth[i],
                       "width_mm": width[i] * 1e3, "dz": dz[i],
                       "uion_rel_l2": round(rel, 4),
                       **{f"{q}_rel_err": round(e, 4) for q, e in errs.items()},
                       "u_grid": ui[i].tolist(), "z_grid": zrow.tolist(),
                       "E": np.asarray(out["E"])[i].tolist(),
                       "Te": np.asarray(out["Tev"])[i].tolist()})
        print(f"{name:>16} {rel:6.3f} {errs['T']:+7.1%} {errs['I_d']:+7.1%} {errs['I_B0']:+7.1%}")

    outdir = Path(args.output)
    outdir.mkdir(parents=True, exist_ok=True)
    with open(outdir / f"anom_shape_{args.pb:.0e}.json", "w") as fd:
        json.dump({"pb": args.pb, "lif_z": z_obs.tolist(), "lif_u": u_obs.tolist(),
                   "cases": report}, fd)
    print(f"saved {outdir}/anom_shape_{args.pb:.0e}.json")


if __name__ == "__main__":
    main()

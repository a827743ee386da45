"""Near-anode conductive-zone sweep: can the u_ion mass-loading plateau shrink?

After the dz fix the residual u_ion error (rel-L2 0.18-0.21) concentrates at
20-30 mm where E ~ 0: the near-anode transport enhancement keeps the plasma
conductive out to ``anode_edge_frac * z_ch + shift`` (~25 mm), so ions born in
the ionization zone sit at anode potential until the barrier. The LIF profiles
show acceleration starting ~15 mm — i.e. the potential drop OVERLAPS the
ionization zone. This sweep moves/widens the conductive-zone roll-off and
reports u_ion rel-L2 at the three LIF pressures plus the scalar anchors.

Each (frac, width) pair is a static-config recompile (batch of 3 pressures).

Usage: python scripts/probe_anode_zone.py [-o runs/r4/anode_zone.json]
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

NOM = dict(l_t=1.87915e-3, a1=0.00680237, a2_mult=14.645, dz=0.2, z0=-0.03104,
           pstar=56.86006e-6, alpha=15.0, u_n=141.24234)
ANCHOR = {"T": 81.7e-3, "I_d": 4.60, "I_B0": 3.6}  # at 1e-5 Torr

CASES = [
    ("frac_0.60", 0.60, 1.5e-3),
    ("frac_0.55", 0.55, 1.5e-3),
    ("frac_0.52", 0.52, 1.5e-3),
    ("frac_0.55_w3", 0.55, 3e-3),
]


def run_case(frac, width):
    from hallthrusterpem_tpu.models.thruster import run_simulation
    from hallthrusterpem_tpu.utils import load_thruster

    pbs = [1e-5, 3e-5, 5.5e-5]
    tree = {
        "config": {
            "thruster": load_thruster("SPT-100"),
            "discharge_voltage": 300.0,
            "anode_mass_flow_rate": 5.16e-6,
            "background_pressure_Torr": np.asarray(pbs),
            "cathode_coupling_voltage": np.asarray([32.8, 33.6, 34.4]),
            "cathode_Tev": 2.23,
            "neutral_velocity": NOM["u_n"],
            "transition_length": NOM["l_t"],
            "ncharge": 3,
            "domain": (0.0, 0.08),
            "ion_wall_losses": True,
            "solve_plume": True,
            "apply_thrust_divergence_correction": True,
            "circuit": {"R": 0.5, "L": 0.0},
            "anode_edge_frac": frac,
            "anode_edge_width": width,
            "anom_model": {
                "type": "LogisticPressureShift",
                "dz": NOM["dz"], "z0": NOM["z0"], "pstar": NOM["pstar"],
                "alpha": NOM["alpha"],
                "model": {"type": "TwoZoneBohm", "c1": NOM["a1"],
                          "c2": NOM["a1"] * NOM["a2_mult"]},
            },
        },
        "simulation": {"adaptive": True, "dt": 1e-9, "min_dt": 1e-10, "max_dt": 1e-7,
                       "duration": 2e-3, "num_save": 1000,
                       "grid": {"type": "EvenGrid", "num_cells": 200}},
        "postprocess": {"average_start_time": 1e-3, "cycle_average": True},
    }
    out = run_simulation(tree)["output"]["average"]
    return pbs, out


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-o", "--output", default="runs/r4/anode_zone.json")
    args = parser.parse_args(argv)

    lif = np.genfromtxt(DATA / "uion_macdonald2019.csv", delimiter=",", skip_header=1)
    groups = {float(pb): lif[lif[:, 0] == pb] for pb in np.unique(lif[:, 0])}

    report = []
    print(f"{'case':>20} {'relL2@1e-5':>10} {'@3e-5':>7} {'@5.5e-5':>8} "
          f"{'T_err':>7} {'Id_err':>7} {'IB0_err':>7}")
    for name, frac, width in CASES:
        pbs, out = run_case(frac, width)
        z = np.asarray(out["z"])
        ui = np.asarray(out["ui"][0])
        rels = []
        for i, pb in enumerate(pbs):
            rows = groups[pb]
            zrow = z[i] if z.ndim > 1 else z
            u_int = np.interp(rows[:, 3], zrow, ui[i])
            rels.append(float(np.linalg.norm(u_int - rows[:, 4]) / np.linalg.norm(rows[:, 4])))
        errs = {q: float(np.asarray(out[{"T": "thrust", "I_d": "discharge_current",
                                          "I_B0": "ion_current"}[q]])[0] / ANCHOR[q] - 1)
                for q in ANCHOR}
        report.append({"case": name, "frac": frac, "width_mm": width * 1e3,
                       "uion_rel_l2": [round(r, 4) for r in rels],
                       **{f"{q}_rel_err": round(e, 4) for q, e in errs.items()}})
        print(f"{name:>20} {rels[0]:10.3f} {rels[1]:7.3f} {rels[2]:8.3f} "
              f"{errs['T']:+7.1%} {errs['I_d']:+7.1%} {errs['I_B0']:+7.1%}")

    out_path = Path(args.output)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w") as fd:
        json.dump(report, fd, indent=1)
    print(f"saved {out_path}")


if __name__ == "__main__":
    main()

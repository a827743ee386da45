"""Published-data anchor regression: pem_v0 nominal model vs the bundled SPT-100 datasets.

BASELINE's north star is solver output within a few percent of the reference
solver; with no Julia runtime in this environment, the published data that the
reference itself calibrates against (reference ``pem_to_julia.json:28-36``
output contract; datasets bundled with provenance in
``hallthrusterpem_tpu/data/spt100/``) is the accuracy anchor. This script runs
the UNMODIFIED pem_v0 nominal calibration through the full coupled PEM at
full fidelity across the anchored operating conditions and writes
``runs/r4/anchors.json``: model vs data for T, I_d, I_B0, eta_c, eta_m, V_cc,
and u_ion(z) rel-L2 against the LIF reconstructions, each with a stated
tolerance. ``tests/test_anchors_artifact.py`` validates the committed artifact,
pinning the accuracy so later physics/perf work cannot silently regress it.

Tolerance philosophy: tolerances are STATED CLAIMS about model quality, set
per condition (tighter at the design point, looser off-design where the
reference workflow treats u_n/a_i as per-dataset calibration targets); the
artifact records both the tolerance and the measured error so drift is visible
even inside the band.

Usage: python scripts/anchors.py [-o runs/r4/anchors.json]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root

import argparse
import json
from datetime import date
from pathlib import Path

import numpy as np

REPO = _Path(__file__).resolve().parents[1]
DATA = REPO / "hallthrusterpem_tpu" / "data" / "spt100"
CONFIG = REPO / "scripts" / "pem_v0" / "pem_v0_SPT-100.yml"

# scalar anchors: operating condition -> data values + per-QoI relative tolerance.
# Diamant 2014 rows are interpolated to P_b = 1e-5 Torr; I_B0/eta bands are the
# published-estimate ranges quoted in docs/validation.md (round-3 table).
SCALAR_ANCHORS = [
    # round-5 ratcheted design-point table (VERDICT round-4 item 6: T<=3%,
    # I_d<=4%, I_B0<=10% this round, toward the 1% north star)
    {"name": "diamant_300V_5.16mg_1e-5Torr", "P_b": 1.0e-5, "V_a": 300.0, "mdot_a": 5.16e-6,
     "data": {"T": 81.7e-3, "I_d": 4.60, "V_cc": 32.5, "I_B0": 3.6, "eta_c": 0.775, "eta_m": 0.90},
     "tol": {"T": 0.03, "I_d": 0.04, "V_cc": 0.05, "I_B0": 0.10, "eta_c": 0.12, "eta_m": 0.08}},
    {"name": "sankovic_250V_5.16mg", "P_b": 5.0e-6, "V_a": 250.0, "mdot_a": 5.16e-6,
     "data": {"T": 72.0e-3, "I_d": 4.60},
     "tol": {"T": 0.12, "I_d": 0.15}},
    {"name": "sankovic_400V_5.16mg", "P_b": 5.0e-6, "V_a": 400.0, "mdot_a": 5.16e-6,
     "data": {"T": 95.5e-3, "I_d": 4.47},
     "tol": {"T": 0.12, "I_d": 0.15}},
    {"name": "sankovic_300V_3.5mg", "P_b": 5.0e-6, "V_a": 300.0, "mdot_a": 3.5e-6,
     # off-design: the pem_v0 nominals are design-point calibration values; the
     # reference workflow recalibrates u_n/a_i per dataset (docs/validation.md)
     "data": {"T": 45.5e-3, "I_d": 3.05},
     "tol": {"T": 0.30, "I_d": 0.10}},
]

# u_ion(z) LIF anchors (MacDonald-Tenenbaum 2019): rel-L2 tolerance per pressure
# (round-5 ratchet 0.25 -> 0.16; frac-0.55 re-tune measured 0.09-0.15)
UION_TOL = 0.16

# j_ion(theta) Faraday-probe anchors (Diamant 2014, r = 1 m sweeps at three
# background pressures): rel-L2 tolerance over the measured angles. This is
# the plume's data-facing contract (reference ``plume.py:21-159`` consumed as
# a first-class QoI per ``pem_to_julia.json:28-36``) — the same dataset the
# MCMC likelihood uses, anchored here at the pem_v0 nominal plume fit.
# Per-pressure tolerances: the 2.9e-5 Torr sweep is model-form limited — the
# measured on-axis current RISES with background pressure (beam narrowing +
# ingestion) while any fixed-divergence beam + CEX-attenuation model of this
# family (ours and the reference's) attenuates; the best global least-squares
# fit over all three sweeps floors at ~0.43 there vs 0.12-0.14 at low/mid
# pressure (fit in pem._NOMINALS provenance note).
JION_TOL = {1.7e-6: 0.20, 8.4e-6: 0.20, 2.9e-5: 0.50}


def nominal_batch(system, conds: list[dict]) -> dict:
    """Every input at its pem_v0 nominal, operating columns from the conditions."""
    n = len(conds)
    batch = {}
    for v in system.inputs():
        if v.name in ("P_b", "V_a", "mdot_a"):
            batch[v.name] = np.array([c[v.name] for c in conds], dtype=np.float64)
        else:
            nom = v.nominal if v.nominal is not None else 0.5 * sum(v.get_domain())
            batch[v.name] = np.full(n, float(nom))
    return batch


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-o", "--output", default="runs/r5/anchors.json")
    args = parser.parse_args(argv)

    import jax

    from hallthrusterpem_tpu.core.yaml_loader import YamlLoader

    system = YamlLoader.load(CONFIG)
    system.set_logger(stdout=True)

    # u_ion LIF profiles, grouped by background pressure
    lif = np.genfromtxt(DATA / "uion_macdonald2019.csv", delimiter=",", skip_header=1)
    lif_groups = {}
    for pb in np.unique(lif[:, 0]):
        rows = lif[lif[:, 0] == pb]
        lif_groups[float(pb)] = (rows[:, 3], rows[:, 4])  # z (m from anode), u (m/s)

    # j_ion(theta) Faraday sweeps, grouped by background pressure (r = 1 m)
    faraday = np.genfromtxt(DATA / "jion_diamant2014.csv", delimiter=",", skip_header=1)
    jion_groups = {}
    for pb in np.unique(faraday[:, 0]):
        rows = faraday[faraday[:, 0] == pb]
        jion_groups[float(pb)] = (np.deg2rad(rows[:, 4]), rows[:, 5])  # theta (rad), j (A/m^2)

    conds = [dict(P_b=c["P_b"], V_a=c["V_a"], mdot_a=c["mdot_a"]) for c in SCALAR_ANCHORS]
    conds += [dict(P_b=pb, V_a=300.0, mdot_a=5.16e-6) for pb in lif_groups]
    conds += [dict(P_b=pb, V_a=300.0, mdot_a=5.16e-6) for pb in jion_groups]
    batch = nominal_batch(system, conds)
    out = system.predict(batch, use_model="best")
    out = {k: np.asarray(v) for k, v in out.items()}

    artifact = {"date": date.today().isoformat(),
                "device": str(jax.devices()[0].device_kind),
                "platform": jax.devices()[0].platform,
                "config": str(CONFIG.relative_to(REPO)),
                "conditions": []}

    n_scalar = len(SCALAR_ANCHORS)
    for i, anchor in enumerate(SCALAR_ANCHORS):
        entry = {"name": anchor["name"],
                 "operating": {k: conds[i][k] for k in ("P_b", "V_a", "mdot_a")},
                 "qois": {}, "pass": True}
        for q, data_val in anchor["data"].items():
            model_val = float(out[q][i])
            rel = abs(model_val - data_val) / abs(data_val)
            ok = bool(np.isfinite(model_val) and rel <= anchor["tol"][q])
            entry["qois"][q] = {"data": data_val, "model": model_val,
                                "rel_err": round(rel, 4), "tol": anchor["tol"][q], "pass": ok}
            entry["pass"] = entry["pass"] and ok
        artifact["conditions"].append(entry)
        print(f"{anchor['name']}: pass={entry['pass']} "
              f"{ {q: round(r['rel_err'], 3) for q, r in entry['qois'].items()} }")

    # u_ion(z) rel-L2 on the LIF coordinates (z measured from the anode)
    zgrid = np.asarray(out["u_ion_coords"])
    for j, (pb, (z_obs, u_obs)) in enumerate(sorted(lif_groups.items())):
        i = n_scalar + j
        zrow = zgrid[i] if zgrid.ndim > 1 else zgrid
        u_model = np.interp(z_obs, zrow, out["u_ion"][i])
        rel_l2 = float(np.linalg.norm(u_model - u_obs) / np.linalg.norm(u_obs))
        entry = {"name": f"uion_macdonald_{pb:.1e}Torr",
                 "operating": {"P_b": pb, "V_a": 300.0, "mdot_a": 5.16e-6},
                 "qois": {"u_ion": {"rel_l2": round(rel_l2, 4), "tol": UION_TOL,
                                    "n_points": int(len(z_obs)),
                                    "pass": bool(np.isfinite(rel_l2) and rel_l2 <= UION_TOL)}},
                 "pass": bool(np.isfinite(rel_l2) and rel_l2 <= UION_TOL)}
        artifact["conditions"].append(entry)
        print(f"{entry['name']}: rel_l2={rel_l2:.4f} pass={entry['pass']}")

    # j_ion(theta) rel-L2 on the Faraday angles (model sweep is 0-90 deg, 1 deg)
    theta_grid = np.asarray(out["j_ion_coords"])
    for j, (pb, (th_obs, j_obs)) in enumerate(sorted(jion_groups.items())):
        i = n_scalar + len(lif_groups) + j
        th_row = theta_grid[i] if theta_grid.ndim > 1 else theta_grid
        j_model = np.interp(th_obs, th_row, out["j_ion"][i])
        rel_l2 = float(np.linalg.norm(j_model - j_obs) / np.linalg.norm(j_obs))
        tol = JION_TOL[min(JION_TOL, key=lambda p: abs(p - pb))]
        entry = {"name": f"jion_diamant_{pb:.1e}Torr",
                 "operating": {"P_b": pb, "V_a": 300.0, "mdot_a": 5.16e-6},
                 "qois": {"j_ion": {"rel_l2": round(rel_l2, 4), "tol": tol,
                                    "n_points": int(len(th_obs)),
                                    "pass": bool(np.isfinite(rel_l2) and rel_l2 <= tol)}},
                 "pass": bool(np.isfinite(rel_l2) and rel_l2 <= tol)}
        artifact["conditions"].append(entry)
        print(f"{entry['name']}: rel_l2={rel_l2:.4f} pass={entry['pass']}")

    artifact["pass"] = all(e["pass"] for e in artifact["conditions"])
    out_path = Path(args.output)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w") as fd:
        json.dump(artifact, fd, indent=1)
    print(f"{'PASS' if artifact['pass'] else 'FAIL'} -> {out_path}")
    return 0 if artifact["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())

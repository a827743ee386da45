"""Diagnose the u_ion(z) anchor gap: model profile vs MacDonald-Tenenbaum LIF.

The round-4 anchors run (scripts/anchors.py) put the nominal-model u_ion(z)
rel-L2 at 0.28/0.30/0.25 for P_b = 1e-5/3e-5/5.5e-5 Torr — just outside the
0.25 claim at the two lower pressures. This probe saves the profiles and an
error decomposition (where along z the error concentrates, and what a
least-squares axial shift/scale would do) so the gap is attributable to a
mechanism rather than a single number.

Usage: python scripts/probe_uion.py [-o runs/r4/uion_probe] [--fidelity 2,2]
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
CONFIG = REPO / "scripts" / "pem_v0" / "pem_v0_SPT-100.yml"


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-o", "--output", default="runs/r4/uion_probe")
    args = parser.parse_args(argv)

    from hallthrusterpem_tpu.core.yaml_loader import YamlLoader

    system = YamlLoader.load(CONFIG)
    system.set_logger(stdout=True)

    lif = np.genfromtxt(DATA / "uion_macdonald2019.csv", delimiter=",", skip_header=1)
    groups = {float(pb): lif[lif[:, 0] == pb] for pb in np.unique(lif[:, 0])}

    conds = [dict(P_b=pb, V_a=300.0, mdot_a=5.16e-6) for pb in sorted(groups)]
    batch = {}
    for v in system.inputs():
        if v.name in ("P_b", "V_a", "mdot_a"):
            batch[v.name] = np.array([c[v.name] for c in conds])
        else:
            nom = v.nominal if v.nominal is not None else 0.5 * sum(v.get_domain())
            batch[v.name] = np.full(len(conds), float(nom))
    out = system.predict(batch, use_model="best")
    z_model = np.asarray(out["u_ion_coords"], dtype=np.float64)
    u_model = np.asarray(out["u_ion"], dtype=np.float64)

    outdir = Path(args.output)
    outdir.mkdir(parents=True, exist_ok=True)
    report = []
    for i, (pb, rows) in enumerate(sorted(groups.items())):
        z_obs, u_obs, du_obs = rows[:, 3], rows[:, 4], rows[:, 5]
        zrow = z_model[i] if z_model.ndim > 1 else z_model
        u_interp = np.interp(z_obs, zrow, u_model[i])
        err = u_interp - u_obs
        rel_l2 = float(np.linalg.norm(err) / np.linalg.norm(u_obs))
        # best axial shift (brute force over +-5 mm): does the error look like
        # a misplaced acceleration region?
        shifts = np.linspace(-5e-3, 5e-3, 201)
        l2s = [np.linalg.norm(np.interp(z_obs + s, zrow, u_model[i]) - u_obs) for s in shifts]
        s_best = float(shifts[int(np.argmin(l2s))])
        rel_l2_shift = float(np.min(l2s) / np.linalg.norm(u_obs))
        # best velocity scale: is it a terminal-velocity (energy) mismatch?
        alpha = float((u_interp @ u_obs) / (u_interp @ u_interp))
        rel_l2_scale = float(np.linalg.norm(alpha * u_interp - u_obs) / np.linalg.norm(u_obs))
        chi2 = float(np.mean((err / np.maximum(du_obs, 1.0)) ** 2))
        entry = {"P_b": pb, "rel_l2": round(rel_l2, 4),
                 "rel_l2_best_shift": round(rel_l2_shift, 4), "best_shift_mm": round(s_best * 1e3, 2),
                 "rel_l2_best_scale": round(rel_l2_scale, 4), "best_scale": round(alpha, 4),
                 "mean_chi2_vs_lif_sigma": round(chi2, 2),
                 "z_obs": z_obs.tolist(), "u_obs": u_obs.tolist(), "du_obs": du_obs.tolist(),
                 "u_model": u_interp.tolist(),
                 "z_grid": zrow.tolist(), "u_grid": u_model[i].tolist()}
        report.append(entry)
        print(f"P_b={pb:.1e}: rel_l2={rel_l2:.3f}  best-shift {s_best * 1e3:+.1f} mm -> "
              f"{rel_l2_shift:.3f}  best-scale {alpha:.3f} -> {rel_l2_scale:.3f}  "
              f"chi2/sigma^2={chi2:.1f}")

    with open(outdir / "uion_probe.json", "w") as fd:
        json.dump(report, fd)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, len(report), figsize=(4 * len(report), 3.2), sharey=True)
        for ax, entry in zip(np.atleast_1d(axes), report):
            ax.errorbar(np.array(entry["z_obs"]) * 1e3, np.array(entry["u_obs"]) * 1e-3,
                        yerr=np.array(entry["du_obs"]) * 1e-3, fmt="o", ms=3, label="LIF")
            ax.plot(np.array(entry["z_grid"]) * 1e3, np.array(entry["u_grid"]) * 1e-3,
                    "-", label="model")
            ax.set_title(f"P_b={entry['P_b']:.1e} Torr (relL2 {entry['rel_l2']:.2f})")
            ax.set_xlabel("z from anode [mm]")
            ax.set_xlim(0, 60)
        np.atleast_1d(axes)[0].set_ylabel("u_ion [km/s]")
        np.atleast_1d(axes)[0].legend()
        fig.tight_layout()
        fig.savefig(outdir / "uion_probe.png", dpi=130)
        print(f"saved {outdir / 'uion_probe.png'}")
    except Exception as err:  # noqa: BLE001
        print(f"plotting skipped: {err}")


if __name__ == "__main__":
    main()

"""Surrogate accuracy report: global + envelope-restricted + calibration metrics.

Reproduces the round-4 I_d characterization (docs/validation.md) from the
committed artifacts: held-out rel-L2 per QoI, the experimental-envelope
restriction, per-sample error quantiles, and the ensemble-spread calibration
(does 2-sigma epistemic spread cover the truth?). Writes a JSON report next to
the trained system.

Usage: python scripts/surr_report.py [runs/r4/surr] [-o report.json]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root

import argparse
import json
import pickle
from pathlib import Path

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("run_dir", nargs="?", default="runs/r4/surr")
    parser.add_argument("-o", "--output", default="report.json")
    parser.add_argument("--envelope", nargs=2, type=float, default=[2.0, 8.0],
                        help="I_d envelope [A] containing the experimental data")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from hallthrusterpem_tpu.core.system import System
    from hallthrusterpem_tpu.surrogate.mlp import _net_forward

    run_dir = Path(args.run_dir)
    system = System.load_from_file(next(run_dir.glob("*_trained.yml")))
    surr = system.system_surrogate
    with open(run_dir / "test_set.pkl", "rb") as fd:
        test = pickle.load(fd)
    drop = test["nan_idx"] if "nan_idx" in test else test["discard"]
    keep = ~np.asarray(drop)
    xt = {k: np.asarray(v)[keep] for k, v in test["samples"].items()}
    yt = {k: np.asarray(v)[keep] for k, v in test["outputs"].items()}

    report = {"n_test": int(keep.sum()), "surrogate": surr.train_info | {
        "hidden": list(surr.hidden), "ensemble": surr.ensemble}}
    report["rel_l2"] = {k: round(float(v), 4) for k, v in sorted(
        surr.test_errors(xt, yt).items())}

    pred = surr.predict(xt)
    lo, hi = args.envelope
    idt = np.asarray(yt["I_d"], dtype=float)
    idp = np.asarray(pred["I_d"], dtype=float)
    fin = np.isfinite(idt)
    rel = np.abs(idp - idt)[fin] / idt[fin]
    env = fin & (idt >= lo) & (idt < hi)
    report["I_d"] = {
        "global_rel_l2": round(float(np.linalg.norm((idp - idt)[fin]) /
                                     np.linalg.norm(idt[fin])), 4),
        "median_rel_err": round(float(np.median(rel)), 4),
        "p90_rel_err": round(float(np.percentile(rel, 90)), 4),
        "envelope_A": [lo, hi],
        "envelope_n": int(env.sum()),
        "envelope_rel_l2": round(float(np.linalg.norm((idp - idt)[env]) /
                                       np.linalg.norm(idt[env])), 4),
        "envelope_median_rel_err": round(float(np.median(
            np.abs(idp - idt)[env] / idt[env])), 4),
    }

    # ensemble-spread calibration on the (log-space) I_d head
    xs = (surr.pack_inputs(xt).astype(np.float32) - surr.x_mu) / surr.x_sd
    out = jax.vmap(_net_forward, in_axes=(0, None))(surr.params, jnp.asarray(xs))
    col = next(start for var, start, *_ in surr.out_slices if var.name == "I_d")
    mem = np.asarray(out[..., col])
    spread = mem.std(axis=0)[fin] * np.asarray(surr.y_sd)[col]
    log_err = np.abs(np.log10(np.maximum(idp, 1e-6)) - np.log10(idt))[fin]
    report["I_d"]["spread_error_corr"] = round(float(np.corrcoef(spread, log_err)[0, 1]), 3)
    report["I_d"]["coverage_2sigma"] = round(float((log_err <= 2 * spread).mean()), 4)
    # deep ensembles under-disperse: the scalar recalibration factor tau makes
    # tau*2sigma a true 95% band on this held-out set (conformal-style quantile)
    ratio = log_err / np.maximum(spread, 1e-12)
    tau95 = float(np.quantile(ratio, 0.95)) / 2.0
    report["I_d"]["spread_tau_for_95pct"] = round(tau95, 3)
    report["I_d"]["coverage_2sigma_recalibrated"] = round(
        float((log_err <= tau95 * 2 * spread).mean()), 4)

    out_path = run_dir / args.output
    with open(out_path, "w") as fd:
        json.dump(report, fd, indent=1)
    print(json.dumps(report["rel_l2"], indent=None))
    print(json.dumps(report["I_d"], indent=None))
    print(f"saved {out_path}")


if __name__ == "__main__":
    main()

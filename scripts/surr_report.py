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

    # ensemble-spread calibration on the I_d head, in the HEAD's own space:
    # log10 when the trainer selected I_d for log regression, linear otherwise
    # (comparing log-space spread against linear error would make every number
    # below silently meaningless — advisor round-4 finding)
    xs = (surr.pack_inputs(xt).astype(np.float32) - surr.x_mu) / surr.x_sd
    out = jax.vmap(_net_forward, in_axes=(0, None))(surr.params, jnp.asarray(xs))
    ivar, col = next((var, start) for var, start, *_ in surr.out_slices if var.name == "I_d")
    log_head = "I_d" in (surr.log_names or ())
    mem = np.asarray(out[..., col])
    y_sd_c, y_mu_c = float(np.asarray(surr.y_sd)[col]), float(np.asarray(surr.y_mu)[col])
    head_pred = mem.mean(axis=0)[fin] * y_sd_c + y_mu_c
    head_true = (np.log10(idt[fin]) if log_head
                 else np.asarray(ivar.normalize(idt[fin]), dtype=float))
    spread = mem.std(axis=0)[fin] * y_sd_c
    err = np.abs(head_pred - head_true)
    report["I_d"]["head_space"] = "log10" if log_head else "linear"
    report["I_d"]["spread_error_corr"] = round(float(np.corrcoef(spread, err)[0, 1]), 3)
    report["I_d"]["coverage_2sigma"] = round(float((err <= 2 * spread).mean()), 4)
    # deep ensembles under-disperse: conformal-style recalibration. The global
    # tau is a single inflation factor; the BINNED table below is the
    # input-dependent calibration (fit on one half, coverage checked on the
    # other) so the 2-sigma band holds across the envelope, not just on average.
    ratio = err / np.maximum(spread, 1e-12)
    tau95 = float(np.quantile(ratio, 0.95)) / 2.0
    report["I_d"]["spread_tau_for_95pct"] = round(tau95, 3)
    report["I_d"]["coverage_2sigma_recalibrated"] = round(
        float((err <= tau95 * 2 * spread).mean()), 4)

    # binned conformal calibration: bins by predicted spread quantile (a
    # prediction-time quantity), per-bin tau from the calibration half,
    # honest per-bin coverage from the held-out half
    rng = np.random.default_rng(0)
    n = err.size
    cal = np.zeros(n, dtype=bool)
    cal[rng.permutation(n)[: n // 2]] = True
    n_bins = 5
    edges = np.quantile(spread[cal], np.linspace(0, 1, n_bins + 1))
    edges[0], edges[-1] = -np.inf, np.inf
    bins_cal = np.clip(np.searchsorted(edges, spread[cal], side="right") - 1, 0, n_bins - 1)
    bins_ev = np.clip(np.searchsorted(edges, spread[~cal], side="right") - 1, 0, n_bins - 1)
    table = []
    for b in range(n_bins):
        mc, mv = bins_cal == b, bins_ev == b
        if mc.sum() < 10 or mv.sum() < 10:
            continue
        tau_b = float(np.quantile(ratio[cal][mc], 0.95)) / 2.0
        cov_b = float((err[~cal][mv] <= tau_b * 2 * spread[~cal][mv]).mean())
        table.append({"spread_lo": round(float(edges[b]) if np.isfinite(edges[b]) else 0.0, 5),
                      "tau": round(tau_b, 3), "n_eval": int(mv.sum()),
                      "coverage_2sigma": round(cov_b, 4)})
    report["I_d"]["binned_calibration"] = table
    report["I_d"]["binned_min_coverage"] = round(
        min(t["coverage_2sigma"] for t in table), 4) if table else None

    # eta_c tail characterization: the one QoI over the reference's 0.10 gate
    # (round-5). The global number is dominated by a handful of rows whose
    # TIME-AVERAGED beam/discharge current ratio exceeds the steady-state
    # physical bound eta_c <= 1 (ratio-of-averages decoupling under strong
    # breathing oscillation — a label-noise mechanism, not an input-space
    # region the surrogate could learn). Unlike the I_d validity ceiling the
    # corpus ratio population is CONTINUOUS above 1 (no measured gap), so
    # these rows are not remasked as failures; they are characterized here.
    etc_t = np.asarray(yt["eta_c"], dtype=float)
    etc_p = np.asarray(pred["eta_c"], dtype=float)
    efin = np.isfinite(etc_t) & np.isfinite(etc_p)
    err2 = np.square((etc_p - etc_t)[efin])
    top10 = np.sort(err2)[-10:].sum() / max(err2.sum(), 1e-300)
    phys = efin & (etc_t <= 1.2)  # quasi-steady band (+20% averaging margin)
    rel_all = np.abs(etc_p - etc_t)[efin] / np.abs(etc_t)[efin]
    report["eta_c"] = {
        "global_rel_l2": round(float(np.linalg.norm((etc_p - etc_t)[efin]) /
                                     np.linalg.norm(etc_t[efin])), 4),
        "median_rel_err": round(float(np.median(rel_all)), 4),
        "top10_sq_err_frac": round(float(top10), 3),
        "physical_band": 1.2,
        "physical_n": int(phys.sum()),
        "physical_rel_l2": round(float(np.linalg.norm((etc_p - etc_t)[phys]) /
                                       np.linalg.norm(etc_t[phys])), 4),
        "derived_IB0_over_Id_rel_l2": round(float(np.linalg.norm(
            (np.asarray(pred["I_B0"], dtype=float) / np.asarray(pred["I_d"], dtype=float)
             - etc_t)[efin]) / np.linalg.norm(etc_t[efin])), 4),
    }

    out_path = run_dir / args.output
    with open(out_path, "w") as fd:
        json.dump(report, fd, indent=1)
    print(json.dumps(report["rel_l2"], indent=None))
    print(json.dumps(report["I_d"], indent=None))
    print(f"saved {out_path}")


if __name__ == "__main__":
    main()

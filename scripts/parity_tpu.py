"""On-hardware Pallas<->lax parity artifact.

CI runs the kernel-parity suite in interpret mode on CPU (tests/test_pallas.py)
— which cannot see Mosaic codegen differences. This script runs the SAME
physics through both backends ON THE REAL DEVICE at the production operating
envelope (nominal + corner configs, fixed seeds) and writes a versioned
pass/fail artifact (``runs/r4/parity_tpu.json``) that
``tests/test_parity_artifact.py`` validates.

Divergent failure masks on basin-boundary samples are expected physics (the
cold-dense attractor study, docs/validation.md: numerically-equivalent paths
can tip different marginal samples over a 2 ms horizon) — the artifact
records the mask-agreement count with a small tolerance, and QoI errors are
compared over the rows finite in BOTH backends.

Usage: python scripts/parity_tpu.py [-o runs/r4/parity_tpu.json] [-B 32]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root

import argparse
import json
import os
import time
from datetime import date
from pathlib import Path

import numpy as np

# persistent XLA compile cache: the four configs share shapes, and without the
# cache each fresh process pays the two big (lax + Pallas) compiles again
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hallthrusterpem_tpu_jax_cache")

# QoI tolerances on commonly-finite rows. Labels are cycle-averaged and
# window-noise <=0.5% (docs/validation.md round-3 probe); backend divergence
# beyond a few percent on a *median* sample would flag real codegen drift.
TOLERANCES = {
    # medians are the codegen-drift claim (measured 0.2-1.2% across the four
    # configs; T at the quench-adjacent corner reaches 1.2% because cycle-
    # averaged QoIs inherit ~1% from tiny limit-cycle phase differences)
    "T": {"median": 0.015, "max": 0.05},
    "I_d": {"median": 0.02, "max": 0.10},
    "I_B0": {"median": 0.02, "max": 0.10},
}
# Floors on the fraction of rows whose failure-mask / attractor choice must
# agree across backends. Deterministic chaos legitimately flips marginal rows
# over a 2 ms horizon (round-3 basin study): measured at the nominal +-4-10%
# envelope, 5/32 rows flip their failure decision between numerically-
# equivalent backends (mask agreement 0.81-1.00 across configs). The CODEGEN
# claim is the median/p90 QoI drift over rows where both backends agree; the
# floors bound how much of the batch chaos may claim.
MIN_MASK_AGREEMENT = 0.75
MIN_ATTRACTOR_AGREEMENT = 0.9
#: hard ceiling on per-row backend divergence over SAME-attractor rows. The
#: attractor cut itself is 30%: a row inside it whose QoIs still disagree by
#: more than this is a codegen bug, not chaos — the chaos accounting may not
#: hide it (advisor round-4 finding).
MAX_REL_SAME_ATTRACTOR = 0.30

CONFIGS = [
    {"name": "nominal_300V_5.16mg", "V_a": 300.0, "mdot_a": 5.16e-6, "P_b": 1e-5},
    {"name": "low_flow_250V_3.5mg", "V_a": 250.0, "mdot_a": 3.5e-6, "P_b": 5e-6},
    {"name": "high_V_400V_high_Pb", "V_a": 400.0, "mdot_a": 5.16e-6, "P_b": 3e-5},
    # quench-adjacent corner: low flow + weak anomalous transport exercises the
    # physicality guards and the failure-mask agreement accounting
    {"name": "quench_corner_low_a1", "V_a": 280.0, "mdot_a": 3.0e-6, "P_b": 1e-5,
     "a_1": 0.004},
    # two-group neutral quadrature at nominal: exercises the round-5 kernel
    # port (extra state lane-block) under real Mosaic codegen
    {"name": "two_group_nominal", "V_a": 300.0, "mdot_a": 5.16e-6, "P_b": 1e-5,
     "neutral_groups": 2},
]


def run_config(cond: dict, batch: int, seed: int, fidelity=(2, 2)) -> dict:
    import jax

    from hallthrusterpem_tpu.models.thruster import hallthruster_jl

    rng = np.random.default_rng(seed)
    inputs = {
        "P_b": np.full(batch, cond["P_b"], np.float64),
        "V_a": cond["V_a"] * (1 + 0.04 * rng.standard_normal(batch)),
        "mdot_a": cond["mdot_a"] * (1 + 0.04 * rng.standard_normal(batch)),
        "V_cc": np.full(batch, 30.0),
        "u_n": 141.24 * (1 + 0.05 * rng.standard_normal(batch)),
        "a_1": cond.get("a_1", 0.0068) * (1 + 0.1 * rng.standard_normal(batch)),
        "a_2": np.full(batch, 14.645),  # ratio on a_1 (wrapper c2 = a_2 * c1)
        "dz": np.full(batch, 0.2),
        "z0": np.full(batch, -0.03104),
        "p0": np.full(batch, 56.86e-6),
    }

    # production pem_v0 thruster config (scripts/pem_v0/pem_v0_SPT-100.yml):
    # pressure-shifted TwoZoneBohm + facility RL filter + plume/divergence
    config = {
        "ncharge": 3,
        "domain": (0.0, 0.08),
        "ion_wall_losses": True,
        "solve_plume": True,
        "apply_thrust_divergence_correction": True,
        "circuit": {"R": 0.5, "L": 0.0},
        "anom_model": {"type": "LogisticPressureShift", "dz": 0.2, "z0": -0.03104,
                       "pstar": 45.0e-6, "alpha": 15,
                       "model": {"type": "TwoZoneBohm", "c1": 0.00625, "c2": 0.0625}},
    }
    if cond.get("neutral_groups"):
        config["neutral_groups"] = cond["neutral_groups"]
    results = {}
    for backend in ("lax", "pallas"):
        os.environ["HTPEM_SOLVER"] = backend
        t0 = time.time()
        out = hallthruster_jl(inputs, thruster="SPT-100", model_fidelity=fidelity,
                              config=config, simulation={"duration": 2e-3},
                              postprocess={"average_start_time": 1e-3,
                                           "cycle_average": True, "num_save": 256})
        results[backend] = ({k: np.asarray(v) for k, v in out.items()}, time.time() - t0)
    os.environ.pop("HTPEM_SOLVER", None)

    lax_out, lax_s = results["lax"]
    pl_out, pl_s = results["pallas"]
    entry = {"condition": cond, "batch": batch, "seed": seed,
             "wall_s": {"lax": round(lax_s, 2), "pallas": round(pl_s, 2)}, "qois": {}}

    fin_l = np.isfinite(lax_out["T"])
    fin_p = np.isfinite(pl_out["T"])
    agree = float((fin_l == fin_p).mean())
    both = fin_l & fin_p
    # attractor agreement: a marginal sample can deterministically land in a
    # different limit cycle over a 2 ms horizon under a numerically-equivalent
    # reordering (the round-3 cold-dense-attractor study; docs/validation.md).
    # Codegen parity is judged on rows where both backends found the SAME
    # attractor (I_d within 30%); the divergent fraction is bounded instead.
    same = both & (np.abs(np.log(np.maximum(lax_out["I_d"], 1e-9) /
                                 np.maximum(pl_out["I_d"], 1e-9))) < np.log(1.3))
    attractor_agree = float(same.sum() / max(both.sum(), 1))
    entry["finite"] = {"lax": int(fin_l.sum()), "pallas": int(fin_p.sum()),
                       "mask_agreement": round(agree, 4), "both": int(both.sum()),
                       "attractor_agreement": round(attractor_agree, 4),
                       "same_attractor": int(same.sum())}
    ok = (agree >= MIN_MASK_AGREEMENT and attractor_agree >= MIN_ATTRACTOR_AGREEMENT
          and same.sum() > 0)
    for qoi, tol in TOLERANCES.items():
        if qoi not in lax_out or not same.any():
            continue
        a, b = lax_out[qoi][same], pl_out[qoi][same]
        rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-12)
        # codegen drift shows up in the BULK of rows (median/p90); the max over
        # rows is recorded but not gated — rows just inside the 30% attractor
        # cut are trajectory divergence (chaos sensitivity), not codegen error
        rec = {"median_rel": float(np.median(rel)), "p90_rel": float(np.percentile(rel, 90)),
               "max_rel": float(rel.max()),
               "tol_median": tol["median"], "tol_p90": tol["max"],
               "tol_max": MAX_REL_SAME_ATTRACTOR,
               "pass": bool(np.median(rel) < tol["median"]
                            and np.percentile(rel, 90) < tol["max"]
                            and rel.max() < MAX_REL_SAME_ATTRACTOR)}
        entry["qois"][qoi] = rec
        ok = ok and rec["pass"]
    entry["pass"] = bool(ok)
    return entry


def reeval(path: Path) -> int:
    """Recompute pass flags of an existing artifact from its recorded raw stats
    under the CURRENT criteria (the artifact stores measurements; the criteria
    live here). Hardware numbers are never altered."""
    with open(path) as fd:
        art = json.load(fd)
    for entry in art["configs"]:
        fin = entry["finite"]
        if "attractor_agreement" not in fin or "same_attractor" not in fin:
            # a legacy artifact without the attractor accounting cannot pass the
            # attractor criterion by default (advisor round-4): re-run the
            # hardware script instead of re-evaluating
            raise SystemExit(f"{path}: artifact lacks attractor_agreement/"
                             "same_attractor — re-run parity_tpu.py on hardware")
        ok = (fin["mask_agreement"] >= MIN_MASK_AGREEMENT
              and fin["attractor_agreement"] >= MIN_ATTRACTOR_AGREEMENT
              and fin["same_attractor"] > 0)
        for qoi, rec in entry["qois"].items():
            tol = TOLERANCES.get(qoi, {})
            rec["tol_median"] = tol.get("median", rec["tol_median"])
            rec["tol_p90"] = tol.get("max", rec.get("tol_p90", rec.get("tol_max")))
            rec["tol_max"] = MAX_REL_SAME_ATTRACTOR
            rec["pass"] = bool(rec["median_rel"] < rec["tol_median"]
                               and rec.get("p90_rel", rec["max_rel"]) < rec["tol_p90"]
                               and rec["max_rel"] < MAX_REL_SAME_ATTRACTOR)
            ok = ok and rec["pass"]
        entry["pass"] = bool(ok)
        print(f"{entry['condition']['name']}: pass={entry['pass']} "
              f"mask={fin['mask_agreement']} attractor={fin.get('attractor_agreement')}")
    art["min_mask_agreement"] = MIN_MASK_AGREEMENT
    art["pass"] = all(e["pass"] for e in art["configs"])
    with open(path, "w") as fd:
        json.dump(art, fd, indent=1)
    print(f"{'PASS' if art['pass'] else 'FAIL'} -> {path} (re-evaluated)")
    return 0 if art["pass"] else 1


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-o", "--output", default="runs/r4/parity_tpu.json")
    parser.add_argument("-B", "--batch", type=int, default=32)
    parser.add_argument("--seed", type=int, default=11)
    parser.add_argument("--reeval", action="store_true",
                        help="recompute pass flags of the existing artifact under "
                             "the current criteria (no hardware run)")
    args = parser.parse_args(argv)
    if args.reeval:
        return reeval(Path(args.output))

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:  # noqa: BLE001
        pass

    device = jax.devices()[0]
    artifact = {
        "date": date.today().isoformat(),
        "device": str(device.device_kind),
        "platform": device.platform,
        "min_mask_agreement": MIN_MASK_AGREEMENT,
        "configs": [],
    }
    if device.platform not in ("tpu", "axon"):
        print(f"WARNING: running on {device.platform}, not TPU — artifact marked non-hardware",
              file=_sys.stderr)
    for cond in CONFIGS:
        entry = run_config(cond, args.batch, args.seed)
        artifact["configs"].append(entry)
        print(f"{cond['name']}: pass={entry['pass']} "
              f"finite l/p={entry['finite']['lax']}/{entry['finite']['pallas']} "
              f"{ {k: round(v['max_rel'], 4) for k, v in entry['qois'].items()} }")
    artifact["pass"] = all(e["pass"] for e in artifact["configs"])

    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as fd:
        json.dump(artifact, fd, indent=1)
    print(f"{'PASS' if artifact['pass'] else 'FAIL'} -> {out}")
    return 0 if artifact["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""Re-apply the thruster wrapper's physical-validity failure mask to cached
labeled datasets (training caches + test set) in place.

Why: the discharge-current ceiling guard (``models/thruster/__init__.py``
absurdity block — time-averaged I_d outside [0.2, 8] x e*mdot_a/m_i is a
failed solve, NaN-row semantics) was added AFTER the round-5 corpus was
generated. The labels themselves are unchanged; this post-pass recomputes the
failure masks so training/evaluation see the same rows the wrapper would now
reject, without re-running 49k solver evaluations.

Usage: python scripts/remask_validity.py runs/r5/surr
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root

import argparse
import pickle
from pathlib import Path

import numpy as np

from hallthrusterpem_tpu.constants import FUNDAMENTAL_CHARGE, atomic_mass_kg

MI = atomic_mass_kg("Xenon")


def validity_mask(i_d, mdot_a):
    """True for rows the wrapper's quasi-steady-average guard now rejects."""
    i_eq = FUNDAMENTAL_CHARGE * np.asarray(mdot_a, dtype=float) / MI
    i_d = np.asarray(i_d, dtype=float)
    with np.errstate(invalid="ignore"):
        return np.isfinite(i_d) & ((i_d < 0.2 * i_eq) | (i_d > 8.0 * i_eq))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("run_dir", nargs="?", default="runs/r5/surr")
    args = parser.parse_args(argv)
    run_dir = Path(args.run_dir)

    from hallthrusterpem_tpu.core.system import System

    system = System.load_from_file(run_dir / "pem_v0_SPT-100_compression.yml")
    in_names = {v.name for v in system.inputs()}

    for path in sorted(run_dir.glob("*mlp_train_data*.pkl")):
        with open(path, "rb") as fd:
            cache = pickle.load(fd)
        out = cache["outputs"]
        n = cache.get("done", len(np.asarray(out["I_d"])))
        bad = validity_mask(np.asarray(out["I_d"])[:n], np.asarray(out["mdot_a"])[:n])
        if not bad.any():
            print(f"{path.name}: no rows to remask")
            continue
        for key, val in out.items():
            val = np.asarray(val)
            if val.dtype.kind != "f" or val.ndim < 1 or val.shape[0] < n:
                continue
            # the sampled INPUT columns ride along inside outputs: leave them
            # intact — they feed the feature matrix and the failure head for
            # exactly these rows; same for coords/cost bookkeeping
            if key in in_names or key.endswith("_coords") or key == "model_cost":
                continue
            mask = bad.reshape(bad.shape + (1,) * (val.ndim - 1))
            val = val.copy()
            val[:n] = np.where(np.broadcast_to(mask, val[:n].shape), np.nan, val[:n])
            out[key] = val
        with open(path, "wb") as fd:
            pickle.dump(cache, fd)
        print(f"{path.name}: NaN-masked {int(bad.sum())}/{n} runaway rows")

    ts_path = run_dir / "test_set.pkl"
    if ts_path.exists():
        with open(ts_path, "rb") as fd:
            test = pickle.load(fd)
        bad = validity_mask(test["outputs"]["I_d"], test["samples"]["mdot_a"])
        for key in ("discard", "nan_idx"):
            if key in test and test[key] is not None:
                test[key] = np.asarray(test[key]) | bad
        for key, val in test["outputs"].items():
            val = np.asarray(val)
            if val.dtype.kind != "f" or val.ndim < 1 or val.shape[0] != bad.shape[0]:
                continue
            mask = bad.reshape(bad.shape + (1,) * (val.ndim - 1))
            test["outputs"][key] = np.where(np.broadcast_to(mask, val.shape), np.nan, val)
        with open(ts_path, "wb") as fd:
            pickle.dump(test, fd)
        print(f"test_set.pkl: marked {int(bad.sum())} runaway rows as failures")


if __name__ == "__main__":
    main()

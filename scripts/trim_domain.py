"""Fit a solver-failure-boundary classifier for prior-domain trimming.

The pem_v0 prior box contains corners where the solver legitimately fails
(quenched discharge, guard-masked blow-ups) — the reference workflow discards
those samples as NaNs (reference ``gen_data.py:186``). This script fits the
cheap quadratic logistic classifier of :mod:`hallthrusterpem_tpu.surrogate.
domain` to any labeled dataset pickle produced by ``gen_data.py`` or the MLP
training-data generator, reports held-out accuracy/recall, and saves the
classifier for ``gen_data.py --trim`` / ``fit_surr.py --trim``.

Usage: python trim_domain.py config.yml data.pkl [-o classifier.pkl]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root

import argparse
import pickle
from pathlib import Path

import numpy as np

from hallthrusterpem_tpu.core.system import System
from hallthrusterpem_tpu.core.yaml_loader import YamlLoader
from hallthrusterpem_tpu.surrogate.domain import FailureClassifier, failure_mask

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("config_file", help="system YAML (base or compression)")
parser.add_argument("data", nargs="+", help="labeled dataset pickle(s): gen_data test_set/"
                                            "compression pkl or *_mlp_train_data.pkl")
parser.add_argument("-o", "--output", default=None, help="output classifier pickle")
parser.add_argument("--threshold", type=float, default=0.5,
                    help="P(fail) above which a sample is rejected")
parser.add_argument("--steps", type=int, default=3000)


def load_labeled(path: Path):
    """(samples, fail) from either a gen_data pickle or an mlp train-data cache."""
    with open(path, "rb") as fd:
        d = pickle.load(fd)
    if "samples" in d:
        samples, outputs = d["samples"], d["outputs"]
    elif "outputs" in d:  # mlp cache: inputs ride along inside outputs
        outputs = d["outputs"]
        samples = None
    else:
        raise ValueError(f"{path}: not a labeled dataset pickle")
    return samples, outputs


def main(argv=None):
    args = parser.parse_args(argv)
    path = Path(args.config_file)
    system = (System.load_from_file(path) if path.name.endswith((".yml", ".yaml"))
              and "compression" in path.name else YamlLoader.load(path))
    system.set_logger(stdout=True)

    in_names = [v.name for v in system.inputs()]
    X_all, fail_all = [], []
    for data_path in args.data:
        samples, outputs = load_labeled(Path(data_path))
        if samples is None:
            samples = {k: outputs[k] for k in in_names if k in outputs}
        fail = failure_mask(outputs, skip=set(samples))
        clf_tmp = FailureClassifier(in_names)
        X_all.append(clf_tmp.pack(samples, system=system))
        fail_all.append(fail)
        system.logger.info("%s: %d samples, %d failures", data_path, fail.size, fail.sum())

    X = np.concatenate(X_all, axis=0)
    fail = np.concatenate(fail_all, axis=0)
    clf = FailureClassifier(in_names, threshold=args.threshold)
    info = clf.fit(X, fail, steps=args.steps)
    print(f"fitted on {fail.size} samples ({fail.mean():.1%} failures): "
          f"val acc {info.get('val_acc', float('nan')):.3f}, "
          f"fail recall {info.get('val_fail_recall', float('nan')):.3f}")

    out = Path(args.output) if args.output else Path(args.data[0]).parent / "domain_classifier.pkl"
    clf.save(out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()

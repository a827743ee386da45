"""Sobol' sensitivity analysis of the PEM v0 over background pressure.

Capability work-alike of the reference's ``scripts/pem_v0/sobol.py``
(SURVEY.md §2.3): S1/ST indices per QoI swept over background pressures
(reference ``sobol.py:100-118``), with NaN-masked handling of pathological samples
(reference's rejection-resampling at ``sobol.py:55-66`` becomes NaN-robust
estimators here).

Usage: python sobol.py pem_v0_SPT-100.yml --search -n 5000
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root

import argparse
from pathlib import Path

import numpy as np

from hallthrusterpem_tpu.core.system import System
from hallthrusterpem_tpu.core.yaml_loader import find_latest_save
from hallthrusterpem_tpu.uq import sobol_sa

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("config_file")
parser.add_argument("--search", action="store_true")
parser.add_argument("-n", "--num_samples", type=int, default=5000)
parser.add_argument("--pressures", nargs="*", type=float,
                    default=[3e-6, 1e-5, 3e-5, 5e-5, 8e-5])
parser.add_argument("--qois", nargs="*", default=["T", "I_d", "V_cc", "eta_a"])
parser.add_argument("--out", default=None,
                    help="save the full S1/ST tables as a JSON artifact")


def main(argv=None):
    args = parser.parse_args(argv)
    path = find_latest_save(args.config_file) if args.search else Path(args.config_file)
    system = System.load_from_file(path)
    system.set_logger(stdout=True)

    # sensitivity over calibration + nuisance inputs, operating conditions pinned
    sweep_vars = [v for v in system.inputs() if v.category in ("calibration", "nuisance")]
    names = [v.name for v in sweep_vars]
    d = len(names)

    artifact = []
    for p_b in args.pressures:

        def sampler(n, seed):
            import jax

            key = jax.random.PRNGKey(seed)
            cols = []
            for i, v in enumerate(sweep_vars):
                k = jax.random.fold_in(key, i)
                cols.append(np.asarray(v.sample(k, (n,))))
            return np.stack(cols, axis=-1)

        def fn(x):
            n = x.shape[0]
            batch = {}
            for v in system.inputs():
                if v.name in names:
                    batch[v.name] = x[:, names.index(v.name)]
                elif v.name == "P_b":
                    batch[v.name] = np.full(n, p_b)
                else:
                    nom = v.nominal if v.nominal is not None else 0.5 * sum(v.get_domain())
                    batch[v.name] = np.full(n, float(nom))
            out = system.predict(batch, use_model=None, qoi_ind=args.qois)
            return {q: np.asarray(out[q], dtype=float) for q in args.qois if q in out
                    and np.asarray(out[q]).ndim == 1}

        res = sobol_sa(fn, sampler, n_samples=args.num_samples, d=d, qoi_names=None,
                       seed=int(p_b * 1e8) % 2**31)
        print(f"== P_b = {p_b:.1e} Torr")
        for qi, q in enumerate(res["qois"]):
            order = np.argsort(res["ST"][:, qi])[::-1][:5]
            tops = ", ".join(f"{names[i]}: S1={res['S1'][i, qi]:.3f} ST={res['ST'][i, qi]:.3f}"
                             for i in order)
            print(f"  {q}: {tops}")
        artifact.append({"P_b": p_b, "n_samples": args.num_samples, "params": names,
                         "qois": list(res["qois"]),
                         "S1": np.round(res["S1"], 5).tolist(),
                         "ST": np.round(res["ST"], 5).tolist()})

    if args.out:
        import json

        with open(args.out, "w") as fd:
            json.dump(artifact, fd, indent=1)
        print(f"saved {args.out}")


if __name__ == "__main__":
    main()

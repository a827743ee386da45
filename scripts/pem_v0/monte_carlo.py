"""Forward Monte Carlo UQ of the PEM v0 over experimental operating conditions.

Capability work-alike of the reference's ``scripts/pem_v0/monte_carlo.py``
(SURVEY.md §2.3): prior/posterior predictive sampling per operating condition,
surrogate vs true-model comparison, relative-L2 validation tables
(reference ``monte_carlo.py:303-335``), SVD field reconstruction, percentile
summaries, HDF5 persistence.

Usage: python monte_carlo.py pem_v0_SPT-100.yml --search -n 1000
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root

import argparse
from pathlib import Path

import numpy as np

from hallthrusterpem_tpu.core.system import System
from hallthrusterpem_tpu.core.yaml_loader import find_latest_save
from hallthrusterpem_tpu.uq import mc_percentiles, run_mc
from hallthrusterpem_tpu.uq.montecarlo import l2_error_table

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("config_file")
parser.add_argument("--search", action="store_true")
parser.add_argument("-n", "--num_samples", type=int, default=1000)
parser.add_argument("--pressures", nargs="*", type=float,
                    default=[3e-6, 1e-5, 3e-5, 5e-5, 8e-5])
parser.add_argument("--compare-model", action="store_true",
                    help="also run the true model and print relative-L2 tables")
parser.add_argument("--posterior", default=None, help="HDF5 DRAM chain to sample calibration from")
parser.add_argument("--qois", nargs="*", default=["V_cc", "T", "I_d", "I_B0", "eta_a"])
parser.add_argument("--out", default="mc_results.h5")


def main(argv=None):
    args = parser.parse_args(argv)
    path = find_latest_save(args.config_file) if args.search else Path(args.config_file)
    system = System.load_from_file(path)
    system.set_logger(stdout=True)

    posterior = None
    calib_names = [v.name for v in system.inputs() if v.category == "calibration"]
    if args.posterior:
        from hallthrusterpem_tpu.uq import read_mcmc_chain

        chains, _ = read_mcmc_chain(args.posterior)
        posterior = chains.reshape(-1, chains.shape[-1])
        print(f"posterior predictive from {posterior.shape[0]} chain samples")

    import h5py

    results = {}
    for p_b in args.pressures:
        nominal = {"P_b": p_b}
        samples = system.sample_inputs(
            args.num_samples, seed=int(p_b * 1e8) % 2**31,
            use_pdf=["calibration", "nuisance"], nominal=nominal, constants=["operating"],
        )
        if posterior is not None:
            rng = np.random.default_rng(0)
            draws = posterior[rng.integers(0, len(posterior), args.num_samples)]
            for i, name in enumerate(calib_names[: draws.shape[1]]):
                samples[name] = draws[:, i]
        outputs = system.predict(samples, use_model=None, qoi_ind=args.qois)
        pct = mc_percentiles(outputs)
        results[p_b] = (samples, outputs, pct)
        line = " ".join(
            f"{q}={pct[q][50]:.4g}[{pct[q][5]:.4g},{pct[q][95]:.4g}]"
            for q in args.qois if q in pct and np.ndim(pct[q][50]) == 0
        )
        print(f"P_b={p_b:.1e}: {line}")

        if args.compare_model:
            truth = system.predict(samples, use_model="best", qoi_ind=args.qois)
            table = l2_error_table(outputs, truth, qois=args.qois)
            print("  surrogate vs model rel-L2:", {k: f"{v:.3e}" for k, v in table.items()})

    with h5py.File(args.out, "w") as f:
        for p_b, (samples, outputs, _) in results.items():
            grp = f.create_group(f"P_b_{p_b:.2e}")
            for k, v in outputs.items():
                arr = np.asarray(v, dtype=float)
                grp.create_dataset(k, data=arr)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()

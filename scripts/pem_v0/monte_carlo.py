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

_sys.path.insert(0, str(_Path(__file__).resolve().parent))
from dataset_util import SCALAR_COLS, field_profiles, load_experiment  # noqa: E402

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("config_file")
parser.add_argument("--search", action="store_true")
parser.add_argument("-n", "--num_samples", type=int, default=1000)
parser.add_argument("--pressures", nargs="*", type=float,
                    default=[3e-6, 1e-5, 3e-5, 5e-5, 8e-5])
parser.add_argument("--data", nargs="*", default=None,
                    help="experimental CSVs (or 'spt100' for the bundled datasets): evaluate "
                         "at the experimental operating conditions and tabulate prediction-vs-"
                         "data errors (reference monte_carlo.py:63-335)")
parser.add_argument("--compare-model", action="store_true",
                    help="also run the true model and print relative-L2 tables")
parser.add_argument("--posterior", default=None, help="HDF5 DRAM chain to sample calibration from")
parser.add_argument("--qois", nargs="*", default=["V_cc", "T", "I_d", "I_B0", "eta_a"])
parser.add_argument("--allocation", action="store_true",
                    help="print the MISC cost-allocation replay for a trained surrogate "
                         "(reference monte_carlo.py:708-767)")
parser.add_argument("--out", default="mc_results.h5")


def print_allocation(system):
    """MISC cost-allocation replay (reference ``monte_carlo.py:708-767``): per
    component and per model-fidelity alpha, the evals spent, wall-clock cost,
    and the active/candidate index-set sizes of the trained surrogate."""
    cost_alloc, model_cost, overhead, model_evals = system.get_allocation()
    print(f"# MISC allocation: total model cost {model_cost:.1f}s, training overhead {overhead:.1f}s")
    print(f"{'component':>12} {'alpha':>10} {'evals':>7} {'cost[s]':>9} {'frac':>6}")
    for comp_name, per_alpha in cost_alloc.items():
        for alpha, cost in sorted(per_alpha.items()):
            n = model_evals[comp_name][alpha]
            frac = cost / model_cost if model_cost > 0 else 0.0
            print(f"{comp_name:>12} {str(alpha):>10} {n:7d} {cost:9.2f} {frac:6.1%}")
    for comp in system.components:
        surr = getattr(comp, "surrogate", None)
        if surr is not None:
            # downward-closed index-set bookkeeping (active + candidate sets)
            alphas = sorted({k[: surr.n_alpha] for k in surr.active})
            print(f"{comp.name}: {len(surr.active)} active / {len(surr.candidates)} candidate "
                  f"multi-indices; active alphas {alphas}")


def run_experimental_comparison(system, args, posterior, calib_names):
    """Evaluate at experimental operating conditions; tabulate surrogate (and
    model) vs data — the reference's publication tables (``monte_carlo.py:63-335``)."""
    qois = [q for q in args.qois if q in SCALAR_COLS or q in ("u_ion", "j_ion")]
    ops, obs, sig, fields = load_experiment(args.data, qois)
    n_ops = len(ops["P_b"])
    Nmc = args.num_samples
    print(f"# {n_ops} experimental operating conditions, {Nmc} draws each")

    # (Nmc x n_ops) batch: operating pinned to data, calibration/nuisance sampled
    samples = system.sample_inputs(
        Nmc * n_ops, seed=7, use_pdf=["calibration", "nuisance"], constants=["operating"])
    for name in ("P_b", "V_a", "mdot_a"):
        if name in samples:
            samples[name] = np.tile(ops[name], Nmc)
    if posterior is not None:
        rng = np.random.default_rng(0)
        draws = posterior[rng.integers(0, len(posterior), Nmc)]
        for i, name in enumerate(calib_names[: draws.shape[1]]):
            samples[name] = np.repeat(draws[:, i], n_ops)

    preds = {"surrogate": system.predict(samples, use_model=None, qoi_ind=qois)}
    if args.compare_model:
        preds["model"] = system.predict(samples, use_model="best", qoi_ind=qois)

    # scalar tables: per-condition medians vs data + rel-L2 across conditions
    for q in [q for q in qois if q in obs]:
        mask = np.isfinite(obs[q])
        if not mask.any():
            continue
        print(f"\n== {q} (vs data at {int(mask.sum())} conditions)")
        meds = {}
        for src, pred in preds.items():
            p = np.asarray(pred[q], dtype=float).reshape(Nmc, n_ops)
            meds[src] = np.nanmedian(p, axis=0)
        hdr = f"{'V_a':>5} {'mdot':>9} {'P_b':>9} {'data':>10}" + "".join(f"{s:>11}" for s in meds)
        print(hdr)
        for k in np.where(mask)[0]:
            row = f"{ops['V_a'][k]:5.0f} {ops['mdot_a'][k]:9.2e} {ops['P_b'][k]:9.2e} {obs[q][k]:10.4g}"
            row += "".join(f"{meds[s][k]:11.4g}" for s in meds)
            print(row)
        for src, med in meds.items():
            num = np.linalg.norm(med[mask] - obs[q][mask])
            den = np.linalg.norm(obs[q][mask]) + 1e-300
            print(f"rel-L2 {src} vs data: {num / den:.3e}")

    # field tables: interpolate profiles onto the data coordinates
    for q, specs in fields.items():
        print(f"\n== {q} (field, vs data)")
        for src, pred in preds.items():
            prof, grid = field_profiles(system, pred, q)
            prof = prof.reshape(Nmc, n_ops, -1)
            grid = grid.reshape(Nmc, n_ops, -1)
            errs = []
            for k, spec in enumerate(specs):
                if spec is None:
                    continue
                med = np.nanmedian(prof[:, k, :], axis=0)
                interp = np.interp(spec["coords"], grid[0, k], med)
                num = np.linalg.norm(interp - spec["vals"])
                den = np.linalg.norm(spec["vals"]) + 1e-300
                errs.append(num / den)
                print(f"  {src} cond {k} (V_a={ops['V_a'][k]:.0f}, P_b={ops['P_b'][k]:.1e}): "
                      f"rel-L2 {num / den:.3e}")
            if errs:
                print(f"rel-L2 {src} vs data (mean over conditions): {np.mean(errs):.3e}")


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

    if args.allocation:
        print_allocation(system)

    if args.data:
        run_experimental_comparison(system, args, posterior, calib_names)
        return

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

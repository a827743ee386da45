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
parser.add_argument("--plots", action="store_true",
                    help="save publication predictive figures: per-QoI prior/posterior bands "
                         "vs background pressure with the experimental errorbars, u_ion(z) and "
                         "j_ion(theta) profile bands vs data (reference monte_carlo.py:338-705), "
                         "and trained-surrogate slice plots (reference plot_surrogate, :770-811)")
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

    if args.plots:
        tag = "_post" if posterior is not None else "_prior"
        saved = save_predictive_plots(system, args, ops, obs, sig, fields, preds, Nmc, n_ops, tag)
        saved += save_surrogate_slices(system, args)
        print("saved figures:", ", ".join(saved))


def save_predictive_plots(system, args, ops, obs, sig, fields, preds, Nmc, n_ops, tag=""):
    """Publication predictive figures vs experimental data (the reference's
    ``spt100_monte_carlo`` plot set, ``monte_carlo.py:338-705``): per-scalar-QoI
    5-95% bands + median over background pressure with 2-sigma data errorbars;
    u_ion(z)/j_ion(theta) profile bands at each measured condition."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from hallthrusterpem_tpu.viz import ax_default

    saved = []
    pb = np.asarray(ops["P_b"], dtype=float)
    for q in [q for q in args.qois if q in obs]:
        mask = np.isfinite(obs[q])
        if not mask.any():
            continue
        fig, axes = plt.subplots(1, len(preds), figsize=(4.2 * len(preds), 3.2), squeeze=False)
        for ax, (src, pred) in zip(axes[0], preds.items()):
            p = np.asarray(pred[q], dtype=float).reshape(Nmc, n_ops)[:, mask]
            x = pb[mask]
            idx = np.argsort(x)
            p5, med, p95 = np.nanpercentile(p, [5, 50, 95], axis=0)
            ax.fill_between(x[idx], p5[idx], p95[idx], alpha=0.25, color="0.4",
                            label=f"{src} 5-95%")
            ax.plot(x[idx], med[idx], "-k", lw=1.2, label=f"{src} median")
            ax.errorbar(x[idx], obs[q][mask][idx], yerr=2 * sig[q][mask][idx], fmt="o",
                        ms=4, capsize=3, mfc="none", color="r", label="experiment")
            ax.set_xscale("log")
            ax_default(ax, "Background pressure (Torr)", q, legend=True)
        fig.tight_layout()
        name = f"mc_{q}{tag}.png"
        fig.savefig(name, dpi=130)
        plt.close(fig)
        saved.append(name)

    for q, specs in fields.items():
        n_meas = sum(s is not None for s in specs)
        if n_meas == 0:
            continue
        ncols = min(n_meas, 4)
        nrows = (n_meas + ncols - 1) // ncols
        fig, axes = plt.subplots(nrows, ncols, figsize=(3.6 * ncols, 2.9 * nrows), squeeze=False)
        flat_axes = [ax for row in axes for ax in row]
        for src, pred in preds.items():
            prof, grid = field_profiles(system, pred, q)
            prof = prof.reshape(Nmc, n_ops, -1)
            grid = grid.reshape(Nmc, n_ops, -1)
            i_ax = 0
            for k, spec in enumerate(specs):
                if spec is None:
                    continue
                ax = flat_axes[i_ax]
                g = grid[0, k]
                p5, med, p95 = np.nanpercentile(prof[:, k, :], [5, 50, 95], axis=0)
                style = "-" if src == "surrogate" else "--"
                ax.fill_between(g, p5, p95, alpha=0.2, color="0.4")
                ax.plot(g, med, style, c="k", lw=1.2, label=src)
                if src == list(preds)[0]:
                    ax.errorbar(spec["coords"], spec["vals"], yerr=2 * spec["stds"], fmt="o",
                                ms=3, capsize=2, mfc="none", color="r", label="experiment")
                ax.set_title(f"V_a={ops['V_a'][k]:.0f} V, P_b={ops['P_b'][k]:.1e} Torr",
                             fontsize=8)
                xlab = "angle (rad)" if q == "j_ion" else "z (m)"
                ax_default(ax, xlab, q, legend=(i_ax == 0))
                if q == "j_ion":
                    ax.set_yscale("log")
                i_ax += 1
        for ax in flat_axes[n_meas:]:
            ax.set_visible(False)
        fig.tight_layout()
        name = f"mc_{q}{tag}.png"
        fig.savefig(name, dpi=130)
        plt.close(fig)
        saved.append(name)
    return saved


def save_surrogate_slices(system, args):
    """Trained-surrogate 1-D slice plots over the main calibration inputs
    (the reference's ``plot_surrogate``, ``monte_carlo.py:770-811``)."""
    inputs = [v.name for v in system.inputs() if v.category == "calibration"][:4]
    if not inputs:
        return []
    qois = [q for q in args.qois if q in {v.name for v in system.outputs()}][:3]
    try:
        system.plot_slice(inputs, qois, show_model=["best"], num_steps=12,
                          save_path="mc_surrogate_slices.png")
        return ["mc_surrogate_slices.png"]
    except Exception as err:  # slice plotting is best-effort
        system.logger.warning("surrogate slice plot skipped: %s", err)
        return []


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

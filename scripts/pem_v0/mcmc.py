"""Bayesian calibration of the PEM v0 calibration parameters via DRAM MCMC.

Capability work-alike of the reference's publication script
``scripts/pem_v0/mcmc.py`` (SURVEY.md §2.3): Gaussian log-likelihood over
V_cc / thrust / u_ion / j_ion plus a discharge-current penalty
(reference ``mcmc.py:95-104``), priors from the calibration variables' pdfs
(``mcmc.py:109-120``), MLE initialization, Laplace approximation, DRAM chains with
HDF5 persistence and IAC/ESS diagnostics (``mcmc.py:268-341``).

TPU-first: the posterior evaluates the *surrogate* (or true model) on the whole
walker ensemble x all operating conditions as one batched call per MCMC step.

Usage:
  python mcmc.py pem_v0_SPT-100.yml --search --data thrust.csv vcc.csv --niter 20000
(with no --data, a synthetic dataset is generated from the model at nominal
calibration values — useful for self-consistency testing.)
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root

import argparse
from pathlib import Path

import numpy as np

from hallthrusterpem_tpu.core.system import System

_sys.path.insert(0, str(_Path(__file__).resolve().parent))
from dataset_util import field_profiles, load_experiment  # noqa: E402
from hallthrusterpem_tpu.uq import (dram, ess, integrated_autocorr_time,
                                    laplace_approximation, run_mle, stretch)

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("config_file")
parser.add_argument("--search", action="store_true")
parser.add_argument("--data", nargs="*", default=None,
                    help="experimental CSV files, or the keyword 'spt100' for the bundled "
                         "literature datasets (hallthrusterpem_tpu/data/spt100)")
parser.add_argument("--niter", type=int, default=10000)
parser.add_argument("--walkers", type=int, default=8)
parser.add_argument("--use-model", default=None, help="'best' for true model; default surrogate")
parser.add_argument("--noise-std", type=float, default=0.02, help="relative data noise (1-sigma)")
parser.add_argument("--noise-samples", type=int, default=1,
                    help="M operating-condition/nuisance noise samples marginalized per "
                         "likelihood eval via logsumexp (reference mcmc.py:103-104); 1 = off")
parser.add_argument("--file", default="dram_chain.h5")
parser.add_argument("--mle", action="store_true", help="run MLE optimization first")
parser.add_argument("--laplace", action="store_true",
                    help="precondition DRAM with the Laplace approximation at the start "
                         "point (MAP with --mle): proposal cov0 = (2.38^2/d) * Sigma_Laplace "
                         "and walker starts ~ N(x_map, Sigma) (reference mcmc.py:234-252)")
parser.add_argument("--qois", nargs="*", default=["V_cc", "T", "I_d"],
                    help="QoIs for the likelihood; u_ion / j_ion add the field terms "
                         "(SVD-latent reconstruction, reference mcmc.py:85-89)")
parser.add_argument("--field-weight", type=float, default=1.0,
                    help="multiplier on the field (u_ion/j_ion) log-likelihood blocks. "
                         "The reference's plain-sum likelihood (mcmc.py:95-104) lets the "
                         "~228 field points outvote the ~41 scalar observations; ~0.2 "
                         "weights each QoI GROUP about equally (41/228)")
parser.add_argument("--id-penalty", type=float, default=2.0,
                    help="extra weight on the discharge-current misfit (reference mcmc.py:95-104)")
parser.add_argument("--on-device", action="store_true",
                    help="(default when a trained surrogate is available) evaluate the "
                         "log-posterior as ONE jitted device program over the whole walker "
                         "ensemble (System.as_jax_fn; SURVEY.md §3.4)")
parser.add_argument("--sampler", choices=["dram", "stretch"], default="dram",
                    help="dram = reference-parity delayed-rejection adaptive Metropolis; "
                         "stretch = affine-invariant ensemble (tuning-free, walker-batched "
                         "— the TPU-native default for sharp anisotropic posteriors)")
parser.add_argument("--host", action="store_true",
                    help="force the host-NumPy posterior path (per-step system.predict); "
                         "the device path is the default for surrogate posteriors")


def load_system(args) -> System:
    path = Path(args.config_file)
    if args.search:
        from hallthrusterpem_tpu.core.yaml_loader import find_latest_save

        path = find_latest_save(path)
    system = System.load_from_file(path)
    system.set_logger(stdout=True)
    return system


def build_dataset(system, args):
    """(operating-conditions dict-of-arrays, scalar observations, scalar sigmas,
    field observations) — see :mod:`dataset_util` for the experimental path."""
    if args.data:
        return load_experiment(args.data, args.qois)

    # synthetic self-consistency dataset: model at nominal calibration values
    ops = {
        "P_b": np.array([3e-6, 1e-5, 3e-5, 5e-5]),
        "V_a": np.full(4, 300.0),
        "mdot_a": np.full(4, 5e-6),
    }
    samples = {}
    for v in system.inputs():
        if v.name in ops:
            samples[v.name] = ops[v.name]
        else:
            nom = v.nominal if v.nominal is not None else 0.5 * sum(v.get_domain())
            samples[v.name] = np.full(4, float(nom))
    truth = system.predict(samples, use_model=args.use_model)
    obs = {q: np.asarray(truth[q], dtype=float) for q in args.qois if q in truth and np.ndim(truth[q]) == 1}
    sig = {q: np.abs(obs[q]) * args.noise_std + 1e-12 for q in obs}
    rng = np.random.default_rng(0)
    obs = {q: obs[q] * (1 + args.noise_std * rng.standard_normal(obs[q].shape)) for q in obs}
    return ops, obs, sig, {}


def build_numpy_posterior(system, args, calib, names, ops, obs, sig, fields):
    """Host-NumPy ensemble log-posterior (theta (W, d) -> (W,)): one batched
    ``system.predict`` per call, optional M-sample noise marginalization."""
    n_ops = len(next(iter(ops.values())))
    M = max(1, args.noise_samples)
    _noise_seed = [0]

    def log_likelihood(theta: np.ndarray) -> np.ndarray:
        """Gaussian log-lik over all QoIs (scalar + field) and operating
        conditions; theta (W, d). One batched predict over (W * M * n_ops)
        samples per call; with M > 1, operating-condition / nuisance noise is
        marginalized by logsumexp over the M samples (reference mcmc.py:57-106:
        inputs resampled from their pdfs about the experimental nominals)."""
        W = theta.shape[0]
        N = W * M * n_ops
        _noise_seed[0] += 1
        rng = np.random.default_rng(1000 + _noise_seed[0])
        batch = {}
        for v in system.inputs():
            if v.name in names:
                batch[v.name] = np.repeat(theta[:, names.index(v.name)], M * n_ops)
                continue
            if v.name in ops:
                base = np.tile(ops[v.name], W * M)
            else:
                nom = v.nominal if v.nominal is not None else 0.5 * sum(v.get_domain())
                base = np.full(N, float(nom))
            if M > 1 and v.distribution is not None and v.category in ("operating", "nuisance"):
                # jitter about the (per-condition) nominal via the variable's pdf
                import jax

                key = jax.random.PRNGKey(rng.integers(2**31))
                jit_v = np.asarray(v.sample(key, (N,), nominal=base))
                batch[v.name] = jit_v
            else:
                batch[v.name] = base
        qoi_list = list(obs) + list(fields)
        pred = system.predict(batch, use_model=args.use_model, qoi_ind=qoi_list, training=True)

        ll = np.zeros((W, M))
        bad = np.zeros((W, M), dtype=bool)
        for q in obs:
            p = np.asarray(pred[q], dtype=float).reshape(W, M, n_ops)
            mask = np.isfinite(obs[q])
            r = (p - obs[q])[..., mask] / sig[q][mask]
            # a sample whose prediction fails (NaN) at ANY observed condition is
            # rejected outright — silently dropping the misfit would bias the
            # posterior toward solver-failure regions (reference uses plain sum
            # so NaN propagates: /root/reference/scripts/pem_v0/mcmc.py:95-104)
            bad |= ~np.isfinite(r).all(axis=-1)
            w = args.id_penalty if q == "I_d" else 1.0
            ll += -0.5 * w * np.sum(np.where(np.isfinite(r), r, 0.0) ** 2, axis=-1)
        for q, specs in fields.items():
            prof, grid = field_profiles(system, pred, q)
            prof = prof.reshape(W, M, n_ops, -1)
            grid = grid.reshape(W, M, n_ops, -1)
            for k, spec in enumerate(specs):
                if spec is None:
                    continue
                g0 = grid[0, 0, k]
                pk = prof[:, :, k, :].reshape(W * M, -1)
                interp = np.stack([np.interp(spec["coords"], g0, row) for row in pk])
                r = (interp.reshape(W, M, -1) - spec["vals"]) / spec["stds"]
                bad |= ~np.isfinite(r).all(axis=-1)
                ll += -0.5 * args.field_weight * np.sum(
                    np.where(np.isfinite(r), r, 0.0) ** 2, axis=-1)
        ll = np.where(bad | ~np.isfinite(ll), -np.inf, ll)
        # logsumexp over the M noise samples (reference mcmc.py:103-104)
        mx = np.max(ll, axis=1, keepdims=True)
        safe_mx = np.where(np.isfinite(mx), mx, 0.0)
        with np.errstate(divide="ignore"):  # all-M-failed walkers -> log(0) -> rejected below
            out = safe_mx[:, 0] + np.log(np.sum(np.exp(ll - safe_mx), axis=1)) - np.log(M)
        return np.where(np.isfinite(out), out, -1e30)

    def log_prior(theta: np.ndarray) -> np.ndarray:
        lp = np.zeros(theta.shape[0])
        for i, v in enumerate(calib):
            pdf = np.asarray(v.pdf(theta[:, i]), dtype=float)
            lp += np.log(np.maximum(pdf, 1e-300))
            dom = v.get_domain()
            if dom is not None:
                lp = np.where((theta[:, i] < dom[0]) | (theta[:, i] > dom[1]), -1e30, lp)
        return lp

    def log_posterior(theta: np.ndarray) -> np.ndarray:
        theta = np.atleast_2d(theta)
        lp = log_prior(theta)
        alive = lp > -1e29
        ll = np.where(alive, log_likelihood(theta), 0.0)
        return lp + ll

    return log_posterior


def build_device_posterior(system, args, calib, names, ops, obs, sig, fields):
    """ONE-device-program log-posterior: the coupled surrogate chain, the scalar +
    field Gaussian likelihood, and the priors, jitted end-to-end over the walker
    ensemble (``System.as_jax_fn``; SURVEY.md §3.4 — the reference evaluates its
    amisc surrogate per-walker on the host, ``mcmc.py:57-106``).

    Returns ``(np_wrapper, jitted_fn)``: the wrapper takes/returns NumPy for the
    DRAM driver; the jitted fn is exposed for steps/sec benchmarking.
    """
    import jax
    import jax.numpy as jnp

    M = max(1, args.noise_samples)
    n_ops = len(next(iter(ops.values())))
    qoi_list = list(obs) + list(fields)
    fn = system.as_jax_fn(training=True, qoi_ind=qoi_list)

    # static per-(noise-sample, condition) inputs, flattened to (M * n_ops,).
    # With M > 1, operating/nuisance jitter uses FIXED common-random-number
    # draws made once at build time — the same noise set for every likelihood
    # call keeps the posterior a deterministic device program while still
    # marginalizing condition noise by logsumexp (reference mcmc.py:103-104
    # redraws per call; CRN is the standard pseudo-marginal variance reduction)
    static = {}
    key = jax.random.PRNGKey(2024)
    for v in system.inputs():
        if v.name in names:
            continue
        if v.name in ops:
            base = np.tile(np.asarray(ops[v.name], dtype=np.float64), M)
        else:
            nom = v.nominal if v.nominal is not None else 0.5 * sum(v.get_domain())
            base = np.full(M * n_ops, float(nom))
        if M > 1 and v.distribution is not None and v.category in ("operating", "nuisance"):
            key, sub = jax.random.split(key)
            base = np.asarray(v.sample(sub, (M * n_ops,), nominal=base))
        static[v.name] = jnp.asarray(base, jnp.float32)

    # observation tensors with NaN-as-mask semantics matching the NumPy path
    obs_t = {}
    for q in obs:
        mask = np.isfinite(obs[q])
        obs_t[q] = (jnp.asarray(np.where(mask, obs[q], 0.0), jnp.float32),
                    jnp.asarray(mask, jnp.float32),
                    jnp.asarray(np.where(mask, sig[q], 1.0), jnp.float32),
                    float(args.id_penalty if q == "I_d" else 1.0))

    # field specs: per-condition static (coords, vals, stds) + the compression grid
    field_t = {}
    for q, specs in fields.items():
        var = next(v for v in system.outputs() if v.name == q)
        if var.compression is None or var.compression.coords is None:
            raise SystemExit(f"--on-device field term {q!r} needs a compression map")
        grid = jnp.asarray(np.asarray(var.compression.coords, dtype=float).reshape(-1), jnp.float32)
        per_cond = []
        for k, spec in enumerate(specs):
            if spec is None:
                continue
            per_cond.append((k, jnp.asarray(spec["coords"], jnp.float32),
                             jnp.asarray(spec["vals"], jnp.float32),
                             jnp.asarray(spec["stds"], jnp.float32)))
        field_t[q] = (var, grid, per_cond)

    dom = np.array([v.get_domain() for v in calib], dtype=float)  # (d, 2)
    lo = jnp.asarray(dom[:, 0], jnp.float32)
    hi = jnp.asarray(dom[:, 1], jnp.float32)

    def log_posterior(theta):  # (W, d) -> (W,)
        W = theta.shape[0]
        batch = {name: jnp.repeat(theta[:, i], M * n_ops) for i, name in enumerate(names)}
        for k, v in static.items():
            batch[k] = jnp.tile(v, W)
        pred = fn(batch)

        ll = jnp.zeros((W, M), jnp.float32)
        bad = jnp.zeros((W, M), bool)
        for q, (vals, mask, s, w) in obs_t.items():
            p = jnp.reshape(pred[q], (W, M, n_ops))
            r = (p - vals) / s * mask
            bad |= ~jnp.isfinite(r).all(axis=-1)
            ll += -0.5 * w * jnp.sum(jnp.where(jnp.isfinite(r), r, 0.0) ** 2, axis=-1)
        for q, (var, grid, per_cond) in field_t.items():
            lat = jnp.reshape(pred[q], (W, M, n_ops, -1))
            prof = var.denormalize(var.compression.reconstruct(lat))  # (W, M, n_ops, nz)
            for k, coords, vals, stds in per_cond:
                rows = prof[:, :, k, :].reshape(W * M, -1)
                interp = jax.vmap(lambda row: jnp.interp(coords, grid[: rows.shape[-1]], row))(rows)
                r = (interp.reshape(W, M, -1) - vals) / stds
                bad |= ~jnp.isfinite(r).all(axis=-1)
                ll += -0.5 * float(args.field_weight) * jnp.sum(
                    jnp.where(jnp.isfinite(r), r, 0.0) ** 2, axis=-1)

        # logsumexp over the M fixed noise samples (matches the NumPy path)
        ll = jnp.where(bad | ~jnp.isfinite(ll), -jnp.inf, ll)
        mx = jnp.max(ll, axis=1, keepdims=True)
        safe_mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
        lsum = safe_mx[:, 0] + jnp.log(jnp.sum(jnp.exp(ll - safe_mx), axis=1)) - jnp.log(float(M))

        lp = jnp.zeros(W, jnp.float32)
        for i, v in enumerate(calib):
            pdf = v.pdf(theta[:, i])
            lp += jnp.log(jnp.maximum(pdf, 1e-30))
        inside = jnp.all((theta >= lo) & (theta <= hi), axis=-1)
        out = jnp.where(inside, lp + lsum, -jnp.inf)
        return jnp.where(jnp.isfinite(out), out, -1e30)

    @jax.jit
    def jitted(theta):
        # f32 matmuls end-to-end (MLP + SVD reconstruction): the TPU bf16
        # default injects per-call quantization that reads as log-posterior
        # noise and collapses Metropolis acceptance (see mlp._net_forward)
        with jax.default_matmul_precision("float32"):
            return log_posterior(theta)

    def np_wrapper(theta: np.ndarray) -> np.ndarray:
        theta = np.atleast_2d(np.asarray(theta, dtype=np.float32))
        return np.asarray(jitted(jnp.asarray(theta)), dtype=float)

    return np_wrapper, jitted


def _reflect_into(x: np.ndarray, dom: np.ndarray) -> np.ndarray:
    """Fold samples into [lo, hi] by reflection at the bounds.

    Clipping an initial walker ensemble flattens every out-of-bounds sample
    onto the SAME bound value — a zero-spread dimension that the affine-
    invariant stretch move can then never diversify (the round-4 Pstar/P_T
    "posterior pin"). Reflection preserves the spread.
    """
    lo, hi = dom[:, 0], dom[:, 1]
    width = hi - lo
    y = np.mod(np.asarray(x, dtype=np.float64) - lo, 2 * width)
    y = np.where(y > width, 2 * width - y, y)
    margin = 1e-6 * width
    return lo + np.clip(y, margin, width - margin)


def main(argv=None):
    args = parser.parse_args(argv)
    system = load_system(args)
    calib = [v for v in system.inputs() if v.category == "calibration"]
    names = [v.name for v in calib]
    print(f"calibrating {len(names)} parameters: {names}")

    ops, obs, sig, fields = build_dataset(system, args)

    # device path is the DEFAULT for surrogate posteriors (UQ hot loops belong
    # on the device; the host path remains for --use-model best and debugging)
    use_device = (args.on_device or not args.host) and args.use_model is None
    log_posterior = None
    if use_device:
        try:
            log_posterior, _ = build_device_posterior(system, args, calib, names, ops, obs, sig, fields)
            print("posterior: jitted device program (walker-ensemble batched); --host to opt out")
        except (ValueError, SystemExit) as err:
            if args.on_device:
                raise
            print(f"device posterior unavailable ({err}); falling back to host path")
    if log_posterior is None:
        log_posterior = build_numpy_posterior(system, args, calib, names, ops, obs, sig, fields)

    x0 = np.array([v.nominal if v.nominal is not None else 0.5 * sum(v.get_domain()) for v in calib])

    if args.mle:
        res = run_mle(lambda x: -float(log_posterior(x[None])[0]), x0,
                      bounds=[v.get_domain() for v in calib])
        print("MLE:", dict(zip(names, res.x)))
        x0 = res.x

    # initial proposal: small fraction of each parameter's domain width (a
    # |nominal|-based scale is useless for near-zero or tightly-constrained
    # parameters and stalls high-dimensional chains)
    widths = np.array([(v.get_domain()[1] - v.get_domain()[0]) for v in calib])
    cov0 = np.diag((0.02 * widths / np.sqrt(len(calib))) ** 2)

    if args.laplace:
        # Laplace preconditioning at the start point (the MAP with --mle): the
        # curvature-matched proposal is what takes 17-dim chains from ~0.02 to
        # the 0.2-0.3 acceptance band (reference run_laplace, mcmc.py:234-252)
        from hallthrusterpem_tpu.uq import normal_sample

        # log_posterior is ensemble-batched; approx_hess sends ONE (2d^2+1, d)
        # stencil batch through it (uq/utils.py:24-49)
        # The Laplace is computed in NORMALIZED coordinates y = (x-lo)/width:
        # raw parameter scales span ~23 decades (c4 ~1e20 vs l_t ~1e-3), which
        # makes the raw-unit Hessian eigenproblem meaningless (measured: the
        # eigen-floor then caps every direction and the preconditioner
        # degenerates). FD stencils are 5% of each width — |x0|-relative steps
        # quantize to zero through the float32 device posterior (see
        # approx_hess docstring) — and are halved near a domain edge so no
        # stencil point falls off the prior cliff.
        dom_l = np.array([v.get_domain()[0] for v in calib], dtype=float)
        dom_h = np.array([v.get_domain()[1] for v in calib], dtype=float)
        y0 = (x0 - dom_l) / widths
        steps_y = np.minimum(0.05, 0.5 * np.minimum(y0, 1.0 - y0))
        steps_y = np.maximum(steps_y, 1e-4)
        y_map, cov_y = laplace_approximation(
            lambda y: np.asarray(log_posterior(np.atleast_2d(dom_l + y * widths))),
            y0, steps=steps_y)
        x_map = dom_l + y_map * widths
        cov_l = cov_y * np.outer(widths, widths)
        # cap flat-direction variances at 5% of the domain width: FD-flat
        # directions (below the f32 posterior's quantization) are NOT known to
        # be wide — rehearsals show informative directions at 0.1-1% of width,
        # and a half-width proposal in 17 dims zeroes the acceptance
        std = np.sqrt(np.diag(cov_l))
        scale = np.minimum(1.0, 0.05 * widths / np.maximum(std, 1e-300))
        cov_l = cov_l * np.outer(scale, scale)
        print("Laplace std:", dict(zip(names, np.round(np.sqrt(np.diag(cov_l)), 6))))
        cov0 = (2.38**2 / len(calib)) * cov_l
        dom = np.array([v.get_domain() for v in calib], dtype=float)
        starts = normal_sample(x_map, cov_l, args.walkers, seed=1)
        x0 = _reflect_into(starts, dom)

    if args.sampler == "stretch":
        dom = np.array([v.get_domain() for v in calib], dtype=float)
        if np.ndim(x0) == 1:
            rng = np.random.default_rng(1)
            x0 = x0[None] + 0.02 * widths * rng.standard_normal((args.walkers, len(calib)))
        x0 = _reflect_into(x0, dom)
        if x0.shape[0] < 2 * len(calib):  # stretch needs a real ensemble
            reps = -(-2 * len(calib) // x0.shape[0])
            rng = np.random.default_rng(2)
            x0 = np.concatenate([x0] * reps)[: 2 * len(calib)]
            x0 = _reflect_into(x0 + 0.005 * widths * rng.standard_normal(x0.shape), dom)
        samples, logps, acc = stretch(log_posterior, x0, niter=args.niter,
                                      n_walkers=x0.shape[0], filename=args.file,
                                      progress=True)
    else:
        samples, logps, acc = dram(
            log_posterior, x0, niter=args.niter, n_walkers=args.walkers, cov0=cov0,
            adapt_after=max(200, args.niter // 10), adapt_interval=100,
            filename=args.file, progress=True,
        )
    print(f"acceptance: {acc:.3f}")
    flat = samples[args.niter // 4 :].reshape(-1, len(names))
    tau = integrated_autocorr_time(flat)
    print("posterior mean:", dict(zip(names, np.round(flat.mean(axis=0), 6))))
    print("posterior std: ", dict(zip(names, np.round(flat.std(axis=0), 6))))
    print("IAC:", np.round(np.atleast_1d(tau), 1), " ESS:", np.round(np.atleast_1d(ess(flat)), 0))

    try:
        from hallthrusterpem_tpu.viz import ndscatter

        ndscatter(flat[:: max(1, len(flat) // 5000)], labels=names, save_path="mcmc_corner.png")
        print("saved mcmc_corner.png")
        journal_plots(system, args, names, flat, ops, obs, sig)
        print("saved mcmc_predictive.png")
    except Exception as e:  # plotting is best-effort
        print("plots skipped:", e)


def journal_plots(system, args, names, flat, ops, obs, sig, n_draws: int = 200):
    """Posterior-predictive QoIs vs background pressure against the data
    (capability parity with reference ``mcmc.py:344-399`` journal_plots)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rng = np.random.default_rng(0)
    draws = flat[rng.integers(0, len(flat), n_draws)]
    pressures = np.geomspace(max(ops["P_b"].min() * 0.5, 1e-7), ops["P_b"].max() * 2, 12)

    qois = [q for q in obs if np.ndim(obs[q]) == 1]
    # ONE batched predict over (draws x pressures) — per-draw python loops would
    # serialize n_draws model dispatches (hours for the true solver)
    nP = len(pressures)
    batch = {}
    for v in system.inputs():
        if v.name == "P_b":
            batch[v.name] = np.tile(pressures, n_draws)
        elif v.name in ops:
            batch[v.name] = np.full(n_draws * nP, float(np.median(ops[v.name])))
        elif v.name in names:
            batch[v.name] = np.repeat(draws[:, names.index(v.name)], nP)
        else:
            nom = v.nominal if v.nominal is not None else 0.5 * sum(v.get_domain())
            batch[v.name] = np.full(n_draws * nP, float(nom))
    out = system.predict(batch, use_model=args.use_model, qoi_ind=qois)

    fig, axes = plt.subplots(1, len(qois), figsize=(3.2 * len(qois), 2.8), squeeze=False)
    for ax, q in zip(axes[0], qois):
        preds = np.asarray(out[q], dtype=float).reshape(n_draws, nP)
        lo, mid, hi = np.nanpercentile(preds, [5, 50, 95], axis=0)
        ax.fill_between(pressures, lo, hi, alpha=0.3, color="0.5")
        ax.plot(pressures, mid, "-k", lw=1)
        mask = np.isfinite(obs[q])
        ax.errorbar(ops["P_b"][mask], obs[q][mask], yerr=2 * sig[q][mask], fmt="o", ms=4,
                    color="r", label="data")
        ax.set_xscale("log")
        ax.set_xlabel("background pressure (Torr)")
        ax.set_ylabel(q)
        ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig("mcmc_predictive.png", dpi=120)
    plt.close(fig)


if __name__ == "__main__":
    main()

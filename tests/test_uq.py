"""UQ driver tests: DRAM recovers a known Gaussian; Sobol' matches the Ishigami
analytic indices; MC percentiles; Laplace/Hessian helpers."""

import numpy as np
import pytest

from hallthrusterpem_tpu.uq import (
    approx_hess,
    autocorrelation,
    dram,
    ess,
    integrated_autocorr_time,
    is_positive_definite,
    laplace_approximation,
    mc_percentiles,
    nearest_positive_definite,
    normal_sample,
    read_mcmc_chain,
    sobol_sa,
)


def test_dram_recovers_gaussian(tmp_path):
    mean = np.array([1.0, -2.0])
    cov = np.array([[1.0, 0.6], [0.6, 2.0]])
    icov = np.linalg.inv(cov)

    def logpdf(x):
        d = x - mean
        return -0.5 * np.einsum("wi,ij,wj->w", d, icov, d)

    h5 = tmp_path / "chain.h5"
    samples, logps, acc = dram(
        logpdf, np.zeros(2), niter=4000, n_walkers=8, adapt_after=300,
        adapt_interval=100, seed=0, filename=str(h5),
    )
    assert samples.shape == (4001, 8, 2)
    assert 0.05 < acc < 0.9
    flat = samples[1000:].reshape(-1, 2)
    assert np.allclose(flat.mean(axis=0), mean, atol=0.15)
    assert np.allclose(np.cov(flat.T), cov, atol=0.4)
    # HDF5 persistence round-trip
    s2, lp2 = read_mcmc_chain(h5, burn_frac=0.25)
    assert s2.shape[0] < 4001 and s2.shape[-1] == 2


def test_dram_single_chain_shape():
    logpdf = lambda x: -0.5 * np.sum(np.atleast_2d(x) ** 2, axis=-1)
    samples, logps, acc = dram(logpdf, np.zeros(3), niter=500, adapt_after=100, seed=1)
    assert samples.shape == (501, 3)
    assert logps.shape == (501,)


def test_autocorr_diagnostics():
    rng = np.random.default_rng(0)
    # AR(1) chain with known IAC = (1+rho)/(1-rho)
    rho = 0.8
    n = 20000
    x = np.empty(n)
    x[0] = 0
    for i in range(1, n):
        x[i] = rho * x[i - 1] + rng.standard_normal()
    acf = autocorrelation(x)
    assert abs(acf[1] - rho) < 0.05
    tau = integrated_autocorr_time(x)
    assert abs(tau - (1 + rho) / (1 - rho)) / ((1 + rho) / (1 - rho)) < 0.3
    assert 100 < ess(x) < n


def test_sobol_ishigami():
    """Ishigami function: analytic S1 = (0.3139, 0.4424, 0), ST = (.557, .442, .244)."""
    a, b = 7.0, 0.1

    def fn(x):
        return np.sin(x[:, 0]) + a * np.sin(x[:, 1]) ** 2 + b * x[:, 2] ** 4 * np.sin(x[:, 0])

    sampler = lambda n, seed: np.random.default_rng(seed).uniform(-np.pi, np.pi, (n, 3))
    res = sobol_sa(fn, sampler, n_samples=2 ** 13, d=3)
    S1, ST = res["S1"][:, 0], res["ST"][:, 0]
    assert np.allclose(S1, [0.3139, 0.4424, 0.0], atol=0.05)
    assert np.allclose(ST, [0.5576, 0.4424, 0.2437], atol=0.05)


def test_mc_percentiles_nan_robust():
    out = {"T": np.array([1.0, 2.0, np.nan, 3.0, 4.0])}
    pct = mc_percentiles(out, percentiles=(50,))
    assert np.isclose(pct["T"][50], 2.5)


def test_hessian_and_laplace():
    A = np.array([[2.0, 0.3], [0.3, 1.0]])

    def logp(x):
        x = np.atleast_2d(x)
        return -0.5 * np.einsum("wi,ij,wj->w", x, A, x)

    H = approx_hess(logp, np.zeros(2))
    assert np.allclose(H, -A, atol=1e-3)
    mu, cov = laplace_approximation(logp, np.zeros(2))
    assert np.allclose(cov, np.linalg.inv(A), atol=1e-3)


def test_pd_helpers():
    M = np.array([[1.0, 2.0], [2.0, 1.0]])  # indefinite
    assert not is_positive_definite(M)
    M2 = nearest_positive_definite(M)
    assert is_positive_definite(M2)
    s = normal_sample([0, 0], np.eye(2), 500, seed=0)
    assert s.shape == (500, 2)


def test_stretch_recovers_anisotropic_gaussian(tmp_path):
    """The affine-invariant move needs no proposal scale even with a 1e6
    condition-number target (the failure mode that motivated it: round-4
    pem_v0 posterior scales span decades)."""
    from hallthrusterpem_tpu.uq import stretch

    mean = np.array([3.0, -1.0, 50.0])
    std = np.array([1e-3, 1.0, 1e3])

    def logpdf(x):
        return -0.5 * np.sum(((np.atleast_2d(x) - mean) / std) ** 2, axis=-1)

    h5 = tmp_path / "chain.h5"
    samples, logps, acc = stretch(logpdf, mean + 0.1 * std, niter=3000,
                                  n_walkers=32, seed=0, filename=str(h5),
                                  scale=0.1 * std)
    assert samples.shape == (3001, 32, 3)
    assert 0.1 < acc < 0.7
    flat = samples[1000:].reshape(-1, 3)
    assert np.allclose(flat.mean(axis=0), mean, atol=0.2 * std)
    assert np.allclose(flat.std(axis=0), std, rtol=0.3)


def test_stretch_rejitters_frozen_dimension():
    """A zero-spread ensemble dimension can never diversify under the stretch
    move (proposals stay in the ensemble's affine span) — the round-4
    Pstar/P_T 'posterior pin at the bound with std 0' artifact. stretch()
    must detect it, warn, and re-jitter so the dimension mixes."""
    import warnings

    from hallthrusterpem_tpu.uq import stretch

    mean = np.array([0.0, 5.0])

    def logpdf(x):
        return -0.5 * np.sum((np.atleast_2d(x) - mean) ** 2, axis=-1)

    x0 = np.random.default_rng(0).standard_normal((16, 2))
    x0[:, 1] = 5.0  # collapsed dimension (e.g. every walker clipped to a bound)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        samples, _, _ = stretch(logpdf, x0, niter=2000, n_walkers=16, seed=0)
    assert any("zero-spread" in str(w.message) for w in rec)
    flat = samples[500:, :, 1].ravel()
    assert flat.std() > 0.5, "frozen dimension did not mix after re-jitter"


def test_normal_sample_degenerate_cov_no_warning():
    """Cholesky-based sampling after Higham repair must not trip numpy's PSD
    re-check (round-4: the warning fired inside Laplace preconditioning)."""
    import warnings

    from hallthrusterpem_tpu.uq import normal_sample

    # rank-deficient covariance (worst case for the repair path)
    v = np.array([[1.0, 2.0, 3.0]])
    cov = v.T @ v
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        s = normal_sample(np.zeros(3), cov, size=256, seed=0)
    assert s.shape == (256, 3)
    assert np.isfinite(s).all()
    assert not any("positive-semidefinite" in str(w.message) for w in rec)

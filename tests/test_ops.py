"""Numerical-ops tests: special functions, quadrature, tridiagonal solvers."""

import numpy as np
import scipy.special as sp
from scipy.integrate import simpson as scipy_simpson

from hallthrusterpem_tpu.ops.integrate import simpson, simpson_weights
from hallthrusterpem_tpu.ops.interp import interp1d
from hallthrusterpem_tpu.ops.special import dawson, erfi, exp_neg_asq_re_erfi, wofz_parts
from hallthrusterpem_tpu.ops.svd import svd_rank
from hallthrusterpem_tpu.ops.tridiag import thomas_solve, tridiag_solve


def test_dawson_vs_scipy():
    x = np.linspace(-6, 6, 101)
    assert np.max(np.abs(np.asarray(dawson(x)) - sp.dawsn(x))) < 5e-7


def test_erfi_real_vs_scipy():
    x = np.linspace(0.01, 4, 50)
    rel = np.abs((np.asarray(erfi(x)) - sp.erfi(x)) / sp.erfi(x))
    assert rel.max() < 1e-5


def test_wofz_parts_vs_scipy():
    a = np.linspace(0.05, 8, 30)
    b = np.linspace(0.05, 8, 30)
    wr, wi = (np.asarray(v) for v in wofz_parts(a, b))
    ref = sp.wofz(a + 1j * b)
    assert np.max(np.abs(wr - ref.real)) < 1e-6
    assert np.max(np.abs(wi - ref.imag)) < 1e-6


def test_plume_erfi_combination():
    """exp(-a^2)*Re[erfi(a+ib)] matches the direct (overflowing) formula."""
    a = np.linspace(0.05, 5, 20)
    b = np.pi / (2 * (2 * a))
    ref = np.exp(-(a**2)) * np.real(sp.erfi(a + 1j * b))
    got = np.asarray(exp_neg_asq_re_erfi(a, b))
    assert np.max(np.abs(got - ref)) < 1e-6


def test_simpson_matches_scipy_uniform_and_nonuniform():
    x = np.linspace(0, np.pi / 2, 91)
    y = np.sin(3 * x) + 1
    # weights are exact float64; the jnp contraction runs in float32 here
    assert abs(float(simpson(y, x=x)) - scipy_simpson(y, x=x)) < 1e-6
    assert abs(float(np.dot(y, simpson_weights(x))) - scipy_simpson(y, x=x)) < 1e-12
    rng = np.random.default_rng(0)
    x2 = np.sort(rng.uniform(0, 1, 90))
    y2 = np.exp(x2)
    assert abs(float(np.dot(y2, simpson_weights(x2))) - scipy_simpson(y2, x=x2)) < 1e-12


def test_simpson_weights_sum():
    x = np.linspace(0, 2, 51)
    assert np.isclose(simpson_weights(x).sum(), 2.0)


def test_tridiag_pcr_and_thomas_vs_dense():
    rng = np.random.default_rng(1)
    B, N = 5, 173  # non-power-of-two size
    a = rng.uniform(0.1, 1, (B, N))
    c = rng.uniform(0.1, 1, (B, N))
    b = np.abs(a) + np.abs(c) + rng.uniform(0.5, 2, (B, N))
    d = rng.normal(size=(B, N))
    x_pcr = np.asarray(tridiag_solve(a, b, c, d))
    x_tho = np.asarray(thomas_solve(a, b, c, d))
    for i in range(B):
        M = np.diag(b[i]) + np.diag(a[i, 1:], -1) + np.diag(c[i, :-1], 1)
        x_ref = np.linalg.solve(M, d[i])
        assert np.allclose(x_pcr[i], x_ref, rtol=1e-4, atol=1e-6)
        assert np.allclose(x_tho[i], x_ref, rtol=1e-4, atol=1e-6)


def test_interp1d_matches_numpy():
    xp = np.linspace(0, 1, 20)
    fp = np.sin(xp * 5)
    xq = np.linspace(-0.1, 1.1, 57)
    got = np.asarray(interp1d(xq, xp, fp))
    ref = np.interp(xq, xp, fp)
    assert np.allclose(got, ref, atol=1e-6)


def test_svd_rank_reconstruction_tol():
    rng = np.random.default_rng(2)
    U0 = np.linalg.qr(rng.normal(size=(60, 60)))[0][:, :5]
    A = U0 @ rng.normal(size=(5, 40)) + 1e-8 * rng.normal(size=(60, 40))
    U, r = svd_rank(A, reconstruction_tol=0.01)
    assert r == 5
    proj = U[:, :r]
    rec = proj @ (proj.T @ A)
    rel = np.linalg.norm(rec - A) / np.linalg.norm(A)
    assert rel < 0.01

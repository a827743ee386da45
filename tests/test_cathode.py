"""Cathode coupling model tests (parity with reference tests/test_cathode.py:8-44)."""

import jax
import jax.numpy as jnp
import numpy as np

from hallthrusterpem_tpu.models.cathode import cathode_coupling

N = 100


def test_scalar_point():
    inputs = {"P_b": 1e-5, "V_a": 300.0, "T_e": 2.0, "V_vac": 30.0, "Pstar": 30e-6, "P_T": 20e-6}
    out = cathode_coupling(inputs)
    v = np.asarray(out["V_cc"])
    assert v.shape == (1,)
    assert 0 <= v[0] <= 300.0
    # hand-computed expectation
    from hallthrusterpem_tpu.constants import TORR_2_PA

    PB, Pstar, PT = 1e-5 * TORR_2_PA, 30e-6 * TORR_2_PA, 20e-6 * TORR_2_PA
    expected = 30.0 + 2.0 * np.log(1 + PB / PT) - 2.0 / (PT + Pstar) * PB
    assert np.isclose(v[0], expected, rtol=1e-5)


def test_random_vectorized():
    rng = np.random.default_rng(0)
    inputs = {
        "P_b": 10 ** (rng.uniform(-8, -4, N)),
        "V_a": rng.uniform(200, 400, N),
        "T_e": rng.uniform(1, 5, N),
        "V_vac": rng.uniform(0, 60, N),
        "Pstar": rng.uniform(10e-6, 100e-6, N),
        "P_T": rng.uniform(10e-6, 100e-6, N),
    }
    out = cathode_coupling(inputs)
    v = np.asarray(out["V_cc"])
    assert v.shape == (N,)
    assert np.all(v >= 0)
    assert np.all(v <= inputs["V_a"] + 1e-6)


def test_pressure_sweep_monotone_clamped():
    P = np.logspace(-8, -4, N)
    inputs = {"P_b": P, "V_a": 300.0, "T_e": 3.0, "V_vac": 30.0, "Pstar": 35e-6, "P_T": 10e-6}
    v = np.asarray(cathode_coupling(inputs)["V_cc"])
    assert v.shape == (N,)
    assert np.all(v >= 0) and np.all(v <= 300)


def test_jit_and_grad():
    """The model is jittable and differentiable (new capability vs reference)."""

    def f(pb):
        return cathode_coupling(
            {"P_b": pb, "V_a": 300.0, "T_e": 3.0, "V_vac": 30.0, "Pstar": 35e-6, "P_T": 10e-6}
        )["V_cc"].sum()

    g = jax.grad(f)(jnp.asarray(1e-5))
    assert np.isfinite(np.asarray(g))
    jf = jax.jit(f)
    assert np.isclose(float(jf(1e-5)), float(f(1e-5)), rtol=1e-6)

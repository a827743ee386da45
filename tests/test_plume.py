"""Plume model tests (parity with reference tests/test_plume.py, incl. the
current-conservation physics invariant at reference lines 90-98)."""

import jax
import numpy as np

from hallthrusterpem_tpu.models.plume import current_density
from hallthrusterpem_tpu.ops.integrate import simpson

J_MIN = 0
J_MAX = 5e3
N = 100


def _random_inputs(rng, n=N):
    return {
        "P_b": 10 ** (rng.uniform(0, 4, n) - 8),
        "c0": rng.uniform(0.1, 0.9, n),
        "c1": rng.uniform(0.1, 0.9, n),
        "c2": rng.uniform(-15, 15, n),
        "c3": rng.uniform(0.1, 1.1, n),
        "c4": 10 ** rng.uniform(18, 22, n),
        "c5": 10 ** rng.uniform(14, 18, n),
        "sigma_cex": rng.uniform(51e-20, 58e-20, n),
        "I_B0": rng.uniform(2, 8, n),
    }


def test_random_samples_shape_and_bounds():
    rng = np.random.default_rng(0)
    inputs = _random_inputs(rng)
    r_p = rng.uniform(1.0, 1.2, 25)
    out = current_density(inputs, sweep_radius=r_p)
    j = np.asarray(out["j_ion"])
    assert j.shape == (N, 91, 25)  # (samples, angles, radii) — reference line 35
    assert j.min() >= J_MIN
    assert j.max() <= J_MAX
    assert np.asarray(out["j_ion_coords"]).shape == (N, 91)


def test_pressure_sweep_current_conservation():
    """Total integrated beam current must be invariant across the pressure sweep
    (reference tests/test_plume.py:90-98, rel. err < 1e-4)."""
    P = 10 ** np.linspace(-6, -4, N)
    inputs = {
        "P_b": P, "c0": 0.1, "c1": 0.7, "c2": -8.0, "c3": 0.2,
        "c4": 1e20, "c5": 1e16, "sigma_cex": 55e-20, "I_B0": 3.0,
    }
    out = current_density(inputs, sweep_radius=1)
    j = np.asarray(out["j_ion"])
    assert j.shape == (N, 91)
    assert j.min() >= J_MIN and j.max() <= J_MAX

    theta = np.linspace(0, np.pi / 2, 91)
    integrand = j * np.sin(theta)
    current = 2 * np.pi * np.asarray(simpson(integrand, x=theta, axis=-1))
    err = np.sqrt(np.sum((current - current.mean()) ** 2) / np.sum(current**2))
    assert err < 1e-4


def test_divergence_angle_and_corrected_thrust():
    inputs = {
        "P_b": np.array([1e-5]), "c0": 0.3, "c1": 0.5, "c2": 10.0, "c3": 0.3,
        "c4": 1e20, "c5": 1e16, "sigma_cex": 55e-20, "I_B0": 3.0, "T": np.array([0.08]),
    }
    out = current_density(inputs)
    div = np.asarray(out["div_angle"])
    assert div.shape == (1,)
    assert 0 < div[0] < np.pi / 2
    T_c = np.asarray(out["T_c"])
    assert np.allclose(T_c, 0.08 * np.cos(div), rtol=1e-5)
    assert T_c[0] < 0.08


def test_invalid_alpha_floors_output():
    """alpha1 <= 0 samples return the 1e-20 floor (reference plume.py:104-107)."""
    inputs = {
        "P_b": np.array([1e-4, 1e-6]), "c0": 0.3, "c1": 0.5,
        "c2": np.array([-1e6, 10.0]), "c3": 0.3,
        "c4": 1e20, "c5": 1e16, "sigma_cex": 55e-20, "I_B0": 3.0,
    }
    j = np.asarray(current_density(inputs)["j_ion"])
    assert np.all(j[0] == 1e-20)
    assert np.all(j[1] > 1e-10)


def test_jittable():
    rng = np.random.default_rng(1)
    inputs = _random_inputs(rng, 8)
    f = jax.jit(lambda d: current_density(d)["j_ion"])
    j1 = np.asarray(f(inputs))
    j2 = np.asarray(current_density(inputs)["j_ion"])
    assert np.allclose(j1, j2, rtol=1e-6)

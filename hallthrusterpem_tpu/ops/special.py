"""Jittable special functions: Faddeeva w(z), Dawson F(x), and erfi.

``jax.scipy.special`` has none of these; the reference plume model leans on
``scipy.special.erfi`` with complex arguments (reference ``src/hallmd/models/plume.py:63-85``).
We implement Weideman's (SIAM Rev. 36, 1994) rational approximation of the Faddeeva
function — a fixed-degree polynomial in the Möbius-transformed argument: pure
elementwise VPU work that vectorizes trivially under ``vmap``.

TPU note: the TPU backend has no complex-dtype support, so the core evaluation
(:func:`wofz_parts`) is written in explicit real-pair arithmetic. The convenience
complex wrappers (:func:`wofz`, :func:`erfi` on complex input) are CPU-only sugar.

Exposed identities (real x; complex z with Im(z) >= 0):
  - ``dawson(x)  = sqrt(pi)/2 * Im[w(x)]``
  - ``erfi(x)    = exp(x^2) * 2/sqrt(pi) * dawson(x)``
  - ``erfi(z)    = i - i exp(z^2) w(z)``
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_N = 36  # Weideman polynomial degree


def _weideman_coefficients(N: int) -> tuple[float, np.ndarray]:
    """Precompute (L, a[0..N-1]) for Weideman's Faddeeva approximation (float64)."""
    M = 2 * N
    M2 = 2 * M
    k = np.arange(-M + 1, M)
    L = np.sqrt(N / np.sqrt(2.0))
    theta = k * np.pi / M
    t = L * np.tan(theta / 2.0)
    f = np.exp(-(t**2)) * (L**2 + t**2)
    f = np.concatenate([[0.0], f])
    a = np.real(np.fft.fft(np.fft.fftshift(f))) / M2
    a = np.flipud(a[1 : N + 1])
    return float(L), a


_L, _A = _weideman_coefficients(_N)
_INV_SQRT_PI = 1.0 / np.sqrt(np.pi)


def wofz_parts(x, y):
    """Faddeeva function of ``z = x + iy`` (``y >= 0``) in real-pair arithmetic.

    :returns: ``(Re[w(z)], Im[w(z)])`` — TPU-safe (no complex dtypes).
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    # iz = -y + i x ;  d = L - iz = (L + y) - i x
    dr = _L + y
    di = -x
    d2 = dr * dr + di * di
    # Z = (L + iz) / (L - iz)
    nr = _L - y
    ni = x
    zr = (nr * dr + ni * di) / d2
    zi = (ni * dr - nr * di) / d2
    # Horner: p = sum a_k Z^k (static unroll over fixed coefficients)
    pr = jnp.zeros_like(zr)
    pi = jnp.zeros_like(zi)
    for coeff in _A:
        pr, pi = pr * zr - pi * zi + coeff, pr * zi + pi * zr
    # w = 2 p / d^2 + (1/sqrt(pi)) / d
    d2r = dr * dr - di * di
    d2i = 2.0 * dr * di
    d2n = d2r * d2r + d2i * d2i
    wr = 2.0 * (pr * d2r + pi * d2i) / d2n + _INV_SQRT_PI * dr / d2
    wi = 2.0 * (pi * d2r - pr * d2i) / d2n + _INV_SQRT_PI * (-di) / d2
    return wr, wi


def wofz(z):
    """Faddeeva function ``w(z) = exp(-z^2) erfc(-iz)`` for ``Im(z) >= 0``.
    Complex in/out convenience wrapper (CPU; TPU lacks complex dtypes)."""
    z = jnp.asarray(z)
    if not jnp.iscomplexobj(z):
        z = z + 0j
    wr, wi = wofz_parts(jnp.real(z), jnp.imag(z))
    return wr + 1j * wi


def dawson(x):
    """Dawson integral ``F(x) = exp(-x^2) \\int_0^x exp(t^2) dt`` for real ``x``.
    Odd symmetry is applied explicitly so negative inputs are exact."""
    x = jnp.asarray(x)
    ax = jnp.abs(x)
    _, wi = wofz_parts(ax, jnp.zeros_like(ax))
    return jnp.sign(x) * (np.sqrt(np.pi) / 2.0) * wi


def erfi(z):
    """Imaginary error function. Real input -> real output (TPU-safe); complex
    input uses ``erfi(z) = i - i exp(z^2) w(z)`` (requires ``Im(z) >= 0``)."""
    z = jnp.asarray(z)
    if not jnp.iscomplexobj(z):
        return jnp.exp(z**2) * (2.0 / np.sqrt(np.pi)) * dawson(z)
    return 1j - 1j * jnp.exp(z**2) * wofz(z)


def exp_neg_sq_erfi(a):
    """Well-conditioned ``exp(-a^2) * erfi(a)`` for real ``a`` (never overflows)."""
    return (2.0 / np.sqrt(np.pi)) * dawson(a)


def exp_neg_asq_re_erfi(a, b):
    """Well-conditioned ``exp(-a^2) * Re[erfi(a + ib)]`` for real ``a, b >= 0``.

    Derivation: ``erfi(z) = i - i e^{z^2} w(z)`` with ``z = a+ib`` gives
    ``e^{-a^2} Re[erfi(z)] = e^{-b^2} (Im[w] cos(2ab) + Re[w] sin(2ab))``.
    All factors are bounded, so this is float32/TPU-safe even where ``erfi``
    itself overflows.
    """
    wr, wi = wofz_parts(a, b)
    phase = 2.0 * a * b
    return jnp.exp(-(b**2)) * (wi * jnp.cos(phase) + wr * jnp.sin(phase))

"""Electron-impact reaction-rate tables for the discharge solver.

The reference's solver (HallThruster.jl, external Julia) ships tabulated
Maxwellian-averaged rate coefficients; here we *generate* equivalent tables at
import time (NumPy, float64) and look them up at runtime with a uniform-grid
linear interpolation in log10(Te) — pure gather + fma, VPU-friendly.

Sources for the closed forms (public literature, not reference code):
  - Xe single ionization & excitation: Goebel & Katz, "Fundamentals of Electric
    Propulsion", 2nd ed., Appendix E Maxwellian-averaged fits.
  - Higher charge states & Krypton: Lotz empirical ionization cross-section
    (W. Lotz, Z. Physik 216, 241 (1968)) numerically Maxwellian-averaged here.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from hallthrusterpem_tpu.constants import ELECTRON_MASS, FUNDAMENTAL_CHARGE

# Te grid for all tables: log-spaced, clamped lookup
TE_MIN, TE_MAX, N_TABLE = 0.3, 150.0, 256
_LOG_TE = np.linspace(np.log10(TE_MIN), np.log10(TE_MAX), N_TABLE)
TE_GRID = 10.0**_LOG_TE


@dataclass(frozen=True)
class Reaction:
    """One electron-impact reaction: source charge state -> target charge state."""

    z_from: int
    z_to: int
    energy_eV: float  # threshold / energy cost per event
    table: tuple  # rate coefficients on TE_GRID (m^3/s), as tuple for hashability
    log_poly: tuple = ()  # ln k = polyval(log_poly, ln Te) — the smooth ground truth


_K_FLOOR = 1e-32  # m^3/s — rates below this are physically negligible


def fit_log_poly(table: np.ndarray, degree: int = 10) -> np.ndarray:
    """Fit ln(k) as a polynomial in ln(Te) over TE_GRID (floored at _K_FLOOR).

    The smooth fit *is* the canonical rate model: the lookup table is resampled
    from it, so the table-interpolation (lax) path and the closed-form polynomial
    (Pallas kernel) path agree to interpolation error by construction.
    """
    x = np.log(TE_GRID)
    y = np.log(np.maximum(np.asarray(table, dtype=np.float64), _K_FLOOR))
    return np.polyfit(x, y, degree)


def _resample(coeffs: np.ndarray) -> np.ndarray:
    return np.exp(np.polyval(coeffs, np.log(TE_GRID)))


def _maxwellian_rate(sigma_fn, Te_eV: np.ndarray) -> np.ndarray:
    """< sigma(E) v > over a Maxwellian EEDF with temperature Te (eV).

    k(Te) = sqrt(8 e Te / (pi m_e)) * \\int_0^inf sigma(x Te) x exp(-x) dx  with x = E/Te.
    Computed by fixed Gauss-Laguerre-like quadrature on a log grid (adequate to <1%).
    """
    x = np.linspace(1e-4, 40.0, 4000)  # E/Te
    dx = x[1] - x[0]
    out = np.zeros_like(Te_eV)
    for i, Te in enumerate(Te_eV):
        E = x * Te
        integrand = sigma_fn(E) * x * np.exp(-x)
        vbar = np.sqrt(8 * FUNDAMENTAL_CHARGE * Te / (np.pi * ELECTRON_MASS))
        out[i] = vbar * np.sum(integrand) * dx
    return out


def _lotz_sigma(P_eV: float, q: int, a: float = 4.0e-18, b: float = 0.6, c: float = 0.56):
    """Lotz empirical ionization cross-section (m^2). ``P_eV`` threshold, ``q``
    equivalent outer-shell electrons."""

    def sigma(E):
        E = np.asarray(E, dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            s = a * q * np.log(np.maximum(E / P_eV, 1.0)) / (E * P_eV) * (
                1.0 - b * np.exp(-c * (E / P_eV - 1.0))
            )
        return np.where(E > P_eV, np.maximum(s, 0.0), 0.0)

    return sigma


def _goebel_katz_iz_rate(Te: np.ndarray) -> np.ndarray:
    """Xe single-ionization Maxwellian rate, m^3/s: Goebel & Katz App. E fit at low
    Te, smoothly blended into a Lotz-averaged rate above ~30 eV (the G&K quadratic
    goes negative above ~43 eV, so it must not be used there)."""
    vbar = np.sqrt(8 * FUNDAMENTAL_CHARGE * Te / (np.pi * ELECTRON_MASS))
    poly = 3.97 + 0.643 * Te - 0.0368 * Te**2
    gk = 1e-20 * np.maximum(poly, 0.0) * np.exp(-12.127 / Te) * vbar
    lotz = _maxwellian_rate(_lotz_sigma(12.1298, 6), TE_GRID if Te is TE_GRID else Te)
    w = np.clip((Te - 10.0) / 8.0, 0.0, 1.0)
    return (1.0 - w) * gk + w * lotz


def _goebel_katz_ex_rate(Te: np.ndarray) -> np.ndarray:
    """Xe effective excitation Maxwellian rate fit (Goebel & Katz App. E), m^3/s."""
    vbar = np.sqrt(8 * FUNDAMENTAL_CHARGE * Te / (np.pi * ELECTRON_MASS))
    return 1.93e-19 * np.exp(-11.6 / Te) / np.sqrt(Te) * vbar


_EX_ENERGY = {"Xenon": 8.32, "Krypton": 9.915}

# ionization thresholds (eV)
_IZ_ENERGY = {
    "Xenon": {1: 12.1298, 2: 20.975, 3: 31.05},
    "Krypton": {1: 13.9996, 2: 24.36, 3: 36.95},
}
# equivalent outer-shell electrons for the Lotz formula
_LOTZ_Q = {0: 6, 1: 5, 2: 4}


def build_reactions(propellant: str, ncharge: int) -> list[Reaction]:
    """All ionization reactions among charge states 0..ncharge for a propellant."""
    E = _IZ_ENERGY[propellant]
    reactions: list[Reaction] = []
    for z_from in range(0, ncharge):
        for z_to in range(z_from + 1, ncharge + 1):
            # total energy cost = sum of successive thresholds
            cost = sum(E[z] for z in range(z_from + 1, z_to + 1))
            if z_from == 0 and z_to == 1 and propellant == "Xenon":
                raw = _goebel_katz_iz_rate(TE_GRID)
            else:
                # direct multi-ionization is suppressed ~5x per extra electron removed
                scale = 0.2 ** (z_to - z_from - 1)
                q = _LOTZ_Q.get(z_from, 3)
                raw = scale * _maxwellian_rate(_lotz_sigma(cost, q, b=0.6 if z_from == 0 else 0.0), TE_GRID)
            coeffs = fit_log_poly(raw)
            table = _resample(coeffs)
            reactions.append(
                Reaction(z_from, z_to, cost, tuple(float(v) for v in table),
                         tuple(float(c) for c in coeffs))
            )
    return reactions


def excitation_table(propellant: str) -> tuple[np.ndarray, float]:
    """(rate table on TE_GRID, energy per event in eV) for effective excitation.
    Table is resampled from the smooth log-poly fit (see :func:`fit_log_poly`)."""
    if propellant == "Xenon":
        raw = _goebel_katz_ex_rate(TE_GRID)
        E = _EX_ENERGY["Xenon"]
    else:
        E = _EX_ENERGY.get(propellant, 10.0)
        raw = _maxwellian_rate(_lotz_sigma(E, 6), TE_GRID) * 2.0
    return _resample(fit_log_poly(raw)), E


def excitation_log_poly(propellant: str) -> tuple[np.ndarray, float]:
    """(log-poly coefficients, energy per event) — kernel-path twin of
    :func:`excitation_table`."""
    if propellant == "Xenon":
        raw = _goebel_katz_ex_rate(TE_GRID)
        E = _EX_ENERGY["Xenon"]
    else:
        E = _EX_ENERGY.get(propellant, 10.0)
        raw = _maxwellian_rate(_lotz_sigma(E, 6), TE_GRID) * 2.0
    return fit_log_poly(raw), E


# Electron-neutral elastic momentum-transfer rate (m^3/s): constant Landmark-style
# value is a decent Xe approximation over 1-50 eV.
K_EN = {"Xenon": 2.5e-13, "Krypton": 1.8e-13, "Argon": 1.0e-13}


def lookup_rate(table, Te):
    """Linear interpolation of a TE_GRID table at electron temperature Te (eV).
    Uniform grid in log10(Te) -> index arithmetic only (no searchsorted)."""
    table = jnp.asarray(table)
    logt = jnp.log10(jnp.clip(Te, TE_MIN, TE_MAX))
    pos = (logt - _LOG_TE[0]) / (_LOG_TE[1] - _LOG_TE[0])
    idx = jnp.clip(pos.astype(jnp.int32), 0, N_TABLE - 2)
    frac = pos - idx
    return table[idx] * (1 - frac) + table[idx + 1] * frac


def dlnk_dlnTe_poly(log_poly, degree: int | None = None) -> np.ndarray:
    """Coefficients of d(ln k)/d(ln Te) — the derivative of the canonical
    ``ln k = polyval(log_poly, ln Te)`` fit. Used to linearize the inelastic
    energy sink implicitly in the electron-energy solve: dk/dTe = k * p'(lnTe)/Te.

    ``degree`` optionally REFITS the derivative at a lower degree (a deg-5
    refit is within 0.7% over TE_GRID and saves ~4 Horner FMAs per reaction
    per step) — measured to perturb crude-config trajectories enough to flip
    marginal runs across the physicality guards, so the exact polyder stays
    the default."""
    d = np.polyder(np.asarray(log_poly, dtype=np.float64))
    if degree is None or degree >= len(d) - 1:
        return d
    x = np.log(TE_GRID)
    return np.polyfit(x, np.polyval(d, x), degree)


def derivative_table(reaction_or_coeffs) -> np.ndarray:
    """``d(ln k)/d(ln Te)`` sampled on TE_GRID (lax-path lookup twin of
    :func:`dlnk_dlnTe_poly`)."""
    coeffs = getattr(reaction_or_coeffs, "log_poly", reaction_or_coeffs)
    return np.polyval(dlnk_dlnTe_poly(coeffs), np.log(TE_GRID))

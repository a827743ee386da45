"""Semi-empirical ion-current-density plume model: two-Gaussian beam + charge-exchange
background over a 90-degree sweep.

Behavioral parity with reference ``src/hallmd/models/plume.py:21-159``, re-derived
for TPU: the reference's complex ``scipy.special.erfi`` normalization
(``plume.py:63-85``) reduces to the real, bounded combination
``exp(-a^2)(erfi(a) - Re erfi(a+ib))`` with ``a = alpha/2``, ``b = pi/(2 alpha)``
(see :mod:`hallthrusterpem_tpu.ops.special`), so the whole model is real
float32-safe elementwise math + one fixed-weight Simpson contraction — fully
jittable and batched.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hallthrusterpem_tpu.constants import TORR_2_PA
from hallthrusterpem_tpu.core.dataset import Dataset
from hallthrusterpem_tpu.ops.integrate import simpson_weights
from hallthrusterpem_tpu.ops.special import exp_neg_asq_re_erfi, exp_neg_sq_erfi

__all__ = ["current_density"]

_N_ANGLES = 91
_ALPHA_RAD = np.linspace(0.0, np.pi / 2, _N_ANGLES)
_SIMPSON_W = simpson_weights(_ALPHA_RAD)


def _gaussian_norm(alpha):
    """Normalization ``(pi^{3/2}/2) * alpha * exp(-(alpha/2)^2) * C(alpha)`` such that
    the solid-angle integral of ``exp(-(theta/alpha)^2)`` over the forward hemisphere
    equals 1/norm — the reference's erfi combination (``plume.py:64-85``), computed in
    overflow-free form."""
    a = alpha / 2.0
    b = np.pi / (2.0 * alpha)
    combo = 2.0 * (exp_neg_sq_erfi(a) - exp_neg_asq_re_erfi(a, b))
    return (np.pi ** 1.5 / 2.0) * alpha * combo


def current_density(inputs: Dataset, sweep_radius=1.0) -> Dataset:
    """Compute ion current density ``j_ion`` over a 91-point sweep (0-90 deg, 1-deg
    steps, angles returned in ``j_ion_coords`` in radians) plus plume divergence angle.

    :param inputs: arrays with common leading (batch) shape — ``P_b`` (Torr),
        fit coefficients ``c0..c5``, ``sigma_cex`` (m^2), ``I_B0`` (A); optional
        ``T`` (N) enables corrected thrust output ``T_c``.
    :param sweep_radius: radial sweep location(s) in m; if multiple, ``j_ion`` gains a
        trailing radius axis ``(..., 91, R)``.
    :returns: ``{'j_ion', 'div_angle', 'j_ion_coords'[, 'T_c']}``
    """
    P_B = jnp.asarray(inputs["P_b"]) * TORR_2_PA
    c0 = jnp.asarray(inputs["c0"])
    c1 = jnp.asarray(inputs["c1"])
    c2 = jnp.asarray(inputs["c2"])
    c3 = jnp.asarray(inputs["c3"])
    c4 = jnp.asarray(inputs["c4"])
    c5 = jnp.asarray(inputs["c5"])
    sigma_cex = jnp.asarray(inputs["sigma_cex"])
    I_B0 = jnp.asarray(inputs["I_B0"])
    thrust = inputs.get("T", None)

    radii = jnp.atleast_1d(jnp.asarray(sweep_radius, dtype=P_B.dtype))
    single_radius = radii.shape[0] == 1
    alpha_rad = jnp.asarray(_ALPHA_RAD, dtype=P_B.dtype)

    # broadcast batch inputs to a common loop shape
    batch = jnp.broadcast_shapes(
        jnp.shape(P_B), jnp.shape(c0), jnp.shape(c1), jnp.shape(c2), jnp.shape(c3),
        jnp.shape(c4), jnp.shape(c5), jnp.shape(sigma_cex), jnp.shape(I_B0),
    )
    bc = lambda x: jnp.broadcast_to(jnp.asarray(x, dtype=P_B.dtype), batch)
    P_B, c0, c1, c2, c3, c4, c5, sigma_cex, I_B0 = map(bc, (P_B, c0, c1, c2, c3, c4, c5, sigma_cex, I_B0))

    n = c4 * P_B + c5  # facility neutral density (m^-3)

    alpha1 = jnp.minimum(c2 * P_B + c3, jnp.pi / 2)  # main-beam divergence (rad)
    valid = alpha1 > 0
    alpha1_safe = jnp.where(valid, alpha1, 0.1)  # keep normalization finite off-branch
    alpha2 = alpha1_safe / c1  # scattered-beam divergence (rad)

    A1 = (1 - c0) / _gaussian_norm(alpha1_safe)
    A2 = c0 / _gaussian_norm(alpha2)

    # expand to (..., angles, radii)
    ex = lambda x: x[..., None, None]
    decay = jnp.exp(-radii * ex(n) * ex(sigma_cex))  # (..., 1, R)
    j_cex = ex(I_B0) * (1 - decay) / (2 * jnp.pi * radii**2)
    base = ex(I_B0) * decay / radii**2
    ang = alpha_rad[..., None]  # (91, 1)
    j_beam = base * ex(A1) * jnp.exp(-((ang / ex(alpha1_safe)) ** 2))
    j_scat = base * ex(A2) * jnp.exp(-((ang / ex(alpha2)) ** 2))
    j_ion = j_beam + j_scat + j_cex  # (..., 91, R)

    # invalid cases: alpha1 <= 0 or any nonpositive density -> flat 1e-20 floor
    # (mask semantics replacing the reference's in-place assignment, plume.py:104-107)
    valid = valid & jnp.all(j_ion > 0, axis=(-1, -2))
    j_ion = jnp.where(valid[..., None, None], j_ion, 1e-20)

    # divergence angle: first moment of the flipped non-CEX profile (plume.py:113-127)
    w = jnp.asarray(_SIMPSON_W, dtype=P_B.dtype)
    j_non_cex = jnp.flip(j_beam + j_scat, axis=-2)
    den_igd = j_non_cex * jnp.cos(ang)
    num_igd = den_igd * jnp.sin(ang)
    num = jnp.tensordot(jnp.moveaxis(num_igd, -2, -1), w, axes=[[-1], [0]])  # (..., R)
    den = jnp.tensordot(jnp.moveaxis(den_igd, -2, -1), w, axes=[[-1], [0]])
    cos_div = num / den
    cos_div = jnp.where(jnp.isfinite(cos_div), cos_div, jnp.nan)
    div_angle = jnp.arccos(jnp.clip(cos_div, -1.0, 1.0))
    div_angle = jnp.where(jnp.isnan(cos_div), jnp.nan, div_angle)

    if single_radius:
        j_ion = jnp.squeeze(j_ion, axis=-1)
        div_angle = jnp.squeeze(div_angle, axis=-1)

    out: Dataset = {"j_ion": j_ion, "div_angle": div_angle}

    if thrust is not None:
        T_c = jnp.asarray(thrust)[..., None] * cos_div
        out["T_c"] = jnp.squeeze(T_c, axis=-1) if single_radius else T_c

    # per-sample coordinate grids (the "{var}_coords" convention, SURVEY.md §5.7)
    out["j_ion_coords"] = jnp.broadcast_to(alpha_rad, batch + (_N_ANGLES,))
    return out

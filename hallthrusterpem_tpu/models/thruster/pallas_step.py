"""Pallas TPU kernel: fused discharge-solver timestep.

One kernel invocation advances a whole batch tile of discharges by one timestep —
heavy-species boundary conditions, upwind/HLLE fluxes, ionization/excitation
sources (closed-form log-polynomial rate fits — pure fma, no gathers), the
Ohm's-law current/field sweep (lane reductions), and the implicit electron-energy
tridiagonal solve (in-lane parallel cyclic reduction) — all in VMEM, writing state
back to HBM once per step instead of once per XLA fusion boundary. This is the
"Pallas kernels for flux and source evaluation" of the north-star design
(BASELINE.json), replacing the body of the pure-lax step in ``solver.py``.

Layout: arrays are (TILE_B, 256) float32 — batch on sublanes, cells on lanes
(NC <= 254 padded to 256, the last ghost cell parked at lane NC-1). Neighbor
access is `pltpu.roll` along lanes + index masks; per-sample scalars ride in a
packed (TILE_B, 128) block.

Correctness contract: bit-comparable (to f32 tolerance) with ``solver.py``'s lax
step — enforced by ``tests/test_pallas.py`` in interpret mode.
"""

from __future__ import annotations

import logging
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hallthrusterpem_tpu.constants import ELECTRON_MASS, FUNDAMENTAL_CHARGE
from hallthrusterpem_tpu.models.thruster.config import SolverConfig
from hallthrusterpem_tpu.models.thruster.rates import (
    K_EN,
    build_reactions,
    excitation_log_poly,
)
from hallthrusterpem_tpu.models.thruster.solver import anomalous_profile, wall_energy_loss_rate

_E = FUNDAMENTAL_CHARGE
_ME = ELECTRON_MASS

LANES = 256  # maximum lane width (254-cell configs)
TILE_B = 8  # minimum batch-tile height (one f32 vreg of sublanes)


def lanes_for(cfg) -> int:
    """Lane width of the kernel layout for a config. f32 vregs are 128 lanes
    wide, so grids with nc <= 126 run the whole solve in half the data volume
    (every fidelity-(0,*) surrogate-training eval: 100 cells -> 102 lanes)."""
    return 128 if cfg.nc <= 126 else LANES


def tile_b_for(batch: int) -> int:
    """Batch-tile height. The kernel is dominated by Mosaic per-instruction
    overhead on tiny (8, 256) tiles, not by VPU data throughput — taller tiles
    amortize it (round-4 on-chip sweep, runs/r4/kernel_profile.json: 139/112/
    100/99/98/98 us/step at tile 16/32/48/64/96/128, B=1024 full physics;
    K-block HBM traffic is 0.9% of v5e peak, so the kernel is compute/issue-
    bound and the plateau is the VPU, not bandwidth). 64 is the default: the
    plateau value with 2x VMEM headroom vs 128.
    ``HTPEM_TILE_B`` overrides for perf experiments."""
    env = os.environ.get("HTPEM_TILE_B")
    if env:
        tb = int(env)
        if tb <= 0 or tb % 8:
            # a non-multiple-of-8 sublane tile fails Mosaic lowering with an
            # opaque error much later — reject it at the source
            raise ValueError(f"HTPEM_TILE_B={env}: batch tile must be a positive multiple of 8")
        return tb
    if batch >= 64:
        return 64
    return 32 if batch > 16 else TILE_B

# per-sample scalar slots in the packed params block (_P_RC: cathode-line series
# resistance [Ohm]; _P_LDT: L/dt [Ohm] — the circuit filter's backward-Euler terms)
_P_DV, _P_MDOT, _P_UN, _P_CW, _P_TECATH, _P_TANDIV, _P_RC, _P_LDT = range(8)
_N_SCALARS = 8


def _poly_eval(coeffs: np.ndarray, x):
    if len(coeffs) == 1:
        return jnp.full_like(x, coeffs[0])
    out = coeffs[0] * x + coeffs[1]  # fold the zeros-init into the first Horner step
    for c in coeffs[2:]:
        out = out * x + c
    return out


def _lane_iota(shape, dtype=jnp.int32):
    return jax.lax.broadcasted_iota(dtype, shape, dimension=1)


def _roll(x, shift: int):
    """x shifted so out[:, i] = x[:, i - shift] (circular roll along lanes;
    pltpu.roll only accepts non-negative shifts)."""
    return pltpu.roll(x, shift % x.shape[-1], axis=1)


def make_physics(cfg: SolverConfig, sanitize: bool = True):
    """Build the pure single-timestep physics function over (TILE_B, LANES) values
    (the kernel wrappers — one-step and K-step — both call this).

    ``sanitize=False`` drops the per-step NaN/range scrub (the K-step kernel
    scrubs once per block instead — an identity for healthy states, ~10% fewer
    VPU passes)."""
    NC = cfg.nc
    if NC > LANES - 2:
        raise ValueError(f"num_cells={cfg.num_cells} exceeds the {LANES}-lane kernel layout")
    LN = lanes_for(cfg)
    Z = cfg.ncharge
    G = cfg.neutral_groups
    if G not in (1, 2):
        raise NotImplementedError(f"neutral_groups={G}: kernel supports 1 or 2")
    dz = cfg.dz
    dt = cfg.dt
    mi = cfg.mi
    A_ch = cfg.geometry.channel_area
    gap = cfg.geometry.channel_gap
    a_i = float(np.sqrt(1.380649e-23 * cfg.ion_temp_K / mi))
    zq = [float(z) for z in range(1, Z + 1)]
    k_en = K_EN.get(cfg.propellant, 2.5e-13)

    reactions = build_reactions(cfg.propellant, Z)
    rxn_coeffs = [(np.asarray(r.log_poly), r.z_from, r.z_to, r.energy_eV) for r in reactions]
    ex_coeffs, ex_energy = excitation_log_poly(cfg.propellant)
    if cfg.implicit_inelastic:
        from hallthrusterpem_tpu.models.thruster.rates import dlnk_dlnTe_poly

        rxn_dcoeffs = [dlnk_dlnTe_poly(c) for c, *_ in rxn_coeffs]
        ex_dcoeffs = dlnk_dlnTe_poly(ex_coeffs)

    rho_floor = float(1e10 * mi)
    ne_floor = cfg.ne_floor
    # strength-reduced constants: the VPU is the bottleneck and divisions cost
    # several multiplies each, so every divide-by-constant becomes a multiply
    inv_mi = 1.0 / mi
    inv_dz = 1.0 / dz
    inv_dt = 1.0 / dt

    def loop_invariants(shape, c_w, tan_div):
        """Everything the per-step physics uses that does NOT depend on the
        evolving state: lane masks, geometry, the static plume cone, and the
        c_w-scaled wall collisionality. The K-step kernel computes this ONCE
        before its ``fori_loop`` (the VPU is the bottleneck; Mosaic does not
        reliably hoist loop-invariant chains with divides out of the loop)."""
        fint = jnp.float32
        lane = _lane_iota(shape)
        interior = (lane >= 1) & (lane <= NC - 2)
        in_domain = lane <= NC - 1
        interior_f = interior.astype(fint)
        face_f = (lane <= NC - 2).astype(fint)

        z_cell = jnp.where(lane == 0, 0.0, (lane.astype(fint) - 0.5) * dz)
        z_cell = jnp.where(lane >= NC - 1, cfg.domain[1] - cfg.domain[0], z_cell)
        in_channel = (z_cell <= cfg.geometry.channel_length).astype(fint)
        nu_ew = (cfg.electron_wall_losses * cfg.wall_momentum_scale * 1e7) * c_w * in_channel

        pre = {
            "lane": lane, "interior": interior, "in_domain": in_domain,
            "interior_f": interior_f, "face_f": face_f,
            "z_cell": z_cell, "in_channel": in_channel, "nu_ew": nu_ew,
        }
        if cfg.solve_plume:
            # STATIC per-sample expansion cone of slope tan_div — time-independent
            # stream-tube area ratio AR(z) from the lane coordinate, no extra state
            tand = jnp.clip(tan_div, 0.0, 2.0)
            drz = tand * jnp.maximum(z_cell - cfg.geometry.channel_length, 0.0)
            r_o = cfg.geometry.outer_radius + drz
            r_i_pl = jnp.maximum(cfg.geometry.inner_radius - drz, 0.0)
            AR = (r_o * r_o - r_i_pl * r_i_pl) * (
                1.0 / (cfg.geometry.outer_radius**2 - cfg.geometry.inner_radius**2)
            )
            inv_AR = 1.0 / AR
            # face area ratios (face i sits between cells i, i+1) and the
            # geometric log-derivative for the pressure-area momentum source
            AR_f = 0.5 * (AR + _roll(AR, -1))
            ARf_m = _roll(AR_f, 1)
            dlnA = (AR_f - ARf_m) * inv_dz * inv_AR * interior_f
            # QoI scale factors at the domain-end exit plane: exit fluxes cross
            # the expanded area A_ch*AR; thrust also projects by cos(divergence)
            ar_ex = AR[:, NC - 2][:, None]
            qs_f = ar_ex
            if cfg.apply_thrust_divergence_correction:
                qs_t = ar_ex * jax.lax.rsqrt(1.0 + tand * tand)
            else:
                qs_t = ar_ex
            pre.update(AR=AR, inv_AR=inv_AR, AR_f=AR_f, ARf_m=ARf_m, dlnA=dlnA,
                       wp=AR_f * inv_AR, wm=ARf_m * inv_AR, qs_t=qs_t, qs_f=qs_f)
        return pre

    def physics(rho_n, nE, rho_i, mom_i, nu_anom, omega_ce, dV, mdot_in, u_n, c_w, te_cath,
                tan_div, rc, l_dt, i_prev, u_i_pre=None, pre=None, rho_n2=None):
        if pre is None:
            pre = loop_invariants(rho_n.shape, c_w, tan_div)
        lane = pre["lane"]
        interior = pre["interior"]
        in_domain = pre["in_domain"]
        fint = jnp.float32
        interior_f = pre["interior_f"]
        z_cell = pre["z_cell"]
        in_channel = pre["in_channel"]
        rho_i = list(rho_i)
        mom_i = list(mom_i)

        if sanitize:
            rho_n, nE, rho_i, mom_i = sanitize_state(cfg, rho_n, nE, rho_i, mom_i)
            if G == 2:
                rho_n2, _, _, _ = sanitize_state(cfg, rho_n2, nE, (), ())

        # ---- plasma properties
        ni = [r * inv_mi for r in rho_i]
        ne = ni[0] * zq[0]
        for z in range(1, Z):
            ne = ne + zq[z] * ni[z]
        ne = jnp.maximum(ne, ne_floor)
        inv_ne = 1.0 / ne
        Te = jnp.clip((2.0 / 3.0) * nE * inv_ne, cfg.Te_min, cfg.Te_max)
        if G == 2:
            # neutral velocity-space quadrature (mirrors solver.py:205-216,320-323):
            # group speeds are fixed ratios of u_n; ionization consumption is
            # split by density share; the momentum-source speed is share-weighted
            nn_g0 = rho_n * inv_mi
            nn_g1 = rho_n2 * inv_mi
            nn = jnp.maximum(nn_g0 + nn_g1, 1e6)
            inv_nn = 1.0 / nn
            share0 = nn_g0 * inv_nn
            share1 = nn_g1 * inv_nn
            u_g0 = cfg.slow_neutral_ratio * u_n
            u_g1 = cfg.fast_neutral_ratio * u_n
            u_n_src = share0 * u_g0 + share1 * u_g1
        else:
            nn = jnp.maximum(rho_n * inv_mi, 1e6)
            u_n_src = u_n
        # the K-step kernel threads the previous step's post-update velocities
        # through the carry (u_i_pre) so the divide happens once per step
        if u_i_pre is None:
            u_i = [m / jnp.maximum(r, rho_floor) for m, r in zip(mom_i, rho_i)]
        else:
            u_i = list(u_i_pre)

        # ---- collisions & mobility
        lnTe = jnp.log(Te)
        lnL = jnp.clip(23.0 - 0.5 * jnp.log(ne * 1e-6) + 1.5 * lnTe, 2.0, 30.0)
        rs_te = jax.lax.rsqrt(Te)
        nu_ei = 2.9e-12 * ne * lnL * (rs_te * rs_te * rs_te)  # Te^-1.5 sans exp
        nu_e = k_en * nn + nu_ei + nu_anom + pre["nu_ew"]
        # mu = (e/me)/nu / (1+(w/nu)^2) == (e/me) nu/(nu^2+w^2): one divide
        mu = (_E / _ME) * nu_e / (nu_e * nu_e + omega_ce * omega_ce)

        # ---- quasi-1D plume expansion (mirrors solver.py's solve_plume block):
        # static cone geometry precomputed in loop_invariants
        if cfg.solve_plume:
            AR = pre["AR"]
            inv_AR = pre["inv_AR"]
            AR_f = pre["AR_f"]
            ARf_m = pre["ARf_m"]
            dlnA = pre["dlnA"]
        else:
            AR = None
            inv_AR = 1.0

        # ---- Ohm's law (direct integration; lane reductions). j_d is the total
        # current / A_ch; the local circuit current density is j_d / AR(z).
        j_i = zq[0] * ni[0] * u_i[0]
        for z in range(1, Z):
            j_i = j_i + zq[z] * ni[z] * u_i[z]
        j_i = _E * j_i
        pe = ne * Te
        grad_pe = (_roll(pe, -1) - _roll(pe, 1)) * (0.5 * inv_dz)
        grad_pe = jnp.where(lane == 0, (_roll(pe, -1) - pe) * inv_dz, grad_pe)
        grad_pe = jnp.where(lane == NC - 1, (pe - _roll(pe, 1)) * inv_dz, grad_pe)
        grad_pe = jnp.where(in_domain, grad_pe, 0.0)
        inv_enmu = 1.0 / (_E * ne * mu)
        gpe_ne = grad_pe * inv_ne
        num_igd = (j_i * inv_enmu + gpe_ne) * interior_f
        den_igd = (inv_AR * inv_enmu * interior_f) if cfg.solve_plume else (inv_enmu * interior_f)
        num_int = jnp.sum(num_igd, axis=1, keepdims=True) * dz
        # discharge-circuit RL filter in the float32-safe INCREMENTAL form
        # (mirrors solver.py: j = j_prev + residual / (den + (R + L/dt) A_ch))
        i_prev = jnp.clip(i_prev, -1e4, 1e4)
        den_pl = jnp.sum(den_igd, axis=1, keepdims=True) * dz + rc * A_ch
        den_all = den_pl + l_dt * A_ch
        j_prev = i_prev * (1.0 / A_ch)
        j_d = j_prev + (dV + num_int - j_prev * den_pl) / den_all
        if cfg.anode_sheath:
            # electron-repelling anode sheath (mirrors solver.py): per-row scalars
            ne1 = ne[:, 1][:, None]
            Te1 = Te[:, 1][:, None]
            j_i1 = j_i[:, 1][:, None]
            j_e_th = _E * ne1 * jnp.sqrt(_E * Te1 / (2.0 * np.pi * _ME))
            j_e_req = jnp.maximum(j_d - j_i1, 1e-6 * j_e_th)
            phi_s = jnp.clip(Te1 * jnp.log(j_e_th / j_e_req), 0.0, 0.5 * jnp.abs(dV))
            j_d = j_prev + (dV - phi_s + num_int - j_prev * den_pl) / den_all
        j_d_loc = j_d * inv_AR if cfg.solve_plume else j_d  # local circuit current density
        E_z = (j_d_loc - j_i) * inv_enmu - gpe_ne

        # ---- heavy-species ghost cells
        u_bohm1 = jnp.sqrt(_E * Te[:, 1][:, None] / mi)  # (B,1) at first interior cell
        mom_back = jnp.zeros_like(dV)
        for z in range(Z):
            mom_back = mom_back + jnp.minimum(mom_i[z][:, 1][:, None], 0.0)
        if G == 2:
            # injected flux split over the groups; anode-recycled ion backflow
            # re-enters the slow group (solver.py:372-375)
            fr = cfg.fast_neutral_fraction
            rho_n_l = ((1.0 - fr) * (mdot_in / A_ch) - mom_back) / u_g0
            rho_n2_l = (fr * (mdot_in / A_ch)) / u_g1
            rho_n2_b = jnp.where(lane == 0, rho_n2_l, rho_n2)
            rho_n2_b = jnp.where(lane == NC - 1, _roll(rho_n2, 1), rho_n2_b)
        else:
            rho_n_l = (mdot_in / A_ch - mom_back) / u_n
        rho_n_b = jnp.where(lane == 0, rho_n_l, rho_n)
        rho_n_b = jnp.where(lane == NC - 1, _roll(rho_n, 1), rho_n_b)

        rho_b, mom_b = [], []
        # trace-time constant (f32 arithmetic mirrors the former jnp.sqrt chain
        # bit-for-bit) — keeps the per-species sqrt/mul out of the Mosaic body
        bohm_c = [float(np.float32(-cfg.mdot_bohm_fraction)
                        * np.sqrt(np.float32(z_), dtype=np.float32)) for z_ in zq]
        for z in range(Z):
            u_gl = jnp.minimum(u_i[z][:, 1][:, None], bohm_c[z] * u_bohm1)
            r_gl = rho_i[z][:, 1][:, None]
            rb = jnp.where(lane == 0, r_gl, rho_i[z])
            rb = jnp.where(lane == NC - 1, _roll(rho_i[z], 1), rb)
            mb = jnp.where(lane == 0, r_gl * u_gl, mom_i[z])
            mb = jnp.where(lane == NC - 1, _roll(mom_i[z], 1), mb)
            rho_b.append(rb)
            mom_b.append(mb)

        # ---- fluxes: F[:, i] = flux through face between cells i and i+1, with
        # MUSCL minmod reconstruction of primitives (mirrors solver.py)
        face_f = pre["face_f"]

        def minmod_slope(q):
            if not cfg.reconstruct:
                return jnp.zeros_like(q)
            dq_p = _roll(q, -1) - q  # forward difference (face i)
            dq_m = _roll(dq_p, 1)  # backward difference (face i-1) = dq_p at i-1
            s = 0.5 * (jnp.sign(dq_m) + jnp.sign(dq_p)) * jnp.minimum(jnp.abs(dq_m), jnp.abs(dq_p))
            return s * interior_f  # zero slope at boundary/ghost/pad lanes

        sl_rn = minmod_slope(rho_n_b)
        if G == 2:
            Fn = u_g0 * jnp.maximum(rho_n_b + 0.5 * sl_rn, rho_floor) * face_f
            sl_rn2 = minmod_slope(rho_n2_b)
            Fn2 = u_g1 * jnp.maximum(rho_n2_b + 0.5 * sl_rn2, rho_floor) * face_f
        else:
            Fn = u_n * jnp.maximum(rho_n_b + 0.5 * sl_rn, rho_floor) * face_f  # upwind, u_n > 0

        Fr, Fm = [], []
        for z in range(Z):
            u_b = mom_b[z] / jnp.maximum(rho_b[z], rho_floor)
            sl_r = minmod_slope(rho_b[z])
            sl_u = minmod_slope(u_b)
            rL = jnp.maximum(rho_b[z] + 0.5 * sl_r, rho_floor)
            # roll commutes with the lane-wise arithmetic: one roll of the
            # combined right state instead of two (round-5 op-count work)
            rR = jnp.maximum(_roll(rho_b[z] - 0.5 * sl_r, -1), rho_floor)
            uL = u_b + 0.5 * sl_u
            uR = _roll(u_b - 0.5 * sl_u, -1)
            mL, mR = rL * uL, rR * uR
            sL = jnp.minimum(jnp.minimum(uL - a_i, uR - a_i), 0.0)
            sR = jnp.maximum(jnp.maximum(uL + a_i, uR + a_i), 0.0)
            ds = jnp.maximum(sR - sL, 1e-8)
            FmL = mL * uL + rL * (a_i * a_i)
            FmR = mR * uR + rR * (a_i * a_i)
            inv_ds = face_f / ds
            Fr.append((sR * mL - sL * mR + sL * sR * (rR - rL)) * inv_ds)
            Fm.append((sR * FmL - sL * FmR + sL * sR * (mR - mL)) * inv_ds)

        if cfg.solve_plume:
            # quasi-1D divergence: (1/A) d(A F)/dz
            ddz = lambda F: ((F * AR_f) - _roll(F * AR_f, 1)) * inv_dz * inv_AR
        else:
            ddz = lambda F: (F - _roll(F, 1)) * inv_dz

        # ---- sources: closed-form rates (log-poly in ln Te), E-force, wall losses
        d_rho_n = jnp.zeros_like(rho_n)
        d_rho_n2 = jnp.zeros_like(rho_n) if G == 2 else None
        d_rho = [jnp.zeros_like(rho_n) for _ in range(Z)]
        d_mom = [jnp.zeros_like(rho_n) for _ in range(Z)]
        inelastic = jnp.zeros_like(rho_n)
        dinel_dTe = jnp.zeros_like(rho_n)
        inv_Te = 1.0 / Te
        for ri, (coeffs, z_from, z_to, energy) in enumerate(rxn_coeffs):
            k_r = jnp.exp(_poly_eval(coeffs, lnTe))
            n_from = nn if z_from == 0 else ni[z_from - 1]
            u_from = u_n_src if z_from == 0 else u_i[z_from - 1]
            dm = (ne * k_r) * n_from * mi
            if z_from == 0:
                if G == 2:
                    # consumption split over the velocity groups by density share
                    d_rho_n = d_rho_n - dm * share0
                    d_rho_n2 = d_rho_n2 - dm * share1
                else:
                    d_rho_n = d_rho_n - dm
            else:
                d_rho[z_from - 1] = d_rho[z_from - 1] - dm
                d_mom[z_from - 1] = d_mom[z_from - 1] - dm * u_from
            d_rho[z_to - 1] = d_rho[z_to - 1] + dm
            d_mom[z_to - 1] = d_mom[z_to - 1] + dm * u_from
            contrib = dm * (energy * inv_mi)
            inelastic = inelastic + contrib
            if cfg.implicit_inelastic:
                dinel_dTe = dinel_dTe + contrib * _poly_eval(rxn_dcoeffs[ri], lnTe) * inv_Te
        k_ex = jnp.exp(_poly_eval(ex_coeffs, lnTe))
        ex_contrib = (ne * k_ex) * nn * ex_energy
        inelastic = inelastic + ex_contrib
        if cfg.implicit_inelastic:
            dinel_dTe = dinel_dTe + ex_contrib * _poly_eval(ex_dcoeffs, lnTe) * inv_Te
            dinel_dTe = jnp.maximum(dinel_dTe, 0.0)

        for z in range(Z):
            d_mom[z] = d_mom[z] + zq[z] * _E * ni[z] * E_z
        if cfg.solve_plume:
            # geometric pressure source: static pressure pushes on the expanding
            # stream tube (+ p dlnA/dz; mirrors solver.py)
            for z in range(Z):
                d_mom[z] = d_mom[z] + rho_i[z] * (a_i * a_i) * dlnA
        if cfg.ion_wall_losses:
            sqrt_te = jnp.sqrt(_E * Te / mi)
            for z in range(Z):
                nu_iw = (0.6 * np.sqrt(zq[z]) / gap) * sqrt_te * in_channel
                d_rho[z] = d_rho[z] - nu_iw * rho_i[z]
                d_mom[z] = d_mom[z] - nu_iw * mom_i[z]
                # wall_recycling < 1: the non-returned fraction escapes radially
                # (mirrors solver.py's 1-D neutral-escape closure)
                d_rho_n = d_rho_n + cfg.wall_recycling * (nu_iw * rho_i[z])

        upd = lambda base, flux, src: base + (-dt) * ddz(flux) * interior_f + dt * src * interior_f
        rho_n_new = jnp.maximum(upd(rho_n_b, Fn, d_rho_n), rho_floor)
        if G == 2:
            rho_n2_new = jnp.maximum(upd(rho_n2_b, Fn2, d_rho_n2), rho_floor)
        rho_new = [jnp.maximum(upd(rho_b[z], Fr[z], d_rho[z]), rho_floor) for z in range(Z)]
        mom_new = [upd(mom_b[z], Fm[z], d_mom[z]) for z in range(Z)]

        # ---- electron energy: backward-Euler in Te, in-lane PCR
        ne_new = rho_new[0] * (inv_mi * zq[0])
        for z in range(1, Z):
            ne_new = ne_new + rho_new[z] * (zq[z] * inv_mi)
        ne_new = jnp.maximum(ne_new, ne_floor)

        Gamma_e = (j_i - j_d_loc) * (1.0 / _E)
        G_f = 0.5 * (Gamma_e + _roll(Gamma_e, -1))  # face f = between cells f, f+1
        kap = (10.0 / 9.0) * mu * ne * Te
        kf = (0.5 * inv_dz) * (kap + _roll(kap, -1))
        Gp = 2.5 * jnp.maximum(G_f, 0.0)
        Gn = 2.5 * jnp.minimum(G_f, 0.0)
        nu_eps = cfg.electron_wall_losses * wall_energy_loss_rate(
            Te, ne, in_channel, c_w, cfg, lnTe=lnTe, rs_te=rs_te)
        q_ohm = (j_d_loc - j_i) * E_z * (1.0 / _E)

        # row i uses faces f-=i-1 (roll +1) and f+=i; with the plume cone the
        # energy-flux divergence picks up AR_face / AR_cell weights
        Gp_m, Gn_m, kf_m = _roll(Gp, 1), _roll(Gn, 1), _roll(kf, 1)
        if cfg.solve_plume:
            wp = pre["wp"]
            wm = pre["wm"]
            sub = (-Gp_m - kf_m) * wm * inv_dz
            sup = (Gn - kf) * wp * inv_dz
            diag = ne_new * (1.5 * inv_dt + nu_eps * 1.5) + (
                (Gp + kf) * wp + (kf_m - Gn_m) * wm
            ) * inv_dz
        else:
            sub = (-Gp_m - kf_m) * inv_dz
            sup = (Gn - kf) * inv_dz
            diag = ne_new * (1.5 * inv_dt + nu_eps * 1.5) + (Gp - Gn_m + kf + kf_m) * inv_dz
        rhs = nE * inv_dt + q_ohm - inelastic
        if cfg.implicit_inelastic:
            # Newton linearization of the inelastic sink (mirrors solver.py)
            diag = diag + dinel_dTe
            rhs = rhs + dinel_dTe * Te
        # Dirichlet BCs folded into the first/last interior rows
        Te_bc_l = jnp.full_like(dV, cfg.anode_Te)
        rhs = jnp.where(lane == 1, rhs - sub * Te_bc_l, rhs)
        rhs = jnp.where(lane == NC - 2, rhs - sup * te_cath, rhs)
        sub = jnp.where(lane == 1, 0.0, sub)
        sup = jnp.where(lane == NC - 2, 0.0, sup)
        # identity rows outside the interior
        sub = jnp.where(interior, sub, 0.0)
        sup = jnp.where(interior, sup, 0.0)
        diag = jnp.where(interior, diag, 1.0)
        rhs = jnp.where(interior, rhs, 1.0)

        # PCR over lanes (8 levels for 256 lanes) in the ROW-NORMALIZED form:
        # each level keeps the diagonal at 1 (one reciprocal + three muls per
        # level) instead of carrying b and paying two divides + two extra rolls
        # (round-3 kernel-headroom work; ~10% of the step). A sublane-packed
        # variant (one roll serving all four coefficient arrays) was measured
        # slower at tile height 32 — the pack/unpack concats cost more data
        # movement than the rolls they save; see docs/validation.md.
        inv = 1.0 / diag
        a = sub * inv
        c = sup * inv
        d = rhs * inv
        k = 1
        # levels span the coupled interior block (identity rows beyond it)
        n_levels = max(1, int(np.ceil(np.log2(max(NC, 2)))))
        # No lane-validity masks (round-5 op-count work): after normalization,
        # level-l coefficients are (up to sign and b-rescaling) PRODUCTS of the
        # original sub/sup over a contiguous 2^l-row window, and sub is exactly
        # zero outside rows [2, NC-2] / sup outside [1, NC-3] — so any roll that
        # wraps past a boundary, or reads an identity pad row, is multiplied by
        # an exact 0.0. The where(valid, roll, 0) guards the round-3 kernel
        # carried were 6 selects + 2 compares per level of dead vector work
        # (~8% of the step's op count). Bit-identical to the masked form. The
        # final level's a/c updates (and their rolls) are dead and skipped.
        for lvl in range(n_levels):
            cm = _roll(c, k)
            ap = _roll(a, -k)
            dm_ = _roll(d, k)
            dp_ = _roll(d, -k)
            b_new = 1.0 - a * cm - c * ap
            d = d - a * dm_ - c * dp_
            rb = 1.0 / b_new
            d = d * rb
            if lvl < n_levels - 1:
                a = -a * _roll(a, k) * rb
                c = -c * _roll(c, -k) * rb
            k *= 2
        Te_new = d
        Te_new = jnp.where(lane == 0, Te_bc_l, Te_new)
        Te_new = jnp.where(lane >= NC - 1, te_cath, Te_new)
        Te_new = jnp.clip(Te_new, cfg.Te_min, cfg.Te_max)
        nE_new = 1.5 * ne_new * Te_new

        # QoI scale factors at the domain-end exit plane (see loop_invariants)
        if cfg.solve_plume:
            qs_t = pre["qs_t"]
            qs_f = pre["qs_f"]
        else:
            qs_t = jnp.ones_like(j_d)
            qs_f = qs_t

        state_out = (rho_n_new, nE_new, tuple(rho_new), tuple(mom_new))
        if G == 2:
            state_out = state_out + (rho_n2_new,)
        return state_out, (j_d, Te, ne, E_z, nn, qs_t, qs_f)

    physics.loop_invariants = loop_invariants
    return physics


def sanitize_state(cfg: SolverConfig, rho_n, nE, rho_i, mom_i):
    """NaN/range scrub of the heavy-species + energy state (solver.py contract)."""
    mi = cfg.mi
    rho_floor = float(1e10 * mi)
    sane = lambda x, lo, hi: jnp.clip(jnp.where(jnp.isfinite(x), x, lo), lo, hi)
    rho_n = sane(rho_n, rho_floor, 1e21 * mi)
    rho_i = [sane(r, rho_floor, 1e21 * mi) for r in rho_i]
    mom_i = [jnp.clip(jnp.where(jnp.isfinite(m), m, 0.0), -r * 3e5, r * 3e5)
             for m, r in zip(mom_i, rho_i)]
    nE = sane(nE, 1.0, 1e23)
    return rho_n, nE, list(rho_i), list(mom_i)


def n_state_for(cfg: SolverConfig) -> int:
    """Number of per-sample state arrays: rho_n, nE, (rho_i, mom_i) x Z, plus the
    fast-group neutral density (appended LAST to keep legacy indices) when
    ``neutral_groups == 2``."""
    return 2 + 2 * cfg.ncharge + (cfg.neutral_groups - 1)


#: scalar-block slots handed to make_physics, in signature order
_SCAL_SLOTS = (_P_DV, _P_MDOT, _P_UN, _P_CW, _P_TECATH, _P_TANDIV, _P_RC, _P_LDT)
#: one-step-kernel slot for the circuit-filter current state (the outer step body
#: rewrites it each launch; the K-step kernel rides it in the sacc block instead)
_P_ICIR = 8


def build_step_kernel(cfg: SolverConfig, interpret: bool = False, tile_b: int = TILE_B):
    """Build ``step(state, consts) -> (state', extras)`` where arrays are
    (B, LANES) with B a multiple of ``tile_b`` — ONE timestep per kernel launch."""
    Z = cfg.ncharge
    G = cfg.neutral_groups
    LN = lanes_for(cfg)
    TB = tile_b
    n_state = n_state_for(cfg)
    physics = make_physics(cfg)

    def kernel(*refs):
        (state_refs, (nu_anom_ref, omega_ref, scal_ref),
         out_refs, (jd_ref, te_ref, ne_ref, e_ref, nn_ref)) = (
            refs[:n_state], refs[n_state : n_state + 3],
            refs[n_state + 3 : 2 * n_state + 3], refs[2 * n_state + 3 :],
        )
        rho_n = state_refs[0][:, :]
        nE = state_refs[1][:, :]
        rho_i = tuple(state_refs[2 + 2 * z][:, :] for z in range(Z))
        mom_i = tuple(state_refs[3 + 2 * z][:, :] for z in range(Z))
        rho_n2 = state_refs[2 + 2 * Z][:, :] if G == 2 else None
        scal = tuple(scal_ref[:, s][:, None] for s in _SCAL_SLOTS)
        i_prev = scal_ref[:, _P_ICIR][:, None]

        state_out, (j_d, Te, ne, E_z, nn, qs_t, qs_f) = physics(
            rho_n, nE, rho_i, mom_i, nu_anom_ref[:, :], omega_ref[:, :], *scal, i_prev,
            rho_n2=rho_n2,
        )
        if G == 2:
            rho_n_new, nE_new, rho_new, mom_new, rho_n2_new = state_out
            out_refs[2 + 2 * Z][:, :] = rho_n2_new
        else:
            rho_n_new, nE_new, rho_new, mom_new = state_out

        out_refs[0][:, :] = rho_n_new
        out_refs[1][:, :] = nE_new
        for z in range(Z):
            out_refs[2 + 2 * z][:, :] = rho_new[z]
            out_refs[3 + 2 * z][:, :] = mom_new[z]
        # lane 0: j_d; lanes 1/2: the exit-plane QoI scale factors
        lane = _lane_iota((TB, LN))
        jd_ref[:, :] = jnp.where(lane == 1, qs_t, jnp.where(lane == 2, qs_f, j_d))
        te_ref[:, :] = Te
        ne_ref[:, :] = ne
        e_ref[:, :] = E_z
        nn_ref[:, :] = nn

    def step(state: dict, consts: dict):
        """state: dict of (B, LANES) arrays; consts: nu_anom/omega_ce (B, LANES),
        scalars (B, 128). Returns (state', extras dict)."""
        B = state["rho_n"].shape[0]
        grid = (B // TB,)
        tile = lambda: pl.BlockSpec((TB, LN), lambda i: (i, 0), memory_space=pltpu.VMEM)
        stile = pl.BlockSpec((TB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

        state_list = [state["rho_n"], state["nE"]]
        for z in range(Z):
            state_list += [state["rho_i"][z], state["mom_i"][z]]
        if G == 2:
            state_list.append(state["rho_n2"])

        n_out = n_state + 5
        out_shapes = [jax.ShapeDtypeStruct((B, LN), jnp.float32) for _ in range(n_out)]
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[tile() for _ in range(n_state)] + [tile(), tile(), stile],
            out_specs=[tile() for _ in range(n_out)],
            out_shape=out_shapes,
            interpret=interpret,
        )(*state_list, consts["nu_anom"], consts["omega_ce"], consts["scalars"])

        new_state = {
            "rho_n": outs[0],
            "nE": outs[1],
            "rho_i": [outs[2 + 2 * z] for z in range(Z)],
            "mom_i": [outs[3 + 2 * z] for z in range(Z)],
        }
        if G == 2:
            new_state["rho_n2"] = outs[2 + 2 * Z]
        extras = {
            "j_d": outs[n_state][:, 0],
            "qs_t": outs[n_state][:, 1],
            "qs_f": outs[n_state][:, 2],
            "Te": outs[n_state + 1],
            "ne": outs[n_state + 2],
            "E": outs[n_state + 3],
            "nn": outs[n_state + 4],
        }
        return new_state, extras

    return step


# accumulator scalar slots (lanes of the packed (TILE_B, 128) accumulator block).
# _A_ICIR carries the circuit-filter current state across K-blocks.
_A_THRUST, _A_ID, _A_ID2, _A_IB0, _A_MDOT, _A_UEXIT, _A_FAILED, _A_ICIR = range(8)
#: first of the per-inner-step I_d trace lanes (SET each step when tracing —
#: lanes 8..8+K-1 hold the CURRENT block's full-resolution discharge-current
#: history, emitted per block by the outer scan; requires inner_steps <= 120)
_A_TRACE0 = 8


def build_multistep_kernel(cfg: SolverConfig, inner_steps: int, interpret: bool = False,
                           tile_b: int = TILE_B, trace: bool = False):
    """K timesteps per kernel launch with state AND accumulators resident in VMEM
    (``jax.lax.fori_loop`` inside the kernel). HBM traffic drops from
    O(arrays * steps) to O(arrays * steps / K); accumulation is exact (same
    per-step gating as the host path).

    Returns ``stepK(state, prof, scal_acc, consts, i0) -> (state', prof', scal')``
    where ``prof`` packs [ui_z..., Te, ne, E, nn] as (B, LANES) running sums and
    ``scal_acc`` is the packed (B, 128) scalar-accumulator block.
    """
    Z = cfg.ncharge
    G = cfg.neutral_groups
    NC = cfg.nc
    LN = lanes_for(cfg)
    TB = tile_b
    n_state = n_state_for(cfg)
    n_prof = Z + 4
    mi = cfg.mi
    A_ch = cfg.geometry.channel_area
    a_i2 = 1.380649e-23 * cfg.ion_temp_K / mi
    rho_floor = float(1e10 * mi)
    physics = make_physics(cfg, sanitize=False)  # scrubbed once per K-block below
    exit_ix = NC - 2

    def kernel(*refs):
        i0_ref = refs[0]
        state_refs = refs[1 : 1 + n_state]
        prof_refs = refs[1 + n_state : 1 + n_state + n_prof]
        sacc_ref = refs[1 + n_state + n_prof]
        nu_anom_ref, omega_ref, scal_ref = refs[2 + n_state + n_prof : 5 + n_state + n_prof]
        out_state = refs[5 + n_state + n_prof : 5 + 2 * n_state + n_prof]
        out_prof = refs[5 + 2 * n_state + n_prof : 5 + 2 * n_state + 2 * n_prof]
        out_sacc = refs[5 + 2 * n_state + 2 * n_prof]

        i0 = i0_ref[0, 0]
        nu_anom = nu_anom_ref[:, :]
        omega = omega_ref[:, :]
        scal = tuple(scal_ref[:, s][:, None] for s in _SCAL_SLOTS)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (TB, 128), dimension=1)
        slot = lambda s: (lane128 == s).astype(jnp.float32)

        # loop-invariant masks/geometry: once per K-block, not once per step
        pre = physics.loop_invariants((TB, LN), scal[3], scal[5])
        # accumulator lane masks are loop-invariant too — Mosaic does not
        # reliably hoist the iota-compare chains out of the fori_loop body
        s_thrust, s_id, s_id2, s_ib0, s_mdot, s_uexit = (
            slot(_A_THRUST), slot(_A_ID), slot(_A_ID2),
            slot(_A_IB0), slot(_A_MDOT), slot(_A_UEXIT),
        )
        m_failed = lane128 == _A_FAILED
        m_icir = lane128 == _A_ICIR

        def body(k, carry):
            (rho_n, nE, rho_i, mom_i, u_i, prof, sacc, icir, rho_n2) = carry
            state_out, (j_d, Te, ne, E_z, nn, qs_t, qs_f) = physics(
                rho_n, nE, rho_i, mom_i, nu_anom, omega, *scal, icir, u_i_pre=u_i, pre=pre,
                rho_n2=rho_n2,
            )
            if G == 2:
                rho_n, nE, rho_i, mom_i, rho_n2 = state_out
            else:
                rho_n, nE, rho_i, mom_i = state_out
            # post-step velocities: shared by the profile/thrust accumulators here
            # and by the next iteration's physics (single divide per step)
            u_post = tuple(mom_i[z] / jnp.maximum(rho_i[z], rho_floor) for z in range(Z))
            i = i0 + k
            w = ((i >= cfg.avg_start_step) & (i < cfg.num_steps)).astype(jnp.float32)

            thrust = jnp.zeros((TB,), jnp.float32)
            I_B0 = jnp.zeros((TB,), jnp.float32)
            mdot_ion = jnp.zeros((TB,), jnp.float32)
            u1 = None
            new_prof = []
            for z in range(Z):
                r_ex = rho_i[z][:, exit_ix]
                m_ex = mom_i[z][:, exit_ix]
                u_ex = u_post[z][:, exit_ix]
                if z == 0:
                    u1 = u_ex
                thrust += A_ch * (m_ex * u_ex + r_ex * a_i2)
                I_B0 += (A_ch * _E * (z + 1) / mi) * r_ex * u_ex
                mdot_ion += A_ch * m_ex
                new_prof.append(prof[z] + w * u_post[z])
            if cfg.solve_plume:
                # exit fluxes cross the expanded area (thrust also cos-projected)
                thrust = thrust * qs_t[:, 0]
                I_B0 = I_B0 * qs_f[:, 0]
                mdot_ion = mdot_ion * qs_f[:, 0]
            I_d = j_d[:, 0] * A_ch
            for off, val in zip(range(4), (Te, ne, E_z, nn)):
                new_prof.append(prof[Z + off] + w * val)

            contrib = (
                s_thrust * (w * thrust)[:, None]
                + s_id * (w * I_d)[:, None]
                + s_id2 * (w * I_d * I_d)[:, None]
                + s_ib0 * (w * I_B0)[:, None]
                + s_mdot * (w * mdot_ion)[:, None]
                + s_uexit * (w * u1)[:, None]
            )
            failed_flag = 1.0 - jnp.isfinite(I_d).astype(jnp.float32)
            sacc = jnp.where(
                m_failed,
                jnp.maximum(sacc, failed_flag[:, None]),
                sacc + contrib,
            )
            # circuit-filter state: persist this step's current for the next block
            sacc = jnp.where(m_icir, I_d[:, None], sacc)
            if trace:
                # full-resolution I_d(t): SET lane _A_TRACE0 + k to this step's
                # current (overwrites the previous block's stale value)
                sacc = jnp.where(lane128 == _A_TRACE0 + k, I_d[:, None], sacc)
            return (rho_n, nE, rho_i, mom_i, u_post, tuple(new_prof), sacc, I_d[:, None],
                    rho_n2)

        # one scrub per K-block (identity for healthy states; physics runs lean).
        # A blow-up landing on the LAST step of the previous block would be
        # scrubbed here before physics ever sees it, so record a was-nonfinite
        # flag from the raw state and OR it into _A_FAILED (solver.py's
        # all-state isfinite semantics; see solver.py:194-210).
        raw_state = [state_refs[j][:, :] for j in range(n_state)]
        bad = jnp.zeros((TB,), jnp.float32)
        for x in raw_state:
            bad = jnp.maximum(bad, 1.0 - jnp.min(jnp.isfinite(x).astype(jnp.float32), axis=1))
        sacc0 = jnp.where(
            lane128 == _A_FAILED,
            jnp.maximum(sacc_ref[:, :], bad[:, None]),
            sacc_ref[:, :],
        )
        rn0, nE0, ri0, mi0 = sanitize_state(
            cfg,
            raw_state[0],
            raw_state[1],
            [raw_state[2 + 2 * z] for z in range(Z)],
            [raw_state[3 + 2 * z] for z in range(Z)],
        )
        rn2_0 = None
        if G == 2:
            rn2_0, _, _, _ = sanitize_state(cfg, raw_state[2 + 2 * Z], raw_state[1], (), ())
        carry0 = (
            rn0,
            nE0,
            tuple(ri0),
            tuple(mi0),
            tuple(m / jnp.maximum(r, rho_floor) for m, r in zip(mi0, ri0)),
            tuple(prof_refs[j][:, :] for j in range(n_prof)),
            sacc0,
            sacc0[:, _A_ICIR][:, None],
            rn2_0,
        )
        # manual unroll (lax.fori_loop(unroll=) is not lowered in Pallas TPU):
        # amortizes the Mosaic loop-management overhead over several physics
        # steps per trip. Requires inner_steps % unroll == 0.
        unroll = int(os.environ.get("HTPEM_UNROLL", "1"))
        if unroll > 1 and inner_steps % unroll:
            logging.getLogger("hallthrusterpem_tpu").warning(
                "HTPEM_UNROLL=%d ignored: inner_steps=%d is not a multiple", unroll, inner_steps)
        if unroll > 1 and inner_steps % unroll == 0:
            def body_u(j, carry):
                for u in range(unroll):
                    carry = body(j * unroll + u, carry)
                return carry

            final = jax.lax.fori_loop(0, inner_steps // unroll, body_u, carry0)
        else:
            final = jax.lax.fori_loop(0, inner_steps, body, carry0)
        rho_n, nE, rho_i, mom_i, _u, prof, sacc, _icir, rho_n2 = final

        out_state[0][:, :] = rho_n
        out_state[1][:, :] = nE
        for z in range(Z):
            out_state[2 + 2 * z][:, :] = rho_i[z]
            out_state[3 + 2 * z][:, :] = mom_i[z]
        if G == 2:
            out_state[2 + 2 * Z][:, :] = rho_n2
        for j in range(n_prof):
            out_prof[j][:, :] = prof[j]
        out_sacc[:, :] = sacc

    def stepK(state: dict, prof: list, sacc, consts: dict, i0):
        B = state["rho_n"].shape[0]
        grid = (B // TB,)
        tile = lambda: pl.BlockSpec((TB, LN), lambda i: (i, 0), memory_space=pltpu.VMEM)
        stile = lambda: pl.BlockSpec((TB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        itile = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

        state_list = [state["rho_n"], state["nE"]]
        for z in range(cfg.ncharge):
            state_list += [state["rho_i"][z], state["mom_i"][z]]
        if G == 2:
            state_list.append(state["rho_n2"])
        inputs = [jnp.asarray(i0, jnp.int32).reshape(1, 1)] + state_list + list(prof) + [sacc] + [
            consts["nu_anom"], consts["omega_ce"], consts["scalars"]
        ]
        out_shapes = (
            [jax.ShapeDtypeStruct((B, LN), jnp.float32) for _ in range(n_state + n_prof)]
            + [jax.ShapeDtypeStruct((B, 128), jnp.float32)]
        )
        # alias state/accumulator inputs to outputs: true in-place update, no copies
        aliases = {1 + j: j for j in range(n_state + n_prof)}
        aliases[1 + n_state + n_prof] = n_state + n_prof
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[itile] + [tile() for _ in range(n_state + n_prof)] + [stile()]
            + [tile(), tile(), stile()],
            out_specs=[tile() for _ in range(n_state + n_prof)] + [stile()],
            out_shape=out_shapes,
            input_output_aliases=aliases,
            interpret=interpret,
        )(*inputs)

        new_state = {
            "rho_n": outs[0],
            "nE": outs[1],
            "rho_i": [outs[2 + 2 * z] for z in range(cfg.ncharge)],
            "mom_i": [outs[3 + 2 * z] for z in range(cfg.ncharge)],
        }
        if G == 2:
            new_state["rho_n2"] = outs[2 + 2 * cfg.ncharge]
        new_prof = list(outs[n_state : n_state + n_prof])
        new_sacc = outs[n_state + n_prof]
        return new_state, new_prof, new_sacc

    return stepK


@partial(jax.jit, static_argnames=("cfg", "inner_steps", "n_calls", "interpret", "tile_b", "trace"))
def _pallas_multi_segment(params, consts, state, prof, sacc, i0, cfg: SolverConfig,
                          inner_steps: int, n_calls: int, interpret: bool = False,
                          tile_b: int = TILE_B, trace: bool = False):
    """``n_calls`` sequential K-step kernel launches under one jit (outer scan).
    With ``trace``, each block's full-resolution I_d(t) lanes are emitted as the
    scan's ys: (n_calls, B, inner_steps)."""
    stepK = build_multistep_kernel(cfg, inner_steps, interpret=interpret, tile_b=tile_b,
                                   trace=trace)

    def body(carry, _):
        state, prof, sacc, i0 = carry
        state, prof, sacc = stepK(state, prof, sacc, consts, i0)
        ys = sacc[:, _A_TRACE0 : _A_TRACE0 + inner_steps] if trace else None
        return (state, prof, sacc, i0 + inner_steps), ys

    (state, prof, sacc, i0), traces = jax.lax.scan(
        body, (state, prof, sacc, i0), None, length=n_calls
    )
    return state, prof, sacc, i0, traces


def simulate_batch_pallas_multi(
    params: dict,
    base_B,
    cfg: SolverConfig,
    inner_steps: int | None = None,
    calls_per_dispatch: int = 40,
    interpret: bool = False,
) -> dict:
    """:func:`simulate_batch_pallas` with the K-step VMEM-resident kernel.

    ``cfg.num_save > 0`` additionally returns evenly-spaced I_d(t) snapshots
    (the reference's ``simulation.num_save``) captured at FULL kernel speed:
    each inner step SETs its current into a spare lane of the VMEM-resident
    accumulator block, so the trace costs one masked select per step instead of
    forfeiting the fused kernel for the lax path.
    """
    if env := os.environ.get("HTPEM_INNER_STEPS"):
        if inner_steps is not None and int(env) != inner_steps:
            # env overrides an EXPLICIT caller argument: legal (perf experiments
            # sweep it process-wide) but must not be silent (advisor round-4) —
            # and with jit caching, changing the env after first trace is a no-op
            logging.getLogger("hallthrusterpem_tpu").warning(
                "HTPEM_INNER_STEPS=%s overrides explicit inner_steps=%d", env, inner_steps)
        inner_steps = int(env)
        if inner_steps <= 0:
            raise ValueError(f"HTPEM_INNER_STEPS={env}: must be a positive integer")
    elif inner_steps is None:
        inner_steps = 50
    trace = cfg.num_save > 0
    if trace and inner_steps > 128 - _A_TRACE0:
        inner_steps = 128 - _A_TRACE0
    params = {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}
    B0 = params["V_d"].shape[0]
    tb = tile_b_for(B0)
    pad = (-B0) % tb
    if pad:
        params = {k: jnp.concatenate([v, jnp.repeat(v[-1:], pad, axis=0)]) for k, v in params.items()}
    B = params["V_d"].shape[0]
    Z = cfg.ncharge
    n_prof = Z + 4

    consts = _pack_consts(params, base_B, cfg)
    state, _accum0, _i, _f = _pallas_init(params, base_B, cfg)
    state = dict(state)
    state.pop("icir", None)  # the K-step kernel rides the filter state in sacc
    prof = [jnp.zeros((B, lanes_for(cfg)), jnp.float32) for _ in range(n_prof)]
    sacc = jnp.zeros((B, 128), jnp.float32).at[:, _A_ICIR].set(
        (_E / cfg.mi) * params["mdot_a"]
    )
    i0 = jnp.zeros((), jnp.int32)

    total_calls = -(-cfg.num_steps // inner_steps)
    done = 0
    # O(num_save) running save buffer: gather each dispatch block's save points
    # into a fixed (B, num_save) buffer instead of concatenating the full
    # O(num_steps) trace and subsampling at the end (which costs ~2 MB/sample
    # of HBM at 2 ms / CFL dt and OOMs reference-config batches >~1k).
    stride = max(1, cfg.num_steps // cfg.num_save) if trace else 1
    save_idx = jnp.arange(cfg.num_save) * stride if trace else None
    tr_buf = jnp.zeros((B, cfg.num_save), jnp.float32) if trace else None
    while done < total_calls:
        n_calls = min(calls_per_dispatch, total_calls - done)
        state, prof, sacc, i0, traces = _pallas_multi_segment(
            params, consts, state, prof, sacc, i0, cfg, inner_steps, n_calls, interpret, tb,
            trace
        )
        if trace:
            # traces: (n_calls, B, inner_steps), step-ordered within the block
            S = n_calls * inner_steps
            block = traces.transpose(1, 0, 2).reshape(B, S)
            pos = save_idx - done * inner_steps  # global save step -> block-local
            in_blk = (pos >= 0) & (pos < S)
            gathered = jnp.take(block, jnp.clip(pos, 0, S - 1), axis=1)
            tr_buf = jnp.where(in_blk[None, :], gathered, tr_buf)
        done += n_calls

    # assemble the accumulator dict the shared finalizer expects
    NC = cfg.nc
    accum = {
        "thrust": sacc[:, _A_THRUST],
        "I_d": sacc[:, _A_ID],
        "I_d2": sacc[:, _A_ID2],
        "I_B0": sacc[:, _A_IB0],
        "mdot_ion": sacc[:, _A_MDOT],
        "u_exit1": sacc[:, _A_UEXIT],
        "ui": jnp.stack([prof[z][:, :NC] for z in range(Z)], axis=1),
        "Te": prof[Z][:, :NC],
        "ne": prof[Z + 1][:, :NC],
        "E": prof[Z + 2][:, :NC],
        "nn": prof[Z + 3][:, :NC],
    }
    failed = sacc[:, _A_FAILED] > 0.5
    out = _pallas_finalize(params, (state, accum, i0, failed), consts, base_B, cfg)
    if trace:
        out["discharge_current_trace"] = jnp.where(failed[:, None], jnp.nan, tr_buf)
        out["trace_times"] = jnp.broadcast_to(
            (save_idx.astype(jnp.float32) + 1.0) * cfg.dt, tr_buf.shape
        )
    if pad:
        out = {k: v[:B0] for k, v in out.items()}
    return out


def _pack_consts(params: dict, base_B, cfg: SolverConfig):
    """Per-sample static-in-time profiles + packed scalar block (B, 128)."""
    from hallthrusterpem_tpu.models.thruster.config import background_neutral_ingestion_flux

    B = params["V_d"].shape[0]
    z = jnp.asarray(cfg.cell_centers(), jnp.float32)
    Bfield = jnp.asarray(base_B, jnp.float32)[None, :] * params["B_hat"][:, None]
    omega = _E * Bfield / _ME
    p32 = {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}
    alpha = jax.vmap(lambda p: anomalous_profile(p, z, cfg))(p32)
    nu_anom = alpha * omega

    pad = lanes_for(cfg) - cfg.nc
    padp = lambda x: jnp.pad(x, ((0, 0), (0, pad)))
    mdot_in = params["mdot_a"] + background_neutral_ingestion_flux(params["P_b"], params["f_n"], cfg)

    scalars = jnp.zeros((B, 128), jnp.float32)
    scalars = scalars.at[:, _P_DV].set(params["V_d"] - params["V_cc"])
    scalars = scalars.at[:, _P_MDOT].set(mdot_in)
    scalars = scalars.at[:, _P_UN].set(jnp.maximum(params["u_n"], 10.0))
    scalars = scalars.at[:, _P_CW].set(params["c_w"])
    scalars = scalars.at[:, _P_TECATH].set(params["T_e_cath"])
    scalars = scalars.at[:, _P_TANDIV].set(params.get("tan_div", jnp.full((B,), 0.1835)))
    zeros = jnp.zeros((B,), jnp.float32)
    scalars = scalars.at[:, _P_RC].set(params.get("circuit_R", zeros))
    scalars = scalars.at[:, _P_LDT].set(params.get("circuit_L", zeros) * (1.0 / cfg.dt))
    # circuit-filter current seed (solver.py's I_prev0): fully-singly-ionized scale
    scalars = scalars.at[:, _P_ICIR].set((_E / cfg.mi) * params["mdot_a"])
    return {"nu_anom": padp(nu_anom), "omega_ce": padp(omega), "scalars": scalars}


def _initial_state(params: dict, cfg: SolverConfig) -> dict:
    """Batched (B, LANES) initial state — same seeding as solver.py."""
    B = params["V_d"].shape[0]
    Z = cfg.ncharge
    mi = cfg.mi
    z = jnp.asarray(cfg.cell_centers(), jnp.float32)
    z_ch = cfg.geometry.channel_length
    L = cfg.domain[1] - cfg.domain[0]
    pad = lanes_for(cfg) - cfg.nc
    padp = lambda x: jnp.pad(x, ((0, 0), (0, pad)))

    from hallthrusterpem_tpu.models.thruster.config import background_neutral_ingestion_flux

    mdot_in = params["mdot_a"] + background_neutral_ingestion_flux(params["P_b"], params["f_n"], cfg)
    u_n = jnp.maximum(params["u_n"], 10.0)
    # per-group injected densities (solver.py's rho_inj_g): group speeds are fixed
    # ratios of u_n, injected flux split by fast_neutral_fraction
    if cfg.neutral_groups == 2:
        fr = cfg.fast_neutral_fraction
        rho_inj = ((1.0 - fr) * mdot_in / (cfg.geometry.channel_area * cfg.slow_neutral_ratio * u_n))[:, None]
        rho_inj2 = (fr * mdot_in / (cfg.geometry.channel_area * cfg.fast_neutral_ratio * u_n))[:, None]
    else:
        rho_inj = (mdot_in / (cfg.geometry.channel_area * u_n))[:, None]
    dV = (params["V_d"] - params["V_cc"])[:, None]

    rho_n0 = jnp.broadcast_to(rho_inj, (B, cfg.nc))
    n_prof = 2e17 + 1e18 * jnp.exp(-(((z - z_ch) / (0.3 * z_ch)) ** 2))
    u_bohm0 = float(np.sqrt(_E * 3.0 / mi))
    u_exit0 = jnp.sqrt(2.0 * _E * jnp.maximum(dV, 50.0) / mi)
    frac = jnp.clip((z - 0.5 * z_ch) / (L - 0.5 * z_ch), 0.0, 1.0)[None, :]
    u0 = -u_bohm0 * (1.0 - frac) + u_exit0 * frac**2
    Te0 = 3.0 + 0.04 * jnp.maximum(dV, 50.0) * jnp.exp(-(((z - z_ch) / (0.4 * z_ch)) ** 2))[None, :]

    rho_i0, mom_i0, ne0 = [], [], jnp.zeros((B, cfg.nc), jnp.float32)
    for zi in range(Z):
        r = jnp.broadcast_to(n_prof * mi * (0.25**zi), (B, cfg.nc)).astype(jnp.float32)
        rho_i0.append(padp(r))
        mom_i0.append(padp(r * u0))
        ne0 = ne0 + (zi + 1) * r / mi
    nE0 = 1.5 * ne0 * Te0

    state = {
        "rho_n": padp(rho_n0.astype(jnp.float32)),
        "nE": padp(nE0.astype(jnp.float32)),
        "rho_i": rho_i0,
        "mom_i": mom_i0,
        "icir": (_E / mi) * params["mdot_a"],
    }
    if cfg.neutral_groups == 2:
        state["rho_n2"] = padp(jnp.broadcast_to(rho_inj2, (B, cfg.nc)).astype(jnp.float32))
    return state


def make_batch_step(cfg: SolverConfig, consts: dict, interpret: bool = False,
                    tile_b: int = TILE_B):
    """One full timestep + accumulation over a (B, LANES) batched carry."""
    Z = cfg.ncharge
    NC = cfg.nc
    mi = cfg.mi
    A_ch = cfg.geometry.channel_area
    a_i2 = 1.380649e-23 * cfg.ion_temp_K / mi
    step = build_step_kernel(cfg, interpret=interpret, tile_b=tile_b)
    exit_ix = NC - 2
    rho_floor = 1e10 * mi

    def body(carry, _):
        state, accum, i, failed = carry
        # circuit-filter state rides a scalar slot rewritten each launch (the
        # K-step kernel carries it in the sacc block instead)
        consts_k = dict(consts)
        consts_k["scalars"] = consts["scalars"].at[:, _P_ICIR].set(state["icir"])
        new_state, ex = step(state, consts_k)
        new_state["icir"] = ex["j_d"] * A_ch
        state = new_state

        B = ex["j_d"].shape[0]
        u_exit = []
        thrust = jnp.zeros((B,), jnp.float32)
        I_B0 = jnp.zeros((B,), jnp.float32)
        mdot_ion = jnp.zeros((B,), jnp.float32)
        for zi in range(Z):
            r = state["rho_i"][zi][:, exit_ix]
            m = state["mom_i"][zi][:, exit_ix]
            u = m / jnp.maximum(r, rho_floor)
            u_exit.append(u)
            thrust += A_ch * (m * u + r * a_i2)
            I_B0 += A_ch * _E * (zi + 1) * r / mi * u
            mdot_ion += A_ch * m
        if cfg.solve_plume:
            thrust = thrust * ex["qs_t"]
            I_B0 = I_B0 * ex["qs_f"]
            mdot_ion = mdot_ion * ex["qs_f"]
        I_d = ex["j_d"] * A_ch
        failed = failed | ~jnp.isfinite(I_d)
        # the in-kernel sanitize scrubs NaN/Inf at the NEXT step's entry before
        # j_d is computed, so a blow-up would otherwise never be observed here —
        # check the raw post-step state too (solver.py all-state semantics)
        state_ok = jnp.ones_like(failed)
        arrs = [state["rho_n"], state["nE"], *state["rho_i"], *state["mom_i"]]
        if cfg.neutral_groups == 2:
            arrs.append(state["rho_n2"])
        for arr in arrs:
            state_ok = state_ok & jnp.all(jnp.isfinite(arr), axis=1)
        failed = failed | ~state_ok

        w = ((i >= cfg.avg_start_step) & (i < cfg.num_steps)).astype(jnp.float32)
        ui_prof = jnp.stack(
            [state["mom_i"][zi] / jnp.maximum(state["rho_i"][zi], rho_floor) for zi in range(Z)], axis=1
        )
        new_accum = {
            "thrust": accum["thrust"] + w * thrust,
            "I_d": accum["I_d"] + w * I_d,
            "I_d2": accum["I_d2"] + w * I_d * I_d,
            "I_B0": accum["I_B0"] + w * I_B0,
            "mdot_ion": accum["mdot_ion"] + w * mdot_ion,
            "u_exit1": accum["u_exit1"] + w * u_exit[0],
            "ui": accum["ui"] + w * ui_prof[:, :, :NC],
            "Te": accum["Te"] + w * ex["Te"][:, :NC],
            "ne": accum["ne"] + w * ex["ne"][:, :NC],
            "E": accum["E"] + w * ex["E"][:, :NC],
            "nn": accum["nn"] + w * ex["nn"][:, :NC],
        }
        return (state, new_accum, i + 1, failed), None

    return body


@partial(jax.jit, static_argnames=("cfg",))
def _pallas_init(params: dict, base_B, cfg: SolverConfig):
    B = params["V_d"].shape[0]
    Z = cfg.ncharge
    NC = cfg.nc
    state0 = _initial_state(params, cfg)
    accum0 = {
        "thrust": jnp.zeros((B,)), "I_d": jnp.zeros((B,)), "I_d2": jnp.zeros((B,)),
        "I_B0": jnp.zeros((B,)), "mdot_ion": jnp.zeros((B,)), "u_exit1": jnp.zeros((B,)),
        "ui": jnp.zeros((B, Z, NC)), "Te": jnp.zeros((B, NC)), "ne": jnp.zeros((B, NC)),
        "E": jnp.zeros((B, NC)), "nn": jnp.zeros((B, NC)),
    }
    return (state0, accum0, jnp.zeros((), jnp.int32), jnp.zeros((B,), bool))


@partial(jax.jit, static_argnames=("cfg", "n_steps", "interpret", "tile_b"))
def _pallas_segment(params: dict, consts: dict, carry, cfg: SolverConfig, n_steps: int,
                    interpret: bool = False, tile_b: int = TILE_B):
    body = make_batch_step(cfg, consts, interpret=interpret, tile_b=tile_b)
    return jax.lax.scan(body, carry, None, length=n_steps)[0]


@partial(jax.jit, static_argnames=("cfg",))
def _pallas_finalize(params: dict, carry, consts: dict, base_B, cfg: SolverConfig):
    _, accum, _, failed = carry
    B = params["V_d"].shape[0]
    NC = cfg.nc
    mi = cfg.mi
    z = jnp.asarray(cfg.cell_centers(), jnp.float32)

    n_avg = float(max(cfg.num_steps - cfg.avg_start_step, 1))
    nanify = lambda v: jnp.where(
        failed.reshape((B,) + (1,) * (v.ndim - 1)), jnp.nan, v / n_avg
    )
    avg = {k: nanify(v) for k, v in accum.items()}

    thrust, I_d, I_B0 = avg["thrust"], avg["I_d"], avg["I_B0"]
    E_avg = avg["E"]
    dz = cfg.dz
    phi = params["V_d"][:, None] - jnp.concatenate(
        [jnp.zeros((B, 1)), jnp.cumsum(0.5 * (E_avg[:, 1:] + E_avg[:, :-1]) * dz, axis=1)], axis=1
    )
    alpha_prof = consts["nu_anom"][:, :NC]
    return {
        "thrust": thrust,
        "discharge_current": I_d,
        "discharge_current_std": jnp.sqrt(jnp.maximum(avg["I_d2"] - I_d**2, 0.0)),
        "ion_current": I_B0,
        "current_eff": I_B0 / I_d,
        "mass_eff": avg["mdot_ion"] / params["mdot_a"],
        "voltage_eff": avg["u_exit1"] ** 2 * mi / (2 * _E * jnp.maximum(params["V_d"], 1.0)),
        "anode_eff": thrust**2 / (2 * params["mdot_a"] * jnp.maximum(I_d * params["V_d"], 1e-6)),
        "ui": avg["ui"],
        "z": jnp.broadcast_to(z, (B, NC)),
        "Tev": avg["Te"],
        "ne": avg["ne"],
        "nn": avg["nn"],
        "potential": phi,
        "E": E_avg,
        "nu_anom": alpha_prof,
        "B": jnp.asarray(base_B, jnp.float32)[None, :] * params["B_hat"][:, None],
    }


def simulate_batch_pallas(
    params: dict,
    base_B,
    cfg: SolverConfig,
    interpret: bool = False,
    chunk_steps: int = 0,
) -> dict:
    """Drop-in for :func:`..solver.simulate_batch` built on the fused Pallas step.

    The batch is padded to a TILE_B multiple internally (padded rows surface as
    extra samples and are dropped). ``chunk_steps > 0`` splits the time loop into
    short device dispatches (see solver.py's chunked-dispatch rationale).
    """
    params = {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}
    B0 = params["V_d"].shape[0]
    tb = tile_b_for(B0)
    pad = (-B0) % tb
    if pad:
        params = {k: jnp.concatenate([v, jnp.repeat(v[-1:], pad, axis=0)]) for k, v in params.items()}

    consts = _pack_consts(params, base_B, cfg)
    carry = _pallas_init(params, base_B, cfg)
    if chunk_steps and cfg.num_steps > chunk_steps:
        for _ in range(-(-cfg.num_steps // chunk_steps)):
            carry = _pallas_segment(params, consts, carry, cfg, chunk_steps, interpret, tb)
    else:
        carry = _pallas_segment(params, consts, carry, cfg, cfg.num_steps, interpret, tb)
    out = _pallas_finalize(params, carry, consts, base_B, cfg)
    if pad:
        out = {k: v[:B0] for k, v in out.items()}
    return out

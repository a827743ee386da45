"""1-D finite-volume Hall-thruster discharge solver — from scratch, TPU-native.

Replaces the reference's out-of-process HallThruster.jl solve
(``src/hallmd/models/thruster.py:281-375``) with an in-process jittable simulation:

* heavy species (neutrals + up to 3 ion charge states) with upwind/HLLE fluxes,
  isothermal EOS, explicit time stepping;
* electron-impact ionization/excitation from Maxwellian-averaged rate tables
  (:mod:`.rates`), anomalous transport (TwoZoneBohm / GaussianBohm + pressure
  shifts), wall losses;
* quasineutral drift-diffusion electrons: the potential solve is a *direct
  integral* of the generalized Ohm's law (no linear system — two reductions and
  elementwise ops), the electron energy equation is backward-Euler implicit via a
  batched parallel-cyclic-reduction tridiagonal solve (:mod:`...ops.tridiag`);
* time integration as one ``lax.scan`` with static shapes; time-averaged QoIs
  accumulated in the carry (HallThruster.jl's ``average_start_time`` postprocess,
  reference ``thruster.py:236-238``).

Design notes (TPU): everything in the step body is elementwise over the (batch,
cells) plane or a log2(N) reduction — no data-dependent shapes, no host syncs.
Batch parallelism via ``vmap`` (thousands of operating conditions per chip);
multi-chip via ``shard_map`` over the batch axis (see ``parallel/``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hallthrusterpem_tpu.constants import (
    BOLTZMANN_CONSTANT,
    ELECTRON_MASS,
    FUNDAMENTAL_CHARGE,
)
from hallthrusterpem_tpu.models.thruster.config import (
    SolverConfig,
    background_neutral_ingestion_flux,
)
from hallthrusterpem_tpu.models.thruster.rates import (
    K_EN,
    build_reactions,
    excitation_table,
    lookup_rate,
)
from hallthrusterpem_tpu.ops.tridiag import tridiag_solve

_E = FUNDAMENTAL_CHARGE
_ME = ELECTRON_MASS
_KB = BOLTZMANN_CONSTANT


# ======================================================================================
# anomalous transport profiles (static in time, per-sample)
# ======================================================================================
def _pressure_shift_m(p, cfg: SolverConfig, z_ch: float):
    """Axial shift (m) of the anomalous-transport profile vs background pressure.

    LogisticPressureShift (reference ``pem_v0_SPT-100.yml:76-85``): parameters
    ``shift_z0`` (channel lengths), ``shift_dz`` (logistic swing, channel
    lengths), ``shift_pstar`` (Torr), ``shift_alpha`` (steepness). The
    DOWNSTREAM displacement is ``(z0 + dz * (1 - sigmoid(alpha (P/P* - 1)))) L_ch``:
    at vacuum the profile sits ``(z0 + dz) L_ch`` downstream of the exit; as
    facility pressure rises it moves UPSTREAM toward ``z0 L_ch`` — the
    LIF-observed direction AND magnitude (bundled MacDonald-Tenenbaum 2019 data:
    mid-acceleration at 30.2/29.0/28.2 mm for P = 1e-5/3e-5/5.5e-5 Torr; this
    mapping with the prior-mean dz = 0.2 puts the barrier at +4.2 mm at vacuum).

    Round-3 note: an alternative convention with the vacuum limit at ``-z0``
    (+0.8 mm) was measured too: it yields a smoother attached channel but
    under-predicts thrust ~5% at the pem_v0 nominal, while this mapping
    reproduces the bundled Diamant anchors to <5% (docs/validation.md).
    """
    if cfg.pressure_shift == "none":
        return jnp.zeros(())
    P = p["P_b"]  # Torr
    sig = jax.nn.sigmoid(p["shift_alpha"] * (P / p["shift_pstar"] - 1.0))
    if cfg.pressure_shift == "SimpleLogisticShift":
        return p["shift_dz"] * (1.0 - sig) * z_ch
    return (p["shift_z0"] + p["shift_dz"] * (1.0 - sig)) * z_ch


def wall_energy_loss_rate(Te, ne, in_channel, c_w, cfg: SolverConfig, xp=jnp,
                          lnTe=None, rs_te=None):
    """Electron-wall energy-loss frequency nu_eps [1/s] such that the volumetric
    loss is ``nu_eps * (3/2 n Te)``. Two models (cfg.wall_loss_type):

    - "landmark": nu = scale * c_w * 1e7 * exp(-20/Te) inside the channel.
    - "sheath": Maxwellian-averaged BN SEE yield ``gamma = min(gmax, 1.4 (Te/e*)^0.576)``,
      wall sheath ``phi_w = Te ln((1-gamma) sqrt(mi/(2 pi me)))``; electron wall
      flux balances the Bohm ion wall flux amplified by 1/(1-gamma); each lost
      electron removes ``2 Te + phi_w``. Loss rate diverges smoothly toward the
      space-charge crossover — damping the ionization runaway at high Te while
      staying gentle at low Te.
    """
    if cfg.wall_loss_type == "sheath":
        if lnTe is not None:
            # kernel fast path: reuse the already-computed ln(Te) — the 0.576
            # power is exp(0.576 (lnTe - ln e*)) without a fresh log
            gamma = xp.minimum(cfg.see_gamma_max,
                               1.4 * xp.exp(0.576 * (lnTe - float(np.log(cfg.see_crossover_eV)))))
        else:
            gamma = xp.minimum(cfg.see_gamma_max, 1.4 * (Te * (1.0 / cfg.see_crossover_eV)) ** 0.576)
        one_m_g = 1.0 - gamma
        # phi_w/Te = max(ln((1-gamma) sqrt(mi/2 pi me)), 0): the Te factor cancels
        # against the 1/(1.5 Te) in nu_eps = flux*(2Te+phi_w)/(1.5 n Te), so the
        # whole expression needs a single divide (by 1-gamma)
        phi_w_over_te = xp.maximum(xp.log(one_m_g * float(np.sqrt(cfg.mi / (2 * np.pi * _ME)))), 0.0)
        coef = float(cfg.wall_energy_scale * 0.6 * np.sqrt(_E / cfg.mi)
                     / cfg.geometry.channel_gap / 1.5)  # Bohm wall flux / (n 1.5 sqrt(Te))
        sqrt_te = (Te * rs_te) if rs_te is not None else xp.sqrt(Te)
        return (coef * c_w) * sqrt_te / one_m_g * (2.0 + phi_w_over_te) * in_channel
    return cfg.wall_energy_scale * c_w * 1e7 * xp.exp(-20.0 / Te) * in_channel


def anomalous_profile(p, z, cfg: SolverConfig):
    """Dimensionless anomalous collision coefficient alpha(z) (nu_anom = alpha * w_ce)."""
    z_ch = cfg.geometry.channel_length
    shift = _pressure_shift_m(p, cfg, z_ch)
    if cfg.anom_model == "GaussianBohm":
        zc = p["center"] + shift
        return p["hall_max"] + (p["hall_min"] - p["hall_max"]) * jnp.exp(
            -0.5 * ((z - zc) / jnp.maximum(p["width"], 1e-4)) ** 2
        )
    # TwoZoneBohm with smooth transition of length l_t at the (shifted) channel exit
    z_tr = z_ch + shift
    w = 0.5 * (1.0 + jnp.tanh(2.0 * (z - z_tr) / jnp.maximum(p["l_t"], 1e-4)))
    alpha = p["a1"] + (p["a2"] - p["a1"]) * w
    if cfg.anom_barrier_width > 0:
        # Transport-barrier well at the (shifted) magnetic-field peak: data-driven
        # anomalous-collisionality inferences (e.g. Mikellides & Lopez Ortega;
        # Jorns' ML-inferred profiles) consistently find a deep NARROW minimum at
        # the B-peak that a flat two-zone profile cannot express — without it the
        # axial electric field spreads over ~2x the measured width (E_peak ~2e4
        # vs ~5e4 V/m published for SPT-100) and the electron leak across the
        # barrier roughly doubles. Depth is a calibratable per-sample parameter
        # (``anom_depth``); the well rides the pressure shift like the rest of
        # the profile.
        # The well PULLS the profile toward the floor a1*(1-depth): a pure
        # multiplicative well saturates where the a1->a2 transition ramp overlaps
        # the well center (the product's minimum never reaches the intended
        # floor), whereas inferred profiles show the minimum AT the B-peak with
        # the plume rise starting just downstream.
        # per-sample well width when provided ("anom_width" param / config
        # barrier_width key); the static cfg value is the default
        width = jnp.where(p.get("anom_width", jnp.zeros(())) > 0,
                          p.get("anom_width", jnp.zeros(())), cfg.anom_barrier_width)
        g = jnp.exp(-0.5 * ((z - z_tr) / width) ** 2)
        floor = p["a1"] * (1.0 - jnp.clip(p["anom_depth"], 0.0, 0.98))
        alpha = alpha + g * (floor - alpha)
    if cfg.anode_alpha > 0:
        # Near-anode transport enhancement — the third feature of inferred
        # anomalous profiles: collisionality rises toward the anode (the
        # ionization region is nearly unmagnetized-conductive), keeping the
        # plasma potential flat until the barrier so ions are born at anode
        # potential (published SPT-100 voltage utilization ~0.85-0.9 of
        # V_d - V_cc; a flat a1 profile drops ~80 V inside the ionization zone
        # instead). Logistic roll-off at ``anode_edge_frac * z_ch`` so the
        # barrier well is untouched.
        edge = cfg.anode_edge_frac * z_ch + shift
        roll = 0.5 * (1.0 - jnp.tanh((z - edge) / cfg.anode_edge_width))
        alpha = alpha + cfg.anode_alpha * roll
    return alpha


# ======================================================================================
# single-sample simulation (vmapped over the batch by simulate_batch)
# ======================================================================================
def make_step(p: dict, base_B, cfg: SolverConfig):
    """Expose (step_fn, initial_carry) for testing/debugging a single sample."""
    return _simulate_one(p, base_B, cfg, _return_step=True)


def _simulate_one(p: dict, base_B: jnp.ndarray, cfg: SolverConfig, _return_step: bool = False):
    f = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    NC = cfg.nc
    N = cfg.num_cells
    Z = cfg.ncharge
    dz = cfg.dz
    dt = jnp.asarray(cfg.dt, f)
    mi = cfg.mi
    A_ch = cfg.geometry.channel_area
    gap = cfg.geometry.channel_gap
    z = jnp.asarray(cfg.cell_centers(), f)
    zq = jnp.arange(1, Z + 1, dtype=f)  # charge numbers

    p = {k: jnp.asarray(v, f) for k, v in p.items()}
    B = jnp.asarray(base_B, f) * p["B_hat"]
    omega_ce = _E * B / _ME

    # static-in-time per-sample profiles
    alpha_anom = anomalous_profile(p, z, cfg)
    nu_anom = alpha_anom * omega_ce
    in_channel = (z <= cfg.geometry.channel_length).astype(f)

    # thermal speeds / EOS
    a_i = float(np.sqrt(_KB * cfg.ion_temp_K / mi))  # isothermal ion sound-ish speed
    Ti_eV = _KB * cfg.ion_temp_K / _E

    # anode inflow (+ facility background ingestion)
    mdot_in = p["mdot_a"] + background_neutral_ingestion_flux(p["P_b"], p["f_n"], cfg)
    u_n = jnp.maximum(p["u_n"], 10.0)
    # neutral velocity-space quadrature (see SolverConfig.neutral_groups): group
    # speeds u_g = ratio * u_n and injected-flux fractions; group 0 additionally
    # receives wall-recombined and anode-recycled neutrals
    if cfg.neutral_groups == 2:
        fr = cfg.fast_neutral_fraction
        u_g = jnp.stack([cfg.slow_neutral_ratio * u_n, cfg.fast_neutral_ratio * u_n])
        inj_frac = jnp.asarray([1.0 - fr, fr], f)
    else:
        u_g = u_n[None]
        inj_frac = jnp.ones((1,), f)
    G = cfg.neutral_groups
    rho_inj_g = inj_frac * mdot_in / (A_ch * u_g)  # (G,)

    # reaction bookkeeping (static; tables as jnp constants)
    reactions = build_reactions(cfg.propellant, Z)
    rxn_tables = [jnp.asarray(np.asarray(r.table), f) for r in reactions]
    ex_table_np, ex_energy = excitation_table(cfg.propellant)
    ex_table = jnp.asarray(ex_table_np, f)
    k_en = K_EN.get(cfg.propellant, 2.5e-13)
    if cfg.implicit_inelastic:
        from hallthrusterpem_tpu.models.thruster.rates import derivative_table, excitation_log_poly

        rxn_dtables = [jnp.asarray(derivative_table(r), f) for r in reactions]
        ex_dtable = jnp.asarray(derivative_table(excitation_log_poly(cfg.propellant)[0]), f)

    rho_floor = jnp.asarray(1e10 * mi, f)  # ~1e10 m^-3 vacuum floor
    ne_floor = jnp.asarray(cfg.ne_floor, f)

    dV = p["V_d"] - p["V_cc"]

    # ---------------------------------------------------------------- initial state
    # Seed the physical discharge attractor (dense ionization hump at the channel
    # exit, warm exit electrons, Bohm presheath toward the anode) — a cold/uniform
    # start can relax into a non-physical anode-starved double layer instead.
    z_ch = cfg.geometry.channel_length
    L = cfg.domain[1] - cfg.domain[0]
    rho_n0 = jnp.broadcast_to(rho_inj_g[:, None], (G, NC)).astype(f)
    n_i0 = 2e17 + 1e18 * jnp.exp(-(((z - z_ch) / (0.3 * z_ch)) ** 2))
    rho_i0 = jnp.tile((n_i0 * mi)[None, :], (Z, 1)) * (0.25 ** jnp.arange(Z, dtype=f)[:, None])
    u_bohm0 = jnp.sqrt(_E * 3.0 / mi)
    u_exit0 = jnp.sqrt(2.0 * _E * jnp.maximum(dV, 50.0) / mi)
    frac = jnp.clip((z - 0.5 * z_ch) / (L - 0.5 * z_ch), 0.0, 1.0)
    u_i0 = jnp.tile((-u_bohm0 * (1.0 - frac) + u_exit0 * frac**2)[None, :], (Z, 1))
    mom_i0 = rho_i0 * u_i0
    ne0 = jnp.sum(zq[:, None] * rho_i0 / mi, axis=0)
    Te0 = 3.0 + 0.04 * jnp.maximum(dV, 50.0) * jnp.exp(-(((z - z_ch) / (0.4 * z_ch)) ** 2))
    nE0 = 1.5 * ne0 * Te0

    # seed the filter state at the fully-singly-ionized current scale so an RL
    # line does not force a cold start (the transient is outside the averaging
    # window either way)
    I_prev0 = jnp.asarray(_E / mi, f) * p["mdot_a"]
    state0 = (rho_n0, rho_i0, mom_i0, nE0, I_prev0)

    # ---------------------------------------------------------------- plume geometry
    # Static quasi-1D expansion cone (see SolverConfig.solve_plume): per-sample,
    # time-independent stream-tube area ratio AR(z), its face means, the
    # geometric pressure-source log-derivative, and the thrust projection.
    if cfg.solve_plume:
        tand = jnp.clip(p["tan_div"], 0.0, 2.0)
        drz = tand * jnp.maximum(z - cfg.geometry.channel_length, 0.0)
        r_o_pl = cfg.geometry.outer_radius + drz
        r_i_pl = jnp.maximum(cfg.geometry.inner_radius - drz, 0.0)
        AR = (r_o_pl**2 - r_i_pl**2) / (
            cfg.geometry.outer_radius**2 - cfg.geometry.inner_radius**2
        )
        inv_AR = 1.0 / AR
        AR_f = 0.5 * (AR[:-1] + AR[1:])
        dlnA = jnp.concatenate(
            [jnp.zeros((1,), f), (AR_f[1:] - AR_f[:-1]) / (dz * AR[1:-1]), jnp.zeros((1,), f)]
        )
        cos_div = jax.lax.rsqrt(1.0 + tand * tand)
    else:
        AR = jnp.ones((NC,), f)
        inv_AR = AR
        AR_f = jnp.ones((NC - 1,), f)
        dlnA = jnp.zeros((NC,), f)
        cos_div = jnp.ones((), f)

    # ---------------------------------------------------------------- step function
    # state sanitization bounds: keep every intermediate finite and in-range so the
    # compiled program is well-defined even for blown-up samples (failed samples
    # are flagged and NaN-masked at the end — SURVEY.md §5.3 mask semantics; NaNs
    # must never reach gather indices or int casts)
    rho_max = jnp.asarray(1e21 * mi, f)  # 1e21 m^-3 ceiling
    u_max = jnp.asarray(3e5, f)  # m/s ceiling

    # discharge-circuit filter term (see config._DEFAULTS["circuit_R"]): with a
    # series RL cathode line, V_t = dV - R I - L dI/dt, backward-Euler in I —
    # unconditionally stable, one carry scalar.
    L_dt = p["circuit_L"] / dt

    def step(carry, _):
        (rho_n, rho_i, mom_i, nE, I_prev), accum, i, failed = carry

        # ---- detect blow-ups, then sanitize state (NaN/Inf -> safe in-range values)
        finite = (
            jnp.all(jnp.isfinite(rho_n))
            & jnp.all(jnp.isfinite(rho_i))
            & jnp.all(jnp.isfinite(mom_i))
            & jnp.all(jnp.isfinite(nE))
        )
        failed = failed | (~finite)
        rho_n = jnp.clip(jnp.nan_to_num(rho_n, nan=1e10 * mi, posinf=1e21 * mi, neginf=1e10 * mi),
                         rho_floor, rho_max)
        rho_i = jnp.clip(jnp.nan_to_num(rho_i, nan=1e10 * mi, posinf=1e21 * mi, neginf=1e10 * mi),
                         rho_floor, rho_max)
        mom_i = jnp.clip(jnp.nan_to_num(mom_i), -rho_i * u_max, rho_i * u_max)
        nE = jnp.clip(jnp.nan_to_num(nE, nan=1.0, posinf=1e22, neginf=1.0), 1.0, 1e23)
        I_prev = jnp.clip(jnp.nan_to_num(I_prev), -1e4, 1e4)

        # ---- plasma properties
        ni = rho_i / mi
        ne = jnp.maximum(jnp.sum(zq[:, None] * ni, axis=0), ne_floor)
        Te = jnp.clip((2.0 / 3.0) * nE / ne, cfg.Te_min, cfg.Te_max)
        nn_g = rho_n / mi  # (G, NC) per-group neutral densities
        nn = jnp.maximum(jnp.sum(nn_g, axis=0), 1e6)
        n_share = nn_g / nn  # group share of ionization consumption
        u_n_eff = jnp.sum(n_share * u_g[:, None], axis=0)  # momentum-source speed
        u_i = mom_i / jnp.maximum(rho_i, rho_floor)

        # ---- collision frequencies & cross-field mobility
        lnL = jnp.clip(23.0 - 0.5 * jnp.log(ne * 1e-6) + 1.5 * jnp.log(Te), 2.0, 30.0)
        nu_ei = 2.9e-12 * ne * lnL / Te**1.5
        nu_en = k_en * nn
        nu_ew = cfg.electron_wall_losses * cfg.wall_momentum_scale * p["c_w"] * 1e7 * in_channel
        nu_e = nu_en + nu_ei + nu_anom + nu_ew
        Omega2 = (omega_ce / nu_e) ** 2
        mu = (_E / (_ME * nu_e)) / (1.0 + Omega2)

        # ---- Ohm's-law potential sweep (direct integration, no linear solve).
        # With the static plume cone the conserved quantity is the total current
        # I_d = A(z) (j_i + j_e): j_d below is I_d / A_ch and the local circuit
        # current density is j_d / AR(z).
        j_i = _E * jnp.sum(zq[:, None] * ni * u_i, axis=0)
        pe = ne * Te  # eV * m^-3 ; gradient below is in V/m
        grad_pe = jnp.gradient(pe) / dz
        enmu = _E * ne * mu
        num_igd = j_i / enmu + grad_pe / ne
        den_igd = inv_AR / enmu
        # midpoint integration over interior cells. The RL filter uses the
        # INCREMENTAL form j = j_prev + (residual)/(den + (R + L/dt) A_ch):
        # algebraically identical to the direct backward-Euler solve but
        # float32-safe when L/dt is many orders above the plasma impedance
        # (the direct form loses dV in the L/dt I_prev sum).
        num_int = jnp.sum(num_igd[1:-1]) * dz
        den_pl = jnp.sum(den_igd[1:-1]) * dz + p["circuit_R"] * A_ch
        den_all = den_pl + L_dt * A_ch
        j_prev = I_prev / A_ch
        j_d = j_prev + (dV + num_int - j_prev * den_pl) / den_all
        if cfg.anode_sheath:
            # electron-repelling anode sheath: the sheath drop phi_s adjusts so the
            # electron flux reaching the anode matches the circuit current; one
            # fixed-point pass (j_d -> phi_s -> j_d) is enough because phi_s enters
            # only through the slowly-varying voltage balance.
            j_e_th = _E * ne[1] * jnp.sqrt(_E * Te[1] / (2.0 * jnp.pi * _ME))
            j_e_req = jnp.maximum(j_d - j_i[1], 1e-6 * j_e_th)
            phi_s = jnp.clip(Te[1] * jnp.log(j_e_th / j_e_req), 0.0, 0.5 * jnp.abs(dV))
            j_d = j_prev + (dV - phi_s + num_int - j_prev * den_pl) / den_all
        I_new = j_d * A_ch
        j_d_loc = j_d * inv_AR  # local circuit current density
        E_z = (j_d_loc - j_i) / enmu - grad_pe / ne
        u_e = -(j_d_loc - j_i) / (_E * ne)

        # ---- heavy-species boundary (ghost) states
        u_bohm = jnp.sqrt(zq * _E * Te[1] / mi)  # (Z,)
        mom_back = jnp.sum(jnp.minimum(mom_i[:, 1], 0.0))  # ion mass flux into anode
        # injected flux per group; anode-recycled ion backflow re-enters group 0
        recyc = jnp.zeros((G,), f).at[0].set(-mom_back)
        rho_n_l = (inj_frac * mdot_in / A_ch + recyc) / u_g
        rho_n_b = rho_n.at[:, 0].set(rho_n_l).at[:, -1].set(rho_n[:, -2])

        rho_gl = rho_i[:, 1]
        u_gl = jnp.minimum(u_i[:, 1], -cfg.mdot_bohm_fraction * u_bohm)
        rho_i_b = jnp.concatenate([rho_gl[:, None], rho_i[:, 1:-1], rho_i[:, -2:-1]], axis=1)
        mom_i_b = jnp.concatenate(
            [(rho_gl * u_gl)[:, None], mom_i[:, 1:-1], mom_i[:, -2:-1]], axis=1
        )

        # ---- fluxes (NC-1 faces); MUSCL minmod-limited linear reconstruction of
        # primitives (2nd-order in space; HallThruster.jl's default scheme uses
        # limited reconstruction too)
        def minmod_slope(q):
            dq = q[..., 1:] - q[..., :-1]
            s = 0.5 * (jnp.sign(dq[..., :-1]) + jnp.sign(dq[..., 1:])) * jnp.minimum(
                jnp.abs(dq[..., :-1]), jnp.abs(dq[..., 1:])
            )
            pad = [(0, 0)] * (q.ndim - 1) + [(1, 1)]
            return jnp.pad(s, pad) if cfg.reconstruct else jnp.zeros_like(q)

        sl_rn = minmod_slope(rho_n_b)
        rho_nLf = rho_n_b[:, :-1] + 0.5 * sl_rn[:, :-1]
        Fn = u_g[:, None] * jnp.maximum(rho_nLf, rho_floor)  # neutral upwind (u_g > 0)

        u_i_b = mom_i_b / jnp.maximum(rho_i_b, rho_floor)
        sl_r = minmod_slope(rho_i_b)
        sl_u = minmod_slope(u_i_b)
        rL = jnp.maximum(rho_i_b[:, :-1] + 0.5 * sl_r[:, :-1], rho_floor)
        rR = jnp.maximum(rho_i_b[:, 1:] - 0.5 * sl_r[:, 1:], rho_floor)
        uL = u_i_b[:, :-1] + 0.5 * sl_u[:, :-1]
        uR = u_i_b[:, 1:] - 0.5 * sl_u[:, 1:]
        mL, mR = rL * uL, rR * uR
        pL, pR = rL * a_i * a_i, rR * a_i * a_i
        sL = jnp.minimum(jnp.minimum(uL - a_i, uR - a_i), 0.0)
        sR = jnp.maximum(jnp.maximum(uL + a_i, uR + a_i), 0.0)
        FrL, FrR = mL, mR
        FmL, FmR = mL * uL + pL, mR * uR + pR
        ds = jnp.maximum(sR - sL, 1e-8)
        Fr = (sR * FrL - sL * FrR + sL * sR * (rR - rL)) / ds
        Fm = (sR * FmL - sL * FmR + sL * sR * (mR - mL)) / ds

        # ---- conservative update (interior cells) + sources; with plume
        # expansion the divergence is (1/A) d(A F)/dz (fluxes weighted by face
        # area ratio, update scaled by the cell's)
        def ddz(F):
            return (F[..., 1:] * AR_f[1:] - F[..., :-1] * AR_f[:-1]) / (dz * AR[1:-1])

        rho_n_new = rho_n_b.at[:, 1:-1].add(-dt * ddz(Fn))
        rho_i_new = rho_i_b.at[:, 1:-1].add(-dt * ddz(Fr))
        mom_i_new = mom_i_b.at[:, 1:-1].add(-dt * ddz(Fm))

        # ionization source terms (static unroll over <= 6 reactions)
        inelastic = jnp.zeros((NC,), f)
        dinel_dTe = jnp.zeros((NC,), f)
        d_rho_n = jnp.zeros((G, NC), f)
        d_rho = jnp.zeros((Z, NC), f)
        d_mom = jnp.zeros((Z, NC), f)
        for ri, (r, table) in enumerate(zip(reactions, rxn_tables)):
            k_r = lookup_rate(table, Te)
            n_from = nn if r.z_from == 0 else ni[r.z_from - 1]
            u_from = u_n_eff if r.z_from == 0 else u_i[r.z_from - 1]
            R = (ne * k_r) * n_from  # events / m^3 s (this product order is
            # float32-safe: ne*n_from alone can exceed 3.4e38)
            dm = R * mi
            if r.z_from == 0:
                # consumption split over the velocity groups by density share
                d_rho_n = d_rho_n - dm[None, :] * n_share
            else:
                d_rho = d_rho.at[r.z_from - 1].add(-dm)
                d_mom = d_mom.at[r.z_from - 1].add(-dm * u_from)
            d_rho = d_rho.at[r.z_to - 1].add(dm)
            d_mom = d_mom.at[r.z_to - 1].add(dm * u_from)
            contrib = R * r.energy_eV
            inelastic = inelastic + contrib
            if cfg.implicit_inelastic:
                dinel_dTe = dinel_dTe + contrib * lookup_rate(rxn_dtables[ri], Te) / Te

        # excitation losses
        k_ex = lookup_rate(ex_table, Te)
        ex_contrib = (ne * k_ex) * nn * ex_energy
        inelastic = inelastic + ex_contrib
        if cfg.implicit_inelastic:
            dinel_dTe = dinel_dTe + ex_contrib * lookup_rate(ex_dtable, Te) / Te
            dinel_dTe = jnp.maximum(dinel_dTe, 0.0)  # only the stabilizing branch

        # electric-field acceleration
        d_mom = d_mom + zq[:, None] * _E * ni * E_z  # force density Z e n_i E

        if cfg.solve_plume:
            # quasi-1D geometric pressure source: only the momentum FLUX dilutes
            # with area; static pressure pushes on the expanding stream tube,
            # contributing + p dlnA/dz
            d_mom = d_mom + rho_i * (a_i * a_i) * dlnA

        # ion wall losses inside the channel (lost ions recombine to slow neutrals)
        if cfg.ion_wall_losses:
            u_bohm_z = jnp.sqrt(zq[:, None] * _E * Te[None, :] / mi)
            nu_iw = 0.6 * u_bohm_z / gap * in_channel[None, :]
            d_rho = d_rho - nu_iw * rho_i
            d_mom = d_mom - nu_iw * mom_i
            d_rho_n = d_rho_n.at[0].add(cfg.wall_recycling * jnp.sum(nu_iw * rho_i, axis=0))

        rho_n_new = rho_n_new.at[:, 1:-1].add(dt * d_rho_n[:, 1:-1])
        rho_i_new = rho_i_new.at[:, 1:-1].add(dt * d_rho[:, 1:-1])
        mom_i_new = mom_i_new.at[:, 1:-1].add(dt * d_mom[:, 1:-1])

        rho_n_new = jnp.maximum(rho_n_new, rho_floor)
        rho_i_new = jnp.maximum(rho_i_new, rho_floor)

        # ---- electron energy: backward-Euler implicit in Te, PCR tridiagonal solve.
        # Solving for Te (not the energy density) keeps the matrix free of 1/n
        # ratios across steep density gradients — essential for float32 stability.
        ne_new = jnp.maximum(jnp.sum(zq[:, None] * rho_i_new / mi, axis=0), ne_floor)
        Te_bc_l = jnp.asarray(cfg.anode_Te, f)
        Te_bc_r = p["T_e_cath"]

        # electron particle flux from current continuity (no density floors needed)
        Gamma_e = -(j_d_loc - j_i) / _E  # n_e u_e at centers
        G_f = 0.5 * (Gamma_e[:-1] + Gamma_e[1:])  # (NC-1,) faces
        kappa_f = (10.0 / 9.0) * 0.5 * ((mu * ne * Te)[:-1] + (mu * ne * Te)[1:])
        kf = kappa_f / dz
        Gp = (5.0 / 2.0) * jnp.maximum(G_f, 0.0)
        Gn = (5.0 / 2.0) * jnp.minimum(G_f, 0.0)

        # rows for interior cells i=1..NC-2 ; face f- = i-1, f+ = i; with the
        # plume cone the energy-flux divergence is (1/A) d(A q)/dz: face terms
        # get AR_f / AR_cell weights (identity inside the channel)
        fm = slice(0, NC - 2)
        fp = slice(1, NC - 1)
        wfm = AR_f[fm] / AR[1:-1]
        wfp = AR_f[fp] / AR[1:-1]
        nu_eps = cfg.electron_wall_losses * wall_energy_loss_rate(Te, ne, in_channel, p["c_w"], cfg)
        n_c = ne_new[1:-1]
        sub = (-Gp[fm] - kf[fm]) * wfm / dz
        sup = (Gn[fp] - kf[fp]) * wfp / dz
        diag = (1.5 * n_c / dt + ((Gp[fp] + kf[fp]) * wfp + (kf[fm] - Gn[fm]) * wfm) / dz
                + nu_eps[1:-1] * 1.5 * n_c)
        q_ohm = (j_d_loc - j_i) * E_z / _E
        rhs = nE[1:-1] / dt + q_ohm[1:-1] - inelastic[1:-1]
        if cfg.implicit_inelastic:
            # Newton linearization of the inelastic sink about Te_old:
            # L(Te') ~ L + L'(Te' - Te): unconditionally stabilizing (L' >= 0)
            diag = diag + dinel_dTe[1:-1]
            rhs = rhs + dinel_dTe[1:-1] * Te[1:-1]
        rhs = rhs.at[0].add(-sub[0] * Te_bc_l)
        rhs = rhs.at[-1].add(-sup[-1] * Te_bc_r)
        sub = sub.at[0].set(0.0)
        sup = sup.at[-1].set(0.0)
        Te_int = tridiag_solve(sub, diag, sup, rhs)
        Te_new = jnp.concatenate([Te_bc_l[None], Te_int, Te_bc_r[None]])
        Te_new = jnp.clip(Te_new, cfg.Te_min, cfg.Te_max)
        nE_new = 1.5 * ne_new * Te_new

        # ---- instantaneous QoIs & running averages (fluxes through the expanded
        # exit cross-section A_ch * AR at the domain end)
        exit_ix = NC - 2
        A_ex = A_ch * AR[exit_ix]
        u_exit = mom_i_new[:, exit_ix] / jnp.maximum(rho_i_new[:, exit_ix], rho_floor)
        thrust = A_ex * jnp.sum(mom_i_new[:, exit_ix] * u_exit + rho_i_new[:, exit_ix] * a_i**2)
        if cfg.apply_thrust_divergence_correction and cfg.solve_plume:
            # axial projection of the diverging beam (reference config surface
            # ``apply_thrust_divergence_correction``): cos of the cone half-angle
            thrust = thrust * cos_div
        I_d = I_new
        I_B0 = A_ex * _E * jnp.sum(zq * rho_i_new[:, exit_ix] / mi * u_exit)
        mdot_ion = A_ex * jnp.sum(mom_i_new[:, exit_ix])

        # accumulate only inside [avg_start_step, num_steps): the upper gate makes
        # chunked dispatch exact when the chunk count overshoots num_steps
        w_avg = ((i >= cfg.avg_start_step) & (i < cfg.num_steps)).astype(f)
        ui_prof = mom_i_new / jnp.maximum(rho_i_new, rho_floor)
        new_accum = {
            "thrust": accum["thrust"] + w_avg * thrust,
            "I_d": accum["I_d"] + w_avg * I_d,
            "I_d2": accum["I_d2"] + w_avg * I_d * I_d,
            "I_B0": accum["I_B0"] + w_avg * I_B0,
            "mdot_ion": accum["mdot_ion"] + w_avg * mdot_ion,
            "u_exit1": accum["u_exit1"] + w_avg * u_exit[0],
            "ui": accum["ui"] + w_avg * ui_prof,
            "Te": accum["Te"] + w_avg * Te,
            "ne": accum["ne"] + w_avg * ne,
            "E": accum["E"] + w_avg * E_z,
            "nn": accum["nn"] + w_avg * nn,
        }
        ys = I_d if cfg.num_save > 0 else None
        return ((rho_n_new, rho_i_new, mom_i_new, nE_new, I_new), new_accum, i + 1, failed), ys

    accum0 = {
        "thrust": jnp.zeros((), f),
        "I_d": jnp.zeros((), f),
        "I_d2": jnp.zeros((), f),
        "I_B0": jnp.zeros((), f),
        "mdot_ion": jnp.zeros((), f),
        "u_exit1": jnp.zeros((), f),
        "ui": jnp.zeros((Z, NC), f),
        "Te": jnp.zeros((NC,), f),
        "ne": jnp.zeros((NC,), f),
        "E": jnp.zeros((NC,), f),
        "nn": jnp.zeros((NC,), f),
    }

    carry0 = (state0, accum0, jnp.zeros((), jnp.int32), jnp.zeros((), bool))
    if _return_step:
        return step, carry0

    if cfg.num_save > 0:
        # evenly-spaced I_d(t) snapshots (the reference's simulation.num_save;
        # breathing-mode spectra are a standard discharge diagnostic). Kept in
        # an O(num_save) carry buffer instead of scan-stacking the full
        # O(num_steps) per-step trace and subsampling afterwards: at 2 ms /
        # CFL dt the stacked trace costs ~2 MB/sample of HBM and OOMs
        # reference-config (num_save: 1000) batches >~1k.
        stride = max(1, cfg.num_steps // cfg.num_save)

        def step_save(c, _):
            inner, buf = c
            i_prev = inner[2]
            inner2, I_d = step(inner, None)
            k = i_prev // stride
            write = (i_prev % stride == 0) & (k < cfg.num_save)
            kc = jnp.clip(k, 0, cfg.num_save - 1)
            buf = buf.at[kc].set(jnp.where(write, I_d, buf[kc]))
            return (inner2, buf), None

        buf0 = jnp.zeros((cfg.num_save,), f)
        ((state_f, accum, _, failed), tr_buf), _ = jax.lax.scan(
            step_save, (carry0, buf0), None, length=cfg.num_steps
        )
        out = _finalize_one(p, accum, failed, nu_anom, B, cfg)
        idx = jnp.arange(cfg.num_save) * stride
        out["discharge_current_trace"] = jnp.where(failed, jnp.nan, tr_buf)
        out["trace_times"] = (idx.astype(jnp.float32) + 1.0) * cfg.dt
        return out

    (state_f, accum, _, failed), _ = jax.lax.scan(step, carry0, None, length=cfg.num_steps)
    return _finalize_one(p, accum, failed, nu_anom, B, cfg)


def _finalize_one(p: dict, accum: dict, failed, nu_anom, B, cfg: SolverConfig) -> dict:
    """Turn the running sums of one sample into the time-averaged output dict."""
    f = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    mi = cfg.mi
    dz = cfg.dz
    z = jnp.asarray(cfg.cell_centers(), f)

    n_avg = jnp.asarray(max(cfg.num_steps - cfg.avg_start_step, 1), f)
    # failed samples surface as NaN (the wrapper and gen_data mask them out)
    nanify = lambda v: jnp.where(failed, jnp.nan, v)
    avg = {k: nanify(v / n_avg) for k, v in accum.items()}

    thrust = avg["thrust"]
    I_d = avg["I_d"]
    I_B0 = avg["I_B0"]
    eta_c = I_B0 / I_d
    eta_m = avg["mdot_ion"] / p["mdot_a"]
    eta_v = avg["u_exit1"] ** 2 * mi / (2 * _E * jnp.maximum(p["V_d"], 1.0))
    eta_a = thrust**2 / (2 * p["mdot_a"] * jnp.maximum(I_d * p["V_d"], 1e-6))

    # time-averaged potential from the averaged field
    E_avg = avg["E"]
    phi = p["V_d"] - jnp.concatenate([jnp.zeros((1,), f), jnp.cumsum(0.5 * (E_avg[1:] + E_avg[:-1]) * dz)])

    return {
        "thrust": thrust,
        "discharge_current": I_d,
        "discharge_current_std": jnp.sqrt(jnp.maximum(avg["I_d2"] - I_d**2, 0.0)),
        "ion_current": I_B0,
        "current_eff": eta_c,
        "mass_eff": eta_m,
        "voltage_eff": eta_v,
        "anode_eff": eta_a,
        "ui": avg["ui"],  # (ncharge, NC) time-averaged ion velocities
        "z": z,
        "Tev": avg["Te"],
        "ne": avg["ne"],
        "nn": avg["nn"],
        "potential": phi,
        "E": E_avg,
        "nu_anom": nu_anom,
        "B": B,
    }


@partial(jax.jit, static_argnames=("cfg",))
def simulate_batch(params: dict, base_B, cfg: SolverConfig) -> dict:
    """Run the discharge solver for a batch of parameter sets.

    :param params: dict of (batch,) arrays (see ``config.PARAM_NAMES``)
    :param base_B: (NC,) unscaled magnetic-field profile on cell centers [T]
    :param cfg: static solver configuration
    :returns: dict of (batch, ...) time-averaged outputs
    """
    return jax.vmap(lambda q: _simulate_one(q, base_B, cfg))(params)


# ---------------------------------------------------------------------------------
# chunked dispatch: the same simulation split into fixed-length scan segments with
# the carry held on device between dispatches. Numerically identical to
# simulate_batch (the accumulation window is gated inside the step), but each
# device program is short — robust against runtime watchdogs/preemption on shared
# TPU workers, and it gives the host a natural progress/checkpoint hook.
# ---------------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("cfg",))
def _init_batch(params: dict, base_B, cfg: SolverConfig):
    return jax.vmap(lambda p: _simulate_one(p, base_B, cfg, _return_step=True)[1])(params)


@partial(jax.jit, static_argnames=("cfg", "n_steps"))
def _segment_batch(params: dict, base_B, carry, cfg: SolverConfig, n_steps: int):
    def one(p, c):
        step, _ = _simulate_one(p, base_B, cfg, _return_step=True)
        return jax.lax.scan(lambda cc, _: step(cc, None), c, None, length=n_steps)[0]

    return jax.vmap(one)(params, carry)


@partial(jax.jit, static_argnames=("cfg",))
def _finalize_batch(params: dict, carry, base_B, cfg: SolverConfig):
    z = jnp.asarray(cfg.cell_centers(), jnp.float32)

    def one(p, c):
        _, accum, _, failed = c
        B = jnp.asarray(base_B, jnp.float32) * p["B_hat"]
        nu_anom = anomalous_profile(p, z, cfg) * (_E * B / _ME)
        return _finalize_one(p, accum, failed, nu_anom, B, cfg)

    return jax.vmap(one)(params, carry)


def simulate_batch_chunked(params: dict, base_B, cfg: SolverConfig, chunk_steps: int = 2000) -> dict:
    """:func:`simulate_batch` with the time loop split into ``chunk_steps``-sized
    device dispatches (bit-identical results; see block comment above)."""
    params = {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}
    base_B = jnp.asarray(base_B, jnp.float32)
    carry = _init_batch(params, base_B, cfg)
    n_segments = -(-cfg.num_steps // chunk_steps)
    for _ in range(n_segments):
        carry = _segment_batch(params, base_B, carry, cfg, chunk_steps)
    return _finalize_batch(params, carry, base_B, cfg)

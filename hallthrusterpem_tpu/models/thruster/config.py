"""Static configuration for the 1-D Hall discharge solver.

Split follows the XLA compilation model: everything that determines *shapes or
control flow* lives in the frozen, hashable :class:`SolverConfig` (one compile per
distinct config); everything that can vary per sample is a batched entry in the
params dict built by :func:`make_params` (one jitted solve serves any batch).

The config surface mirrors what the reference exposes of HallThruster.jl
(``scripts/pem_v0/pem_v0_SPT-100.yml:66-104`` and ``src/hallmd/models/pem_to_julia.json``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from hallthrusterpem_tpu.constants import BOLTZMANN_CONSTANT, atomic_mass_kg

__all__ = ["Geometry", "SolverConfig", "make_params", "PARAM_NAMES"]


@dataclass(frozen=True)
class Geometry:
    channel_length: float = 0.025  # m
    inner_radius: float = 0.0345  # m
    outer_radius: float = 0.05  # m

    @property
    def channel_area(self) -> float:
        return float(np.pi * (self.outer_radius**2 - self.inner_radius**2))

    @property
    def channel_gap(self) -> float:
        return self.outer_radius - self.inner_radius


@dataclass(frozen=True)
class SolverConfig:
    """Hashable static solver configuration (shapes + compile-time switches)."""

    num_cells: int = 100
    ncharge: int = 1
    domain: tuple[float, float] = (0.0, 0.08)
    geometry: Geometry = Geometry()
    propellant: str = "Xenon"
    dt: float = 5e-9
    duration: float = 1e-3
    average_start_time: float = 5e-4
    anom_model: str = "TwoZoneBohm"  # or "GaussianBohm"
    pressure_shift: str = "none"  # or "LogisticPressureShift" | "SimpleLogisticShift"
    ion_wall_losses: bool = True
    electron_wall_losses: bool = True
    #: electron-wall MOMENTUM collisionality as a fraction of the Landmark 1e7 s^-1
    #: base frequency. Round-3 default 0.0: near-wall momentum transfer is
    #: already absorbed by the calibrated anomalous profile — a separate 0.5e7
    #: term added ~30% extra cross-field transport exactly in the barrier and
    #: was a large part of the round-2 discharge-current excess
    #: (docs/validation.md round-3 study).
    wall_momentum_scale: float = 0.0
    #: electron-wall ENERGY loss as a multiple of the Landmark 1e7 s^-1 base.
    #: 1.0 = faithful Landmark. A x2 scale stabilizes the deep breathing cycle at
    #: SPT-100 nominal (depth 13 -> 1.2, I_d -> 4.99 A) but quenches low-flow
    #: operation; a high-Te quadratic enhancement does the reverse — see
    #: docs/validation.md "Breathing-mode stability study".
    wall_energy_scale: float = 1.0
    #: electron-wall energy loss model: "landmark" (nu = 1e7 exp(-20/Te)) or
    #: "sheath" — a BN secondary-electron-emission wall sheath: electron wall flux
    #: balances the Bohm ion flux amplified by 1/(1-gamma(Te)); as the SEE yield
    #: approaches the space-charge crossover the sheath collapses and losses grow
    #: steeply (the physical mechanism HallThruster.jl's WallSheath captures).
    wall_loss_type: str = "sheath"
    see_crossover_eV: float = 45.0  # BN sigma(E) = (E/eps*)^0.576 energy scale
    see_gamma_max: float = 0.983  # space-charge-limited yield ceiling
    apply_thrust_divergence_correction: bool = False
    #: quasi-1D plume expansion outside the channel (HallThruster.jl's
    #: ``solve_plume``; enabled by the reference config
    #: ``pem_v0_SPT-100.yml`` "solve_plume: true"): the beam cross-section grows
    #: as a STATIC cone of half-angle atan(params["tan_div"]) (outer radius
    #: grows, inner shrinks to the axis), diluting plume density — a pure 1-D
    #: channel model otherwise carries beam-level density to the domain end and
    #: overestimates the electron leak across the magnetic barrier. The geometry
    #: is deliberately state-independent: a self-adjusting stream tube couples
    #: into the Ohm impedance integral ahead of the density dilution and
    #: resonates with the breathing mode into an unphysical runaway (measured;
    #: see docs/validation.md round-2 notes). The cone angle is a calibratable
    #: per-sample parameter instead.
    solve_plume: bool = False
    neutral_temp_K: float = 500.0
    ion_temp_K: float = 1000.0
    background_temp_K: float = 150.0
    #: electron-density floor [m^-3]: the minimum ne seen by ionization and the
    #: Ohm solve. Physically a pre-ionization/background-plasma seed: a higher
    #: floor re-ignites a quenched discharge earlier and gentler, shallowing
    #: the breathing limit cycle and shrinking the basin of the cold-dense
    #: attractor (see docs/validation.md round-2 breathing study).
    ne_floor: float = 1e12
    Te_min: float = 0.5  # eV floor
    Te_max: float = 150.0  # eV ceiling (guards rate-table range)
    anode_Te: float = 2.0  # eV Dirichlet BC
    mdot_bohm_fraction: float = 1.0  # anode sheath Bohm-speed limiter scale
    reconstruct: bool = True  # MUSCL minmod reconstruction (2nd-order heavy fluxes)
    #: electron-repelling anode sheath: part of the applied voltage drops in a
    #: sheath that throttles the electron current collected by the anode
    #: (HallThruster.jl's default anode boundary is a sheath, not Dirichlet)
    anode_sheath: bool = True
    #: linearize the inelastic (ionization + excitation) energy sink implicitly
    #: in the electron-energy solve (Newton source linearization; dk/dTe from
    #: the canonical log-poly rate fits). The sink's Te-derivative is enormous
    #: at low Te (exp(-E/Te) thresholds), and treating it explicitly
    #: under-damps reignition spikes of the breathing cycle. Measured at
    #: fidelity (2,2): tames the nominal point (300V/5.16mg I_d 8.4 -> 5.6 A)
    #: but makes the cold-dense anode-starved attractor reachable at 250 V with
    #: round-2 physics. Round-3 default ON: with the corrected pressure-shift
    #: direction and the three-region anomalous profile the nominal map is
    #: steady and the attractor basin is no longer adjacent (volume
    #: recombination was measured NOT to be the forbidding physics — rates are
    #: ~4 orders below transit at the attractor's parameters).
    implicit_inelastic: bool = True
    #: number of evenly-spaced time-series snapshots of the discharge current to
    #: record (the reference's ``simulation.num_save``; 0 = averages only).
    #: Diagnostics feature of the lax path (the Pallas path returns averages).
    num_save: int = 0
    #: neutral velocity-space quadrature: 1 = single fluid at u_n (HallThruster.jl
    #: model), 2 = two-group kinetic-tail model. Monokinetic neutrals make the
    #: breathing-mode refill front artificially sharp — the real injected flux is
    #: a drifting half-Maxwellian (T_w ~ 500 K, v_th ~ 2 u_n at the pem_v0
    #: calibrated u_n ~ 141 m/s) whose fast tail refills the ionization zone
    #: early and reignites the discharge gently (kinetic-neutral breathing
    #: studies, e.g. Hara et al.). The two groups ride at
    #: ``slow_neutral_ratio * u_n`` and ``fast_neutral_ratio * u_n`` with flux
    #: fractions (1-f, f); wall-recombined and anode-recycled neutrals re-enter
    #: the slow group (desorbed at wall temperature).
    neutral_groups: int = 1
    fast_neutral_fraction: float = 0.25
    fast_neutral_ratio: float = 2.2
    slow_neutral_ratio: float = 0.6
    #: 1-sigma axial width [m] of the transport-barrier well in the anomalous
    #: profile (see solver.anomalous_profile; 0 disables). Applies to the
    #: TwoZoneBohm family; GaussianBohm expresses its own well.
    anom_barrier_width: float = 2.5e-3
    #: near-anode anomalous collisionality plateau (dimensionless alpha; 0
    #: disables) with logistic roll-off at ``anode_edge_frac * z_ch`` over
    #: ``anode_edge_width`` [m] — see solver.anomalous_profile
    anode_alpha: float = 0.03
    #: Round-5 default 0.55 (was 0.82): the round-4 anode-zone study measured
    #: that rolling the near-anode conductive plateau off at 0.55*z_ch fixes
    #: the u_ion mass-loading plateau (LIF rel-L2 0.18-0.21 -> 0.09-0.14) and
    #: removes the bistable cold-dense attractor tail that dominated the I_d
    #: surrogate error; the thrust/beam-current shift is re-absorbed by the
    #: re-tuned calibration nominals (runs/r5/tune_d_refine.json).
    anode_edge_frac: float = 0.55
    anode_edge_width: float = 1.5e-3
    #: fraction of wall-recombined ions returned to the channel neutral flow.
    #: A 1-D closure for radial neutral escape: neutrals desorbed near the exit
    #: plane partly leave through the channel mouth without re-ionizing, which
    #: is what keeps measured anode mass utilization at ~0.90 (a pure 1-D
    #: recycle-everything model re-ionizes the lot and drives eta_m -> 1).
    #: Round-5 default 0.78 (was 0.93), from the frac-0.55 re-tune: with the
    #: shorter conductive zone more of the recycled flow re-ionizes, so a lower
    #: recycle fraction is needed to hold eta_m at the measured ~0.90.
    wall_recycling: float = 0.78
    dtype: str = "float32"

    @property
    def nc(self) -> int:
        """Total cells including the two ghost/boundary cells (the reference's
        observable grid size, ``tests/test_thruster.py:185-186``)."""
        return self.num_cells + 2

    @property
    def dz(self) -> float:
        return (self.domain[1] - self.domain[0]) / self.num_cells

    @property
    def mi(self) -> float:
        return atomic_mass_kg(self.propellant)

    @property
    def num_steps(self) -> int:
        return max(1, int(round(self.duration / self.dt)))

    @property
    def avg_start_step(self) -> int:
        return min(self.num_steps - 1, int(round(self.average_start_time / self.dt)))

    def cell_centers(self) -> np.ndarray:
        """NC cell-center coordinates with boundary points at the domain edges
        (matches HallThruster.jl's output ``z`` grid of num_cells+2 points)."""
        z0, z1 = self.domain
        interior = z0 + (np.arange(self.num_cells) + 0.5) * self.dz
        return np.concatenate([[z0], interior, [z1]])


#: per-sample parameter names (each becomes a batched scalar array)
PARAM_NAMES = (
    "V_d",        # discharge (anode) voltage [V]
    "V_cc",       # cathode coupling voltage [V]
    "mdot_a",     # anode mass flow rate [kg/s]
    "P_b",        # background pressure [Torr]
    "T_e_cath",   # cathode electron temperature BC [eV]
    "u_n",        # neutral velocity [m/s]
    "l_t",        # two-zone transition length [m]
    "a1",         # anomalous coeff inside channel (TwoZoneBohm c1)
    "a2",         # anomalous coeff outside channel (TwoZoneBohm c2, absolute)
    "hall_min",   # GaussianBohm trough coefficient
    "hall_max",   # GaussianBohm background coefficient
    "center",     # GaussianBohm center [m]
    "width",      # GaussianBohm width [m]
    "shift_dz",   # pressure-shift displacement [channel lengths]
    "shift_z0",   # pressure-shift upstream limit [channel lengths]
    "shift_pstar",  # pressure-shift turning pressure [Torr]
    "shift_alpha",  # pressure-shift logistic steepness [-]
    "anom_depth",   # transport-barrier well depth at the B-peak (0..1) [-]
    "anom_width",   # transport-barrier well 1-sigma width [m]; 0 = cfg.anom_barrier_width
    "f_n",        # neutral ingestion multiplier [-]
    "c_w",        # wall loss scale [-]
    "B_hat",      # magnetic field scale [-]
    "tan_div",    # plume stream-tube expansion slope (solve_plume cone tangent) [-]
    "circuit_R",  # cathode-line series resistance [Ohm] (facility filter unit)
    "circuit_L",  # cathode-line series inductance [H]
)

_DEFAULTS = {
    "V_d": 300.0,
    "V_cc": 0.0,
    "mdot_a": 5e-6,
    "P_b": 0.0,
    "T_e_cath": 3.0,
    "u_n": 300.0,
    "l_t": 0.003,
    "a1": 0.00625,
    "a2": 0.0625,
    "hall_min": 0.00625,
    "hall_max": 0.0625,
    "center": 0.025,
    "width": 0.005,
    "shift_dz": 0.2,
    "shift_z0": 0.0,
    "shift_pstar": 45.0e-6,
    "shift_alpha": 15.0,
    "anom_depth": 0.904,  # round-5 re-tuned barrier depth (runs/r5/tune_d_refine.json)
    "anom_width": 0.0,
    "f_n": 1.0,
    "c_w": 1.0,
    "B_hat": 1.0,
    # Round-5 re-tune: the frac-0.55 winner wants a tighter stream-tube cone
    # (tan 0.183 ~ 10.4 deg half-angle near-field slope; the far-field 20 deg
    # divergence lives in the plume model's c1..c3 fit, not this near-plume
    # expansion) — runs/r5/tune_d_refine.json idx 184.
    "tan_div": 0.1835,
    # Discharge-circuit filter (the cathode-line RL filter unit every Hall-thruster
    # test facility inserts between the power supply and the thruster; e.g. the
    # SPT-100/PPS-1350 qualification harness). The plasma sees
    # V_t = V_d - R I - L dI/dt instead of an ideal voltage source: breathing-mode
    # reignition current spikes are throttled by the inductor and the unphysical
    # high-current attractors are starved by the resistive drop. Defaults are off
    # (ideal source) for parity with HallThruster.jl's voltage-driven model.
    "circuit_R": 0.0,
    "circuit_L": 0.0,
}


def make_params(overrides: Optional[dict] = None, batch_shape: tuple = ()) -> dict:
    """Build the full per-sample parameter dict, broadcasting defaults.

    :param overrides: name -> scalar or (batch,) array
    :param batch_shape: common batch shape (inferred from overrides if empty)
    """
    import jax.numpy as jnp

    overrides = dict(overrides or {})
    unknown = set(overrides) - set(PARAM_NAMES)
    if unknown:
        raise KeyError(f"Unknown solver parameters: {sorted(unknown)}")
    if not batch_shape:
        for v in overrides.values():
            batch_shape = np.broadcast_shapes(batch_shape, np.shape(v))
    params = {}
    for name in PARAM_NAMES:
        val = overrides.get(name, _DEFAULTS[name])
        params[name] = jnp.broadcast_to(jnp.asarray(val, dtype=jnp.float32), batch_shape)
    return params


def background_neutral_ingestion_flux(P_b_torr, f_n, cfg: SolverConfig):
    """Effusion mass-flux of facility background neutrals through the exit plane,
    kg/s (added to the anode flow; models HallThruster.jl's
    ``neutral_ingestion_multiplier`` config, ``pem_to_julia.json:22``)."""
    import jax.numpy as jnp

    from hallthrusterpem_tpu.constants import TORR_2_PA

    P = jnp.asarray(P_b_torr) * TORR_2_PA
    flux = P * jnp.sqrt(cfg.mi / (2 * np.pi * BOLTZMANN_CONSTANT * cfg.background_temp_K))
    return f_n * flux * cfg.geometry.channel_area

"""Thruster component: batched in-process 1-D Hall discharge solver.

Public API mirrors the reference wrapper (``src/hallmd/models/thruster.py:281-512``):
``run_simulation`` (≙ ``run_hallthruster_jl`` — same input-tree schema, but no
subprocess/JSON/tempfile machinery) and ``hallthruster_jl`` (the PEM component).
One call evaluates an entire batch of operating conditions in a single jitted,
``vmap``-ed solve; failed samples surface as NaN rows instead of raised exceptions
(mask semantics — SURVEY.md §5.3)."""

from __future__ import annotations

import copy
import json
import os
import time
from pathlib import Path
from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from hallthrusterpem_tpu.core.dataset import Dataset
from hallthrusterpem_tpu.models.thruster.config import Geometry, SolverConfig, make_params
from hallthrusterpem_tpu.models.thruster.mapping import (
    PEM_TO_JULIA,
    convert_to_pem,
    default_model_fidelity,
    format_input_tree,
)
from hallthrusterpem_tpu.models.thruster.solver import simulate_batch
from hallthrusterpem_tpu.ops.interp import interp1d

#: whether the fused Pallas kernel implements the quasi-1D plume expansion
#: (solver_backend falls back to the lax path for solve_plume configs until the
#: kernel port lands)
PALLAS_SOLVE_PLUME = True
#: whether the fused Pallas kernel implements the two-group neutral model
#: (ported round 5: fast group rides an extra state lane-block; parity vs the
#: lax path is pinned by tests/test_pallas.py::test_two_group_kernel_matches_lax)
PALLAS_NEUTRAL_GROUPS = True

__all__ = [
    "hallthruster_jl",
    "run_simulation",
    "run_hallthruster_jl",
    "PEM_TO_JULIA",
    "SolverConfig",
    "simulate_batch",
]


def _load_bfield(thr: dict, cfg: SolverConfig) -> np.ndarray:
    """Magnetic-field profile on solver cell centers from a device dict."""
    z_cells = cfg.cell_centers()
    mf = (thr or {}).get("magnetic_field", {})
    file = mf.get("file")
    if file and Path(str(file)).exists():
        raw = np.genfromtxt(str(file), delimiter=",", skip_header=1)
        if raw.ndim == 1 or raw.shape[1] < 2:  # maybe headerless
            raw = np.genfromtxt(str(file), delimiter=",")
        zb, Bb = raw[:, 0], raw[:, 1]
        return np.asarray(interp1d(z_cells, zb, Bb))
    # fallback: representative Gaussian profile peaked at the channel exit
    # (SPT-100-class: ~200 G peak, ~12 mm decay into the plume — published
    # SPT-100 maps place the peak radial field at 160-230 G with the field
    # falling to <25% within ~2 cm of the exit)
    z_ch = cfg.geometry.channel_length
    s = np.where(z_cells < z_ch, 0.011, 0.012)
    return 0.020 * np.exp(-0.5 * ((z_cells - z_ch) / s) ** 2)


def _tree_to_solver_inputs(tree: dict):
    """Split the input tree into (static SolverConfig, per-sample params, base B)."""
    config = tree.get("config", {})
    sim = tree.get("simulation", {})
    post = tree.get("postprocess", {})
    thr = config.get("thruster", {}) or {}

    geom_d = thr.get("geometry", {})
    geometry = Geometry(
        channel_length=float(geom_d.get("channel_length", 0.025)),
        inner_radius=float(geom_d.get("inner_radius", 0.0345)),
        outer_radius=float(geom_d.get("outer_radius", 0.05)),
    )
    domain = config.get("domain", (0.0, 0.08))
    duration = float(sim.get("duration", 1e-3))

    anom = config.get("anom_model", {}) or {}
    shift = "none"
    inner = anom
    if anom.get("type") in ("LogisticPressureShift", "SimpleLogisticShift"):
        shift = anom["type"]
        inner = anom.get("model", {}) or {}
    anom_type = inner.get("type", "TwoZoneBohm")

    num_cells = int(sim.get("grid", {}).get("num_cells", 100))
    ncharge = int(config.get("ncharge", 1))
    dt = float(np.min(np.asarray(sim.get("dt", 5e-9))))
    if sim.get("adaptive"):
        # The reference config requests HallThruster.jl's adaptive timestepping
        # (pem_v0_SPT-100.yml:93). Under XLA we keep static shapes (one compiled
        # program per config), so adaptivity is quasi-static: pick the
        # CFL-consistent dt for THIS config (same bound default_model_fidelity
        # applies on the fidelity ladder, reference thruster.py:140-181) and
        # clamp it to the requested [min_dt, max_dt] window. The YAML's dt then
        # acts as the initial guess it is in HallThruster.jl, not a hard step.
        fid = default_model_fidelity((0, ncharge - 1), {"config": config})
        dx = (float(domain[1]) - float(domain[0])) / (num_cells + 1)
        dt_cfl = fid["dt"] * dx / (float(domain[1]) / (fid["num_cells"] + 1))
        dt = float(np.clip(dt_cfl, float(sim.get("min_dt", dt_cfl)),
                           float(sim.get("max_dt", dt_cfl))))

    # three-region anomalous-profile shape constants (solver.anomalous_profile):
    # optionally overridable per-config for profile-shape studies
    shape_keys = {k: float(config[k]) for k in
                  ("anode_alpha", "anode_edge_frac", "anode_edge_width", "anom_barrier_width",
                   "wall_recycling")
                  if config.get(k) is not None}

    cfg = SolverConfig(
        num_cells=num_cells,
        ncharge=ncharge,
        domain=(float(domain[0]), float(domain[1])),
        geometry=geometry,
        **shape_keys,
        propellant=str(config.get("propellant", "Xenon")),
        dt=dt,
        duration=duration,
        average_start_time=float(post.get("average_start_time", 0.5 * duration)),
        anom_model=anom_type,
        pressure_shift=shift,
        ion_wall_losses=bool(config.get("ion_wall_losses", True)),
        solve_plume=bool(config.get("solve_plume", False)),
        # two-group neutral velocity-space quadrature (kinetic-tail closure,
        # docs/validation.md §two-group): supported by BOTH backends since the
        # round-5 kernel port
        neutral_groups=int(config.get("neutral_groups", 1)),
        apply_thrust_divergence_correction=bool(config.get("apply_thrust_divergence_correction", False)),
        # discharge-current time traces (the reference's simulation.num_save,
        # pem_v0_SPT-100.yml:101) are honored directly: the K-step Pallas kernel
        # records I_d(t) in spare accumulator lanes at full kernel speed, so the
        # config key no longer needs an env-var opt-in. HTPEM_TRACES=0 force-disables.
        num_save=0 if os.environ.get("HTPEM_TRACES") == "0" else int(sim.get("num_save", 0)),
    )
    if sim.get("adaptive"):
        import logging

        logging.getLogger("hallthrusterpem_tpu").info(
            "simulation.adaptive=true: quasi-static adaptive stepping, "
            "CFL-consistent dt=%.3g s clamped to [min_dt, max_dt]", cfg.dt,
        )

    overrides = {}

    def grab(name, *path, default=None):
        node = config
        for key in path[:-1]:
            node = node.get(key, {}) if isinstance(node, dict) else {}
        val = node.get(path[-1]) if isinstance(node, dict) else None
        if val is not None:
            overrides[name] = val
        elif default is not None:
            overrides[name] = default

    grab("V_d", "discharge_voltage")
    grab("V_cc", "cathode_coupling_voltage")
    grab("mdot_a", "anode_mass_flow_rate")
    grab("P_b", "background_pressure_Torr")
    grab("T_e_cath", "cathode_Tev")
    grab("u_n", "neutral_velocity")
    grab("l_t", "transition_length")
    grab("f_n", "neutral_ingestion_multiplier")
    grab("B_hat", "magnetic_field_scale")
    # plume stream-tube cone tangent (per-sample; sets both the quasi-1D area
    # expansion and the thrust cos-projection when
    # apply_thrust_divergence_correction is on)
    grab("tan_div", "plume_divergence_tan")
    grab("circuit_R", "circuit", "R")
    grab("circuit_L", "circuit", "L")
    wl = config.get("wall_loss_model", {}) or {}
    if wl.get("loss_scale") is not None:
        overrides["c_w"] = wl["loss_scale"]
    for src, dst in (("c1", "a1"), ("c2", "a2"), ("hall_min", "hall_min"),
                     ("hall_max", "hall_max"), ("center", "center"), ("width", "width"),
                     ("barrier_scale", "anom_depth"), ("barrier_width", "anom_width")):
        if inner.get(src) is not None:
            overrides[dst] = inner[src]
    for src, dst in (("dz", "shift_dz"), ("z0", "shift_z0"), ("pstar", "shift_pstar"),
                     ("alpha", "shift_alpha"), ("shift_length", "shift_dz")):
        if anom.get(src) is not None:
            overrides[dst] = anom[src]

    params = make_params(overrides)
    base_B = _load_bfield(thr, cfg)
    return cfg, params, base_B


def solver_backend(cfg: SolverConfig) -> tuple[str, int]:
    """(backend, chunk_steps) policy: the fused Pallas kernel on TPU (14x faster
    than the multi-fusion lax scan there), the lax path elsewhere; long time loops
    dispatched in chunks on TPU (shared-worker robustness). Env overrides:
    HTPEM_SOLVER=lax|pallas, HTPEM_CHUNK_STEPS=N (0 = monolithic)."""
    import os

    import jax

    on_tpu = jax.default_backend() == "tpu"
    explicit = os.environ.get("HTPEM_SOLVER", "")
    choice = explicit
    if not choice:
        # num_save no longer forces the lax path: the K-step kernel records
        # full-resolution I_d(t) in spare accumulator lanes at kernel speed
        choice = "pallas" if (on_tpu and cfg.nc <= 254) else "lax"
    if cfg.solve_plume and choice == "pallas" and not PALLAS_SOLVE_PLUME:
        choice = "lax"  # never route plume physics to a kernel that lacks it
    if cfg.neutral_groups > 1 and choice == "pallas" and not PALLAS_NEUTRAL_GROUPS:
        # two-group neutrals not ported to the fused kernel: the lax fallback
        # costs ~48x at nominal fidelity (runs/r4/parity_tpu.json wall times),
        # which must never happen silently (round-4 verdict)
        if explicit == "pallas":
            raise NotImplementedError(
                "HTPEM_SOLVER=pallas requested, but neutral_groups>1 is not "
                "implemented in the fused Pallas kernel — unset HTPEM_SOLVER "
                "to accept the (~48x slower) lax path, or use neutral_groups=1")
        import logging

        logging.getLogger("hallthrusterpem_tpu").warning(
            "neutral_groups=%d is not implemented in the fused Pallas kernel: "
            "falling back to the lax path (~48x slower at nominal fidelity)",
            cfg.neutral_groups)
        choice = "lax"
    chunk = int(os.environ.get("HTPEM_CHUNK_STEPS", "2000" if on_tpu else "0"))
    return choice, chunk


def dispatch_solver(params: dict, base_B, cfg: SolverConfig) -> dict:
    """Run the discharge solve with the platform-appropriate backend."""
    backend, chunk = solver_backend(cfg)
    if backend == "pallas":
        from hallthrusterpem_tpu.models.thruster.pallas_step import simulate_batch_pallas_multi

        return simulate_batch_pallas_multi(params, base_B, cfg)
    if chunk > 0 and cfg.num_steps > chunk and cfg.num_save == 0:
        # (chunked dispatch drops time traces; num_save runs go monolithic)
        from hallthrusterpem_tpu.models.thruster.solver import simulate_batch_chunked

        return simulate_batch_chunked(params, base_B, cfg, chunk_steps=chunk)
    return simulate_batch(params, base_B, cfg)


def simulate_batch_sharded(params: dict, base_B, cfg: SolverConfig, mesh,
                           axis_name: str = "batch", backend: Optional[str] = None,
                           interpret: bool = False) -> dict:
    """Run the discharge solve SPMD over a device ``Mesh``, batch axis sharded.

    This is the multi-chip *production* path (SURVEY.md §2.6): ``shard_map``
    hands each device its batch shard, inside which the regular backend runs —
    including the fused Pallas K-step kernel, whose ``pallas_call`` batch grid
    is then per-shard (a Pallas kernel under plain ``jit`` + NamedSharding
    would not be partitioned automatically). The solve is elementwise over the
    batch, so there are no collectives: perfect weak scaling over ICI.

    :param params: per-sample parameter dict; every leaf ``(B, ...)`` with B a
        multiple of the mesh's batch-axis size
    :param backend: "pallas" | "lax" | None (None = :func:`solver_backend` policy)
    :param interpret: run the Pallas kernel in interpret mode (CPU CI meshes)
    """
    import jax
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map if hasattr(jax, "shard_map") else None
    if shard_map is None:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    if backend is None:
        backend, _ = solver_backend(cfg)

    n_shards = mesh.shape[axis_name]
    B = jnp.shape(next(iter(params.values())))[0]
    if B % n_shards:
        raise ValueError(f"batch {B} must divide the {axis_name}-axis size {n_shards} "
                         "(pad with parallel.mesh.pad_to_multiple)")

    def local_solve(p, bB):
        if backend == "pallas":
            from hallthrusterpem_tpu.models.thruster.pallas_step import (
                simulate_batch_pallas_multi,
            )

            return simulate_batch_pallas_multi(p, bB, cfg, interpret=interpret)
        return simulate_batch(p, bB, cfg)

    # check_vma=False: pallas_call's output avals carry no varying-mesh-axes
    # metadata, so jax's shard_map vma check cannot see through the kernel
    fn = shard_map(local_solve, mesh=mesh, in_specs=(P(axis_name), P()),
                   out_specs=P(axis_name), check_vma=False)
    return fn(params, jnp.asarray(base_B, jnp.float32))


def run_simulation(json_input: dict, **_compat) -> dict:
    """Run the discharge solver from a reference-format input tree
    (``{'config': ..., 'simulation': ..., 'postprocess': ...}``) and return a
    reference-format output tree (``{'output': {'average': ...}, ...}``).

    Drop-in for the reference's ``HallThruster.run_simulation`` JSON round-trip
    (``thruster.py:281-375``) — but in-process, jitted, and batched: any config
    value may be a (batch,) array.
    """
    if not isinstance(json_input, dict):
        with open(json_input, "r", encoding="utf-8") as fd:
            json_input = json.load(fd)

    cfg, params, base_B = _tree_to_solver_inputs(json_input)

    batch_shape = np.broadcast_shapes(*[np.shape(v) for v in params.values()])
    scalar_in = batch_shape == ()
    if scalar_in:
        params = {k: jnp.reshape(v, (1,)) for k, v in params.items()}

    raw = dispatch_solver(params, jnp.asarray(base_B, jnp.float32), cfg)
    raw = {k: np.asarray(v) for k, v in raw.items()}
    if scalar_in:
        raw = {k: v[0] for k, v in raw.items()}

    z_axis = 0 if scalar_in else 1
    batch = raw["thrust"].shape
    z_b = np.broadcast_to(raw["z"], batch + (cfg.nc,)) if not scalar_in else raw["z"]

    average = {
        "thrust": raw["thrust"],
        "discharge_current": raw["discharge_current"],
        "discharge_current_std": raw["discharge_current_std"],
        "ion_current": raw["ion_current"],
        "current_eff": raw["current_eff"],
        "mass_eff": raw["mass_eff"],
        "voltage_eff": raw["voltage_eff"],
        "anode_eff": raw["anode_eff"],
        # ui[Z] is the (batch, NC) velocity profile of charge state Z+1
        "ui": [np.take(raw["ui"], zi, axis=z_axis) for zi in range(cfg.ncharge)],
        "z": z_b,
        "nu_anom": raw["nu_anom"],
        "B": raw["B"],
        "Tev": raw["Tev"],
        "ne": raw["ne"],
        "nn": raw["nn"],
        "potential": raw["potential"],
        "E": raw["E"],
    }
    if "discharge_current_trace" in raw:
        average["discharge_current_trace"] = raw["discharge_current_trace"]
        average["trace_times"] = raw["trace_times"]
        if json_input.get("postprocess", {}).get("cycle_average"):
            # integer-breathing-cycle I_d average from the trace: removes the
            # window-phase noise term from training labels (postprocess.py)
            from hallthrusterpem_tpu.models.thruster.postprocess import cycle_averaged_current

            i_cyc = np.asarray(cycle_averaged_current(
                raw["discharge_current_trace"], raw["trace_times"], cfg.average_start_time))
            average["discharge_current"] = np.where(
                np.isfinite(i_cyc), i_cyc, average["discharge_current"])
    output_tree = {
        "output": {"average": average},
        "config": json_input.get("config", {}),
        "simulation": json_input.get("simulation", {}),
        "postprocess": json_input.get("postprocess", {}),
    }

    if out_file := json_input.get("postprocess", {}).get("output_file"):
        _write_output_json(out_file, output_tree)
    return output_tree


# alias for API parity with the reference wrapper name
run_hallthruster_jl = run_simulation


def _write_output_json(path, tree: dict):
    def _tolist(x):
        if isinstance(x, dict):
            return {k: _tolist(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [_tolist(v) for v in x]
        if isinstance(x, (np.ndarray, jnp.ndarray)):
            return np.asarray(x).tolist()
        if isinstance(x, (np.floating, np.integer)):
            return x.item()
        return x

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", encoding="utf-8") as fd:
        json.dump({k: _tolist(v) for k, v in tree.items()}, fd)


def hallthruster_jl(
    thruster_inputs: Optional[Dataset] = None,
    thruster="SPT-100",
    config: Optional[dict] = None,
    simulation: Optional[dict] = None,
    postprocess: Optional[dict] = None,
    model_fidelity: tuple = (2, 2),
    output_path: Optional[str] = None,
    version: Optional[str] = None,  # accepted for config parity; no Julia here
    pem_to_julia: Optional[dict] = None,
    fidelity_function: Optional[Callable] = None,
    julia_script=None,  # accepted for API parity; unused
    run_kwargs: Optional[dict] = None,  # accepted for API parity; unused
    shock_threshold: Optional[float] = None,
) -> Dataset:
    """PEM thruster component: batched 1-D Hall discharge simulation.

    Call-signature parity with reference ``hallmd.models.thruster.hallthruster_jl``
    (``thruster.py:378-512``), with batch-first semantics: every entry of
    ``thruster_inputs`` may be a (batch,) array, and the whole batch is solved in
    one jitted ``vmap``-ed call. Non-physical samples (negative thrust/beam
    current, reference ``thruster.py:490-494``) and "shock-like" ion-velocity
    profiles (``thruster.py:496-502``) are returned as NaN rows rather than raised.
    """
    if pem_to_julia is None:
        _map = copy.deepcopy(PEM_TO_JULIA)
    else:
        _map = copy.deepcopy(PEM_TO_JULIA)
        _map.update(pem_to_julia)

    thruster_inputs = dict(thruster_inputs or {})
    tree = format_input_tree(
        thruster_inputs,
        _map,
        thruster=thruster,
        config=config,
        simulation=simulation,
        postprocess=postprocess,
        model_fidelity=model_fidelity,
        fidelity_function=fidelity_function,
    )

    if output_path is not None:
        fname = "hallthruster_jl"
        if name := tree["config"].get("thruster", {}).get("name"):
            fname += f"_{name}"
        fname += f"_{int(time.time() * 1e6) % 2**31:x}.json"
        tree["postprocess"]["output_file"] = str((Path(output_path) / fname).resolve())

    t1 = time.time()
    sim_results = run_simulation(tree)
    t2 = time.time()

    outputs = convert_to_pem(sim_results, _map)
    outputs = {k: np.asarray(v) for k, v in outputs.items()}

    # failure masks (NaN-row semantics replacing the reference's raises,
    # thruster.py:490-494), extended with same-spirit absurdity guards: a
    # persistent exit backflow (negative mass efficiency) or negative discharge
    # current is a pathological limit-cycle, not a measurement
    thrust = outputs.get("T", np.zeros(()))
    beam = outputs.get("I_B0", np.zeros(()))
    bad = (np.asarray(thrust) < 0) | (np.asarray(beam) < 0)
    if "I_d" in outputs:
        bad = bad | (np.asarray(outputs["I_d"]) < 0)
    if "eta_m" in outputs:
        bad = bad | (np.asarray(outputs["eta_m"]) < 0)
    # beam current cannot exceed the fully-stripped mass-flow limit
    # Z e mdot / m_i (x1.5 margin for ingestion + averaging noise): catches the
    # cold-dense "glow" attractor whose reported beam current is nonsense
    mdot_any = tree.get("config", {}).get("anode_mass_flow_rate")
    if mdot_any is not None and "I_B0" in outputs:
        from hallthrusterpem_tpu.constants import FUNDAMENTAL_CHARGE, atomic_mass_kg

        mi = atomic_mass_kg(tree["config"].get("propellant", "Xenon"))
        zmax = int(np.max(np.asarray(tree["config"].get("ncharge", 3))))
        i_eq = FUNDAMENTAL_CHARGE * np.asarray(mdot_any, dtype=float) / mi
        i_max = 1.5 * zmax * i_eq
        bad = bad | (np.asarray(outputs["I_B0"]) > i_max)
        # ... and a self-sustained discharge cannot carry (time-averaged) less
        # than ~20% of the anode-flow-equivalent current e*mdot/m_i: published
        # Hall discharges run at I_d/I_eq ~ 1-3, and the solver's quenched
        # "extinction" states sit 4+ orders below that with a near-empty gap
        # between the two populations (measured over 1.6k pem_v0 training
        # knots: 183 quenched below 0.05*I_eq, 2 in [0.05, 0.2), live
        # population resumes above 0.2). The reference treats such failed
        # discharges as errors -> NaN rows (thruster.py:490-502 semantics).
        # Only meaningful for quasi-steady averages: gate on the averaging
        # window starting after the ~0.1-0.2 ms ignition transient, so short
        # diagnostic/CI solves (e.g. 60 us) are not mislabeled as quenched.
        avg_start = float(tree.get("postprocess", {}).get("average_start_time", 0.0) or 0.0)
        if "I_d" in outputs and avg_start >= 2e-4:
            # ... and cannot (time-averaged) EXCEED ~8x the anode-flow-
            # equivalent current either: published Hall discharges run at
            # I_d/I_eq ~ 1-3 and the widest pem_v0 prior corners reach ~6
            # (measured over the round-5 49k corpus: live population tops out
            # at 6.0, the breathing-runaway population starts at ~16 and runs
            # to 113 — 37/47k rows). A 100 A "SPT-100" average is a model-
            # validity failure (the reference solver diverges -> raise -> NaN,
            # thruster.py:490-502), and its label poisons any regression that
            # trains on it.
            i_d_arr = np.asarray(outputs["I_d"])
            bad = bad | (i_d_arr < 0.2 * i_eq) | (i_d_arr > 8.0 * i_eq)
    if shock_threshold is not None and "u_ion" in outputs:
        z = outputs["u_ion_coords"]
        ui = outputs["u_ion"]
        zmax = np.take_along_axis(
            np.broadcast_to(z, ui.shape), np.argmax(ui, axis=-1, keepdims=True), axis=-1
        )[..., 0]
        bad = bad | (zmax < shock_threshold)
    bad = ~np.isfinite(np.asarray(thrust)) | bad
    bad = np.asarray(bad)
    if np.any(bad):
        for key, val in outputs.items():
            val = np.asarray(val, dtype=float)
            mask = bad.reshape(bad.shape + (1,) * (val.ndim - bad.ndim))
            outputs[key] = np.where(np.broadcast_to(mask, val.shape), np.nan, val)

    batch_n = max(int(np.prod(np.shape(thrust))), 1)
    outputs["model_cost"] = np.full(np.shape(thrust), (t2 - t1) / batch_n)

    if output_path is not None:
        out_file = Path(tree["postprocess"]["output_file"])
        outputs["output_path"] = out_file.relative_to(Path(output_path).resolve()).as_posix()

    outputs["thruster_output"] = sim_results
    return outputs

"""Breathing-mode diagnostic: spatiotemporal snapshots of one nominal discharge.

Runs a single SPT-100 operating point with the lax step function and records
decimated full-state snapshots (nn, ne, Te, E_z, u_i, j_d) so the limit-cycle
phases (ionization burst -> expulsion -> quench -> neutral refill) can be
inspected quantitatively. Prints cycle statistics and phase timing.

This is the working tool behind docs/validation.md's breathing-mode sections
(reference context: HallThruster.jl's published SPT-100 sims oscillate at
10-30 kHz with O(+-50%) depth; the round-1 solver breathed 20:1).

Usage: python scripts/diagnose_breathing.py [--cells 100] [--ncharge 1]
       [--duration 1e-3] [--every 100] [--vd 300] [--mdot 5.16e-6] [--cpu]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import argparse

parser = argparse.ArgumentParser()
parser.add_argument("--cells", type=int, default=100)
parser.add_argument("--ncharge", type=int, default=1)
parser.add_argument("--duration", type=float, default=1.0e-3)
parser.add_argument("--every", type=int, default=100, help="snapshot stride (steps)")
parser.add_argument("--vd", type=float, default=300.0)
parser.add_argument("--mdot", type=float, default=5.16e-6)
parser.add_argument("--u-n", type=float, default=300.0)
parser.add_argument("--a1", type=float, default=0.00625)
parser.add_argument("--a2", type=float, default=0.0625)
parser.add_argument("--c-w", type=float, default=1.0)
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--plume", action="store_true", help="solve_plume + divergence correction")
parser.add_argument("--shift", action="store_true", help="LogisticPressureShift (reference z0=-0.031)")
parser.add_argument("--circuit-r", type=float, default=0.0, help="cathode-line resistance [Ohm]")
parser.add_argument("--circuit-l", type=float, default=0.0, help="cathode-line inductance [H]")
parser.add_argument("--implicit-inelastic", action="store_true")
parser.add_argument("--shift-dz", type=float, default=0.2)
parser.add_argument("--te-cath", type=float, default=3.0)
parser.add_argument("--l-t", type=float, default=0.003)
parser.add_argument("--npz", type=str, default="", help="save snapshots to this .npz")


def main(argv=None):
    args = parser.parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from hallthrusterpem_tpu.models.thruster import _load_bfield
    from hallthrusterpem_tpu.models.thruster.config import SolverConfig, make_params
    from hallthrusterpem_tpu.models.thruster.solver import make_step
    from hallthrusterpem_tpu.utils import load_thruster

    device = load_thruster("SPT-100")
    cfg = SolverConfig(
        num_cells=args.cells, ncharge=args.ncharge, dt=5e-9,
        duration=args.duration, average_start_time=args.duration / 2,
        solve_plume=args.plume, apply_thrust_divergence_correction=args.plume,
        pressure_shift="LogisticPressureShift" if args.shift else "none",
        implicit_inelastic=args.implicit_inelastic,
    )
    base_B = jnp.asarray(_load_bfield(device, cfg), jnp.float32)
    p = make_params({
        "V_d": args.vd, "mdot_a": args.mdot, "V_cc": 30.0, "P_b": 1e-5,
        "u_n": args.u_n, "a1": args.a1, "a2": args.a2, "c_w": args.c_w,
        "shift_z0": -0.03104, "shift_dz": args.shift_dz, "T_e_cath": args.te_cath,
        "l_t": args.l_t, "circuit_R": args.circuit_r, "circuit_L": args.circuit_l,
    })
    p = {k: jnp.asarray(v[0] if getattr(v, "ndim", 0) else v, jnp.float32) for k, v in p.items()}

    step, carry0 = make_step(p, base_B, cfg)
    every = args.every
    n_snap = cfg.num_steps // every
    mi = cfg.mi
    A_ch = cfg.geometry.channel_area

    def snap_block(carry, _):
        def inner(c, _):
            c2, _ys = step(c, None)
            return c2, None

        carry, _ = jax.lax.scan(inner, carry, None, length=every)
        (rho_n, rho_i, mom_i, nE, I_cir), accum, i, failed = carry
        ni = rho_i / mi
        ne = jnp.sum(jnp.arange(1, cfg.ncharge + 1, dtype=jnp.float32)[:, None] * ni, axis=0)
        Te = (2.0 / 3.0) * nE / jnp.maximum(ne, 1e12)
        u1 = mom_i[0] / jnp.maximum(rho_i[0], 1e10 * mi)
        # instantaneous exit quantities
        ex = cfg.nc - 2
        zq = jnp.arange(1, cfg.ncharge + 1, dtype=jnp.float32)
        I_B = A_ch * 1.602176634e-19 * jnp.sum(zq * rho_i[:, ex] / mi *
                                               mom_i[:, ex] / jnp.maximum(rho_i[:, ex], 1e10 * mi))
        snap = {
            "nn": jnp.sum(rho_n, axis=0) / mi, "ne": ne, "Te": Te, "u1": u1,
            "I_d": I_cir, "I_B": I_B,
            "rho_i_ex": rho_i[:, ex] / mi,
        }
        return carry, snap

    # run with accum I_d used as cumulative (we difference it for the block means)
    carry, snaps = jax.lax.scan(snap_block, carry0, None, length=n_snap)
    snaps = {k: np.asarray(v) for k, v in snaps.items()}

    # block-mean discharge current from the cumulative accumulator (only counts
    # inside the averaging window) - instead use I_B + reconstruct from snapshots
    t = (np.arange(n_snap) + 1.0) * every * cfg.dt

    nn, ne, Te = snaps["nn"], snaps["ne"], snaps["Te"]
    z = np.asarray(cfg.cell_centers())
    ch = z <= cfg.geometry.channel_length

    IB = snaps["I_B"]
    half = n_snap // 2
    ib = IB[half:]
    print(f"# {n_snap} snapshots, dt_snap = {every * cfg.dt * 1e6:.2f} us")
    print(f"exit beam current I_B: mean {ib.mean():.2f} median {np.median(ib):.2f} "
          f"p10 {np.percentile(ib, 10):.2f} p90 {np.percentile(ib, 90):.2f} max {ib.max():.2f} A")
    # dominant breathing frequency from I_B spectrum
    y = ib - ib.mean()
    if len(y) > 16:
        f = np.fft.rfftfreq(len(y), d=every * cfg.dt)
        P = np.abs(np.fft.rfft(y)) ** 2
        print(f"dominant frequency: {f[1 + np.argmax(P[1:])] / 1e3:.1f} kHz")
    print(f"channel-average Te: mean {Te[half:, ch].mean():.1f} max {Te[half:].max():.1f} eV")
    print(f"channel-min nn: median {np.median(nn[half:, ch].min(axis=1)):.2e} "
          f"min {nn[half:, ch].min():.2e} m^-3")
    print(f"peak ne: median {np.median(ne[half:].max(axis=1)):.2e} max {ne[half:].max():.2e}")
    if cfg.ncharge > 1:
        rex = snaps["rho_i_ex"][half:]
        tot = rex.sum(axis=1, keepdims=True)
        fr = (rex / np.maximum(tot, 1e-30)).mean(axis=0)
        print("exit charge-state fractions:", np.array2string(fr, precision=3))

    if args.npz:
        np.savez(args.npz, t=t, z=z, **snaps)
        print(f"saved {args.npz}")


if __name__ == "__main__":
    main()

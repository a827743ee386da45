"""Micro-benchmark of the Pallas multistep discharge kernel on the real TPU.

Prints per-step wall time for the production configuration (200 cells, 3 charge
states). Used to validate kernel optimizations (docs/validation.md "Kernel
performance"). np.asarray fetch is the only reliable sync on the axon tunnel.
"""

import sys as _sys
import time
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import numpy as np
import jax.numpy as jnp

from hallthrusterpem_tpu.models.thruster.config import SolverConfig, make_params
from hallthrusterpem_tpu.models.thruster.pallas_step import simulate_batch_pallas_multi

B = int(_sys.argv[1]) if len(_sys.argv) > 1 else 1024
nsteps = int(_sys.argv[2]) if len(_sys.argv) > 2 else 20000

cfg = SolverConfig(num_cells=200, ncharge=3, dt=5e-9, duration=nsteps * 5e-9,
                   average_start_time=nsteps // 2 * 5e-9)
z = cfg.cell_centers()
s = np.where(z < 0.025, 0.011, 0.018)
base_B = jnp.asarray(0.016 * np.exp(-0.5 * ((z - 0.025) / s) ** 2), jnp.float32)
rng = np.random.default_rng(0)
params = make_params({
    "V_d": rng.uniform(250, 350, B).astype(np.float32),
    "V_cc": 30.0, "mdot_a": 5e-6, "P_b": 1e-5,
})

for rep in range(3):
    t0 = time.perf_counter()
    out = simulate_batch_pallas_multi(params, base_B, cfg)
    th = np.asarray(out["thrust"])  # sync
    dt_wall = time.perf_counter() - t0
    print(f"rep{rep}: {dt_wall:.2f} s total, {dt_wall / nsteps * 1e6:.1f} us/step "
          f"(B={B}, finite={np.isfinite(th).mean():.2f}, mean T={np.nanmean(th) * 1e3:.1f} mN)")

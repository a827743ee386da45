"""Benchmark: coupled-PEM (cathode -> 1-D discharge solver -> plume) throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.json): coupled PEM evaluations/sec/chip for a
1024-sample Monte Carlo at the pem_v0 operating envelope. The reference executes
one HallThruster.jl subprocess per sample (~30 s/sim on a CPU core is a
conservative published-ballpark figure for an SPT-100 case at alpha=(2,2)
resolution; see BASELINE.md) with 64-way parallelism -> 64/30 ≈ 2.13 evals/s.
``vs_baseline`` = our evals/s/chip divided by that reference throughput.

The physics workload per eval: 200-cell, 3-charge-state discharge solve,
dt from the CFL contract (reference thruster.py:140-181), 0.5 ms simulated time
(~230k timesteps) with time-averaged QoIs, plus the analytic cathode/plume models
— all as ONE jitted vmapped XLA program.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hallthrusterpem_tpu_jax_cache")


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    import numpy as np

    from hallthrusterpem_tpu.pem import CoupledPEM, default_coupled_inputs

    BATCH = 1024
    SIM_DURATION = 5.0e-4  # seconds of simulated discharge per eval
    REFERENCE_EVALS_PER_SEC = 64.0 / 30.0  # 64-way HallThruster.jl CPU (BASELINE.md)

    pem = CoupledPEM(
        thruster="SPT-100",
        model_fidelity=(2, 2),  # 200 cells, 3 charge states (the canonical contract)
        duration=SIM_DURATION,
    )
    inputs = default_coupled_inputs(BATCH, key=jax.random.PRNGKey(42), spread=0.08)

    # warmup (compile)
    out = pem(inputs)
    np.asarray(out["T"])

    # timed runs (fresh inputs so nothing can be memoized)
    times = []
    for trial in range(2):
        inp = default_coupled_inputs(BATCH, key=jax.random.PRNGKey(trial), spread=0.08)
        t0 = time.time()
        out = pem(inp)
        thrust = np.asarray(out["T"])  # force full execution + fetch
        times.append(time.time() - t0)
    wall = min(times)

    n_ok = int(np.isfinite(thrust).sum())
    evals_per_sec = BATCH / wall
    result = {
        "metric": "coupled_pem_evals_per_sec_per_chip",
        "value": round(evals_per_sec, 3),
        "unit": "evals/s/chip (batch=1024, 200 cells, ncharge=3, 0.5 ms sim)",
        "vs_baseline": round(evals_per_sec / REFERENCE_EVALS_PER_SEC, 2),
    }
    print(json.dumps(result))
    print(
        f"# wall={wall:.2f}s for {BATCH} evals; {n_ok}/{BATCH} finite; "
        f"mean T={np.nanmean(thrust) * 1e3:.1f} mN",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

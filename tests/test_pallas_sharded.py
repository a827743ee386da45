"""The production Pallas path under a multi-device mesh.

``dryrun_multichip`` and ``test_distributed.py`` exercise the lax path under
NamedSharding; this suite runs the fused Pallas K-step kernel itself
(interpret mode on the virtual 8-CPU mesh) through ``shard_map``, validating
that the kernel's batch-grid partitioning composes with SPMD sharding — the
path that actually ships on a TPU pod (SURVEY.md §2.6).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hallthrusterpem_tpu.models.thruster import simulate_batch, simulate_batch_sharded
from hallthrusterpem_tpu.models.thruster.config import SolverConfig, make_params


def _setup(batch: int, ncharge: int = 1):
    cfg = SolverConfig(num_cells=32, ncharge=ncharge, dt=5e-9, duration=400 * 5e-9,
                       average_start_time=200 * 5e-9)
    z = cfg.cell_centers()
    s = np.where(z < cfg.geometry.channel_length, 0.011, 0.018)
    base_B = jnp.asarray(0.016 * np.exp(-0.5 * ((z - 0.025) / s) ** 2), jnp.float32)
    rng = np.random.default_rng(3)
    params = make_params({
        "V_d": 300.0 * (1 + 0.05 * rng.standard_normal(batch)),
        "mdot_a": 5e-6 * (1 + 0.05 * rng.standard_normal(batch)),
        "P_b": np.full(batch, 1e-5),
        "u_n": np.full(batch, 150.0),
    })
    return cfg, params, base_B


def test_pallas_sharded_matches_lax(eight_devices):
    mesh = Mesh(np.asarray(eight_devices), ("batch",))
    batch = 16  # 2 per device; kernel pads each shard to its 8-row tile
    cfg, params, base_B = _setup(batch)

    out = simulate_batch_sharded(params, base_B, cfg, mesh,
                                 backend="pallas", interpret=True)
    ref = simulate_batch(params, base_B, cfg)

    assert out["thrust"].shape == (batch,)
    # each output must actually be sharded over the mesh, not replicated
    sh = out["thrust"].sharding
    assert isinstance(sh, NamedSharding) and sh.spec == P("batch"), sh
    got_T = np.asarray(out["thrust"])
    ref_T = np.asarray(ref["thrust"])
    assert np.isfinite(got_T).all()
    np.testing.assert_allclose(got_T, ref_T, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(out["discharge_current"]),
                               np.asarray(ref["discharge_current"]), rtol=2e-2)


def test_pallas_sharded_profiles_and_multicharge(eight_devices):
    mesh = Mesh(np.asarray(eight_devices), ("batch",))
    batch = 8
    cfg, params, base_B = _setup(batch, ncharge=2)
    out = simulate_batch_sharded(params, base_B, cfg, mesh,
                                 backend="pallas", interpret=True)
    assert out["ui"].shape == (batch, 2, cfg.nc)
    assert out["z"].shape == (batch, cfg.nc)
    assert np.isfinite(np.asarray(out["ui"])).all()


def test_sharded_batch_divisibility(eight_devices):
    mesh = Mesh(np.asarray(eight_devices), ("batch",))
    cfg, params, base_B = _setup(12)  # 12 % 8 != 0
    with pytest.raises(ValueError, match="divide"):
        simulate_batch_sharded(params, base_B, cfg, mesh, backend="pallas",
                               interpret=True)

"""Device/mesh smoke test.

Work-alike of the reference's executor sanity harness (``scripts/debug.py`` +
``debug.sh``: Thread vs Process pools under sbatch). The TPU equivalent checks
the device inventory, a trivial compile/execute round-trip, batch sharding over a
mesh, and the BatchExecutor drop-in.

Usage: python debug.py [-n 8]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root

import argparse
import time

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("-n", "--devices", type=int, default=None, help="mesh size (default: all)")
parser.add_argument("--cpu", action="store_true", help="force CPU backend with 8 virtual devices")


def main(argv=None):
    args = parser.parse_args(argv)
    import os

    if args.cpu:
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    t0 = time.time()
    x = jax.block_until_ready(jnp.ones((512, 512)) @ jnp.ones((512, 512)))
    print(f"matmul round-trip: {time.time() - t0:.2f}s (val {float(x[0, 0]):.0f})")

    from hallthrusterpem_tpu.parallel import BatchExecutor, make_mesh

    mesh = make_mesh(args.devices)
    print(f"mesh: {mesh}")
    executor = BatchExecutor(mesh)

    def model(batch):
        return {"y": jnp.sin(batch["x"]) * 2.0}

    n = 4 * executor.n_devices + 3  # deliberately non-multiple: exercises padding
    out = executor.run(jax.jit(model), {"x": np.linspace(0, 1, n)})
    y = np.asarray(out["y"])
    assert y.shape == (n,)
    assert np.allclose(y, 2 * np.sin(np.linspace(0, 1, n)), atol=1e-6)
    print(f"BatchExecutor over {executor.n_devices} devices: OK ({n} samples, padded + unpadded)")


if __name__ == "__main__":
    main()

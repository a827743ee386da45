"""hallthrusterpem_tpu — a TPU-native predictive engineering model (PEM) framework for
Hall-effect thrusters, built from scratch in JAX/XLA/Pallas.

Capabilities mirror JANUS-Institute/HallThrusterPEM (the ``hallmd`` package,
reference @ /root/reference): a coupled cathode -> thruster -> plume model system,
experimental-data loading, adaptive multi-fidelity sparse-grid surrogates with SVD
field compression, and surrogate-enabled UQ (Monte Carlo, DRAM MCMC calibration,
Sobol' sensitivity analysis). Where the reference dispatches one Julia
``HallThruster.jl`` subprocess per sample (reference ``src/hallmd/models/thruster.py:281-375``),
this framework runs an in-process, jittable, batched 1-D finite-volume Hall-discharge
solver and parallelizes over samples with ``vmap``/``shard_map`` on a TPU mesh.
"""

__version__ = "0.5.0"

import logging as _logging

from hallthrusterpem_tpu.core.dataset import Dataset, to_model_dataset
from hallthrusterpem_tpu.core.variables import Variable
from hallthrusterpem_tpu.core.component import Component
from hallthrusterpem_tpu.core.system import System


def get_logger(name: str) -> "_logging.Logger":
    """Module logger factory (``pem_core.get_logger`` parity, reference
    ``plume.py:11,19``)."""
    logger = _logging.getLogger(name)
    if not logger.handlers:
        handler = _logging.StreamHandler()
        handler.setFormatter(_logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s"))
        logger.addHandler(handler)
        logger.setLevel(_logging.WARNING)
    return logger


__all__ = ["Dataset", "Variable", "Component", "System", "to_model_dataset", "get_logger", "__version__"]

"""Physics component models: cathode coupling, 1-D Hall discharge thruster, plume.

Mirrors the reference's 3-component feed-forward PEM registry
(``src/hallmd/models/__init__.py:15-19``), with the thruster re-built as an
in-process batched JAX finite-volume solver instead of a Julia subprocess.
"""

from hallthrusterpem_tpu.models.cathode import cathode_coupling
from hallthrusterpem_tpu.models.plume import current_density
from hallthrusterpem_tpu.models.thruster import hallthruster_jl
from hallthrusterpem_tpu.models.fake_thruster import fake_thruster

__all__ = ["cathode_coupling", "current_density", "hallthruster_jl", "fake_thruster"]

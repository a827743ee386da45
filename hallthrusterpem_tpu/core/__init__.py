"""Core types: datasets, variables, components, systems, config loading."""

from hallthrusterpem_tpu.core.dataset import Dataset, to_model_dataset, COORDS_STR_ID
from hallthrusterpem_tpu.core.variables import Variable, Distribution, Norm, Compression
from hallthrusterpem_tpu.core.component import Component
from hallthrusterpem_tpu.core.system import System

__all__ = [
    "Dataset",
    "to_model_dataset",
    "COORDS_STR_ID",
    "Variable",
    "Distribution",
    "Norm",
    "Compression",
    "Component",
    "System",
]

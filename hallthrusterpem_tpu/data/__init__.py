"""Experimental-data loading for Hall-thruster PEMs.

Implements the reference's data conventions spec (the normative docstring at
reference ``src/hallmd/data.py:1-99``): case-insensitive column matching, unit
conversion to SI, operating-condition grouping (discharge voltage, anode flow
rate, background pressure, magnetic field scale), optional per-quantity
uncertainties (absolute/relative, 2-sigma, 2% relative default), derived anode
flow from total-flow + ratio/fraction, and field quantities (ion velocity vs z,
ion current density vs r/theta).

The reference delegates parsing to the external ``pem_core.data``; here the loader
is self-contained (pandas) and emits plain ``DataEntry`` records plus batch arrays
ready for jitted likelihoods.
"""

from hallthrusterpem_tpu.data.loader import (
    DataEntry,
    DataField,
    DataInstance,
    load_single_dataset,
    load_multiple_datasets,
    HT_COORDS,
    HT_DERIVED_COLS,
    HT_OP_VARS,
    HT_QOIS,
    HT_RENAME_MAP,
    load_ht_dataset,
    load_ht_datasets,
    data_to_arrays,
    pem_to_dataentries,
    pem_to_xarray,
)

__all__ = [
    "DataEntry",
    "DataField",
    "DataInstance",
    "load_single_dataset",
    "load_multiple_datasets",
    "HT_OP_VARS",
    "HT_COORDS",
    "HT_QOIS",
    "HT_RENAME_MAP",
    "HT_DERIVED_COLS",
    "load_ht_dataset",
    "load_ht_datasets",
    "data_to_arrays",
    "pem_to_dataentries",
    "pem_to_xarray",
]

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

from pathlib import Path as _Path

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

#: bundled SPT-100 experimental datasets (literature reconstructions; see
#: data/spt100/README.md for provenance). The reference fetches the originals
#: from the external pem_data repo (reference ``data.py:1-2``).
SPT100_DATA_DIR = _Path(__file__).parent / "spt100"


def spt100_datasets() -> list:
    """Paths of all bundled SPT-100 experimental CSVs."""
    return sorted(SPT100_DATA_DIR.glob("*.csv"))


def spt100_data(qois: tuple = ()) -> list[DataEntry]:
    """Load the bundled SPT-100 experimental data as DataEntry records.

    Legacy-API parity with the reference scripts' ``hallmd.data.loader.spt100_data``
    (reference ``scripts/pem_v0/mcmc.py:14-18``, ``monte_carlo.py:19-23``).
    ``qois``: optionally keep only entries containing at least one of these
    canonical QoI names (e.g. ``("thrust", "ion velocity")``).
    """
    entries = load_ht_datasets(spt100_datasets())
    if qois:
        entries = [e for e in entries if any(q in e.data for q in qois)]
    return entries

__all__ = [
    "SPT100_DATA_DIR",
    "spt100_data",
    "spt100_datasets",
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

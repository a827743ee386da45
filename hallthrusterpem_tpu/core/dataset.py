"""Dataset: the universal data-exchange type of the framework.

A ``Dataset`` is a ``dict[str, array]`` — a pytree, so it flows through ``jit``/
``vmap``/``shard_map`` unchanged. This mirrors the reference's model signature
``f(inputs: Dataset) -> Dataset`` (reference ``src/hallmd/models/__init__.py:1-19``).

Field quantities (profiles like ``u_ion(z)``) carry their grids in a companion
entry named ``"{var}_coords"`` — the same convention as ``amisc.typing.COORDS_STR_ID``
(reference usage at ``scripts/gen_data.py:54,88-90``).
"""

from __future__ import annotations

from typing import Dict, Iterable, Union

import jax.numpy as jnp
import numpy as np

ArrayLike = Union[np.ndarray, "jnp.ndarray", float, int]
Dataset = Dict[str, ArrayLike]
PathLike = Union[str, "os.PathLike"]

#: Suffix convention for field-quantity coordinate arrays: "{var}" + COORDS_STR_ID
COORDS_STR_ID = "_coords"


def is_coords_key(key: str) -> bool:
    return key.endswith(COORDS_STR_ID)


def base_var_of_coords(key: str) -> str:
    return key[: -len(COORDS_STR_ID)]


def stack_dataset(ds: Dataset, names: Iterable[str], axis: int = -1):
    """Stack named scalar entries of a dataset into a single array along ``axis``."""
    return jnp.stack([jnp.asarray(ds[n]) for n in names], axis=axis)


def unstack_dataset(arr, names: Iterable[str], axis: int = -1) -> Dataset:
    """Split an array into a dataset of named entries along ``axis``."""
    names = list(names)
    parts = jnp.split(jnp.asarray(arr), len(names), axis=axis)
    return {n: jnp.squeeze(p, axis=axis) for n, p in zip(names, parts)}


def to_model_dataset(samples: Dataset, variables) -> tuple[Dataset, Dataset]:
    """Convert a dataset of *normalized* variable values to model (denormalized) values.

    Mirrors ``amisc.to_model_dataset`` as used at reference ``scripts/gen_data.py:242-243``.

    :param samples: dataset of normalized values keyed by variable name
    :param variables: iterable of :class:`Variable` (anything with ``.name`` and
        ``.denormalize``)
    :returns: ``(model_inputs, extras)`` — the denormalized dataset and any entries
        in ``samples`` that had no matching variable (passed through untouched).
    """
    by_name = {v.name: v for v in variables}
    out: Dataset = {}
    extras: Dataset = {}
    for key, value in samples.items():
        if key in by_name:
            out[key] = by_name[key].denormalize(value)
        else:
            extras[key] = value
    return out, extras


def dataset_shape(ds: Dataset) -> tuple:
    """Common leading (loop) shape of the entries of a dataset."""
    shapes = [np.shape(v) for v in ds.values()]
    if not shapes:
        return ()
    return max(shapes, key=len)[:1] if shapes else ()


def as_numpy(ds: Dataset) -> Dataset:
    return {k: np.asarray(v) for k, v in ds.items()}

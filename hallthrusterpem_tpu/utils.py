"""Package utilities: device-configuration loading.

Behavioral parity with reference ``src/hallmd/utils.py:12-85`` (``load_thruster``
with relative->absolute file-path rewriting), plus a packaged
device directory (``hallthrusterpem_tpu/devices``) so ``load_thruster('SPT-100')``
works out of the box — the reference downloads device data from an external repo at
test time (``tests/test_thruster.py:28-41``); we ship it.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import yaml

__all__ = ["load_thruster", "load_device", "device_dir"]


def device_dir() -> Path:
    """Directory containing the packaged device configurations."""
    return Path(__file__).parent / "devices"


def _locate_value(target, tree: dict) -> tuple | None:
    """Depth-first search of a nested dict for a leaf equal to ``target``.

    Returns the key tuple addressing that leaf (so ``tree[k0][k1]...[kN] ==
    target``), or ``None`` when the value does not appear anywhere. Iterative
    (explicit stack) so deeply nested configs cannot hit the recursion limit.
    """
    stack = [((), tree)]
    while stack:
        keys, node = stack.pop()
        if isinstance(node, dict):
            stack.extend((keys + (k,), v) for k, v in node.items())
        elif node == target:
            return keys
    return None


def load_thruster(thruster_dir: str | Path, thruster_filename: str = "thruster.yml") -> dict:
    """Load a device configuration directory; any file referenced by (relative) name
    inside the config is rewritten to an absolute path.

    Accepts a path to a device directory, or a bare packaged device name
    (e.g. ``'SPT-100'``, ``'devices/SPT-100'``).
    """
    thruster_dir = Path(thruster_dir)
    if not thruster_dir.exists():
        candidate = device_dir() / thruster_dir.name
        if candidate.exists():
            thruster_dir = candidate
        else:
            raise FileNotFoundError(f"Device directory {thruster_dir} not found")

    thruster_file = thruster_dir / thruster_filename
    with open(thruster_file, "r", encoding="utf-8") as fd:
        if thruster_file.suffix in (".yml", ".yaml"):
            config = yaml.safe_load(fd)
        elif thruster_file.suffix == ".json":
            config = json.load(fd)
        else:
            raise ValueError(
                f"Cannot parse device config {thruster_file}: expected a .yml/.yaml or .json suffix, "
                f"got {thruster_file.suffix!r}"
            )

    for root, _, files in os.walk(thruster_dir):
        for file in files:
            if file == thruster_filename:
                continue
            root_path = Path(root) / file
            rel_path = root_path.relative_to(thruster_dir)
            keys = _locate_value(rel_path.as_posix(), config)
            if keys is None:
                keys = _locate_value(file, config)
            if keys:
                parent = config
                for key in keys[:-1]:
                    parent = parent[key]
                parent[keys[-1]] = root_path.resolve().as_posix()

    return config


# alias matching the reference docstring's naming (utils.py:50-52)
load_device = load_thruster

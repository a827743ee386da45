"""YAML config DSL: ``!System`` / ``!Component`` / ``!Variable`` tags plus
``!!python/name:`` model references — load/save compatible with the reference's
amisc YAML format (``scripts/pem_v0/pem_v0_SPT-100.yml``), including dotted
``hallmd.models.*`` paths which are transparently aliased to this package's models
(see ``core/component.py:_MODEL_ALIASES``).
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any

import numpy as np
import yaml

from hallthrusterpem_tpu.core.component import Component
from hallthrusterpem_tpu.core.system import System
from hallthrusterpem_tpu.core.variables import Compression, Variable

__all__ = ["YamlLoader", "load_system", "save_system", "variable_to_dict"]

_COMPONENT_FIELDS = {
    "name",
    "model",
    "vectorized",
    "inputs",
    "outputs",
    "model_fidelity",
    "data_fidelity",
    "training_data",
    "model_kwargs",
}


class _PemLoader(yaml.SafeLoader):
    pass


def _construct_system(loader, node):
    data = loader.construct_mapping(node, deep=True)
    data["__system__"] = True
    return data


def _construct_component(loader, node):
    if isinstance(node, yaml.SequenceNode):
        items = loader.construct_sequence(node, deep=True)
        return [{"__component__": True, **it} for it in items]
    data = loader.construct_mapping(node, deep=True)
    return {"__component__": True, **data}


def _construct_variable(loader, node):
    if isinstance(node, yaml.SequenceNode):
        items = loader.construct_sequence(node, deep=True)
        return [{"__variable__": True, **it} for it in items]
    data = loader.construct_mapping(node, deep=True)
    return {"__variable__": True, **data}


def _construct_python_name(loader, suffix, node):
    return suffix  # keep the dotted path as a string; resolved lazily by Component.fn


_PemLoader.add_constructor("!System", _construct_system)
_PemLoader.add_constructor("!Component", _construct_component)
_PemLoader.add_constructor("!Variable", _construct_variable)
_PemLoader.add_multi_constructor("tag:yaml.org,2002:python/name:", _construct_python_name)


def _build_variable(d: dict) -> Variable:
    d = {k: v for k, v in d.items() if k != "__variable__"}
    return Variable.from_dict(d)


def _build_component(d: dict) -> Component:
    d = {k: v for k, v in d.items() if k != "__component__"}
    known: dict[str, Any] = {}
    extra: dict[str, Any] = {}
    for k, v in d.items():
        (known if k in _COMPONENT_FIELDS else extra)[k] = v
    inputs = [v if isinstance(v, Variable) else _build_variable(v) for v in known.pop("inputs", [])]
    outputs = [v if isinstance(v, Variable) else _build_variable(v) for v in known.pop("outputs", [])]
    model_kwargs = dict(known.pop("model_kwargs", {}))
    model_kwargs.update(extra)
    return Component(inputs=inputs, outputs=outputs, model_kwargs=model_kwargs, **known)


def _build_system(d: dict) -> System:
    comps = d.get("components", [])
    if isinstance(comps, dict):
        comps = [comps]
    components = [c if isinstance(c, Component) else _build_component(c) for c in comps]
    return System(components, name=d.get("name", "System"))


class YamlLoader:
    """amisc-compatible entry point (reference usage ``gen_data.py:56,441``)."""

    @staticmethod
    def load(path) -> System:
        return load_system(path)

    @staticmethod
    def dump(system: System, path):
        return save_system(system, path)


def find_latest_save(base) -> Path:
    """Newest trained/iter/compression save under a config's directory tree
    (the reference's timestamp-directory search convention,
    ``fit_surr.py:209-233``, ``plot_slice.py:59-95``). Falls back to ``base``."""
    base = Path(base)
    root = base if base.is_dir() else base.parent
    for pattern in ("*_trained.yml", "*_iter*.yml", "*_compression.yml"):
        cands = sorted(root.rglob(pattern), key=lambda p: p.stat().st_mtime)
        if cands:
            return cands[-1]
    return base


def load_system(path) -> System:
    path = Path(path)
    with open(path, "r", encoding="utf-8") as fd:
        raw = yaml.load(fd, Loader=_PemLoader)
    if not isinstance(raw, dict) or not raw.get("__system__"):
        raise ValueError(f"{path} does not contain a !System document")
    system = _build_system(raw)
    system.root_dir = path.parent

    sidecar = path.with_suffix(path.suffix + ".state.pkl")
    if sidecar.exists():
        _load_state(system, sidecar)
    return system


def variable_to_dict(v: Variable) -> dict:
    d: dict[str, Any] = {"name": v.name}
    if v.description:
        d["description"] = v.description
    if v.category:
        d["category"] = v.category
    if v.tex:
        d["tex"] = v.tex
    if v.units:
        d["units"] = v.units
    if v.nominal is not None:
        d["nominal"] = float(v.nominal)
    if v.domain is not None:
        d["domain"] = f"({v.domain[0]}, {v.domain[1]})"
    if v.distribution is not None:
        names = {"uniform": "Uniform", "loguniform": "LogUniform", "normal": "N", "relative": "Relative",
                 "tolerance": "Tolerance"}
        args = ", ".join(repr(p) for p in v.distribution.params)
        d["distribution"] = f"{names[v.distribution.kind]}({args})"
    if v.norm:
        specs = []
        for n in v.norm:
            specs.append(n.kind if not n.params else f"{n.kind}({', '.join(repr(p) for p in n.params)})")
        d["norm"] = "; ".join(specs)
    if v.compression is not None:
        c = v.compression
        cd: dict[str, Any] = {"method": c.method}
        if c.rank is not None:
            cd["rank"] = int(c.rank)
        if c.energy_tol is not None:
            cd["energy_tol"] = float(c.energy_tol)
        if c.reconstruction_tol is not None:
            cd["reconstruction_tol"] = float(c.reconstruction_tol)
        d["compression"] = cd
    return d


def save_system(system: System, path):
    """Save the system spec as YAML; array/surrogate state goes to a pickle sidecar
    (mirrors amisc's save-file convention, reference ``gen_data.py:294``)."""
    path = Path(path)
    doc = {
        "name": system.name,
        "components": [c.to_dict() for c in system.components],
    }
    with open(path, "w", encoding="utf-8") as fd:
        fd.write("!System\n")
        fd.write(yaml.safe_dump(doc, sort_keys=False, default_flow_style=False))

    state = _collect_state(system)
    sidecar = path.with_suffix(path.suffix + ".state.pkl")
    if state:
        with open(sidecar, "wb") as fd:
            pickle.dump(state, fd)
    elif sidecar.exists():
        sidecar.unlink()
    return path


def _collect_state(system: System) -> dict:
    state: dict[str, Any] = {"compression": {}, "surrogates": {}, "model_costs": {}, "train_history": system.train_history}
    has_any = bool(system.train_history)
    for comp in system.components:
        if comp.model_costs:
            state["model_costs"][comp.name] = {tuple(k): v for k, v in comp.model_costs.items()}
            has_any = True
        for var in comp.outputs:
            if var.compression is not None and var.compression.projection is not None:
                c = var.compression
                state["compression"][var.name] = {
                    "projection": np.asarray(c.projection),
                    "coords": None if c.coords is None else np.asarray(c.coords),
                    "rank": c.rank,
                }
                has_any = True
        if comp.surrogate is not None:
            state["surrogates"][comp.name] = comp.surrogate.to_state()
            has_any = True
    if system.system_surrogate is not None:
        state["system_surrogate"] = system.system_surrogate.to_state()
        has_any = True
    return state if has_any else {}


def _load_state(system: System, sidecar: Path):
    with open(sidecar, "rb") as fd:
        state = pickle.load(fd)
    for comp in system.components:
        comp.model_costs.update(state.get("model_costs", {}).get(comp.name, {}))
        for var in comp.outputs:
            cstate = state.get("compression", {}).get(var.name)
            if cstate is not None:
                if var.compression is None:
                    var.compression = Compression()
                var.compression.projection = cstate["projection"]
                var.compression.coords = cstate["coords"]
                var.compression.rank = cstate["rank"]
        sstate = state.get("surrogates", {}).get(comp.name)
        if sstate is not None:
            from hallthrusterpem_tpu.surrogate import ComponentSurrogate

            comp.surrogate = ComponentSurrogate.from_state(sstate, comp)
    system.train_history = state.get("train_history", [])
    sys_state = state.get("system_surrogate")
    if sys_state is not None:
        from hallthrusterpem_tpu.surrogate.mlp import MLPSurrogate

        # compression maps were restored above, so the layout is reproducible
        system.system_surrogate = MLPSurrogate.from_state(sys_state, system)

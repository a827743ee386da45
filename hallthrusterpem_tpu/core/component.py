"""Component: one node of the coupled-system DAG.

API mirrors the amisc ``Component`` surface the reference relies on (SURVEY.md §2.4:
``name``, ``model``, ``vectorized``, ``model_fidelity``, ``data_fidelity``,
``training_data``, extra model kwargs, ``model_costs``, ``get_cost``) — re-designed so
that a component's model is a *batched jittable function* ``f(Dataset) -> Dataset``
rather than a per-sample subprocess (reference ``scripts/gen_data.py:448-460`` fans
one Julia process per sample; here the batch axis is ``vmap``-ed/sharded).
"""

from __future__ import annotations

import importlib
import inspect
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import numpy as np

from hallthrusterpem_tpu.core.dataset import Dataset
from hallthrusterpem_tpu.core.variables import Variable

__all__ = ["Component"]

# dotted-path translation so reference YAML configs load unchanged
_MODEL_ALIASES = {
    "hallmd.models.cathode.cathode_coupling": "hallthrusterpem_tpu.models.cathode.cathode_coupling",
    "hallmd.models.thruster.hallthruster_jl": "hallthrusterpem_tpu.models.thruster.hallthruster_jl",
    "hallmd.models.plume.current_density": "hallthrusterpem_tpu.models.plume.current_density",
}


def resolve_model(model) -> Callable:
    """Resolve a model given as a callable or dotted import path."""
    if callable(model):
        return model
    path = _MODEL_ALIASES.get(str(model), str(model))
    module_name, _, attr = path.rpartition(".")
    mod = importlib.import_module(module_name)
    return getattr(mod, attr)


def _as_tuple(value) -> tuple:
    if value is None:
        return ()
    if isinstance(value, str):
        toks = value.strip().lstrip("([").rstrip(")]").split(",")
        return tuple(int(t) for t in toks if t.strip())
    if isinstance(value, (int, np.integer)):
        return (int(value),)
    return tuple(int(v) for v in value)


@dataclass
class Component:
    name: str
    model: Any = None
    vectorized: bool = True
    inputs: list[Variable] = field(default_factory=list)
    outputs: list[Variable] = field(default_factory=list)
    model_fidelity: tuple = ()
    data_fidelity: tuple = ()
    training_data: dict = field(default_factory=lambda: {"method": "sparse-grid", "knots_per_level": 2})
    model_kwargs: dict = field(default_factory=dict)
    #: measured seconds per batch-eval keyed by model-fidelity tuple (feeds the
    #: cost-aware multi-fidelity trainer, reference ``fit_surr.py:137-140``)
    model_costs: dict = field(default_factory=dict)
    #: interpolation state installed by the surrogate trainer (None = no surrogate)
    surrogate: Any = None

    def __post_init__(self):
        self.model_fidelity = _as_tuple(self.model_fidelity)
        self.data_fidelity = _as_tuple(self.data_fidelity)
        self.inputs = [v if isinstance(v, Variable) else Variable.from_dict(v) for v in self.inputs]
        self.outputs = [v if isinstance(v, Variable) else Variable.from_dict(v) for v in self.outputs]

    # ------------------------------------------------------------------
    @property
    def fn(self) -> Callable:
        return resolve_model(self.model)

    def input_names(self) -> list[str]:
        return [v.name for v in self.inputs]

    def output_names(self) -> list[str]:
        return [v.name for v in self.outputs]

    def __getitem__(self, var_name: str) -> Variable:
        for v in list(self.inputs) + list(self.outputs):
            if v.name == var_name:
                return v
        raise KeyError(var_name)

    # ------------------------------------------------------------------
    def call_model(self, inputs: Dataset, model_fidelity: Optional[tuple] = None, **extra) -> Dataset:
        """Evaluate the true model on a batch of inputs (model units).

        Merges the component's YAML-declared extra kwargs (reference
        ``pem_v0_SPT-100.yml:64-104,218``), passing ``model_fidelity`` through when
        the model accepts it. Records wall-clock into ``model_costs``.
        """
        fn = self.fn
        kwargs = dict(self.model_kwargs)
        kwargs.update(extra)
        alpha = self.model_fidelity if model_fidelity is None else _as_tuple(model_fidelity)

        sig_params = None
        try:
            sig_params = set(inspect.signature(fn).parameters)
        except (TypeError, ValueError):
            pass
        if sig_params is not None:
            if "model_fidelity" in sig_params and alpha:
                kwargs["model_fidelity"] = alpha
            kwargs = {k: v for k, v in kwargs.items() if k in sig_params}
        batch = {k: v for k, v in inputs.items() if k in self.input_names()}

        t0 = time.perf_counter()
        out = fn(batch, **kwargs)
        try:
            import jax

            out = jax.block_until_ready(out)
        except Exception:
            pass
        elapsed = time.perf_counter() - t0

        n = 1
        for v in batch.values():
            n = max(n, int(np.prod(np.shape(v)[:1])) if np.ndim(v) > 0 else 1)
        prev_evals, prev_cost = self.model_costs.get(alpha, (0, 0.0))
        self.model_costs[alpha] = (prev_evals + n, prev_cost + elapsed)
        return out

    def _model(self, inputs: Dataset, alpha: Optional[tuple] = None, **kwargs) -> Dataset:
        """Legacy direct-model accessor (reference ``monte_carlo.py:221,264``)."""
        return self.call_model(inputs, model_fidelity=alpha, **kwargs)

    def get_cost(self, alpha: tuple = (), beta: tuple = ()) -> float:
        """Estimated seconds per model evaluation at fidelity ``alpha`` (legacy
        ``comp.get_cost`` surface, reference ``monte_carlo.py:725``)."""
        alpha = _as_tuple(alpha)
        if alpha in self.model_costs:
            n, total = self.model_costs[alpha]
            return total / max(n, 1)
        if self.model_costs:
            totals = [t / max(n, 1) for (n, t) in self.model_costs.values()]
            return float(np.mean(totals))
        return 1.0

    @property
    def max_refine(self) -> tuple:
        return tuple(self.model_fidelity)

    @property
    def truth_alpha(self) -> tuple:
        return tuple(self.model_fidelity)

    def to_dict(self) -> dict:
        from hallthrusterpem_tpu.core.yaml_loader import variable_to_dict

        model = self.model if isinstance(self.model, str) else (
            f"{self.fn.__module__}.{self.fn.__qualname__}" if self.model is not None else None
        )
        return {
            "name": self.name,
            "model": model,
            "vectorized": self.vectorized,
            "model_fidelity": list(self.model_fidelity),
            "data_fidelity": list(self.data_fidelity),
            "training_data": dict(self.training_data),
            "model_kwargs": dict(self.model_kwargs),
            "inputs": [variable_to_dict(v) for v in self.inputs],
            "outputs": [variable_to_dict(v) for v in self.outputs],
        }

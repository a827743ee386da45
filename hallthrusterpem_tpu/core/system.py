"""System: a DAG of components evaluated feed-forward over a batch axis.

API mirrors the amisc ``System`` surface the reference scripts depend on (SURVEY.md
§2.4): construction from YAML, ``sample_inputs``, ``predict``, ``fit``, ``clear``,
``get_allocation``, ``train_history``, ``graph``, ``coupling_vars``, save/load.

TPU-first redesign: components are batched jittable functions, so ``predict`` is a
single feed-forward sweep over ``(batch, ...)`` arrays — the reference's executor
fan-out of one subprocess per sample (``gen_data.py:448-460``) is replaced by
``vmap`` inside each model and (optionally) ``shard_map`` over a device mesh via
``hallthrusterpem_tpu.parallel``.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Iterable, Optional, Sequence

from hallthrusterpem_tpu.core.component import Component
from hallthrusterpem_tpu.core.dataset import Dataset
from hallthrusterpem_tpu.core.variables import Variable

__all__ = ["System"]


class _Graph:
    """Minimal DAG view with the ``graph.nodes[name]['exo_in']`` surface the
    reference analysis scripts use (``monte_carlo.py:220``, ``sobol.py:25-28``)."""

    def __init__(self):
        self.nodes: dict[str, dict] = {}
        self.edges: list[tuple[str, str]] = []


class System:
    def __init__(self, components: Sequence[Component], name: str = "System", root_dir: Optional[str] = None):
        self.components: list[Component] = list(components)
        self.name = name
        self.root_dir = Path(root_dir) if root_dir else None
        self.train_history: list[dict] = []
        self.system_surrogate = None  # optional end-to-end surrogate (surrogate.mlp)
        self.logger = logging.getLogger(f"hallthrusterpem_tpu.{name}")
        self._link_variables()
        self._topo_sort()
        self._build_graph()

    # ------------------------------------------------------------------ structure
    def _link_variables(self):
        """Unify variables by name across components: a bare ``- name: X`` reference
        inherits the first full definition (reference YAML convention, e.g.
        ``pem_v0_SPT-100.yml:111-112`` re-using Cathode's P_b/V_a in Thruster)."""
        registry: dict[str, Variable] = {}
        for comp in self.components:
            for vlist in (comp.inputs, comp.outputs):
                for i, var in enumerate(vlist):
                    existing = registry.get(var.name)
                    is_bare = not (
                        var.description or var.category or var.tex or var.units
                        or var.nominal is not None or var.domain is not None
                        or var.distribution is not None or var.norm or var.compression
                    )
                    if existing is not None and is_bare:
                        vlist[i] = existing
                    else:
                        registry[var.name] = vlist[i]
        self._variables = registry

    def _topo_sort(self):
        produced = {}
        for comp in self.components:
            for out in comp.output_names():
                produced[out] = comp.name
        order: list[Component] = []
        remaining = list(self.components)
        resolved: set[str] = set()
        while remaining:
            progressed = False
            for comp in list(remaining):
                deps = {produced[n] for n in comp.input_names() if n in produced and produced[n] != comp.name}
                if deps.issubset({c.name for c in order}):
                    order.append(comp)
                    remaining.remove(comp)
                    resolved |= set(comp.output_names())
                    progressed = True
            if not progressed:
                raise ValueError(f"Cyclic or unresolvable component dependencies among {[c.name for c in remaining]}")
        self.components = order

    def _build_graph(self):
        g = _Graph()
        produced = {}
        for comp in self.components:
            for out in comp.output_names():
                produced[out] = comp.name
        exo_names = [v.name for v in self.inputs()]
        for comp in self.components:
            exo_in = [exo_names.index(n) for n in comp.input_names() if n in exo_names]
            g.nodes[comp.name] = {"exo_in": exo_in, "component": comp}
            for n in comp.input_names():
                if n in produced and produced[n] != comp.name:
                    g.edges.append((produced[n], comp.name))
        self.graph = g

    # ------------------------------------------------------------------ accessors
    def __getitem__(self, comp_name: str) -> Component:
        for comp in self.components:
            if comp.name == comp_name:
                return comp
        raise KeyError(comp_name)

    def inputs(self) -> list[Variable]:
        """Exogenous inputs: component inputs not produced by any component."""
        produced = set()
        for comp in self.components:
            produced |= set(comp.output_names())
        seen, out = set(), []
        for comp in self.components:
            for var in comp.inputs:
                if var.name not in produced and var.name not in seen:
                    seen.add(var.name)
                    out.append(var)
        return out

    def outputs(self) -> list[Variable]:
        seen, out = set(), []
        for comp in self.components:
            for var in comp.outputs:
                if var.name not in seen:
                    seen.add(var.name)
                    out.append(var)
        return out

    @property
    def coupling_vars(self) -> list[Variable]:
        """Variables produced by one component and consumed by another
        (reference ``monte_carlo.py:213``, ``mcmc.py:43``)."""
        consumed = set()
        for comp in self.components:
            consumed |= set(comp.input_names())
        return [v for v in self.outputs() if v.name in consumed]

    @property
    def variables(self) -> dict[str, Variable]:
        return dict(self._variables)

    # legacy aliases (reference mcmc.py:235, monte_carlo.py:31)
    @property
    def exo_vars(self) -> list[Variable]:
        return self.inputs()

    @property
    def x_vars(self) -> list[Variable]:
        return self.inputs()

    @property
    def refine_level(self) -> int:
        """Number of completed refinement iterations (legacy ``system.refine_level``,
        reference ``monte_carlo.py:762``)."""
        return len(self.train_history)

    @property
    def build_metrics(self) -> dict:
        """Legacy ``build_metrics`` view over train_history (reference
        ``monte_carlo.py:762-763,777-778``)."""
        return {
            "train_record": self.train_history,
            "test_stats": [h.get("test_error", {}) for h in self.train_history],
        }

    # ------------------------------------------------------------------ sampling
    def sample_inputs(
        self,
        shape,
        key=None,
        seed: int = 0,
        normalize: bool = False,
        use_pdf: Iterable[str] | bool = (),
        nominal: Optional[dict] = None,
        constants: Iterable[str] = (),
        domain_filter=None,
        max_rejection_rounds: int = 50,
    ) -> Dataset:
        """Sample the exogenous inputs (reference semantics at ``gen_data.py:238``
        and the legacy nominal/constants form at ``mcmc.py:64``).

        :param shape: leading sample shape (int or tuple)
        :param use_pdf: categories whose variables sample from their distribution
            pdf (others sample uniformly over their domain); True = all
        :param nominal: per-variable nominal overrides (pins Relative() centers and
            the values used for ``constants``)
        :param constants: categories (or variable names) frozen at their nominal
        :param normalize: return values in normalized space
        :param domain_filter: optional ``samples dict -> bool keep-mask`` callable
            (e.g. a trained :class:`~hallthrusterpem_tpu.surrogate.domain.
            FailureClassifier` bound via ``make_domain_filter``); rejected draws
            are resampled so the returned batch lies in the surviving domain
        :param max_rejection_rounds: resampling-round cap for ``domain_filter``
        """
        import jax

        if key is None:
            key = jax.random.PRNGKey(seed)
        if isinstance(shape, int):
            shape = (shape,)
        nominal = nominal or {}
        use_pdf = set(self._category_set(use_pdf))
        constants = set(self._category_set(constants))

        def draw(key, shape) -> Dataset:
            samples: Dataset = {}
            variables = self.inputs()
            keys = jax.random.split(key, max(len(variables), 1))
            for var, k in zip(variables, keys):
                nom = nominal.get(var.name, var.nominal)
                if var.category in constants or var.name in constants:
                    if nom is None:
                        raise ValueError(f"Variable {var.name} frozen as constant but has no nominal")
                    value = jax.numpy.full(shape, float(nom))
                elif var.category in use_pdf or var.name in use_pdf:
                    value = var.sample(k, shape, nominal=nom)
                else:
                    value = var.sample_domain(k, shape)
                samples[var.name] = value
            return samples

        samples = draw(key, shape)
        if domain_filter is not None:
            # rejection-sample the trimmed domain: rows failing the filter are
            # redrawn until the whole batch survives (or the round cap trips)
            import numpy as np

            flat = {k: np.array(v).reshape(-1) for k, v in samples.items()}
            n = next(iter(flat.values())).size
            keep = np.asarray(domain_filter(flat), dtype=bool)
            rounds = 0
            while not keep.all():
                rounds += 1
                if rounds > max_rejection_rounds:
                    frac = float(keep.mean())
                    raise RuntimeError(
                        f"domain_filter accepted only {frac:.1%} after "
                        f"{max_rejection_rounds} rounds; the trimmed domain is too small")
                key, sub = jax.random.split(key)
                bad = np.flatnonzero(~keep)
                redraw = draw(sub, (bad.size,))
                for name, v in redraw.items():
                    flat[name][bad] = np.asarray(v)
                sub_keep = np.asarray(domain_filter({k: v[bad] for k, v in flat.items()}), dtype=bool)
                keep[bad] = sub_keep
            samples = {k: v.reshape(shape) for k, v in flat.items()}

        variables = {v.name: v for v in self.inputs()}
        if normalize:
            samples = {k: variables[k].normalize(v) for k, v in samples.items()}
        return samples

    def _category_set(self, spec) -> set:
        if spec is True:
            return {v.category for v in self.inputs()} | {v.name for v in self.inputs()}
        if isinstance(spec, str):
            return {spec}
        return set(spec or ())

    # ------------------------------------------------------------------ prediction
    def predict(
        self,
        samples: Dataset,
        use_model: Optional[str] = None,
        normalized: bool = False,
        model_dir=None,
        executor=None,
        verbose: bool = False,
        training: bool = False,
        qoi_ind: Optional[Sequence[str]] = None,
        ppool=None,
        **kwargs,
    ) -> Dataset:
        """Feed-forward coupled prediction over a batch of input samples.

        :param samples: dataset keyed by exogenous-input name, common leading shape
        :param use_model: ``'best'``/``'truth'`` to run the true models; ``None``
            to use trained surrogates where available (reference ``gen_data.py:239``
            vs ``mcmc.py:65``)
        :param normalized: whether ``samples`` are in normalized space
        :param qoi_ind: restrict returned outputs to these names (plus coords)
        """
        data: Dataset = {}
        variables = self._variables
        for name, value in samples.items():
            var = variables.get(name)
            data[name] = var.denormalize(value) if (normalized and var is not None) else value

        # a trained system-level surrogate (e.g. the MLP ensemble) replaces the whole
        # coupled chain on the surrogate path
        if use_model is None and self.system_surrogate is not None:
            out = self.system_surrogate.predict(data, training=training, qoi_ind=qoi_ind)
            data.update(out)
            if qoi_ind is not None:
                keep = set(qoi_ind) | {f"{q}_coords" for q in qoi_ind}
                return {k: v for k, v in data.items() if k in keep}
            return data

        for comp in self.components:
            batch = {n: data[n] for n in comp.input_names() if n in data}
            missing = [n for n in comp.input_names() if n not in data]
            if missing:
                raise KeyError(f"Component {comp.name} missing inputs {missing}")
            if verbose:
                self.logger.info("Evaluating component %s ...", comp.name)
            if use_model is None and comp.surrogate is not None:
                out = comp.surrogate.predict(batch, training=training)
            else:
                extra = {}
                if model_dir is not None:
                    # persist raw model outputs per component (reference gen_data
                    # passes model_dir so the thruster dumps its solver output,
                    # gen_data.py:94-98); only models that accept output_path save
                    comp_dir = Path(model_dir) / comp.name
                    comp_dir.mkdir(parents=True, exist_ok=True)
                    extra["output_path"] = str(comp_dir)
                if use_model == "worst":
                    # lowest model fidelity (reference plot_slice show_model lists)
                    extra["model_fidelity"] = tuple(0 for _ in comp.model_fidelity)
                out = comp.call_model(batch, **extra)
            for k, v in out.items():
                data[k] = v

        if qoi_ind is not None:
            keep = set(qoi_ind)
            keep |= {f"{q}_coords" for q in qoi_ind}
            return {k: v for k, v in data.items() if k in keep}
        return data

    def __call__(self, samples: Dataset, **kwargs) -> Dataset:
        return self.predict(samples, **kwargs)

    def as_jax_fn(self, training: bool = True, qoi_ind: Optional[Sequence[str]] = None):
        """Jittable feed-forward system prediction through the *trained surrogates*.

        Device-side analogue of :meth:`predict` (``use_model=None``) for fusing the
        whole coupled system into one jitted program — an on-device MCMC posterior
        with vmapped walkers (SURVEY.md §3.4; reference ``mcmc.py:65`` evaluates the
        amisc surrogate on the host per walker), a Sobol' sweep, or an optimizer
        loop. Every component must have a trained surrogate. Compressed field
        outputs come back as latent coefficients, same as :meth:`predict`.
        """
        if self.system_surrogate is not None:
            return self.system_surrogate.as_jax_fn(training=training, qoi_ind=qoi_ind)
        chain = []
        for comp in self.components:
            if comp.surrogate is None:
                raise ValueError(f"Component {comp.name} has no trained surrogate; "
                                 "as_jax_fn requires a fully-trained system")
            chain.append((comp.input_names(), comp.surrogate.as_jax_fn(training=training)))
        keep = None if qoi_ind is None else set(qoi_ind)

        def fn(samples: Dataset) -> Dataset:
            data = dict(samples)
            for in_names, f in chain:
                out = f({n: data[n] for n in in_names})
                data.update(out)
            if keep is not None:
                return {k: v for k, v in data.items() if k in keep}
            return data

        return fn

    # ------------------------------------------------------------------ training
    def fit(self, **kwargs):
        """Adaptive multi-fidelity surrogate training (reference ``fit_surr.py:111-116``).
        Implemented in :mod:`hallthrusterpem_tpu.surrogate.train`."""
        from hallthrusterpem_tpu.surrogate.train import fit_system

        return fit_system(self, **kwargs)

    def clear(self):
        """Drop all trained surrogate state (reference ``fit_surr.py:144``)."""
        for comp in self.components:
            comp.surrogate = None
        self.system_surrogate = None
        self.train_history = []

    def load_training_cache(self, path) -> int:
        """Merge a mid-fit training-data cache (written by ``fit(cache_interval=...)``)
        into the component surrogates' evaluation caches so a restarted fit
        reuses the expensive model evals. Returns the number of cached points."""
        import pickle

        from hallthrusterpem_tpu.surrogate.component import ComponentSurrogate

        with open(path, "rb") as f:
            payload = pickle.load(f)
        n = 0
        for comp in self.components:
            entry = payload.get(comp.name)
            if entry is None:
                continue
            if comp.surrogate is None:
                comp.surrogate = ComponentSurrogate(comp)
            for alpha, cache in entry.get("eval_cache", {}).items():
                comp.surrogate.eval_cache.setdefault(alpha, {}).update(cache)
                n += len(cache)
            for alpha, keys in entry.get("repaired", {}).items():
                rep = getattr(comp.surrogate, "_repaired_keys", None)
                if rep is None:
                    rep = comp.surrogate._repaired_keys = {}
                rep.setdefault(alpha, set()).update(map(tuple, keys))
            for alpha, rec in entry.get("model_costs", {}).items():
                comp.model_costs.setdefault(alpha, rec)
        return n

    def get_allocation(self):
        """Cost-allocation accounting: ``(cost_alloc, model_cost, overhead_cost,
        model_evals)`` (reference ``fit_surr.py:119,153``)."""
        cost_alloc: dict[str, dict] = {}
        model_cost = 0.0
        model_evals: dict[str, dict] = {}
        for comp in self.components:
            cost_alloc[comp.name] = {}
            model_evals[comp.name] = {}
            for alpha, (n, total) in comp.model_costs.items():
                cost_alloc[comp.name][alpha] = total
                model_evals[comp.name][alpha] = n
                model_cost += total
        overhead = sum(h.get("overhead_s", 0.0) for h in self.train_history)
        return cost_alloc, model_cost, overhead, model_evals

    # ------------------------------------------------------------------ io
    def set_logger(self, stdout: bool = False, level=logging.INFO):
        self.logger.setLevel(level)
        if stdout and not any(isinstance(h, logging.StreamHandler) for h in self.logger.handlers):
            handler = logging.StreamHandler()
            handler.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s"))
            self.logger.addHandler(handler)

    def save_to_file(self, filename: str, save_dir=None):
        from hallthrusterpem_tpu.core.yaml_loader import save_system

        save_dir = Path(save_dir) if save_dir else (self.root_dir or Path("."))
        save_dir.mkdir(parents=True, exist_ok=True)
        path = save_dir / filename
        save_system(self, path)
        return path

    @staticmethod
    def load_from_file(path, root_dir=None) -> "System":
        from hallthrusterpem_tpu.core.yaml_loader import load_system

        system = load_system(path)
        if root_dir is not None:
            system.root_dir = Path(root_dir)
        return system

    # ------------------------------------------------------------------ plotting (thin)
    def plot_slice(self, *args, **kwargs):
        from hallthrusterpem_tpu.viz import plot_slice

        return plot_slice(self, *args, **kwargs)

    def plot_allocation(self, *args, **kwargs):
        from hallthrusterpem_tpu.viz import plot_allocation

        return plot_allocation(self, *args, **kwargs)

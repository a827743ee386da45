"""Round-4 feature units: MLP log-space targets, multi-cache loading, and the
per-sample transport-barrier well width."""

import pickle

import numpy as np
import pytest


# ---------------------------------------------------------------- anom_width
def test_anom_width_param_defaults_to_config():
    """anom_width=0 -> the static cfg.anom_barrier_width; matching explicit
    value -> identical profile; different value -> different profile."""
    import jax.numpy as jnp

    from hallthrusterpem_tpu.models.thruster.config import SolverConfig, make_params
    from hallthrusterpem_tpu.models.thruster.solver import anomalous_profile

    cfg = SolverConfig(num_cells=50, ncharge=1, dt=5e-9, duration=1e-4)
    z = jnp.asarray(cfg.cell_centers())

    base = make_params({"P_b": 1e-5}, batch_shape=(1,))
    explicit = make_params({"P_b": 1e-5, "anom_width": cfg.anom_barrier_width}, batch_shape=(1,))
    wider = make_params({"P_b": 1e-5, "anom_width": 4 * cfg.anom_barrier_width}, batch_shape=(1,))

    p0 = {k: v[0] for k, v in base.items()}
    p1 = {k: v[0] for k, v in explicit.items()}
    p2 = {k: v[0] for k, v in wider.items()}
    a0 = np.asarray(anomalous_profile(p0, z, cfg))
    a1 = np.asarray(anomalous_profile(p1, z, cfg))
    a2 = np.asarray(anomalous_profile(p2, z, cfg))
    np.testing.assert_allclose(a0, a1, rtol=1e-6)
    assert np.abs(a2 - a0).max() > 1e-4  # wider well really changes the profile


def test_barrier_width_config_key_reaches_solver():
    """The wrapper accepts anom_model.model.barrier_width (scalar or batch)."""
    from hallthrusterpem_tpu.models.thruster import _tree_to_solver_inputs

    tree = {
        "config": {
            "anom_model": {"type": "LogisticPressureShift", "dz": 0.2, "z0": 0.0,
                           "pstar": 45e-6, "alpha": 15,
                           "model": {"type": "TwoZoneBohm", "c1": 0.00625,
                                     "c2": 0.0625, "barrier_width": 6e-3}},
        },
        "simulation": {"duration": 1e-4, "grid": {"num_cells": 50}},
        "postprocess": {},
    }
    _cfg, params, _b = _tree_to_solver_inputs(tree)
    assert float(np.asarray(params["anom_width"])) == pytest.approx(6e-3)


# ---------------------------------------------------------------- a_2 fixup
def test_a2_ratio_fixup_without_explicit_anom_config():
    """format_input_tree's a_2 ratio fixup must follow the path-map nesting even
    when the caller supplies no anom_model config (round-4 regression: KeyError
    because the 'type' tag was absent)."""
    from hallthrusterpem_tpu.models.thruster.mapping import PEM_TO_JULIA, format_input_tree

    tree = format_input_tree({"a_1": 0.01, "a_2": 10.0}, PEM_TO_JULIA)
    inner = tree["config"]["anom_model"]["model"]
    assert inner["c2"] == pytest.approx(0.1)  # a_2 is a ratio on c1


# ---------------------------------------------------------------- MLP features
@pytest.fixture(scope="module")
def tiny_system():
    from pathlib import Path

    from hallthrusterpem_tpu.core.yaml_loader import YamlLoader

    return YamlLoader.load(Path(__file__).parent / "fake_pem.yml")


def _tiny_data(system, n=256, seed=0):
    rng = np.random.default_rng(seed)
    samples = {v.name: np.asarray(system.sample_inputs(n, seed=seed)[v.name])
               for v in system.inputs()}
    outputs = system.predict(samples, use_model="best")
    return samples, {k: np.asarray(v) for k, v in outputs.items()}


def test_mlp_log_targets_roundtrip(tiny_system, tmp_path):
    """Wide-dynamic-range positive scalars are auto-detected for log-space
    regression, predictions come back in physical units, and the choice
    survives the state round-trip."""
    from hallthrusterpem_tpu.surrogate.mlp import MLPSurrogate

    system = tiny_system
    samples, outputs = _tiny_data(system)
    # inject a synthetic 3-decade positive output (keyed to an existing output
    # name so the layout picks it up): scale I_d through decades
    name = "I_d" if "I_d" in outputs else list(outputs)[0]
    outputs[name] = 10.0 ** (3 * np.linspace(0, 1, len(outputs[name]))) * np.abs(outputs[name]).mean()

    surr = MLPSurrogate(system, hidden=(32, 32), ensemble=2, seed=0)
    surr.fit(samples, outputs, steps=300, verbose=False)
    assert name in surr.log_names

    pred = surr.predict(samples)
    assert np.all(pred[name] > 0)  # exp'd back to physical units

    path = tmp_path / "mlp.pkl"
    surr.save(path)
    surr2 = MLPSurrogate.load(path, system)
    assert surr2.log_names == surr.log_names
    np.testing.assert_allclose(pred[name], surr2.predict(samples)[name], rtol=1e-5)


def test_load_training_caches_concatenates(tiny_system, tmp_path):
    from hallthrusterpem_tpu.surrogate.mlp import generate_training_data, load_training_caches

    system = tiny_system
    system.set_logger()
    c1 = tmp_path / f"{system.name}_mlp_train_data.pkl"
    c2 = tmp_path / f"{system.name}_mlp_train_data_s9.pkl"
    generate_training_data(system, 64, seed=3, chunk=64, cache_path=c1)
    generate_training_data(system, 32, seed=9, chunk=32, cache_path=c2)

    samples, outputs = load_training_caches(tmp_path, system)
    n = len(next(iter(samples.values())))
    assert n == 96
    for k in samples:
        assert len(outputs[k]) == 96  # inputs ride along in outputs too
    # pairing integrity: inputs in `samples` equal the cached input columns
    with open(c1, "rb") as fd:
        first = pickle.load(fd)["outputs"]
    np.testing.assert_allclose(samples["P_b"][:64], np.asarray(first["P_b"]))

"""System/Component/Variable + YAML DSL tests (the amisc-equivalent core)."""

from pathlib import Path

import numpy as np
import jax
import pytest

from hallthrusterpem_tpu.core.component import Component
from hallthrusterpem_tpu.core.system import System
from hallthrusterpem_tpu.core.variables import Variable, parse_distribution, parse_norms
from hallthrusterpem_tpu.core.yaml_loader import YamlLoader, load_system, save_system

FAKE_PEM_YAML = (Path(__file__).parent / "fake_pem.yml").read_text()


@pytest.fixture()
def fake_system(tmp_path):
    path = tmp_path / "fake_pem.yml"
    path.write_text(FAKE_PEM_YAML)
    return YamlLoader.load(path)


def test_variable_dsl():
    v = Variable(name="x", distribution="U(1, 5)", norm="log10", nominal=2.0)
    assert v.distribution.kind == "uniform"
    assert np.isclose(float(v.normalize(100.0)), 2.0)
    assert np.isclose(float(v.denormalize(2.0)), 100.0)
    v2 = Variable(name="y", distribution="Relative(20)", nominal=10.0)
    lo, hi = v2.get_domain()
    assert np.isclose(lo, 8.0) and np.isclose(hi, 12.0)
    v3 = Variable(name="z", distribution="N(0.2, 0.07)")
    assert np.isclose(v3.distribution.mu, 0.2)
    assert float(v3.pdf(0.2)) > float(v3.pdf(0.5))
    norms = parse_norms("linear(1e6)")
    assert np.isclose(float(norms[0].forward(2e-6)), 2.0)
    assert parse_distribution("LogUniform(0.00316, 0.1)").kind == "loguniform"


def test_yaml_load_structure(fake_system):
    s = fake_system
    assert s.name == "fake-pem"
    assert [c.name for c in s.components] == ["Cathode", "Thruster", "Plume"]
    in_names = [v.name for v in s.inputs()]
    assert "P_b" in in_names and "V_cc" not in in_names and "I_B0" not in in_names
    out_names = [v.name for v in s.outputs()]
    assert {"V_cc", "T", "I_d", "j_ion"} <= set(out_names)
    # bare `- name: P_b` in Plume inherits the full Cathode definition
    assert s["Plume"]["P_b"].distribution is not None
    # coupling variables: produced by one comp, consumed by another
    assert {v.name for v in s.coupling_vars} == {"V_cc", "I_B0"}
    # graph exo_in indices (reference monte_carlo.py:220 surface)
    assert s.graph.nodes["Cathode"]["exo_in"] == [in_names.index(n) for n in
                                                  ["P_b", "V_a", "T_e", "V_vac", "Pstar", "P_T"]]
    # component model kwargs pass through (sweep_radius)
    assert s["Plume"].model_kwargs["sweep_radius"] == 1.0


def test_sample_inputs_semantics(fake_system):
    s = fake_system
    samples = s.sample_inputs(64, seed=0, use_pdf=["calibration", "nuisance"])
    assert set(samples) == {v.name for v in s.inputs()}
    for name, arr in samples.items():
        assert np.shape(arr) == (64,)
    # operating vars sample uniform over domain
    assert np.all(np.asarray(samples["V_a"]) >= 200) and np.all(np.asarray(samples["V_a"]) <= 400)
    # constants freeze at nominal
    s2 = s.sample_inputs(8, seed=1, constants=["calibration"], nominal={"T_e": 3.3})
    assert np.allclose(np.asarray(s2["T_e"]), 3.3)
    # normalized sampling respects norms (Pstar scaled by 1e6)
    s3 = s.sample_inputs(128, seed=2, normalize=True, use_pdf=True)
    ps = np.asarray(s3["Pstar"])
    assert ps.min() >= 8.0 and ps.max() <= 102.0


def test_predict_feed_forward(fake_system):
    s = fake_system
    samples = s.sample_inputs(32, seed=0, use_pdf=["calibration", "nuisance"])
    out = s.predict(samples, use_model="best")
    assert np.shape(out["V_cc"]) == (32,)
    assert np.shape(out["T"]) == (32,)
    assert np.shape(out["j_ion"]) == (32, 91)
    assert np.shape(out["u_ion"]) == (32, 100)
    assert np.all(np.asarray(out["T"]) > 0)
    # V_cc feeds the thruster; plume consumes thruster I_B0
    assert np.all(np.isfinite(np.asarray(out["j_ion"])))
    # qoi_ind filtering
    out2 = s.predict(samples, use_model="best", qoi_ind=["T", "j_ion"])
    assert set(out2) == {"T", "j_ion", "j_ion_coords"}
    # model costs recorded for the multi-fidelity trainer
    assert s["Thruster"].model_costs


def test_predict_normalized_inputs(fake_system):
    s = fake_system
    samples_n = s.sample_inputs(16, seed=3, normalize=True, use_pdf=True)
    out = s.predict(samples_n, use_model="best", normalized=True)
    assert np.all(np.asarray(out["T"]) > 0)


def test_save_load_roundtrip(fake_system, tmp_path):
    s = fake_system
    s.sample_inputs(4, seed=0)
    path = save_system(s, tmp_path / "saved.yml")
    s2 = load_system(path)
    assert s2.name == s.name
    assert [c.name for c in s2.components] == [c.name for c in s.components]
    assert s2["Cathode"]["P_b"].distribution.kind == "relative"
    assert s2["Plume"].model_kwargs["sweep_radius"] == 1.0
    # loaded system still predicts
    out = s2.predict(s2.sample_inputs(4, seed=5), use_model="best")
    assert np.shape(out["T"]) == (4,)


def test_component_get_cost(fake_system):
    s = fake_system
    s.predict(s.sample_inputs(8, seed=0), use_model="best")
    comp = s["Thruster"]
    assert comp.get_cost(comp.model_fidelity) > 0
    alloc, model_cost, overhead, evals = s.get_allocation()
    assert model_cost > 0
    assert evals["Thruster"]

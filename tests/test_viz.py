"""Plotting-surface tests (headless): every viz entry point renders and saves."""

from pathlib import Path

import numpy as np

from hallthrusterpem_tpu.core.yaml_loader import YamlLoader
from hallthrusterpem_tpu.viz import (
    ax_default,
    ndscatter,
    plot_allocation,
    plot_error_vs_cost,
    plot_slice,
)

FAKE = Path(__file__).parent / "fake_pem.yml"


def test_plot_slice_and_allocation(tmp_path):
    system = YamlLoader.load(FAKE)
    fig, axes = plot_slice(system, inputs=["P_b", "V_a"], outputs=["T", "I_d"],
                           num_steps=5, save_path=tmp_path / "slice.png")
    assert (tmp_path / "slice.png").exists()
    system.predict(system.sample_inputs(4, seed=0), use_model="best")
    fig, ax = plot_allocation(system, save_path=tmp_path / "alloc.png")
    assert (tmp_path / "alloc.png").exists()


def test_error_vs_cost_and_corner(tmp_path):
    history = [
        {"num_evals": 2, "test_error": {"T": 0.5, "I_d": 0.6}},
        {"num_evals": 4, "test_error": {"T": 0.2, "I_d": 0.3}},
        {"num_evals": 8, "test_error": {"T": 0.1, "I_d": 0.15}},
    ]
    plot_error_vs_cost(history, save_path=tmp_path / "err.png")
    assert (tmp_path / "err.png").exists()

    rng = np.random.default_rng(0)
    ndscatter(rng.normal(size=(200, 3)), labels=["a", "b", "c"], save_path=tmp_path / "corner.png")
    assert (tmp_path / "corner.png").exists()

    ax = ax_default(xlabel="x", ylabel="y")
    assert ax.get_xlabel() == "x"

"""End-to-end workflow-script tests: gen_data -> fit_surr -> plot_slice on the
fake PEM (the reference's pipeline shape, SURVEY.md §3.2-3.3, exercised in-process)."""

import shutil
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))
sys.path.insert(0, str(REPO / "scripts" / "pem_v0"))


@pytest.fixture()
def workdir(tmp_path):
    shutil.copy(Path(__file__).parent / "fake_pem.yml", tmp_path / "fake_pem.yml")
    return tmp_path


def test_pipeline_gen_fit_slice(workdir, monkeypatch):
    import gen_data
    import fit_surr
    import plot_slice

    cfg = str(workdir / "fake_pem.yml")
    gen_data.main([cfg, "-c", "48", "-t", "32"])
    data_dir = workdir / "amisc_data"
    assert (data_dir / "compression.pkl").exists()
    assert (data_dir / "test_set.pkl").exists()
    comp_yml = data_dir / "fake-pem_compression.yml"
    assert comp_yml.exists()

    # compression maps persisted with the system
    from hallthrusterpem_tpu.core.system import System

    system = System.load_from_file(comp_yml)
    uvar = system["Thruster"]["u_ion"]
    assert uvar.compression.projection is not None
    assert uvar.compression.latent_size >= 1

    fit_surr.main([str(comp_yml), "--surrogate", "misc", "-i", "6", "-m", "1e-8", "-N", "64"])
    trained = data_dir / "fake-pem_trained.yml"
    assert trained.exists()

    s2 = System.load_from_file(trained)
    assert all(c.surrogate is not None for c in s2.components)
    assert len(s2.train_history) >= 1
    # surrogate predictions exist and are finite on fresh samples
    out = s2.predict(s2.sample_inputs(16, seed=9), use_model=None, training=True)
    assert np.isfinite(np.asarray(out["T"], dtype=float)).all()

    monkeypatch.chdir(workdir)
    plot_slice.main([str(trained), "-i", "P_b", "V_a", "-o", "T", "I_d", "-n", "7",
                     "--save", str(workdir / "slice.png")])
    assert (workdir / "slice.png").exists()


def test_mcmc_script_synthetic(workdir, monkeypatch):
    """DRAM calibration self-consistency on the fake PEM (true model, tiny run)."""
    import mcmc

    monkeypatch.chdir(workdir)
    mcmc.main([str(workdir / "fake_pem.yml"), "--niter", "60", "--walkers", "4",
               "--use-model", "best", "--file", str(workdir / "chain.h5"),
               "--qois", "V_cc", "T", "I_d", "--laplace"])
    assert (workdir / "chain.h5").exists()
    from hallthrusterpem_tpu.uq import read_mcmc_chain

    chains, logps = read_mcmc_chain(workdir / "chain.h5", burn_frac=0.0, clean=False)
    assert chains.shape[0] == 61


def test_sobol_script(workdir, capsys):
    import sobol

    sobol.main([str(workdir / "fake_pem.yml"), "-n", "128",
                "--pressures", "1e-5", "--qois", "T", "I_d", "V_cc"])
    out = capsys.readouterr().out
    assert "P_b = 1.0e-05" in out.replace("1e-05", "1.0e-05")


def test_monte_carlo_script(workdir, monkeypatch):
    import monte_carlo

    monkeypatch.chdir(workdir)
    monte_carlo.main([str(workdir / "fake_pem.yml"), "-n", "64", "--pressures", "1e-5", "3e-5",
                      "--qois", "V_cc", "T", "I_d", "--out", str(workdir / "mc.h5")])
    import h5py

    with h5py.File(workdir / "mc.h5", "r") as f:
        assert len(f.keys()) == 2
        grp = f[list(f.keys())[0]]
        assert grp["T"].shape == (64,)


def test_gen_data_plots(workdir):
    import gen_data

    cfg = str(workdir / "fake_pem.yml")
    gen_data.main([cfg, "-c", "24", "-t", "12", "--plots"])
    data_dir = workdir / "amisc_data"
    assert (data_dir / "compression_u_ion.png").exists()
    assert (data_dir / "test_set_outliers.png").exists()


def test_run_mcmc_restart(workdir, monkeypatch):
    """run_mcmc.py restart-from-chain capability (reference run.sh:15-24)."""
    import run_mcmc

    monkeypatch.chdir(workdir)
    chain1 = str(workdir / "c1.h5")
    run_mcmc.main([str(workdir / "fake_pem.yml"), "--niter", "40", "--walkers", "4",
                   "--use-model", "best", "--file", chain1])
    assert (workdir / "c1.h5").exists()
    run_mcmc.main([str(workdir / "fake_pem.yml"), "--niter", "30", "--walkers", "4",
                   "--use-model", "best", "--file", str(workdir / "c2.h5"),
                   "--restart", chain1])
    assert (workdir / "c2.h5").exists()


def test_thruster_output_path(tmp_path):
    """Raw per-batch solver output persistence (reference thruster.py:252-263,506-508)."""
    import numpy as np

    from hallthrusterpem_tpu.models.thruster import hallthruster_jl

    out = hallthruster_jl(
        {"P_b": np.array([1e-5]), "V_a": np.array([300.0]), "mdot_a": np.array([5e-6]),
         "V_cc": np.array([30.0])},
        thruster="SPT-100", config={"ncharge": 1},
        simulation={"dt": 8e-9, "grid": {"num_cells": 50}, "duration": 4e-5},
        postprocess={"average_start_time": 2e-5},
        model_fidelity=None, output_path=str(tmp_path),
    )
    assert "output_path" in out
    saved = tmp_path / out["output_path"]
    assert saved.exists()
    import json

    tree = json.loads(saved.read_text())
    assert "output" in tree and "average" in tree["output"]


def test_debug_script():
    import debug

    debug.main(["-n", "8"])


def test_bench_importable():
    """bench.py parses and has a main (actual run needs the TPU)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.main)


def test_mcmc_script_real_data_fields(workdir, monkeypatch, capsys):
    """Calibration against the bundled experimental datasets with u_ion/j_ion
    field likelihood terms (SVD-latent reconstruction + interpolation onto the
    data coordinates; reference mcmc.py:85-89) and M=2 logsumexp noise
    marginalization (reference mcmc.py:103-104)."""
    import mcmc

    monkeypatch.chdir(workdir)
    mcmc.main([str(workdir / "fake_pem.yml"), "--use-model", "best", "--data", "spt100",
               "--niter", "25", "--walkers", "3", "--noise-samples", "2",
               "--qois", "V_cc", "T", "I_d", "u_ion", "j_ion",
               "--file", str(workdir / "chain_data.h5")])
    out = capsys.readouterr().out
    assert "posterior mean" in out
    from hallthrusterpem_tpu.uq import read_mcmc_chain

    chains, logps = read_mcmc_chain(workdir / "chain_data.h5", burn_frac=0.0, clean=False)
    assert chains.shape[0] == 26 and np.isfinite(chains).all()
    # the likelihood must actually constrain the chain (not flat prior wandering)
    assert np.isfinite(logps).all() and logps.max() > -1e29


def test_mcmc_on_device_parity(workdir, monkeypatch, capsys):
    """--on-device: the whole-ensemble posterior as ONE jitted device program
    (System.as_jax_fn -> scalar + field likelihood -> priors; SURVEY.md §3.4)
    matches the host-NumPy posterior and drives DRAM end-to-end."""
    import gen_data
    import fit_surr
    import mcmc
    from hallthrusterpem_tpu.core.system import System

    monkeypatch.chdir(workdir)
    gen_data.main([str(workdir / "fake_pem.yml"), "-c", "32", "-t", "16"])
    comp_yml = workdir / "amisc_data" / "fake-pem_compression.yml"
    fit_surr.main([str(comp_yml), "--surrogate", "misc", "-i", "4", "-m", "1e-8", "-N", "32"])
    trained = workdir / "amisc_data" / "fake-pem_trained.yml"

    argv = [str(trained), "--data", "spt100", "--qois", "V_cc", "T", "I_d", "u_ion"]
    args = mcmc.parser.parse_args(argv)
    system = System.load_from_file(trained)
    calib = [v for v in system.inputs() if v.category == "calibration"]
    names = [v.name for v in calib]
    ops, obs, sig, fields = mcmc.build_dataset(system, args)
    np_lp = mcmc.build_numpy_posterior(system, args, calib, names, ops, obs, sig, fields)
    dev_lp, _ = mcmc.build_device_posterior(system, args, calib, names, ops, obs, sig, fields)

    rng = np.random.default_rng(5)
    dom = np.array([v.get_domain() for v in calib], dtype=float)
    x0 = np.array([v.nominal if v.nominal is not None else 0.5 * (d[0] + d[1])
                   for v, d in zip(calib, dom)])
    theta = x0 + 0.05 * (dom[:, 1] - dom[:, 0]) * rng.standard_normal((6, len(calib)))
    theta = np.clip(theta, dom[:, 0], dom[:, 1])
    host, dev = np_lp(theta), dev_lp(theta)
    # float32 device chain vs float64 host on the same surrogate/likelihood
    assert np.all(np.isfinite(host)) and np.all(np.isfinite(dev))
    assert np.allclose(dev, host, rtol=3e-3, atol=3e-3 * float(np.abs(host).max()))

    mcmc.main(argv + ["--on-device", "--niter", "20", "--walkers", "3",
                      "--file", str(workdir / "chain_dev.h5")])
    assert "posterior mean" in capsys.readouterr().out


def test_monte_carlo_experimental_comparison(workdir, monkeypatch, capsys):
    """Model-vs-data tables at experimental operating conditions plus the MISC
    allocation replay (reference monte_carlo.py:63-335, 708-767)."""
    import monte_carlo

    monkeypatch.chdir(workdir)
    monte_carlo.main([str(workdir / "fake_pem.yml"), "--data", "spt100", "-n", "32",
                      "--compare-model", "--allocation", "--plots",
                      "--qois", "V_cc", "T", "I_d", "u_ion"])
    out = capsys.readouterr().out
    assert "experimental operating conditions" in out
    assert "rel-L2 surrogate vs data" in out and "rel-L2 model vs data" in out
    assert "u_ion (field, vs data)" in out
    assert "MISC allocation" in out
    # publication predictive figures (reference monte_carlo.py:338-705 plot set)
    for name in ("mc_T_prior.png", "mc_V_cc_prior.png", "mc_u_ion_prior.png"):
        assert (workdir / name).exists(), name
    assert (workdir / "mc_surrogate_slices.png").exists()


def test_filter_outputs_reference_semantics():
    """NaN-only discard by default; IQR screens outputs only, never inputs
    (reference gen_data.py:125-215 filters normalized system.outputs();
    discard_outliers defaults to False at gen_data.py:179-213)."""
    import gen_data

    rng = np.random.default_rng(0)
    n = 400
    # log-uniform input passthrough spanning 4 decades: a linear IQR would flag its tails
    c4 = 10 ** rng.uniform(18, 22, n)
    y = rng.normal(1.0, 0.1, n)
    y[7] = np.nan          # genuine failure
    y[11] = 50.0           # genuine outlier
    outputs = {"c4": c4, "T": y}
    nan_idx, outlier_idx = gen_data.filter_outputs(outputs, 1.5, skip={"c4"})
    assert nan_idx.sum() == 1 and nan_idx[7]
    assert outlier_idx[11] and not outlier_idx[7]
    # without skip, the input's decades-wide tail would dominate the outlier mask
    _, out_all = gen_data.filter_outputs(outputs, 1.5)
    assert out_all.sum() > 50  # documents why inputs must be excluded


def test_mlp_surrogate_pipeline(workdir):
    """--surrogate mlp: data gen (resumable), training, rel-L2 report, yml round-trip,
    on-device prediction path (System.as_jax_fn dispatches to the MLP)."""
    import gen_data
    import fit_surr
    import jax

    cfg = str(workdir / "fake_pem.yml")
    gen_data.main([cfg, "-c", "48", "-t", "64"])
    comp_yml = workdir / "amisc_data" / "fake-pem_compression.yml"

    fit_surr.main([str(comp_yml), "--surrogate", "mlp", "--mlp-samples", "512",
                   "--mlp-steps", "2000", "--mlp-hidden", "64", "64",
                   "--mlp-ensemble", "3", "--mlp-chunk", "256"])
    # chunked data generation cached for resume
    assert (workdir / "amisc_data" / "fake-pem_mlp_train_data.pkl").exists()

    from hallthrusterpem_tpu.core.system import System

    s2 = System.load_from_file(workdir / "amisc_data" / "fake-pem_trained.yml")
    assert s2.system_surrogate is not None

    # the fake PEM is a smooth analytic map: the MLP must fit it well
    import pickle
    with open(workdir / "amisc_data" / "test_set.pkl", "rb") as fd:
        d = pickle.load(fd)
    keep = ~d["discard"]
    xt = {k: v[keep] for k, v in d["samples"].items()}
    yt = {k: np.asarray(v)[keep] for k, v in d["outputs"].items()}
    errors = s2.system_surrogate.test_errors(xt, yt)
    assert errors["T"] < 0.15, errors
    assert errors["I_d"] < 0.15, errors

    # surrogate path through System.predict and the jittable fn agree
    fresh = s2.sample_inputs(8, seed=3)
    out_host = s2.predict(fresh, use_model=None)
    fn = jax.jit(s2.as_jax_fn())
    out_dev = fn({k: np.asarray(v) for k, v in fresh.items()})
    np.testing.assert_allclose(np.asarray(out_host["T"]), np.asarray(out_dev["T"]), rtol=1e-5)
    assert "sys_fail_prob" in out_dev
    # the fake model never fails: classifier should say so
    assert float(np.asarray(out_dev["sys_fail_prob"]).max()) < 0.5


def test_remask_validity_mask():
    """The discharge-current validity rule (wrapper absurdity guard) and the
    cache post-pass must agree: I_d/I_eq outside [0.2, 8] is a failure."""
    import numpy as np

    from remask_validity import validity_mask

    mdot = np.full(5, 5e-6)
    i_eq = 1.602176634e-19 * 5e-6 / 2.1801714e-25  # ~3.67 A
    i_d = np.array([0.05 * i_eq, 0.5 * i_eq, 6.0 * i_eq, 16.0 * i_eq, np.nan])
    bad = validity_mask(i_d, mdot)
    assert bad.tolist() == [True, False, False, True, False]  # NaN rows already masked

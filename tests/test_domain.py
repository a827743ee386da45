"""Prior-domain trimming: failure-boundary classifier + rejection sampling
(the reference workflow's discard-NaN-samples semantics, reference
gen_data.py:186, turned into an explicit surviving-domain sampler)."""

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))

from hallthrusterpem_tpu.surrogate.domain import (
    FailureClassifier,
    failure_mask,
    make_domain_filter,
)


def _toy_data(n=3000, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-1, 1, (n, 3))
    # curved failure boundary: quadratic features must separate it
    fail = (X[:, 0] + X[:, 1] ** 2 - 0.3 * X[:, 2]) > 0.6
    return X, fail


def test_failure_classifier_learns_curved_boundary(tmp_path):
    X, fail = _toy_data()
    clf = FailureClassifier(["a", "b", "c"])
    info = clf.fit(X, fail)
    assert info["val_acc"] > 0.95, info
    assert info["val_fail_recall"] > 0.85, info

    # save/load round-trip preserves predictions
    clf.save(tmp_path / "clf.pkl")
    clf2 = FailureClassifier.load(tmp_path / "clf.pkl")
    Xq, _ = _toy_data(200, seed=1)
    np.testing.assert_allclose(clf.prob(Xq), clf2.prob(Xq))

    # keep_mask over a sample dict (no system: values already normalized)
    samples = {"a": Xq[:, 0], "b": Xq[:, 1], "c": Xq[:, 2]}
    keep = clf2.keep_mask(samples, normalized=True)
    truth_ok = ~((Xq[:, 0] + Xq[:, 1] ** 2 - 0.3 * Xq[:, 2]) > 0.6)
    assert (keep == truth_ok).mean() > 0.9


def test_failure_mask_skips_inputs_and_coords():
    outputs = {
        "x_in": np.array([1.0, np.nan, 3.0]),          # input passthrough: ignored
        "T": np.array([1.0, 2.0, np.nan]),
        "u_ion": np.array([[1.0, 2.0], [np.nan, 1.0], [1.0, 1.0]]),
        "u_ion_coords": np.full((3, 2), np.nan),        # coords: ignored
    }
    mask = failure_mask(outputs, skip={"x_in"})
    np.testing.assert_array_equal(mask, [False, True, True])


def test_sample_inputs_rejection_sampling():
    from hallthrusterpem_tpu.core.system import System

    system = System.load_from_file(Path(__file__).parent / "fake_pem.yml") \
        if (Path(__file__).parent / "fake_pem.yml").name.endswith("_compression.yml") else None
    if system is None:
        from hallthrusterpem_tpu.core.yaml_loader import YamlLoader

        system = YamlLoader.load(Path(__file__).parent / "fake_pem.yml")

    # trim to the upper half of the V_a domain via the filter protocol
    def domain_filter(samples):
        return np.asarray(samples["V_a"]) > 300.0

    s = system.sample_inputs(256, seed=0, domain_filter=domain_filter)
    va = np.asarray(s["V_a"])
    assert va.shape == (256,)
    assert (va > 300.0).all()
    # other variables still span their domains (not collapsed by resampling)
    pb = np.asarray(s["P_b"])
    assert pb.std() > 0

    # an impossible filter trips the round cap with a clear error
    with pytest.raises(RuntimeError, match="domain_filter accepted only"):
        system.sample_inputs(16, seed=0, domain_filter=lambda s: np.zeros(
            np.asarray(s["V_a"]).size, dtype=bool), max_rejection_rounds=3)


def test_trim_domain_cli_and_gen_data_trim(tmp_path):
    """trim_domain.py fits from a labeled pickle; gen_data --trim reject-samples."""
    import pickle
    import shutil

    import gen_data
    import trim_domain

    shutil.copy(Path(__file__).parent / "fake_pem.yml", tmp_path / "fake_pem.yml")
    cfg = str(tmp_path / "fake_pem.yml")

    # build a labeled dataset whose "failures" are high-V_a samples
    from hallthrusterpem_tpu.core.yaml_loader import YamlLoader

    system = YamlLoader.load(cfg)
    samples = system.sample_inputs(1500, seed=2, use_pdf=["calibration", "nuisance"])
    samples = {k: np.asarray(v) for k, v in samples.items()}
    va = samples["V_a"]
    T = np.where(va > 350.0, np.nan, 0.08 + 1e-4 * (va - 300.0))
    with open(tmp_path / "labeled.pkl", "wb") as fd:
        pickle.dump({"samples": samples, "outputs": {**samples, "T": T}}, fd)

    trim_domain.main([cfg, str(tmp_path / "labeled.pkl"),
                      "-o", str(tmp_path / "clf.pkl")])
    assert (tmp_path / "clf.pkl").exists()

    clf = FailureClassifier.load(tmp_path / "clf.pkl")
    flt = make_domain_filter(clf, system)
    trimmed = system.sample_inputs(512, seed=5, domain_filter=flt)
    # the classifier should carve out (most of) the failing V_a half-space
    assert (np.asarray(trimmed["V_a"]) > 360.0).mean() < 0.05

    gen_data.main([cfg, "-c", "16", "-t", "8", "-o", str(tmp_path / "out"),
                   "--trim", str(tmp_path / "clf.pkl")])
    with open(tmp_path / "out" / "test_set.pkl", "rb") as fd:
        d = pickle.load(fd)
    assert (d["samples"]["V_a"] < 370.0).mean() > 0.9

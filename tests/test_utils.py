"""Device-loading utilities (parity with reference tests/test_utils.py)."""

from pathlib import Path

import numpy as np

from hallthrusterpem_tpu.utils import _locate_value, device_dir, load_thruster


def test_locate_value():
    data = {"a": {"b": {"c": "target.csv"}}, "x": 1}
    assert _locate_value("target.csv", data) == ("a", "b", "c")
    assert _locate_value("missing", data) is None


def test_load_synthetic_device(tmp_path: Path):
    dev = tmp_path / "MyThruster"
    dev.mkdir()
    (dev / "field.csv").write_text("z(m),B(T)\n0,0.01\n0.08,0.001\n")
    (dev / "thruster.yml").write_text(
        "name: MyThruster\n"
        "geometry:\n  channel_length: 0.02\n  inner_radius: 0.03\n  outer_radius: 0.05\n"
        "magnetic_field:\n  file: field.csv\n"
    )
    config = load_thruster(dev)
    assert config["name"] == "MyThruster"
    # relative file reference rewritten to absolute path (reference utils.py:67-84)
    assert Path(config["magnetic_field"]["file"]).is_absolute()
    assert Path(config["magnetic_field"]["file"]).exists()


def test_packaged_devices_load():
    for name in ("SPT-100", "H9"):
        config = load_thruster(name)
        assert "geometry" in config
        bfile = Path(config["magnetic_field"]["file"])
        assert bfile.exists()
        raw = np.genfromtxt(bfile, delimiter=",", skip_header=1)
        assert raw.shape[1] == 2
        assert raw[:, 1].max() < 0.1  # Tesla sanity
    assert (device_dir() / "SPT-100").exists()

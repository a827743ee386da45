"""Data-loader tests against the reference's CSV conventions spec
(reference src/hallmd/data.py:1-99)."""

import numpy as np
import pytest

from hallthrusterpem_tpu.data import (
    DataEntry,
    data_to_arrays,
    load_ht_dataset,
    pem_to_dataentries,
)


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return p


def test_basic_scalar_qois(tmp_path):
    f = _write(
        tmp_path, "a.csv",
        "Background Pressure (Torr),Anode Flow Rate (mg/s),Discharge Voltage (V),"
        "Thrust (mN),Thrust relative uncertainty,Discharge Current (A)\n"
        "1e-5,5.0,300,80,0.05,4.5\n"
        "3e-5,5.0,300,82,0.05,4.6\n",
    )
    entries = load_ht_dataset(f)
    assert len(entries) == 2
    e = entries[0]
    assert np.isclose(e.operating_condition["anode mass flow rate"], 5e-6)  # mg/s -> kg/s
    assert np.isclose(e.operating_condition["discharge voltage"], 300)
    assert np.isclose(e.operating_condition["magnetic field scale"], 1.0)  # default
    th = e.data["thrust"]
    assert np.isclose(th.val, 0.080)  # mN -> N
    assert np.isclose(th.std, 0.080 * 0.05 / 2)  # relative, 2-sigma convention
    idc = e.data["discharge current"]
    assert np.isclose(idc.std, 4.5 * 0.02 / 2)  # 2% default


def test_anode_voltage_alias_and_flow_from_fraction(tmp_path):
    f = _write(
        tmp_path, "b.csv",
        "Total Flow Rate (mg/s),Cathode Flow Fraction,Anode Voltage (V),Anode Current (A)\n"
        "6.0,0.1,250,4.0\n",
    )
    entries = load_ht_dataset(f)
    e = entries[0]
    assert np.isclose(e.operating_condition["anode mass flow rate"], 5.4e-6)
    assert np.isclose(e.operating_condition["discharge voltage"], 250)
    assert np.isclose(e.operating_condition["background pressure"], 0.0)  # default
    assert "discharge current" in e.data


def test_flow_from_ratio(tmp_path):
    f = _write(
        tmp_path, "c.csv",
        "Total Flow Rate (mg/s),Anode-Cathode Flow Ratio,Discharge Voltage (V)\n"
        "6.0,9.0,300\n",
    )
    e = load_ht_dataset(f)[0]
    assert np.isclose(e.operating_condition["anode mass flow rate"], 6e-6 * 0.9)


def test_ion_current_density_field(tmp_path):
    rows = "\n".join(
        f"1e-5,5.0,300,{r},{th},{10.0 - th * 0.1}" for r in (1.0,) for th in range(0, 90, 10)
    )
    f = _write(
        tmp_path, "d.csv",
        "Background Pressure (Torr),Anode Flow Rate (mg/s),Discharge Voltage (V),"
        "Radial Position from Thruster Exit (m),Angular Position from Thruster Centerline (deg),"
        "Ion Current Density (mA/cm^2)\n" + rows + "\n",
    )
    entries = load_ht_dataset(f)
    assert len(entries) == 1
    jf = entries[0].data["ion current density"]
    assert jf.val.shape == (9,)
    assert np.isclose(jf.val[0], 100.0)  # mA/cm^2 -> A/m^2 (x10)
    assert np.isclose(jf.coords["theta"][1], 10 * np.pi / 180)  # deg -> rad


def test_partial_field_columns_raise(tmp_path):
    f = _write(
        tmp_path, "e.csv",
        "Anode Flow Rate (mg/s),Discharge Voltage (V),Ion Current Density (A/m^2)\n"
        "5.0,300,100\n",
    )
    with pytest.raises(ValueError):
        load_ht_dataset(f)


def test_ion_velocity_profile(tmp_path):
    rows = "\n".join(f"5.0,300,{z / 100},{z * 150}" for z in range(10))
    f = _write(
        tmp_path, "f.csv",
        "Anode Flow Rate (mg/s),Discharge Voltage (V),"
        "Axial Position from Anode (m),Ion Velocity (m/s)\n" + rows + "\n",
    )
    e = load_ht_dataset(f)[0]
    uf = e.data["ion velocity"]
    assert uf.val.shape == (10,)
    assert "z" in uf.coords


def test_data_to_arrays_and_pem_bridge(tmp_path):
    f = _write(
        tmp_path, "g.csv",
        "Background Pressure (Torr),Anode Flow Rate (mg/s),Discharge Voltage (V),Thrust (mN)\n"
        "1e-5,5.0,300,80\n3e-5,5.0,300,83\n",
    )
    entries = load_ht_dataset(f)
    ops, vals, stds = data_to_arrays(entries, "thrust")
    assert vals.shape == (2, 1)
    assert np.allclose(ops["background pressure"], [1e-5, 3e-5])

    outputs = {
        "T": np.array([0.081, 0.082]),
        "I_d": np.array([4.4, 4.5]),
        "V_cc": np.array([31.0, 32.0]),
        "u_ion": np.random.rand(2, 10),
        "u_ion_coords": np.tile(np.linspace(0, 0.08, 10), (2, 1)),
        "j_ion": np.random.rand(2, 91),
        "j_ion_coords": np.tile(np.linspace(0, np.pi / 2, 91), (2, 1)),
    }
    pem_entries = pem_to_dataentries([e.operating_condition for e in entries], outputs)
    assert len(pem_entries) == 2
    assert "ion velocity" in pem_entries[0].data
    assert pem_entries[0].data["ion current density"].val.shape == (91,)


def test_bundled_spt100_data():
    """The bundled SPT-100 literature datasets load through the standard
    conventions and cover all five QoIs (reference data spec data.py:1-99;
    provenance: hallthrusterpem_tpu/data/spt100/README.md)."""
    from hallthrusterpem_tpu.data import spt100_data

    entries = spt100_data()
    assert len(entries) >= 20
    qois = set()
    for e in entries:
        qois |= set(e.data)
        assert 150 <= e.operating_condition["discharge voltage"] <= 450
        assert 2e-6 <= e.operating_condition["anode mass flow rate"] <= 7e-6
    assert qois == {"thrust", "discharge current", "cathode coupling voltage",
                    "ion velocity", "ion current density"}

    # nominal-point anchors: 300 V / 5.16 mg/s thrust ~ 80 mN, I_d ~ 4.5 A
    ops, T, _ = data_to_arrays(entries, "thrust")
    nominal = (np.abs(ops["discharge voltage"] - 300) < 1) & \
              (np.abs(ops["anode mass flow rate"] - 5.16e-6) < 1e-8)
    assert np.all((T[nominal] > 0.070) & (T[nominal] < 0.095))  # N

    # field data carry coordinates and 1-sigma stds
    uion = [e for e in entries if "ion velocity" in e.data]
    assert len(uion) == 3
    f = uion[0].data["ion velocity"]
    assert "z" in f.coords and f.val.shape == f.coords["z"].shape
    assert f.std is not None and np.all(f.std > 0)

    jion = [e for e in entries if "ion current density" in e.data][0].data["ion current density"]
    assert "theta" in jion.coords and "r" in jion.coords
    assert float(jion.coords["theta"].max()) <= np.pi / 2 + 1e-9  # converted to rad

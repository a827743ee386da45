"""Validate the committed published-data anchor regression artifact
(runs/r4/anchors.json, produced by scripts/anchors.py at full fidelity on the
real chip). Covers T, I_d, I_B0, eta_c, eta_m, V_cc and u_ion(z) rel-L2 at
>=4 operating conditions with stated tolerances (the reference output
contract consumes the same QoIs: reference pem_to_julia.json:28-36)."""

import json
from pathlib import Path

import pytest

ARTIFACT = Path(__file__).resolve().parents[1] / "runs" / "r4" / "anchors.json"


@pytest.mark.skipif(not ARTIFACT.exists(), reason="anchor artifact not yet generated")
def test_anchor_artifact_valid_and_passing():
    with open(ARTIFACT) as fd:
        art = json.load(fd)
    assert art["pass"] is True
    names = [c["name"] for c in art["conditions"]]
    assert len(names) >= 7  # 4 scalar conditions + 3 LIF pressures
    # the design-point condition must anchor the full QoI set
    nominal = next(c for c in art["conditions"] if "diamant" in c["name"])
    for q in ("T", "I_d", "I_B0", "eta_c", "eta_m", "V_cc"):
        rec = nominal["qois"][q]
        assert rec["pass"], (q, rec)
        assert rec["rel_err"] <= rec["tol"]
    # u_ion profile error quantified at multiple pressures
    uion = [c for c in art["conditions"] if c["name"].startswith("uion")]
    assert len(uion) >= 3
    for c in uion:
        rec = c["qois"]["u_ion"]
        assert rec["rel_l2"] <= rec["tol"], c["name"]
    # every condition passes its stated tolerances
    for c in art["conditions"]:
        assert c["pass"], c["name"]

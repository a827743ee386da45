"""Validate the committed published-data anchor regression artifact
(runs/r5/anchors.json, produced by scripts/anchors.py at full fidelity on the
real chip). Covers T, I_d, I_B0, eta_c, eta_m, V_cc, u_ion(z) rel-L2 and
j_ion(theta) rel-L2 at >=4 operating conditions with stated tolerances (the
reference output contract consumes the same QoIs: reference
pem_to_julia.json:28-36). The round-5 design-point tolerance table is
ratcheted (T<=3%, I_d<=4%, I_B0<=10%) and pinned here so later physics/perf
work cannot silently loosen it."""

import json
from pathlib import Path

import pytest

ARTIFACT = Path(__file__).resolve().parents[1] / "runs" / "r5" / "anchors.json"

#: round-5 ratcheted design-point tolerance ceiling: the committed artifact
#: must claim AT MOST these (scripts/anchors.py can only tighten, not loosen)
DESIGN_TOL_CEILING = {"T": 0.03, "I_d": 0.04, "I_B0": 0.10, "V_cc": 0.05,
                      "eta_c": 0.12, "eta_m": 0.08}


@pytest.mark.skipif(not ARTIFACT.exists(), reason="anchor artifact not yet generated")
def test_anchor_artifact_valid_and_passing():
    with open(ARTIFACT) as fd:
        art = json.load(fd)
    assert art["pass"] is True
    names = [c["name"] for c in art["conditions"]]
    assert len(names) >= 10  # 4 scalar conditions + 3 LIF + 3 Faraday pressures
    # the design-point condition must anchor the full QoI set at (at most)
    # the round-5 ratcheted tolerances
    nominal = next(c for c in art["conditions"] if c["name"].startswith("diamant"))
    for q, ceiling in DESIGN_TOL_CEILING.items():
        rec = nominal["qois"][q]
        assert rec["pass"], (q, rec)
        assert rec["rel_err"] <= rec["tol"] <= ceiling, (q, rec)
    # u_ion profile error quantified at multiple pressures
    uion = [c for c in art["conditions"] if c["name"].startswith("uion")]
    assert len(uion) >= 3
    for c in uion:
        rec = c["qois"]["u_ion"]
        assert rec["rel_l2"] <= rec["tol"] <= 0.16, c["name"]
    # j_ion Faraday sweeps anchored at multiple pressures
    jion = [c for c in art["conditions"] if c["name"].startswith("jion")]
    assert len(jion) >= 3
    for c in jion:
        rec = c["qois"]["j_ion"]
        assert rec["rel_l2"] <= rec["tol"], c["name"]
    # every condition passes its stated tolerances
    for c in art["conditions"]:
        assert c["pass"], c["name"]

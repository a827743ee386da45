"""Validate the committed on-hardware Pallas<->lax parity artifact
(produced by scripts/parity_tpu.py on the real chip; the NEWEST round's
artifact is validated so a kernel change must re-earn its parity gate).

Interpret-mode parity stays in tests/test_pallas.py; this test pins the
*hardware* run — Mosaic codegen differences are exactly what interpret mode
cannot see."""

import json
from pathlib import Path

import pytest

_RUNS = Path(__file__).resolve().parents[1] / "runs"
_CANDIDATES = sorted(
    (p for p in _RUNS.glob("r*/parity_tpu.json") if p.parent.name[1:].isdigit()),
    key=lambda p: int(p.parent.name[1:]),
)
ARTIFACT = _CANDIDATES[-1] if _CANDIDATES else _RUNS / "r4" / "parity_tpu.json"


@pytest.mark.skipif(not ARTIFACT.exists(), reason="hardware parity artifact not yet generated")
def test_parity_artifact_valid_and_passing():
    with open(ARTIFACT) as fd:
        art = json.load(fd)
    # produced on real hardware, not a CPU stand-in
    assert art["platform"] in ("tpu", "axon"), art["platform"]
    assert art["configs"], "artifact has no configs"
    names = {c["condition"]["name"] for c in art["configs"]}
    assert "nominal_300V_5.16mg" in names
    assert len(names) >= 4, "nominal + >=3 corner configs required"
    for entry in art["configs"]:
        assert entry["pass"], f"parity failed for {entry['condition']['name']}: {entry['qois']}"
        assert entry["finite"]["mask_agreement"] >= art["min_mask_agreement"]
        # bistable rows may land in different attractors across backends (the
        # round-3 basin study); their fraction is bounded, and QoI tolerances
        # are judged on attractor-agreeing rows
        assert entry["finite"]["attractor_agreement"] >= art["min_mask_agreement"]
        for qoi, rec in entry["qois"].items():
            assert rec["median_rel"] < rec["tol_median"], (qoi, rec)
            assert rec["p90_rel"] < rec["tol_p90"], (qoi, rec)
    assert art["pass"] is True

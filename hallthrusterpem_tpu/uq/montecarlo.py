"""Monte Carlo forward UQ over a coupled System (reference ``monte_carlo.py:63-300``
capability: prior/posterior predictive sampling per operating condition, surrogate
vs true-model comparison, percentile statistics, relative-L2 validation)."""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np

from hallthrusterpem_tpu.surrogate.train import relative_l2

__all__ = ["run_mc", "mc_percentiles", "l2_error_table"]


def run_mc(
    system,
    n_samples: int,
    use_model: Optional[str] = None,
    use_pdf: Iterable[str] | bool = ("calibration", "nuisance"),
    nominal: Optional[dict] = None,
    constants: Iterable[str] = (),
    qois: Optional[Iterable[str]] = None,
    seed: int = 0,
    normalize: bool = False,
) -> tuple[dict, dict]:
    """Sample inputs and push them through the system (surrogate by default).

    :returns: (samples, outputs) dicts of (n_samples, ...) arrays
    """
    samples = system.sample_inputs(
        n_samples, seed=seed, use_pdf=use_pdf, nominal=nominal, constants=constants,
        normalize=normalize,
    )
    outputs = system.predict(samples, use_model=use_model, normalized=normalize, qoi_ind=qois)
    return samples, outputs


def mc_percentiles(outputs: dict, percentiles=(5, 50, 95)) -> dict:
    """NaN-robust percentile table per output (failed samples are NaN rows)."""
    out = {}
    for k, v in outputs.items():
        arr = np.asarray(v, dtype=np.float64)
        out[k] = {p: np.nanpercentile(arr, p, axis=0) for p in percentiles}
    return out


def l2_error_table(pred: dict, truth: dict, qois: Optional[Iterable[str]] = None) -> dict:
    """Relative-L2 validation table (reference ``monte_carlo.py:303-335``)."""
    table = {}
    for k in qois or truth.keys():
        if k in pred and k in truth:
            p = np.asarray(pred[k], dtype=np.float64)
            t = np.asarray(truth[k], dtype=np.float64)
            if p.shape == t.shape:
                table[k] = relative_l2(p, t, axis=-1 if t.ndim > 1 else None)
    return table

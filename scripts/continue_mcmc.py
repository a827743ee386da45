"""Continue a stretch-ensemble chain from its last recorded ensemble state.

The HDF5 chain file appends, so a continuation extends ESS without re-burning:
the new segment starts exactly where the committed chain ended.

Usage: python scripts/continue_mcmc.py runs/r4/mcmc/dram_chain.h5 [--niter 20000]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root
_sys.path.insert(0, str(_Path(__file__).resolve().parents[0] / "pem_v0"))

import argparse

import h5py
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("chain")
    parser.add_argument("--config", default="runs/r4/surr/pem_v0_SPT-100_trained.yml")
    parser.add_argument("--niter", type=int, default=20000)
    parser.add_argument("--noise-samples", type=int, default=16)
    args = parser.parse_args(argv)

    import mcmc as M

    m_args = argparse.Namespace(
        config_file=args.config, search=False, data=["spt100"], niter=args.niter,
        walkers=64, use_model=None, noise_std=0.02, noise_samples=args.noise_samples,
        file=args.chain, mle=False, laplace=False,
        qois=["V_cc", "T", "I_d", "u_ion", "j_ion"], id_penalty=2.0,
        on_device=True, host=False, sampler="stretch")
    system = M.load_system(m_args)
    calib = [v for v in system.inputs() if v.category == "calibration"]
    names = [v.name for v in calib]
    ops, obs, sig, fields = M.build_dataset(system, m_args)
    log_posterior, _ = M.build_device_posterior(system, m_args, calib, names, ops, obs, sig, fields)

    with h5py.File(args.chain, "r") as f:
        x_last = f["samples"][-1]  # (W, d)
    print(f"continuing from ensemble state {x_last.shape} in {args.chain}")

    from hallthrusterpem_tpu.uq import ess, integrated_autocorr_time, stretch

    samples, logps, acc = stretch(log_posterior, x_last, niter=args.niter,
                                  n_walkers=x_last.shape[0], filename=args.chain,
                                  progress=True)
    print(f"acceptance: {acc:.3f}")
    with h5py.File(args.chain, "r") as f:
        s = f["samples"][...]
    burn = s.shape[0] // 4
    taus = []
    for p in range(s.shape[-1]):
        per_w = [integrated_autocorr_time(s[burn:, w, p]) for w in range(0, s.shape[1], 8)]
        taus.append(float(np.mean(per_w)))
    n_eff = (s.shape[0] - burn) * s.shape[1] / np.maximum(taus, 1.0)
    print("total chain:", s.shape, "per-walker IAC min/med/max:",
          round(min(taus)), round(float(np.median(taus))), round(max(taus)))
    print("honest ESS per param: min", int(n_eff.min()), "median", int(np.median(n_eff)))


if __name__ == "__main__":
    main()

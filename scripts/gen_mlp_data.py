"""Generate an additional labeled training-data cache for the MLP surrogate.

Separate caches per seed (``*_mlp_train_data_s{seed}.pkl``) because the chunked
cache is resumable only at fixed (n, seed); ``scripts/mlp_sweep.py`` and
``fit_surr.py --surrogate mlp`` concatenate every cache in the run directory.

Usage: python scripts/gen_mlp_data.py -n 65536 --seed 8
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root

import argparse
from pathlib import Path


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-n", "--num_samples", type=int, default=65536)
    parser.add_argument("--seed", type=int, default=8)
    parser.add_argument("--chunk", type=int, default=1024)
    parser.add_argument("--dir", default="runs/r4/surr")
    parser.add_argument("--trim", default="runs/r4/surr/domain_classifier.pkl")
    args = parser.parse_args(argv)

    from hallthrusterpem_tpu.core.system import System
    from hallthrusterpem_tpu.surrogate.domain import FailureClassifier, make_domain_filter
    from hallthrusterpem_tpu.surrogate.mlp import generate_training_data

    run_dir = Path(args.dir)
    system = System.load_from_file(run_dir / "pem_v0_SPT-100_compression.yml")
    system.set_logger(stdout=True)
    domain_filter = None
    if args.trim:
        domain_filter = make_domain_filter(FailureClassifier.load(args.trim), system)
    cache = run_dir / f"{system.name}_mlp_train_data_s{args.seed}.pkl"
    generate_training_data(system, args.num_samples, seed=args.seed, chunk=args.chunk,
                           cache_path=cache, domain_filter=domain_filter)
    print(f"done -> {cache}")


if __name__ == "__main__":
    main()

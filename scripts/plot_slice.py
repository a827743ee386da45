"""1-D slice diagnostics of a trained surrogate vs the true model.

Work-alike of the reference's ``scripts/plot_slice.py`` (search conventions at
``plot_slice.py:59-95``, plotting call at ``plot_slice.py:121-127``).

Usage: python plot_slice.py config.yml --search [-i P_b V_a] [-o T I_d] [-n 15]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root

import argparse
from pathlib import Path

from hallthrusterpem_tpu.core.system import System

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("config_file")
parser.add_argument("--search", action="store_true", help="find newest trained/compression YAML")
parser.add_argument("-i", "--inputs", nargs="*", default=None)
parser.add_argument("-o", "--outputs", nargs="*", default=None)
parser.add_argument("-n", "--num_steps", type=int, default=15)
parser.add_argument("-r", "--random_walk", action="store_true")
parser.add_argument("-e", "--executor", default="batch", help="(parity flag)")
parser.add_argument("--save", default="slice.png")


def find_newest(base: Path) -> Path:
    """Newest trained (preferred) or compression save (reference's iter-directory
    search, plot_slice.py:59-95)."""
    root = base if base.is_dir() else base.parent
    for pattern in ("*_trained.yml", "*_iter*.yml", "*_compression.yml"):
        cands = sorted(root.rglob(pattern), key=lambda p: p.stat().st_mtime)
        if cands:
            return cands[-1]
    return base


def main(argv=None):
    args = parser.parse_args(argv)
    path = Path(args.config_file)
    if args.search:
        path = find_newest(path)
    system = System.load_from_file(path)
    system.set_logger(stdout=True)
    fig, _ = system.plot_slice(
        inputs=args.inputs,
        outputs=args.outputs,
        num_steps=args.num_steps,
        random_walk=args.random_walk,
        save_path=args.save,
    )
    system.logger.info("saved %s", args.save)


if __name__ == "__main__":
    main()

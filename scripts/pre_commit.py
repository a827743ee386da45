"""Pre-commit gate: refuse commits whose package/tests changes postdate the last
green pytest run (capability parity with the reference's ``_pre_commit_checks.py:31-40``).

Install:  ln -s ../../scripts/pre_commit.py .git/hooks/pre-commit  (or call directly)
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main() -> int:
    status_file = REPO / ".pytest_status"
    if not status_file.exists():
        print("pre-commit: no .pytest_status — run `python -m pytest tests/ -q` first")
        return 1
    status = json.loads(status_file.read_text())
    if status.get("exit_status", 1) != 0:
        print("pre-commit: last pytest run FAILED — fix tests before committing")
        return 1
    last_green = status.get("timestamp", 0.0)
    stale = [
        str(p.relative_to(REPO))
        for d in ("hallthrusterpem_tpu", "tests")
        for p in (REPO / d).rglob("*.py")
        if p.stat().st_mtime > last_green
    ]
    if stale:
        print("pre-commit: files changed after the last green pytest run:")
        for s in stale[:20]:
            print("  ", s)
        print("re-run `python -m pytest tests/ -q`")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

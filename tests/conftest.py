"""Test configuration: run everything on a virtual 8-device CPU mesh.

The real TPU is a single chip here; multi-chip sharding is validated on
``xla_force_host_platform_device_count=8`` CPU devices (same SPMD program XLA
would partition across real chips), mirroring the driver's ``dryrun_multichip``.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import json  # noqa: E402
import time  # noqa: E402
from pathlib import Path  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs[:8]


def _update_readme_coverage_badge(repo_root: Path) -> None:
    """Refresh the ``![Code Coverage](...)`` badge in README.md from the
    pytest-cov data file, when one exists (the reference's coverage-badge
    automation, tests/conftest.py:15-57, reimplemented for shields.io)."""
    import re

    cov_file = repo_root / ".coverage"
    readme = repo_root / "README.md"
    if not cov_file.exists() or not readme.exists():
        return
    try:
        from coverage import Coverage

        cov = Coverage(data_file=str(cov_file))
        cov.load()
        total = round(cov.report(show_missing=False, file=open(os.devnull, "w")))
    except Exception:
        return
    color = next(c for low, c in [(95, "brightgreen"), (90, "green"), (75, "yellowgreen"),
                                  (60, "yellow"), (40, "orange"), (0, "red")] if total >= low)
    badge = f"![Code Coverage](https://img.shields.io/badge/coverage-{total}%25-{color}?logo=codecov)"
    text = readme.read_text(encoding="utf-8")
    new = re.sub(r"\!\[Code Coverage\]\(.*?\)", badge, text, count=1)
    if new != text:
        readme.write_text(new, encoding="utf-8")


def pytest_sessionfinish(session, exitstatus):
    """Record the last test-run status for the pre-commit gate
    (the reference's ``.pytest_status`` convention, tests/conftest.py:60-67),
    and refresh the README coverage badge when pytest-cov ran."""
    repo_root = Path(__file__).resolve().parents[1]
    status = {"exit_status": int(exitstatus), "timestamp": time.time()}
    try:
        (repo_root / ".pytest_status").write_text(json.dumps(status))
    except OSError:
        pass
    _update_readme_coverage_badge(repo_root)

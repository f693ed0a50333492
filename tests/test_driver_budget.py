"""Guards for the driver-budget default selection (pyproject addopts +
conftest DRIVER_BUDGET_SLOW).

The external driver verifies the repo with the DEFAULT pytest selection
inside a fixed wall-clock budget; the deselection that keeps that run
inside the budget is a measured nodeid list applied at collection time.
A renamed/deleted test (or a typo in the list) would silently drop an
entry from the deselection and creep the default run back toward the
budget edge — these tests make that rot loud instead."""

import re
import subprocess
import sys
from pathlib import Path

import conftest

TESTS_DIR = Path(__file__).resolve().parent


def test_slow_list_entries_resolve_to_real_tests():
    """Every DRIVER_BUDGET_SLOW nodeid must match a collectable test.

    Collection covers the FULL suite (-m 'slow or not slow') so the
    check sees the deselected entries too; parametrized ids must match
    exactly (param reprs change when a param list is edited)."""
    out = subprocess.run(
        [
            sys.executable, "-m", "pytest", str(TESTS_DIR),
            "--collect-only", "-q", "-m", "slow or not slow",
            "-p", "no:cacheprovider",
        ],
        capture_output=True, text=True, timeout=180,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    collected = set()
    for line in out.stdout.splitlines():
        line = line.strip()
        if "::" in line:
            collected.add(line.split("tests/")[-1])
    assert len(collected) > 500, "collection output not parsed"
    missing = sorted(n for n in conftest.DRIVER_BUDGET_SLOW if n not in collected)
    assert not missing, (
        "DRIVER_BUDGET_SLOW entries no longer match any collected test "
        "(renamed/deleted test or stale param id — fix or drop them so "
        "the default run stays inside the driver budget): "
        f"{missing[:10]}{' …' if len(missing) > 10 else ''}"
    )


def test_slow_list_is_well_formed():
    """Entries are tests/-relative nodeids of existing files, and the
    two sweep files contribute param-level entries only (whole-file
    marks there would erase the default run's plan-guard smoke set)."""
    for nodeid in conftest.DRIVER_BUDGET_SLOW:
        assert not nodeid.startswith("tests/"), nodeid
        fname, sep, rest = nodeid.partition("::")
        assert sep and rest, f"not a nodeid: {nodeid}"
        assert (TESTS_DIR / fname).is_file(), f"missing file: {nodeid}"
        assert re.match(r"test_\w+\.py$", fname), nodeid
        if fname in ("test_plans.py", "test_no_cartesian.py"):
            assert "[" in nodeid and nodeid.endswith("]"), (
                f"sweep entries must be param-level: {nodeid}"
            )

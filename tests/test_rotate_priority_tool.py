"""tools/rotate_priority.py must reproduce the committed rotation.

The rotation guard (tests/test_rotation_staleness.py) defines WHAT must
be front-loaded; the tool mechanizes the rewrite. These tests pin the
two to each other: the tool's computed front-load is exactly the set the
guard would demand, and running the tool against the committed tree is a
byte-for-byte no-op (idempotence — the committed _PRIORITY IS the tool's
output for the current ledger).
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _tool():
    spec = importlib.util.spec_from_file_location(
        "rotate_priority", REPO / "tools" / "rotate_priority.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tool_is_noop_on_committed_tree():
    """--check mode: the committed _PRIORITY matches the ledger exactly."""
    assert _tool().rewrite(check=True) is False, (
        "tools/rotate_priority.py would rewrite _PRIORITY — run it and "
        "commit the result (round-start rotation is out of date)"
    )


def test_tool_front_load_satisfies_guard():
    """The tool's computed set == the guard's demanded set (same ledger,
    same window, same green predicate)."""
    sys.path.insert(0, str(REPO))
    try:
        import test_rotation_staleness as guard_mod  # noqa: F401
    except ImportError:
        pass
    finally:
        sys.path.pop(0)
    tool = _tool()
    guard = tool._load(
        REPO / "tests" / "test_rotation_staleness.py", "rotation_guard_check"
    )
    names, notes = tool.compute_priority()
    assert len(names) == len(notes)
    assert len(names) <= guard.BUDGET + guard.NEW_GRACE

    rounds = tool._rounds()
    recent = {n for _, data in rounds[-guard.MAX_STALE_ROUNDS:] for n in data}
    ever = {n for _, data in rounds for n in data}
    declared = list(
        tool._load(REPO / "__spark_entry__.py", "spark_entry_check").queries()
    )
    stale = (set(declared) & ever) - recent
    latest = rounds[-1][1]
    red = {n for n, row in latest.items() if not tool._green(row) and n in declared}
    # every guard-demanded name is in the tool's front-load
    assert stale | red <= set(names)
    # and mandatory names fit the recording budget
    assert len(stale | red) <= guard.BUDGET
    # never-recorded names are queued too (within the grace window)
    assert set(declared) - ever <= set(names)

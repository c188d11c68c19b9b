"""Guard the correctness-rotation contract.

The grading driver records at most ~50 of the declared queries per round
(global time budget), so ``__spark_entry__._modules()`` rotates which
families run first. These tests fail loudly when the rotation starves a
query AND the current entry ordering would not repair it next round:

- a query with no CORRECTNESS row in the last two recorded rounds is
  indistinguishable from one that silently broke — it must sit inside
  the front BUDGET positions of ``queries()`` so the next driver run
  records it;
- a non-green row in the latest round is a regression — it must be
  fixed AND front-loaded so the fix actually re-records.

Run at round start (cheap — pure JSON): the names these tests list are
exactly the ones ``_modules()`` / ``_PRIORITY`` must front-load.
"""

from __future__ import annotations

import importlib.util
import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
MAX_STALE_ROUNDS = 2
# conservative vs the driver's recording budget: CORRECTNESS_r01-r05
# each hold EXACTLY 50 rows (a deterministic count cap, not a time
# budget), so position < 48 still reliably gets a row with a 2-row
# safety margin. This bounds the sustainable query surface at
# 2*50 recent + 48 front = ~148 declared queries.
BUDGET = 48


def _entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _rounds() -> list[tuple[int, dict]]:
    out = []
    for p in REPO.glob("CORRECTNESS_r*.json"):
        m = re.match(r"CORRECTNESS_r(\d+)\.json", p.name)
        if m:
            out.append((int(m.group(1)), json.loads(p.read_text())))
    return sorted(out)


def _green(row: dict) -> bool:
    return bool(
        not row.get("err")
        and row.get("rows_match")
        and row.get("schema_match")
        # rows-only checks (non-SQL-expressible ops) have no hash key
        and row.get("hash_match", True)
    )


def test_stale_queries_are_front_loaded():
    rounds = _rounds()
    assert rounds, "no CORRECTNESS_r*.json found"
    recent = {name for _, data in rounds[-MAX_STALE_ROUNDS:] for name in data}
    order = list(_entry().queries())
    front = set(order[:BUDGET])
    starved = sorted(set(order) - recent - front)
    last = [r for r, _ in rounds[-MAX_STALE_ROUNDS:]]
    assert not starved, (
        f"{len(starved)} queries have no CORRECTNESS row in rounds {last} "
        f"AND sit beyond position {BUDGET} in queries() — move them into "
        f"_PRIORITY / front modules in __spark_entry__.py: {starved}"
    )


def test_latest_round_red_rows_are_front_loaded():
    """A red row in the latest round must be queued for re-recording
    (inside the front BUDGET positions) — fixing the query without
    front-loading it leaves the fix unverified for another round."""
    rnd, data = _rounds()[-1]
    order = list(_entry().queries())
    front = set(order[:BUDGET])
    unqueued = sorted(
        name for name, row in data.items() if not _green(row) and name not in front
    )
    assert not unqueued, (
        f"round {rnd} rows {unqueued} are non-green and NOT front-loaded "
        f"in __spark_entry__.queries() — add them to _PRIORITY"
    )

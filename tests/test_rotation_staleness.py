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
# The driver's recording budget: every recorded round (r01-r05, r07,
# r08) holds EXACTLY 50 rows — a deterministic count cap, not a time
# budget. BUDGET matches the cap: when a skipped driver round (r06 had
# no recording) leaves a full 50-name stale backlog, all 50 must fit in
# the front positions or the guard becomes unsatisfiable. This bounds
# the sustainable query surface at 2*50 recent + 50 front = 150
# declared queries.
BUDGET = 50
# Brand-new queries (no CORRECTNESS row in ANY round yet) are not
# "silently broken" — they queue behind the previously-verified stale
# backlog. They must still sit within BUDGET + NEW_GRACE so they are
# next in line once the backlog clears the following round.
NEW_GRACE = 6


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
    ever = {name for _, data in rounds for name in data}
    order = list(_entry().queries())
    front = set(order[:BUDGET])
    last = [r for r, _ in rounds[-MAX_STALE_ROUNDS:]]
    starved = sorted((set(order) & ever) - recent - front)
    assert not starved, (
        f"{len(starved)} previously-verified queries have no CORRECTNESS "
        f"row in rounds {last} AND sit beyond position {BUDGET} in "
        f"queries() — move them into _PRIORITY / front modules in "
        f"__spark_entry__.py: {starved}"
    )
    grace = set(order[: BUDGET + NEW_GRACE])
    parked = sorted(set(order) - ever - grace)
    assert not parked, (
        f"{len(parked)} never-recorded new queries sit beyond position "
        f"{BUDGET + NEW_GRACE} in queries() — they would never reach the "
        f"recording window; move them just behind the stale backlog in "
        f"_PRIORITY: {parked}"
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


def test_query_surface_within_cap():
    """Round-10 policy: the declared query surface is capped at the
    guard's sustainable bound (2 recent rounds x BUDGET recorded +
    BUDGET front = 150 names). Beyond that, a stale backlog can exceed
    the front window and the staleness guard becomes permanently
    unsatisfiable. New capabilities must piggyback on existing oracle
    rows (extra columns) or be pytest-gated without a queries() slot.
    See the QUERY-SURFACE POLICY note above _PRIORITY in
    __spark_entry__.py."""
    cap = (MAX_STALE_ROUNDS + 1) * BUDGET
    order = list(_entry().queries())
    assert len(order) <= cap, (
        f"{len(order)} declared queries exceed the sustainable cap of "
        f"{cap} — fold the new capability into an existing oracle row "
        f"instead of adding a queries() entry"
    )

"""Inventory contract checks (driver-facing surface)."""

from __future__ import annotations

from flink_streaming_platform_web_spark import inventory


def test_inventory_complete_and_ordered():
    qs = inventory.queries()
    oracles = inventory.oracle_sql()
    assert len(qs) == 149
    # every entry is oracle-gated (none fall back to rows-only)
    assert not (qs.keys() - oracles.keys())
    # the driver walks insertion order and has a finite budget: the
    # entries that lacked a CORRECTNESS_r01 row must run first
    inventory._check_first_is_exact()
    assert list(qs)[: len(inventory._CHECK_FIRST)] == list(
        inventory._CHECK_FIRST
    )


def test_oracles_are_nonempty_sql():
    for name, sql in inventory.oracle_sql().items():
        assert "select" in sql.lower(), name


def _correctness_ledger():
    """Parse CORRECTNESS_r*.json at the repo root → (latest: name →
    newest round with a driver row, max_round). Entries never
    driver-checked are simply absent (latest 0 via .get).

    Artifacts from rounds >= inventory._LEDGER_ROTATION_ROUND are
    excluded: the rotation was computed against the ledger the
    builder could see at round open, and the driver deposits the
    in-progress round's artifact AFTER that — including it made the
    r13 gates flip red mid-round (ADVICE r13 item 1)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    rounds = []
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        r = int(re.search(r"_r(\d+)\.json$", f).group(1))
        if r >= inventory._LEDGER_ROTATION_ROUND:
            continue
        rounds.append(r)
        with open(f) as fh:
            for k in json.load(fh):
                latest[k] = max(latest.get(k, 0), r)
    assert rounds, "no CORRECTNESS_r*.json ledger found"
    return latest, max(rounds)


def test_check_first_covers_stale_ledger_rows():
    """The rotation ledger's own gate (VERDICT r12 item 6): the
    _CHECK_FIRST slots of the CURRENT round must cover (a) every
    entry whose latest driver row is >= 3 rounds old, and (b) every
    entry the driver has never checked at all — so no entry's green
    can silently age out of the rotation."""
    latest, max_round = _correctness_ledger()
    qs = inventory.queries()
    head = set(inventory._CHECK_FIRST)
    stale = sorted(
        k for k in qs if latest.get(k, 0) <= max_round - 3
    )
    missed = [k for k in stale if k not in head]
    assert not missed, (
        f"entries with no driver row since r{max_round - 3} are not"
        f" fronted in _CHECK_FIRST: {missed}"
    )
    # the driver walks exactly 50 slots per round — more would
    # silently fall off the end, fewer wastes rotation budget
    assert len(inventory._CHECK_FIRST) == 50


def test_ledger_claim_matches_computed_histogram():
    """inventory._LEDGER_MIN_ROUND is the structured form of the
    rotation comment's steady-state claim ('no entry's latest driver
    row predates rN'). r12's prose drifted from the data (said r10,
    truth was r9 — VERDICT r12 'What's wrong' 3); asserting the
    machine-readable claim keeps the comment honest."""
    latest, _ = _correctness_ledger()
    qs = inventory.queries()
    dated = [latest[k] for k in qs if k in latest]
    assert dated, "ledger names do not intersect the inventory"
    # >= not ==: a driver deposit that IMPROVES the ledger (re-dating
    # old rows) must never read as red (VERDICT r13 What's-wrong 1)
    assert min(dated) >= inventory._LEDGER_MIN_ROUND, (
        f"computed oldest latest-row round {min(dated)} <"
        f" claimed _LEDGER_MIN_ROUND {inventory._LEDGER_MIN_ROUND}"
    )

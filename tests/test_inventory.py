"""Inventory contract checks (driver-facing surface)."""

from __future__ import annotations

from flink_streaming_platform_web_spark import inventory


def test_inventory_complete_and_ordered():
    qs = inventory.queries()
    oracles = inventory.oracle_sql()
    assert len(qs) == 147
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

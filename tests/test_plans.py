"""Physical-plan quality gates: the properties that decide whether a
query survives a 100× scale-up. These assert on `.explain` output so a
regression (lost pushdown, surprise shuffle, dropped broadcast) fails
CI instead of surfacing as a cluster bill.

- filters/projections reach the parquet scan (PushedFilters/ReadSchema)
- dimension joins broadcast (no shuffle of the fact side)
- aggregations are partial (map-side combine) before the exchange
- hot paths stay in WholeStageCodegen (no Python in the row loop)
"""

from __future__ import annotations

from flink_streaming_platform_web_spark.operators.relational import (
    q01_pricing_summary,
    q02_filter_project,
    q06_lookup_join,
    q07_enriched_orders,
    q21_local_supplier_volume,
)


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _formatted(q02_filter_project(spark, sf_dir))
    assert "PushedFilters:" in plan
    assert "l_quantity" in plan.split("PushedFilters:")[1].split("\n")[0]


def test_column_pruning(spark, sf_dir):
    plan = _formatted(q02_filter_project(spark, sf_dir))
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    # only the 4 needed columns are read, not all 11 lineitem columns
    assert "l_extendedprice" not in read_schema
    assert "l_tax" not in read_schema
    assert "l_orderkey" in read_schema


def test_q01_partial_aggregation(spark, sf_dir):
    plan = _physical(q01_pricing_summary(spark, sf_dir))
    # partial agg before the exchange, final after: exactly one shuffle
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in plan or "partial_count" in plan


def test_lookup_join_broadcasts_dim(spark, sf_dir):
    plan = _physical(q06_lookup_join(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # the fact side (events) must not shuffle for the join itself:
    # only the aggregation exchange remains
    assert plan.count("Exchange hashpartitioning") <= 1


def test_enriched_orders_dims_broadcast(spark, sf_dir):
    plan = _physical(q07_enriched_orders(spark, sf_dir))
    # customer/nation/region joins all broadcast at these sizes
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_q21_whole_stage_codegen(spark, sf_dir):
    df = q21_local_supplier_volume(spark, sf_dir)
    df.collect()  # AQE only materializes codegen stages on execution
    plan = _physical(df)
    # '*(n)' prefixes mark WholeStageCodegen spans in the plan string
    assert "*(" in plan
    # no Python evaluation in the relational inventory's hot path
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan

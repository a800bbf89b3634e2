"""Plan-inspection helpers — the `.explain` tooling behind the
plan-quality gates in tests/test_plans.py."""

from flink_streaming_platform_web_spark.plans.explain import (  # noqa: F401
    executed_plan,
    formatted_plan,
    has_python_eval,
    pushed_filters,
    read_schema,
    shuffle_count,
)

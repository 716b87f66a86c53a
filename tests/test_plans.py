"""Physical-plan regression tests: lock in the plan properties the scale
design depends on (SCALE.md). A semantic refactor that silently converts
a broadcast join to sort-merge, loses parquet filter pushdown, or drops
Python into a JVM-only path fails HERE, not in a later bench round.

Plans are audited AFTER execution so AQE's final decisions are what is
asserted (the same approach as tools/explain_audit.py).
"""

from __future__ import annotations

import re

import pytest

from incubator_pulsar_spark.plans.queries import ALL_QUERIES

from conftest import SF_DIR


def executed_plan(spark, name: str) -> str:
    df = ALL_QUERIES[name].build(spark, SF_DIR)
    df.count()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


JOIN_TPCH = [
    "q3_shipping_priority", "q5_region_revenue", "q7_nation_volume",
    "q8_market_share", "q10_returned_items", "q18_large_orders",
]
JVM_ONLY_TPCH = ["q1_pricing_summary", *JOIN_TPCH]


class TestPlanQuality:
    @pytest.mark.parametrize("name", JOIN_TPCH)
    def test_tpch_joins_broadcast_not_sortmerge(self, spark, name):
        plan = executed_plan(spark, name)
        assert "SortMergeJoin" not in plan, f"{name}: dim join regressed to SMJ"
        assert "BroadcastHashJoin" in plan, f"{name}: expected broadcast joins"

    @pytest.mark.parametrize("name", JVM_ONLY_TPCH)
    def test_tpch_stays_jvm_side(self, spark, name):
        plan = executed_plan(spark, name)
        assert not re.search(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
                             plan), f"{name}: Python stage in a JVM-only path"

    def test_filter_pushdown_reaches_scan(self, spark):
        plan = executed_plan(spark, "q6_forecast_revenue")
        pushed = [p for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if p]
        assert pushed, "q6 predicates must reach the parquet scan"

    def test_column_pruning(self, spark):
        plan = executed_plan(spark, "q6_forecast_revenue")
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m, "no ReadSchema in plan"
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert "l_comment" not in cols and len(cols) <= 5, (
            f"q6 should scan only its needed columns, got {sorted(cols)}")

    def test_topk_no_global_sort(self, spark):
        plan = executed_plan(spark, "topk_orders")
        assert "TakeOrderedAndProject" in plan, (
            "top-k must use TakeOrderedAndProject, not a global sort")

    def test_compaction_partial_agg(self, spark):
        """max_by compaction must keep partial aggregation (map-side
        combine) — the two-phase compactor's memory bound."""
        plan = executed_plan(spark, "compaction_publish_order")
        n_agg = plan.count("HashAggregate") + plan.count("SortAggregate")
        assert n_agg >= 2, "compaction lost its partial (map-side) aggregation"

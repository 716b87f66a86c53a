"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` exposes one
callable per implemented operator (SURVEY.md §2); ``oracle_sql()`` gives
the DuckDB-equivalent SQL used for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from incubator_pulsar_spark.plans.queries import ALL_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Topic compaction (publish order) is the signature data-plane operator
    of the reference (AbstractTwoPhaseCompactor) — latest message per key.
    """
    return ALL_QUERIES["compaction_publish_order"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; approximate/non-relational ops
    are omitted → rows-only check."""
    return {name: q.oracle for name, q in ALL_QUERIES.items() if q.oracle is not None}

"""Bucketed-table co-located joins: the shuffle-elimination posture for
repeated big-big joins.

At 100 TB the orders⋈lineitem join shuffles BOTH tables on every query
that runs it. Writing each table bucketed by the join key (Spark's
``bucketBy`` — hash-partitioned files + catalog metadata) pays that
shuffle ONCE at write time; every subsequent join on the key reads
co-located buckets and plans with NO Exchange on either side (an SMJ
over pre-bucketed, optionally pre-sorted inputs). This module wraps
the write/read pair; the pytest plan lock asserts the probe join plans
zero hashpartitioning Exchanges, and the oracle gate proves the
bucketed join returns byte-identical results to the plain join.

Bucket-count discipline: both sides must use the SAME bucket count
(Spark joins bucketed tables shuffle-free only when counts match or
divide evenly with bucket coalescing); size buckets so one bucket of
the LARGER table fits an executor core's working set (128 MB-1 GB
parquet per bucket at warehouse scale).
"""


def write_bucketed(df, table: str, *, bucket_col: str, n_buckets: int,
                   path: str) -> None:
    """Persist ``df`` as a bucketed external table (overwriting any
    prior registration): hash(bucket_col) % n_buckets files per write
    task, bucket metadata in the session catalog, sorted within
    buckets on the key so downstream SMJs skip their sorts."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (df.write.mode("overwrite")
     .option("path", path)
     .bucketBy(n_buckets, bucket_col)
     .sortBy(bucket_col)
     .format("parquet")
     .saveAsTable(table))


def bucketed_join(spark, left_table: str, right_table: str,
                  on: str):
    """Join two same-bucket-count tables on their bucket key — reads
    co-located buckets, no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on)

"""Topic digests: order-independent content checksums for replica
verification.

The reference replicates topics across clusters (geo-replication:
``org.apache.pulsar.broker.service.persistent.PersistentReplicator``)
but offers no content-comparison primitive — operators diff cursor
positions and message counts. The engine-side anti-entropy check is a
DIGEST: per group (topic / day / key-range), an order-independent
checksum of the rows, so two replicas can be compared with two scans
and a tiny join — never by shipping data.

Checksum design: count + the exact SUM of 48-bit md5 values as
DECIMAL(38,0). Sum (not XOR) because XOR cancels duplicate rows in
pairs — a replica holding a message twice and missing another XORs
clean, but sums differently. 48-bit hashes keep the sum exact in
decimals (2^48 · 10^12 rows ≪ 10^38) and replay in ANSI SQL, so the
digest itself is correctness-gated cross-engine.

Scale shape: one map-side partial aggregate per replica — the shuffle
carries |groups| rows of (count, decimal) — then an equi-join of two
digest tables. 100 TB replicas compare in two scans at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topic_digest(df: DataFrame, group_cols: list[str],
                 content_cols: list[str], *, salt: str = "dg") -> DataFrame:
    """Per-group (n_rows, checksum) over the named content columns.

    Rows digest as md5(salt:col1:col2:...) — NULLs render as the empty
    string under concat_ws on both engines (documented; a NULL vs ''
    ambiguity is acceptable for anti-entropy, not for cryptography).
    """
    h48 = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt),
                                      *[F.col(c).cast("string")
                                        for c in content_cols])), 1, 12),
        16, 10).cast("decimal(38,0)")
    return (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
             F.sum(h48).cast("decimal(38,0)").cast("string").alias("checksum"))
    )


def digest_diff(a: DataFrame, b: DataFrame,
                group_cols: list[str]) -> DataFrame:
    """Groups whose digests disagree between two replicas (full outer
    join of two digest tables — a group missing on one side counts as
    a difference)."""
    an = a.select(*group_cols, F.col("n_rows").alias("n_rows_a"),
                  F.col("checksum").alias("checksum_a"))
    bn = b.select(*group_cols, F.col("n_rows").alias("n_rows_b"),
                  F.col("checksum").alias("checksum_b"))
    j = an.join(bn, group_cols, "full_outer")
    return j.filter(
        ~(F.col("checksum_a").eqNullSafe(F.col("checksum_b"))
          & F.col("n_rows_a").eqNullSafe(F.col("n_rows_b"))))

"""Streaming replica digests: the anti-entropy checksum maintained
incrementally across micro-batches.

The batch digest (operators/digest.py) is a per-group (count, exact
decimal sum of md5-48 row hashes). Both components are MERGEABLE by
addition, so the streaming form is just a built-in streaming
aggregation in update mode — no custom state: Spark's agg state per
group is exactly (count, decimal sum), the same ~48 bytes the batch
operator shuffles. After any sequence of micro-batches the streaming
digest equals the batch digest of the union (pytest-proven), which is
what lets a replica verify itself continuously instead of by
scheduled full scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topic_digest_stream(stream: DataFrame, group_cols: list[str],
                        content_cols: list[str], *,
                        salt: str = "dg") -> DataFrame:
    """Update-mode running digest per group: group_cols + (n_rows,
    checksum) — emits the refreshed digest for every group touched by
    a micro-batch."""
    h48 = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt),
                                      *[F.col(c).cast("string")
                                        for c in content_cols])), 1, 12),
        16, 10).cast("decimal(38,0)")
    return (
        stream.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
             F.sum(h48).cast("decimal(38,0)").cast("string").alias("checksum"))
    )

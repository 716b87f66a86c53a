"""TableView: a continuously-updated latest-value-per-key map.

Reference: ``pulsar-client-api/.../TableView.java:28-105`` (get/entrySet/
forEach/listen) backed by a tailing reader that applies put, and remove
on null payload (``TableViewImpl.java:206-239``). It is client-side
continuous compaction.

Spark-first: the batch snapshot is ``compact(...)`` projected to
(key, value); the streaming variant keeps last-per-key state with
``max_by`` in update mode (operators/../streaming/tableview_stream.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .compaction import PUBLISH_ORDER, compact


def table_view(
    df: DataFrame,
    *,
    key_col: str = "key",
    value_col: str = "value",
    sequence_col: str = "sequence",
    mode: str = PUBLISH_ORDER,
) -> DataFrame:
    """Materialize the key→latest-value map as a two-column DataFrame.

    Tombstones (null value) remove the key, exactly TableViewImpl's
    ``data.remove(key)`` on null payload (TableViewImpl.java:237-239).
    """
    snap = compact(
        df,
        key_col=key_col,
        value_col=value_col,
        sequence_col=sequence_col,
        mode=mode,
        retain_null_key=False,
        drop_tombstones=True,
    )
    return snap.select(F.col(key_col).alias("key"), F.col(value_col).alias("value"))

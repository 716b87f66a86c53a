"""Z-order (Morton) data layout: multi-dimensional clustering so
min/max file statistics prune on EVERY interleaved dimension, not just
the leading sort column.

Public technique (Morton 1966; productized in lakehouse OPTIMIZE
ZORDER BY implementations): interleave the bits of the dimension
values so rows close in the 2-D space land close in the 1-D sort
order. A file/row-group then covers a compact rectangle-ish region,
and a rectangular predicate touches ~O(perimeter) blocks instead of
O(total/selectivity-of-one-dim) — row-major layouts prune only the
leading column, and hash/random layouts prune nothing.

Pieces:

- ``zorder_key(x, y, bits)`` — pure column expression (shift/mask
  folds, exact integer math, identical on any SQL engine);
- ``zorder_write(df, path, cols)`` — the DISTRIBUTED layout writer:
  ``repartitionByRange`` on the z-key + ``sortWithinPartitions`` means
  no global sort bottleneck at 100 TB, then each output file covers a
  contiguous z-range. To later re-cluster with
  ``operators.maintenance.compact_parquet_dir(sort_by=["_zkey"])``,
  pass ``keep_key=True`` so ``_zkey`` is persisted in the files (by
  default it is dropped and the compactor would have nothing to sort
  by — recompute it before compacting otherwise);
- the gated query (plans/queries.py: ``zorder_block_stats_events``) is
  the EVALUATION harness, not the writer: it scores layouts by blocks
  touched for a rectangular predicate, replayable exactly in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, *, bits: int = 8) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative ints:
    result bit 2i is x's bit i, bit 2i+1 is y's bit i. 2·bits ≤ 62."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    z = F.lit(0).cast("long")
    xl, yl = x.cast("long"), y.cast("long")
    for i in range(bits):
        z = z.bitwiseOR(F.shiftleft(F.shiftright(xl, i).bitwiseAND(F.lit(1)),
                                    2 * i))
        z = z.bitwiseOR(F.shiftleft(F.shiftright(yl, i).bitwiseAND(F.lit(1)),
                                    2 * i + 1))
    return z


def zorder_key_sql(x: str, y: str, *, bits: int = 8) -> str:
    """The identical interleave as ANSI-ish SQL text (DuckDB dialect:
    ``&``, ``|``, ``>>``, ``<<`` on BIGINT) — the oracle-side mirror."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_write(df: DataFrame, path: str, x_col: str, y_col: str, *,
                 bits: int = 8, n_files: int | None = None,
                 keep_key: bool = False) -> None:
    """Write ``df`` z-clustered on (x_col, y_col): range-partition by
    the z-key (distributed — no global sort), sort within partitions.
    Each output file then covers a contiguous z-range, which is what
    makes min/max stats selective on BOTH dimensions.

    ``keep_key=True`` persists the ``_zkey`` helper column so later
    maintenance passes (``compact_parquet_dir(sort_by=["_zkey"])``) can
    re-cluster without recomputing it; the default drops it."""
    keyed = df.withColumn("_zkey", zorder_key(F.col(x_col), F.col(y_col),
                                              bits=bits))
    parts = n_files or keyed.sparkSession.sparkContext.defaultParallelism
    clustered = (keyed.repartitionByRange(parts, "_zkey")
                 .sortWithinPartitions("_zkey"))
    if not keep_key:
        clustered = clustered.drop("_zkey")
    clustered.write.mode("overwrite").parquet(path)


def zorder_key_n(cols: list[Column], *, bits: int = 8) -> Column:
    """N-dimensional Morton interleave (round-robin bit placement:
    result bit n·i + d is dimension d's bit i). Dimensions beyond 2
    follow the same locality argument — an axis-aligned hyper-rectangle
    of aligned power-of-two extent maps to one contiguous z-range.
    n·bits ≤ 62."""
    n = len(cols)
    if n < 1:
        raise ValueError("need at least one column")
    if not 1 <= bits <= 62 // n:
        raise ValueError(f"bits must be in [1, {62 // n}] for {n} dims")
    z = F.lit(0).cast("long")
    for d, col in enumerate(cols):
        cl = col.cast("long")
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(cl, i).bitwiseAND(F.lit(1)),
                            n * i + d))
    return z

"""Partition routing and Key_Shared dispatch.

Reference:
- MessageRoutingMode (``MessageRoutingMode.java:39-55``): SinglePartition,
  RoundRobinPartition, CustomPartition.
- RoundRobinPartitionMessageRouterImpl.java:74-77 — keyed messages route
  by hash(key) % n; unkeyed round-robin.
- Hashing schemes: JavaStringHash / Murmur3_32Hash
  (``client/impl/Murmur3Hash32.java``); Spark's ``hash()`` IS Murmur3-32,
  so the idiomatic route matches the reference's default family.
- Key_Shared subscription (``SubscriptionType.java:61``): all messages of
  a key go to one consumer, in order — a 0..65535 consistent-hash ring
  (``ConsistentHashingStickyKeyConsumerSelector.java:40,104``).

Spark-first: routing == repartitioning; Key_Shared == shuffle by key +
sort within partitions by publish order. Spark's shuffle gives the
"one task owns each key, in order" contract natively — the hash ring,
permit accounting, and consumer selectors are scheduler work Spark
already does.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KEY_SHARED_RING_SIZE = 65536  # KeySharedPolicy.DEFAULT_HASH_RANGE_SIZE


def route_partition_col(
    key: Column, num_partitions: int, *, unkeyed_fallback: Column | None = None
) -> Column:
    """Partition index per the default router: pmod(murmur3(key), n).

    RoundRobinPartitionMessageRouterImpl.java:74-77. ``unkeyed_fallback``
    supplies the round-robin index source for null keys (e.g. sequence).
    """
    keyed = F.pmod(F.hash(key), F.lit(num_partitions))
    if unkeyed_fallback is None:
        return keyed.cast("int")
    return F.when(key.isNotNull(), keyed).otherwise(
        F.pmod(unkeyed_fallback.cast("long"), F.lit(num_partitions))
    ).cast("int")


def route_round_robin(df: DataFrame, num_partitions: int, key_col: str = "key",
                      sequence_col: str = "sequence") -> DataFrame:
    """Recompute the ``partition`` column with the default router."""
    return df.withColumn(
        "partition",
        route_partition_col(F.col(key_col), num_partitions,
                            unkeyed_fallback=F.col(sequence_col)),
    )


def route_single_partition(df: DataFrame, partition: int = 0) -> DataFrame:
    """SinglePartitionMessageRouter: everything to one chosen partition."""
    return df.withColumn("partition", F.lit(partition).cast("int"))


def route_custom(df: DataFrame, partition_expr: Column) -> DataFrame:
    """CustomPartition: user-supplied routing expression."""
    return df.withColumn("partition", partition_expr.cast("int"))


def key_shared(df: DataFrame, *, key_col: str = "key", order_col: str = "sequence",
               num_tasks: int | None = None) -> DataFrame:
    """Key_Shared dispatch: co-locate each key on one task, ordered.

    Physical contract (SubscriptionType.java:61): per-key processing
    order equals publish order. ``repartition(key)`` pins a key to one
    task; ``sortWithinPartitions`` restores publish order without a
    global sort. Downstream ``mapInPandas``/``foreachPartition`` then
    sees what a Key_Shared consumer would see.
    """
    parted = (
        df.repartition(num_tasks, F.col(key_col))
        if num_tasks
        else df.repartition(F.col(key_col))
    )
    return parted.sortWithinPartitions(key_col, order_col)


def salted_two_phase_agg(
    df: DataFrame,
    *,
    key_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt_buckets: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Skew-proof aggregation: pre-aggregate by (key, salt), then finish
    by key — a hot key spreads over ``salt_buckets`` reduce tasks in
    phase one instead of landing on a single straggler.

    Use when a re-aggregable metric (sum/count/min/max) meets a skewed
    key at a scale where map-side partial aggregation alone can't save
    you (billions of rows of ONE key across thousands of map tasks still
    reduce into one task without the salt). ``partial_aggs`` compute per
    (key, salt); ``final_aggs`` combine the partials per key — e.g.
    partial ``sum(x) as s`` then final ``sum(s) as total``.

    ``salt_source`` defaults to a deterministic spread over input rows
    (murmur3 of all columns) so results stay reproducible.
    """
    salt = salt_source if salt_source is not None else F.hash(*[F.col(c) for c in df.columns])
    salted = df.withColumn("_salt", F.pmod(salt, F.lit(salt_buckets)))
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)


def key_hash_slot(key: Column, ring_size: int = KEY_SHARED_RING_SIZE) -> Column:
    """Position of a key on the Key_Shared hash ring (0..65535).

    ConsistentHashingStickyKeyConsumerSelector keys the TreeMap ring with
    murmur3(key) % 65536; exposed for tests asserting sticky assignment.
    """
    return F.pmod(F.hash(key), F.lit(ring_size)).cast("int")


def java_string_hash(key: Column) -> Column:
    """Bit-exact JavaStringHash (client/impl/JavaStringHash.java):
    ``s.hashCode() & Integer.MAX_VALUE``.

    Java's ``String.hashCode`` is the 31-multiplier fold over UTF-16
    units; implemented as a pure column fold with explicit signed-32-bit
    wraparound so partition assignments match a Java client's bit for
    bit (BMP characters; Spark ``split('')`` yields code points, which
    equal UTF-16 units inside the BMP). Null key hashes like the empty
    string (hashCode 0), matching a null partition key.
    """
    def step(acc: Column, c: Column) -> Column:
        v = acc * 31 + F.ascii(c)
        return ((v + F.lit(2 ** 31)) % F.lit(2 ** 32)) - F.lit(2 ** 31)

    h = F.aggregate(F.split(F.coalesce(key, F.lit("")), ""),
                    F.lit(0).cast("long"), step)
    return h.bitwiseAND(F.lit(0x7FFFFFFF)).cast("int")


def route_partition_col_java(key: Column, num_partitions: int) -> Column:
    """Default router under HashingScheme.JavaStringHash:
    ``JavaStringHash(key) % n`` (non-negative by construction)."""
    return (java_string_hash(key) % F.lit(num_partitions)).cast("int")


@dataclass(frozen=True)
class StickyRange:
    """One consumer's explicit hash range (KeySharedPolicy.java:88-95
    STICKY mode; Range.java). ``start``/``end`` inclusive, 0..65535."""
    start: int
    end: int
    consumer: str


def validate_sticky_ranges(ranges: list[StickyRange],
                           ring_size: int = KEY_SHARED_RING_SIZE) -> None:
    """KeySharedPolicySticky.validate: every range inside the ring and no
    two ranges intersecting (HashRangeExclusiveStickyKeyConsumerSelector
    rejects overlapping claims)."""
    for r in ranges:
        if not (0 <= r.start <= r.end < ring_size):
            raise ValueError(f"range {r} outside ring [0, {ring_size})")
    by_start = sorted(ranges, key=lambda r: r.start)
    for a, b in zip(by_start, by_start[1:]):
        if b.start <= a.end:
            raise ValueError(f"ranges {a} and {b} overlap")


def assign_sticky(df: DataFrame, ranges: list[StickyRange], *,
                  key_col: str = "key",
                  ring_size: int = KEY_SHARED_RING_SIZE) -> DataFrame:
    """Key_Shared STICKY dispatch: map each row's key-hash slot to the
    consumer whose explicit range covers it; NULL consumer when no range
    claims the slot (the reference withholds such messages until a
    consumer claims the range — callers filter or park those rows).
    """
    validate_sticky_ranges(ranges, ring_size)
    slot = key_hash_slot(F.col(key_col), ring_size)
    expr = F.lit(None).cast("string")
    for r in ranges:  # CASE chain: tiny (ranges ≤ consumers), map-side
        expr = F.when((slot >= r.start) & (slot <= r.end),
                      F.lit(r.consumer)).otherwise(expr)
    return df.withColumn("consumer", expr)

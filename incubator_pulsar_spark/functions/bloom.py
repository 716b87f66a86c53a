"""Broadcast Bloom-filter semi-join: prune a fact scan with a bitmap
built from the dimension side before any shuffle or join runs.

The reference ships server-side filtering as broker entry filters
(pulsar-broker: EntryFilter ACCEPT/REJECT, see
``org.apache.pulsar.broker.service.plugin.EntryFilter``); the Spark-first
equivalent of "drop rows before they travel" is a runtime Bloom filter
pushed into the fact scan. Spark's own `InjectRuntimeFilter` does this
only for shuffle-join shapes it recognizes; this module is the explicit
operator: build the bitmap from the (small) build side, broadcast it to
the probe side, then let a real join remove the false positives — the
Bloom stage can only prune, never change results.

Determinism & oracle-portability: bit positions are md5-derived
(``('0x'||substr(md5('bf{i}:'||key),1,12))::BIGINT % m_bits`` replays in
ANSI SQL), so the bitmap — and therefore the exact set of fact rows
passing the pre-filter, INCLUDING false positives — is reproducible on
any engine. The correctness gate checks the Bloom itself, not just the
final join.

Scale shape: the bitmap is fixed-size (m_bits/8 bytes; 8 KiB for the
default 2^16 — size m_bits ≈ 10·n_keys for ~1% fpp at 3 hashes)
regardless of fact size, built with one small aggregation over the
build side and collected once (bounded: m_bits/64 rows — same
documented pattern as the IVF centroid pool). It reaches the probe side
as an ``array<long>`` DATA column on a broadcast 1-row frame, probed
with O(1) ``element_at`` + bitmask — all JVM expressions inside
whole-stage codegen, no Python, no extra shuffle.

Two rejected encodings, both measured at sf0.01 (15 k probe rows):
a 1024-element literal array costs 2-4 s of codegen compilation per
query (each element becomes its own expression in the generated Java),
and a '0'/'1' string literal probed with ``substr`` costs ~2.6 s per
pass because ``UTF8String.substring`` walks bytes to the char offset —
O(position) per probe, ~32 KiB per row on a 64 Kbit map. The
broadcast-row array probe runs the same query in ~0.6 s.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# 64 single-bit masks as a small literal array: F.shiftleft takes only a
# Python-int shift amount, so a COLUMN bit position selects its mask by
# element_at instead (bit 63 is the sign bit — hence the negative long).
def _bit_mask(bit: Column) -> Column:
    masks = F.array(*[
        F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long")
        for b in range(64)
    ])
    return F.element_at(masks, bit.cast("int") + 1)


def bloom_positions(col: Column, *, m_bits: int, num_hashes: int) -> list[Column]:
    """The ``num_hashes`` md5-derived bit positions of a key (48-bit
    uniforms mod m_bits — exact in BIGINTs on both engines)."""
    return [
        F.conv(F.substring(F.md5(F.concat(F.lit(f"bf{i}:"), col.cast("string"))),
                           1, 12), 16, 10).cast("long") % m_bits
        for i in range(num_hashes)
    ]


def build_bloom(build: DataFrame, key_col: str, *, m_bits: int = 1 << 16,
                num_hashes: int = 3) -> list[int]:
    """Aggregate the build side into a Bloom bitmap (list of m_bits/64
    longs, index = bit >> 6). One narrow aggregation; the collect is
    bounded at m_bits/64 rows (1024 for the 8 KiB default)."""
    pos = F.explode(F.array(*bloom_positions(F.col(key_col), m_bits=m_bits,
                                             num_hashes=num_hashes)))
    words = (
        build.select(pos.alias("_pos"))
        .select((F.col("_pos") / 64).cast("int").alias("_w"),
                _bit_mask(F.col("_pos") % 64).alias("_m"))
        .groupBy("_w").agg(F.bit_or("_m").alias("_bits"))
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[r["_w"]] = r["_bits"]
    return bitmap


def _probe(words_col: Column, key: Column, *, m_bits: int,
           num_hashes: int) -> Column:
    checks = []
    for p in bloom_positions(key, m_bits=m_bits, num_hashes=num_hashes):
        word = F.element_at(words_col, (p / 64).cast("int") + 1)
        checks.append(word.bitwiseAND(_bit_mask(p % 64)) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def apply_bloom_filter(df: DataFrame, bitmap: list[int], key_col: str, *,
                       m_bits: int = 1 << 16, num_hashes: int = 3) -> DataFrame:
    """Rows of ``df`` whose key MIGHT be in the set that built ``bitmap``
    (false positives possible, false negatives impossible).

    The bitmap travels as data on a broadcast 1-row frame — constant
    cost however large the probe side is, and no giant literals for
    codegen to chew (see module docstring for the measured trap).
    """
    spark = df.sparkSession
    bdf = spark.createDataFrame([(bitmap,)], "_bf_words ARRAY<BIGINT>")
    return (
        df.crossJoin(F.broadcast(bdf))
        .filter(_probe(F.col("_bf_words"), F.col(key_col), m_bits=m_bits,
                       num_hashes=num_hashes))
        .drop("_bf_words")
    )


def might_contain(bitmap: list[int], col: Column, *, m_bits: int = 1 << 16,
                  num_hashes: int = 3) -> Column:
    """Column-form membership test against a LITERAL bitmap array.

    Convenience for unit tests and tiny maps: every bitmap word becomes
    its own literal expression, which costs codegen compile time
    linearly in m_bits (~2 s at 2^16) — use ``apply_bloom_filter`` in
    query plans.
    """
    arr = F.array(*[F.lit(w).cast("long") for w in bitmap])
    return _probe(arr, col, m_bits=m_bits, num_hashes=num_hashes)


def bloom_prefiltered_join(fact: DataFrame, build: DataFrame, fact_col: str,
                           build_col: str, *, m_bits: int = 1 << 16,
                           num_hashes: int = 3) -> DataFrame:
    """Fact rows surviving the Bloom pre-filter, flagged with the exact
    membership verdict (``_bloom_true``) from a broadcast join on the
    real key set — false positives are the rows where the flag is
    false. Callers keeping only ``_bloom_true`` rows get exactly the
    semi-join result; the pre-filter is pure pruning."""
    bitmap = build_bloom(build, build_col, m_bits=m_bits, num_hashes=num_hashes)
    keys = build.select(F.col(build_col).alias("_bk")).dropDuplicates(["_bk"])
    passed = apply_bloom_filter(fact, bitmap, fact_col, m_bits=m_bits,
                                num_hashes=num_hashes)
    return (
        passed.join(F.broadcast(keys), passed[fact_col] == keys["_bk"], "left")
        .withColumn("_bloom_true", F.col("_bk").isNotNull())
        .drop("_bk")
    )

"""Declarative data-quality checks — the dbt-test / Deequ-style
constraint pass a production topic runs before data is served or
trained on: not-null, accepted-values, range, uniqueness, referential
integrity.

Scale shape: every SCALAR rule (not_null / accepted_values / in_range)
compiles to a CASE flag summed in ONE aggregate over ONE scan of the
table — adding rules adds columns to that pass, never scans.
Uniqueness rides the same pass as count(*) − count(distinct keys)
(excess-row count). Referential rules each add one anti-join against
the (broadcastable) reference side. The report is rule-count rows —
metadata-sized regardless of table size.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str
    col: str | None = None
    cols: tuple[str, ...] = ()
    values: tuple = ()
    lo: float | None = None
    hi: float | None = None
    ref: DataFrame | None = field(default=None, compare=False)
    ref_col: str | None = None


def not_null(col: str, name: str | None = None) -> Rule:
    return Rule(name or f"not_null:{col}", "not_null", col=col)


def accepted_values(col: str, values, name: str | None = None) -> Rule:
    """Violation = non-null value outside the list (nulls are
    not_null's business, the dbt convention)."""
    return Rule(name or f"accepted_values:{col}", "accepted_values",
                col=col, values=tuple(values))


def in_range(col: str, lo, hi, name: str | None = None) -> Rule:
    """Violation = non-null value outside [lo, hi]."""
    return Rule(name or f"in_range:{col}", "in_range", col=col, lo=lo, hi=hi)


def unique(cols, name: str | None = None) -> Rule:
    """Violation count = rows in excess of distinct key tuples
    (count(*) − count(distinct keys)); null-keyed rows count as one
    distinct null like SQL DISTINCT does."""
    cols = tuple(cols)
    return Rule(name or "unique:" + ",".join(cols), "unique", cols=cols)


def references(col: str, ref: DataFrame, ref_col: str,
               name: str | None = None) -> Rule:
    """Violation = non-null value with no match in the reference column
    (foreign-key orphan)."""
    return Rule(name or f"references:{col}", "references",
                col=col, ref=ref, ref_col=ref_col)


def _scalar_flag(r: Rule) -> Column:
    c = F.col(r.col)
    if r.kind == "not_null":
        return c.isNull()
    if r.kind == "accepted_values":
        return c.isNotNull() & ~c.isin(*r.values)
    if r.kind == "in_range":
        return c.isNotNull() & ((c < F.lit(r.lo)) | (c > F.lit(r.hi)))
    raise ValueError(r.kind)


def run_checks(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule; returns (rule, n_violations) — one scan for
    all scalar + uniqueness rules, one anti-join per referential rule."""
    scalar = [r for r in rules if r.kind in
              ("not_null", "accepted_values", "in_range")]
    uniq = [r for r in rules if r.kind == "unique"]
    refs = [r for r in rules if r.kind == "references"]
    spark = df.sparkSession

    parts: list[DataFrame] = []
    aggs = [F.sum(_scalar_flag(r).cast("long")).alias(r.name)
            for r in scalar]
    for r in uniq:
        # count_distinct drops tuples containing any NULL, which would
        # report every null-keyed row as a violation; wrapping the keys
        # in a struct makes the tuple non-null (null FIELDS are fine),
        # so null keys count as one distinct value — SQL DISTINCT
        # semantics, per unique()'s contract.
        aggs.append(
            (F.count(F.lit(1))
             - F.count_distinct(F.struct(*[F.col(c) for c in r.cols])))
            .alias(r.name))
    if aggs:
        one = df.agg(*aggs)
        pairs = F.array(*[
            F.struct(F.lit(r.name).alias("rule"),
                     F.coalesce(F.col(r.name), F.lit(0)).cast("long")
                     .alias("n_violations"))
            for r in scalar + uniq])
        parts.append(
            one.select(F.explode(pairs).alias("z"))
            .select("z.rule", "z.n_violations"))
    for r in refs:
        orphans = (df.select(F.col(r.col).alias("_v")).filter(
            F.col("_v").isNotNull())
            .join(F.broadcast(r.ref.select(
                F.col(r.ref_col).alias("_v")).distinct()), "_v", "left_anti"))
        parts.append(orphans.agg(
            F.count(F.lit(1)).cast("long").alias("n_violations"))
            .select(F.lit(r.name).alias("rule"), "n_violations"))
    if not parts:
        return spark.createDataFrame([], "rule string, n_violations long")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def profile_table(df: DataFrame) -> DataFrame:
    """Deequ-style column profile in ONE scan: per column — data type,
    null count, distinct count, numeric min/max (NULL for non-numeric
    types, so the report schema stays fixed). The aggregate computes
    4·|columns| expressions over a single pass; the result is
    |columns| rows — metadata-sized for any table.

    Pairs with ``run_checks``: profile first to discover ranges and
    null rates, then pin them as rules.
    """
    from pyspark.sql.types import NumericType

    cols = df.schema.fields
    aggs: list[Column] = []
    for f_ in cols:
        c = F.col(f_.name)
        # isinstance, not simpleString() prefixes: "interval day to
        # second".startswith("int") would misclassify interval columns
        # as numeric and min(c).cast("double") raises on them.
        is_num = isinstance(f_.dataType, NumericType)
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"__nn_{f_.name}"))
        aggs.append(F.count_distinct(c).alias(f"__nd_{f_.name}"))
        if is_num:
            aggs.append(F.round(F.min(c).cast("double"), 6)
                        .alias(f"__mn_{f_.name}"))
            aggs.append(F.round(F.max(c).cast("double"), 6)
                        .alias(f"__mx_{f_.name}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"__mn_{f_.name}"))
            aggs.append(F.lit(None).cast("double").alias(f"__mx_{f_.name}"))
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(f_.name).alias("column"),
            F.lit(f_.dataType.simpleString()).alias("dtype"),
            F.coalesce(F.col(f"__nn_{f_.name}"), F.lit(0)).cast("long")
             .alias("n_nulls"),
            F.col(f"__nd_{f_.name}").cast("long").alias("n_distinct"),
            F.col(f"__mn_{f_.name}").alias("min_num"),
            F.col(f"__mx_{f_.name}").alias("max_num"))
        for f_ in cols])
    return one.select(F.explode(rows).alias("z")).select(
        "z.column", "z.dtype", "z.n_nulls", "z.n_distinct",
        "z.min_num", "z.max_num")


def benford_digits(df: DataFrame, value_col: str) -> DataFrame:
    """Benford's-law first-digit audit — the classic fabricated-data /
    corrupted-feed screen: naturally-occurring multiplicative
    quantities (prices, populations, file sizes) put digit d first
    with probability log₁₀(1+1/d); a flat or spiked observed
    distribution flags synthetic or truncated data. This is the
    distribution-level complement of the scalar rules above (one more
    Deequ-style audit, not a per-row flag).

    Scope contract: rows with value ≥ 1 only (first-SIGNIFICANT-digit
    normalization for sub-unit magnitudes needs log-scale shifting —
    float territory; the audit's domain is natural magnitudes).
    NULLs and sub-unit rows are excluded and reported via n_values.

    Determinism: the digit comes from the DECIMAL(18,2) STRING render
    (both engines format decimals identically — never from float
    log10, whose power-of-10 edges are ulp-fragile). Counts are exact;
    the observed share is micro-unit DIV; expected shares snap to 9
    decimals (the ln-snap discipline); the deviation is one float
    subtract under round-6. One aggregation, one 9-row digit spine
    (zeros included — a digit that NEVER appears is the loudest
    signal). Output: (digit INT 1-9, n BIGINT, p_obs_micro BIGINT,
    p_benford DOUBLE, abs_dev DOUBLE round-6).
    """
    digit = F.substring(
        F.col(value_col).cast("decimal(18,2)").cast("string"), 1, 1
    ).cast("int")
    counts = (df.filter(F.col(value_col).isNotNull()
                        & (F.col(value_col) >= 1))
              .select(digit.alias("digit"))
              .groupBy("digit")
              .agg(F.count(F.lit(1)).cast("long").alias("n")))
    spine = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit"))
    tot = counts.agg(F.sum("n").cast("long").alias("_nt"))
    p_ben = F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 9)
    return (spine.join(counts, on="digit", how="left")
            .crossJoin(F.broadcast(tot))
            .select("digit",
                    F.coalesce(F.col("n"), F.lit(0)).cast("long")
                    .alias("n"),
                    F.expr("CAST((COALESCE(n, 0) * 1000000) DIV _nt "
                           "AS LONG)").alias("p_obs_micro"),
                    p_ben.alias("p_benford"))
            .withColumn(
                "abs_dev",
                F.round(F.abs(F.col("p_obs_micro") / F.lit(1e6)
                              - F.col("p_benford")), 6)))


def start_checks_stream(stream: DataFrame, rules: list[Rule], *,
                        out_path: str, checkpoint_path: str,
                        available_now: bool = False):
    """Continuous data-quality monitoring: evaluate the rule set on
    every micro-batch and append (batch_id, rule, n_violations,
    n_rows) to a parquet report topic — the violation-rate time series
    an alerting layer thresholds on. Each batch's report overwrites its
    own ``batch_id=N`` directory, so replays are idempotent (the
    late.py pattern). Scalar/unique rules stay one scan per batch;
    referential rules join the (static) reference side per batch.

    Returns the StreamingQuery.
    """
    import os as _os

    def process(batch_df, batch_id: int) -> None:
        report = run_checks(batch_df, rules)
        n_rows = batch_df.count()
        (report.withColumn("n_rows", F.lit(n_rows).cast("long"))
         .write.mode("overwrite")
         .parquet(_os.path.join(out_path, f"batch_id={batch_id}")))

    writer = (stream.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

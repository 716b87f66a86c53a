"""End-to-end corpus cleanup: the composed training-data pipeline.

A user of the reference system feeding an LLM data pipeline runs these
stages in sequence; this module chains the engine's operators into one
lazy DataFrame plan so THE WHOLE PIPELINE is a single Spark job:

    1. PII redaction            (text.redact_pii — map-only)
    2. quality filters          (length / type-token / stopword /
                                 pattern-density column flags — map-only)
    3. exact dedup              (fuzzy.exact_dedup_docs — fingerprint
                                 shuffle, payloads never move)
    4. near-dup drop (optional) (fuzzy.lsh_candidate_pairs + connected
                                 components → keep cluster canonicals)
    5. split assignment         (md5-bucket train/val/test — map-only)

Because every stage is declarative, Catalyst pipelines the map-only
stages into the SAME scan: redaction, filtering and split assignment
cost one pass over the corpus; the only shuffles are the dedup
fingerprint agg and (if enabled) the LSH band join. At 100 TB that is
the difference between a 5-job pipeline re-reading the corpus five
times and one job reading it once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import fuzzy, text


def quality_flags(docs: DataFrame, *, text_col: str = "text",
                  min_words: int = 30, min_ttr: float = 0.35,
                  min_stopword_ratio: float = 0.01,
                  max_pattern_density: float = 5.0) -> DataFrame:
    """Annotate (not drop): adds ``n_words`` and a boolean ``quality_ok``
    so callers can audit what a threshold change would do before
    committing to it."""
    t = F.col(text_col)
    words = text.word_tokens(t)
    nw = F.size(words)
    ttr = F.when(nw > 0, F.size(F.array_distinct(words)).cast("double") / nw) \
        .otherwise(F.lit(0.0))
    ok = ((nw >= min_words)
          & (ttr >= min_ttr)
          & (text.stopword_ratio(t) >= min_stopword_ratio)
          & (text.pattern_density(t) < max_pattern_density))
    return docs.withColumn("n_words", nw.cast("long")).withColumn("quality_ok", ok)


def split_assignment(id_col: str = "doc_id") -> F.Column:
    """Deterministic md5-bucket split column: <'cd' train (~80%),
    <'e6' val (~10%), else test."""
    b = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    return (F.when(b < "cd", F.lit("train"))
            .when(b < "e6", F.lit("val"))
            .otherwise(F.lit("test")))


def clean_corpus(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    min_words: int = 30, min_ttr: float = 0.35,
    min_stopword_ratio: float = 0.01, max_pattern_density: float = 5.0,
    near_dup: bool = False, near_dup_k: int = 5,
    near_dup_num_hashes: int = 16, near_dup_bands: int = 4,
) -> DataFrame:
    """The composed cleanup. Returns the surviving documents with
    ``text`` redacted, plus ``n_words`` and ``split`` columns.

    ``near_dup=True`` additionally resolves MinHash/LSH candidate pairs
    into clusters and keeps only each cluster's lowest-id canonical —
    the banded equi-join path, never all-pairs.
    """
    redacted = docs.withColumn(text_col, text.redact_pii(F.col(text_col)))
    flagged = quality_flags(
        redacted, text_col=text_col, min_words=min_words, min_ttr=min_ttr,
        min_stopword_ratio=min_stopword_ratio,
        max_pattern_density=max_pattern_density)
    kept = flagged.filter(F.col("quality_ok")).drop("quality_ok")
    deduped = fuzzy.exact_dedup_docs(kept, id_col=id_col, text_col=text_col)

    if near_dup:
        pairs = fuzzy.lsh_candidate_pairs(
            deduped, id_col=id_col, text_col=text_col, k=near_dup_k,
            num_hashes=near_dup_num_hashes, bands=near_dup_bands)
        clusters = fuzzy.connected_components(
            pairs, src_col="doc_a", dst_col="doc_b")
        losers = clusters.filter(F.col("id") != F.col("cluster")) \
            .select(F.col("id").alias(id_col))
        deduped = deduped.join(losers, on=id_col, how="left_anti")

    return deduped.withColumn("split", split_assignment(id_col))


def temperature_weights(counts: dict[str, int], *, alpha: float = 0.5,
                        ndigits: int = 6) -> dict[str, float]:
    """Temperature-scaled source sampling weights: w_s ∝ n_s^alpha,
    normalized — the standard multilingual/multi-source re-balancing
    rule (alpha=1 keeps natural proportions, alpha→0 approaches
    uniform, upweighting small sources). Pure driver-side math over the
    per-source counts (control-plane sized); feed the result into a
    hash-threshold sample like ``dataset_mixing`` to materialize it."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    powered = {s: float(n) ** alpha for s, n in counts.items() if n > 0}
    total = sum(powered.values())
    return {s: round(v / total, ndigits) for s, v in sorted(powered.items())}


def corpus_report(cleaned: DataFrame, *, source_col: str = "source") -> DataFrame:
    """Per (split, source) survivor counts + word totals — the summary a
    dataset card quotes."""
    return (cleaned.groupBy("split", source_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_words").alias("sum_words"))
            .orderBy("split", source_col))

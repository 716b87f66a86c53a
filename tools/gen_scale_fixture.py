"""Generate a deterministic large-scale documents/embeddings fixture.

The driver ships sf0.001/0.01/0.1 parquet; the scaling curve
(SCALING.md) needs a point ~10x beyond sf0.1 for the LLM-pipeline
operators, whose cost is driven by the documents/embeddings tables.
This produces schema-identical tables at sf1-equivalent density:

  documents : 50,000 rows (10x sf0.1) — doc_id, text, lang, source, n_chars
  embeddings: 20,000 rows (10x sf0.1) — vec_id, embedding float[64], label

Everything derives from md5 of the row id (no RNG), so regeneration is
bit-identical anywhere, and generation itself is distributed column
expressions — the generator IS a scale test of the expression path.

Corpus structure mirrors the driver's synthetic tables: a small shared
vocabulary (so shingles/minhash find real near-dups), ~1% exact
duplicate documents and ~1.2% exact clone vectors (so dedup operators
have positives to find).

Usage: python tools/gen_scale_fixture.py [out_dir] [n_docs] [n_vecs]
Default out_dir .fixtures/sf1 (gitignored).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_pulsar_spark.session import get_spark  # noqa: E402

VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "vector", "index", "shard", "page", "cache", "join", "plan",
]
LANGS = ["en", "de", "fr", "es", "zh"]
N_SOURCES = 20


def _h(*cols):
    """md5(concat(...)) -> long in [0, 2^32) — the only entropy source."""
    return F.conv(F.substring(F.md5(F.concat_ws(":", *cols)), 1, 8), 16, 10).cast("long")


def gen_documents(spark, n_docs: int):
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # ~1% exact duplicates: doc 97k+1 copies the text of doc 97k
    seed = F.when((F.col("doc_id") % 97 == 1) & (F.col("doc_id") > 0),
                  F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    n_words = (10 + _h(F.lit("n"), seed) % 51).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            F.array(*[F.lit(w) for w in VOCAB]),
            (_h(F.lit("w"), seed, i) % len(VOCAB) + 1).cast("int")),
    )
    text = F.array_join(words, " ")
    return base.select(
        "doc_id",
        text.alias("text"),
        F.element_at(F.array(*[F.lit(x) for x in LANGS]),
                     (_h(F.lit("l"), F.col("doc_id")) % len(LANGS) + 1).cast("int")
                     ).alias("lang"),
        F.concat(F.lit("src"), (_h(F.lit("s"), F.col("doc_id")) % N_SOURCES)
                 ).alias("source"),
        F.length(text).alias("n_chars"),
    )


def gen_embeddings(spark, n_vecs: int, dim: int = 64):
    base = spark.range(n_vecs).select(F.col("id").alias("vec_id"))
    # ~1.2% exact clone vectors: vec 83k+1 copies vec 83k
    seed = F.when((F.col("vec_id") % 83 == 1) & (F.col("vec_id") > 0),
                  F.col("vec_id") - 1).otherwise(F.col("vec_id"))
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: ((_h(F.lit("e"), seed, j) % 2001 - 1000) / 1000.0).cast("float"),
    )
    return base.select(
        "vec_id",
        emb.alias("embedding"),
        (_h(F.lit("c"), seed) % 8).cast("int").alias("label"),
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".fixtures", "sf1")
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    spark = get_spark("gen-scale-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    gen_documents(spark, n_docs).repartition(8).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet"))
    gen_embeddings(spark, n_vecs).repartition(8).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet"))
    print(f"wrote {n_docs} documents / {n_vecs} embeddings to {out}")


if __name__ == "__main__":
    main()

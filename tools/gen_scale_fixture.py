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


def _wide_vocab(size: int = 4096) -> list[str]:
    """Deterministic letters-only vocabulary (the [a-z]+ tokenizer
    drops digits — a 'w001'-style vocab would silently tokenize to
    one word 'w'). Word k = 4-8 letters from md5(k), collision-deduped
    by extension."""
    import hashlib

    seen: set[str] = set()
    out: list[str] = []
    for k in range(size):
        h = hashlib.md5(f"v{k}".encode()).hexdigest()
        n = 4 + int(h[0], 16) % 5
        w = "".join(chr(ord("a") + int(h[i * 2:i * 2 + 2], 16) % 26)
                    for i in range(n))
        while w in seen:  # rare; extend deterministically
            w += chr(ord("a") + int(h[-2:], 16) % 26)
        seen.add(w)
        out.append(w)
    return out


def gen_documents_wide(spark, n_docs: int, vocab_size: int = 4096):
    """Realistic-diversity corpus for the banded-dedup bench (VERDICT
    r12 #5): the driver fixture's 31-word vocabulary makes EVERY
    shingle hot — band buckets collide ~all docs and LSH degenerates
    to the quadratic pair stream it exists to avoid. This corpus keeps
    the same schema/row shape but draws from a 4096-word vocabulary
    with a low-skew product distribution (two uniform hashes
    multiplied — density peaks at the head like real text), plants
    ~1% EXACT duplicates (doc_id % 97) and ~2.7% NEAR duplicates
    (doc_id % 37 copies its seed with every 7th word substituted), so
    banding has true positives to find while honest negatives
    dominate."""
    vocab = _wide_vocab(vocab_size)
    varr = F.array(*[F.lit(w) for w in vocab])
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    exact_seed = F.when((F.col("doc_id") % 97 == 1) & (F.col("doc_id") > 0),
                        F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    near = (F.col("doc_id") % 37 == 1) & (F.col("doc_id") > 0)
    seed = F.when(near, F.col("doc_id") - 1).otherwise(exact_seed)
    n_words = (40 + _h(F.lit("n"), seed) % 81).cast("int")

    def word_at(i, salt):
        h1 = _h(F.lit("wa"), salt, i) % 65536
        h2 = _h(F.lit("wb"), salt, i) % 65536
        idx = (h1 * h2 * vocab_size / F.lit(65536 * 65536)).cast("int")
        return F.element_at(varr, idx + 1)

    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.when(near & (i % 7 == 3),
                         word_at(i, F.concat(F.lit("mut"),
                                             F.col("doc_id").cast("string"))))
        .otherwise(word_at(i, seed.cast("string"))))
    text = F.array_join(words, " ")
    return base.select(
        "doc_id",
        text.alias("text"),
        F.element_at(F.array(*[F.lit(x) for x in LANGS]),
                     (_h(F.lit("l"), F.col("doc_id")) % len(LANGS) + 1)
                     .cast("int")).alias("lang"),
        F.concat(F.lit("src"),
                 (_h(F.lit("s"), F.col("doc_id")) % N_SOURCES)).alias("source"),
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
    args = [a for a in sys.argv[1:] if a != "--wide"]
    wide = "--wide" in sys.argv[1:]
    out = args[0] if args else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".fixtures", "wide" if wide else "sf1")
    n_docs = int(args[1]) if len(args) > 1 else 50_000
    n_vecs = int(args[2]) if len(args) > 2 else 20_000
    spark = get_spark("gen-scale-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (gen_documents_wide(spark, n_docs) if wide
            else gen_documents(spark, n_docs))
    docs.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet"))
    gen_embeddings(spark, n_vecs).repartition(8).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet"))
    print(f"wrote {n_docs}{' wide-vocab' if wide else ''} documents / "
          f"{n_vecs} embeddings to {out}")


if __name__ == "__main__":
    main()

"""Cross-engine property tests: the oracle-dialect assumptions the
correctness gate rests on, checked against DuckDB with generated inputs.

Every gated query's exactness depends on Spark (Java regex, HALF_UP
casts, md5) and DuckDB (RE2, HALF_EVEN, md5) agreeing on the specific
constructions we use. The fixture corpus is ASCII word-salad, so the
generators stay in printable ASCII — the domain the gate actually
exercises."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row
from pyspark.sql import functions as F

from incubator_pulsar_spark.functions import text

SLOW = settings(max_examples=15, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture,
                                       HealthCheck.too_slow])

ascii_texts = st.lists(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0, max_size=60),
    min_size=1, max_size=10)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    return con


def _duck_map(duck, ts, expr):
    duck.execute("CREATE OR REPLACE TABLE t (i BIGINT, s VARCHAR)")
    duck.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(ts)))
    return dict(duck.execute(f"SELECT i, {expr} FROM t").fetchall())


def _spark_map(spark, ts, col):
    df = spark.createDataFrame([Row(i=i, s=s) for i, s in enumerate(ts)],
                               "i LONG, s STRING")
    return {r.i: r.o for r in df.select("i", col(F.col("s")).alias("o")).collect()}


@given(ts=ascii_texts)
@SLOW
def test_word_tokenizer_counts_agree(spark, duck, ts):
    """len(regexp_extract_all(lower(s), '[a-z]+')) — the tokenizer every
    text query's oracle reuses."""
    got = _spark_map(spark, ts, text.word_count)
    want = _duck_map(duck, ts,
                     "CAST(len(regexp_extract_all(lower(s), '[a-z]+')) AS BIGINT)")
    assert got == want


@given(ts=ascii_texts)
@SLOW
def test_pii_redaction_md5_agrees(spark, duck, ts):
    """md5 of the full redaction chain — the exact construction
    pii_redaction's oracle hashes."""
    got = _spark_map(spark, ts, lambda c: F.md5(text.redact_pii(c)))
    want = _duck_map(duck, ts, r"""
        md5(regexp_replace(regexp_replace(regexp_replace(s,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
              '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IP]', 'g'),
              '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}', '[PHONE]', 'g'))""")
    assert got == want


@given(ids=st.lists(st.integers(0, 10 ** 12), min_size=1, max_size=30))
@SLOW
def test_md5_split_assignment_agrees(spark, duck, ids):
    """The md5-bucket train/val/test rule used by train_split_stats /
    split_leakage / clean_corpus."""
    from incubator_pulsar_spark.functions.corpus import split_assignment

    df = spark.createDataFrame([Row(doc_id=i) for i in ids], "doc_id LONG")
    got = {r.doc_id: r.o for r in
           df.select("doc_id", split_assignment().alias("o")).distinct().collect()}
    duck.execute("CREATE OR REPLACE TABLE ids (doc_id BIGINT)")
    duck.executemany("INSERT INTO ids VALUES (?)", [(i,) for i in ids])
    want = dict(duck.execute("""
        SELECT DISTINCT doc_id,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                    ELSE 'test' END
        FROM ids""").fetchall())
    assert got == want


@given(ts=ascii_texts)
@SLOW
def test_word_shingles_agree_with_list_slice(spark, duck, ts):
    """Distinct 3-gram shingles: Spark sequence+slice+array_join vs
    DuckDB range+list_slice+array_to_string — the construction behind
    contamination_check / split_leakage / repetition_stats oracles."""
    df = spark.createDataFrame([Row(i=i, s=s) for i, s in enumerate(ts)],
                               "i LONG, s STRING")
    words = df.select("i", text.word_tokens(F.col("s")).alias("_w"))
    got = {r.i: sorted(r.o) for r in words.select(
        "i", text.word_shingles(F.col("_w"), 3).alias("o")).collect()}
    duck.execute("CREATE OR REPLACE TABLE t (i BIGINT, s VARCHAR)")
    duck.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(ts)))
    want = {i: sorted(v) for i, v in duck.execute("""
        WITH w AS (SELECT i, regexp_extract_all(lower(s), '[a-z]+') AS words FROM t),
        pos AS (SELECT i, words, unnest(range(1, greatest(len(words) - 2, 1) + 1)) AS p FROM w),
        sh AS (SELECT DISTINCT i,
                      COALESCE(array_to_string(list_slice(words, p, p + 2), ' '), '') AS g
               FROM pos)
        SELECT i, list(g) FROM sh GROUP BY i""").fetchall()}
    assert got == want


@given(vals=st.lists(
    st.decimals(min_value="-99999.99", max_value="99999.99", places=2),
    min_size=1, max_size=40))
@SLOW
def test_decimal_sum_cast_double_agrees(spark, duck, vals):
    """SUM over DECIMAL(18,4)-cast doubles, then CAST AS DOUBLE — the
    exact-aggregation recipe every revenue oracle uses (order-independent
    and engine-independent by construction)."""
    fvals = [float(v) for v in vals]
    df = spark.createDataFrame([Row(v=v) for v in fvals], "v DOUBLE")
    got = df.agg(F.sum(F.col("v").cast("decimal(18,4)"))
                 .cast("double").alias("o")).collect()[0].o
    duck.execute("CREATE OR REPLACE TABLE d (v DOUBLE)")
    duck.executemany("INSERT INTO d VALUES (?)", [(v,) for v in fvals])
    want = duck.execute(
        "SELECT CAST(SUM(CAST(v AS DECIMAL(18,4))) AS DOUBLE) FROM d").fetchone()[0]
    assert repr(got) == repr(want)

"""Unit tests for the as-of join operator and the round-3 text-pipeline
functions (PII redaction, shingles, repetition signals)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from incubator_pulsar_spark.functions import text
from incubator_pulsar_spark.operators.asof import asof_join


def _collect_map(df, key, *cols):
    return {r[key]: tuple(r[c] for c in cols) for r in df.collect()}


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [Row(id=1, k="a", ts=10), Row(id=2, k="a", ts=25),
             Row(id=3, k="b", ts=5), Row(id=4, k="b", ts=40)])
        right = spark.createDataFrame(
            [Row(k="a", ts=10, v="a@10"), Row(k="a", ts=20, v="a@20"),
             Row(k="b", ts=30, v="b@30")])
        return left, right

    def test_latest_at_or_before_per_key(self, spark):
        left, right = self._frames(spark)
        out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts")
        got = _collect_map(out, "id", "v", "ts_right")
        # id=1: right row at exactly ts=10 is visible (inclusive tie)
        assert got[1] == ("a@10", 10)
        assert got[2] == ("a@20", 20)
        # id=3: no right row at or before ts=5 → NULL match under how='left'
        assert got[3] == (None, None)
        assert got[4] == ("b@30", 30)

    def test_inner_drops_unmatched(self, spark):
        left, right = self._frames(spark)
        out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts", how="inner")
        assert sorted(r.id for r in out.collect()) == [1, 2, 4]

    def test_left_keeps_all_left_columns_and_rows(self, spark):
        left, right = self._frames(spark)
        out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts")
        assert set(out.columns) == {"id", "k", "ts", "ts_right", "v"}
        assert out.count() == left.count()

    def test_tie_col_resolves_duplicate_right_ts(self, spark):
        left = spark.createDataFrame([Row(id=1, k="a", ts=15)])
        right = spark.createDataFrame(
            [Row(k="a", ts=10, seq=1, v="first"), Row(k="a", ts=10, seq=2, v="second")])
        out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts", tie_col="seq")
        assert out.collect()[0].v == "second"

    def test_suffix_on_collision(self, spark):
        left = spark.createDataFrame([Row(id=1, k="a", ts=15, v="left-v")])
        right = spark.createDataFrame([Row(k="a", ts=10, v="right-v")])
        out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts", suffix="_r")
        row = out.collect()[0]
        assert row.v == "left-v" and row.v_r == "right-v" and row.ts_r == 10

    def test_bad_how_rejected(self, spark):
        left, right = self._frames(spark)
        with pytest.raises(ValueError):
            asof_join(left, right, on="k", left_ts="ts", right_ts="ts", how="full")

    def test_salted_hot_key_identical_output_multiple_tasks(self, spark):
        """salt_interval splits ONE hot key across time buckets: output
        is bit-identical to the unsalted path (including cross-bucket
        carries and empty-bucket left rows), and the window exchange
        partitions on (key, bucket) so the hot key runs as many tasks,
        not one sorted partition."""
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        # one hot key: 600 left events over 10 hours; right quotes every
        # 23 min — several buckets have no right row at all, so their
        # left rows depend on the carried boundary seed
        left = spark.createDataFrame(
            [Row(id=i, k="hot", ts=t0 + dt.timedelta(minutes=i))
             for i in range(600)]
            + [Row(id=10_000, k="cold", ts=t0 + dt.timedelta(minutes=90))])
        right = spark.createDataFrame(
            [Row(k="hot", ts=t0 + dt.timedelta(minutes=m), v=f"q@{m}")
             for m in range(2, 600, 23)]
            + [Row(k="cold", ts=t0 + dt.timedelta(minutes=1), v="cold-q")])

        base = asof_join(left, right, on="k", left_ts="ts", right_ts="ts")
        salted = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                           salt_interval="1 hour")
        key = lambda r: (r["id"], r["v"], r["ts_right"])
        assert sorted(map(key, salted.collect())) == sorted(map(key, base.collect()))

        # the big window's exchange hashes on (key, bucket)
        salted.count()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = salted._jdf.queryExecution().explainString(mode)
        assert "__asof_bucket" in plan
        import re
        parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
        assert any("k#" in p and "__asof_bucket" in p for p in parts), parts


class TestPiiRedaction:
    def _one(self, spark, s, col):
        return spark.createDataFrame([Row(t=s)]).select(col(F.col("t")).alias("o")).collect()[0].o

    def test_redacts_all_three_classes_in_order(self, spark):
        s = "mail bob@x.io from 10.0.0.1 call 555-123-4567 done"
        assert self._one(spark, s, text.redact_pii) == \
            "mail [EMAIL] from [IP] call [PHONE] done"

    def test_counts(self, spark):
        s = "a@b.co c@d.org 1.2.3.4 999-000-1234"
        assert self._one(spark, s, text.email_count) == 2
        assert self._one(spark, s, text.ipv4_count) == 1
        assert self._one(spark, s, text.phone_count) == 1

    def test_clean_text_untouched(self, spark):
        s = "no pii here just words"
        assert self._one(spark, s, text.redact_pii) == s


class TestWordShingles:
    def _shingles(self, spark, words, n, **kw):
        df = spark.createDataFrame([Row(w=words)])
        return df.select(text.word_shingles(F.col("w"), n, **kw).alias("s")).collect()[0].s

    def test_distinct_by_default(self, spark):
        assert self._shingles(spark, ["a", "b", "a", "b"], 2) == ["a b", "b a"]

    def test_multiplicity_kept_when_requested(self, spark):
        assert self._shingles(spark, ["a", "b", "a", "b"], 2, distinct=False) == \
            ["a b", "b a", "a b"]

    def test_short_doc_yields_whole_doc(self, spark):
        assert self._shingles(spark, ["only"], 3) == ["only"]

    def test_type_token_ratio(self, spark):
        df = spark.createDataFrame([Row(t="a a b b"), Row(t="")])
        got = [r.o for r in df.select(text.type_token_ratio(F.col("t")).alias("o")).collect()]
        assert got == [0.5, 1.0]


class TestAsofNulls:
    def test_null_ts_right_rows_never_match(self, spark):
        left = spark.createDataFrame([Row(id=1, k="a", ts=10)],
                                     "id LONG, k STRING, ts LONG")
        right = spark.createDataFrame(
            [Row(k="a", ts=None, v="ghost"), Row(k="a", ts=5, v="real")],
            "k STRING, ts LONG, v STRING")
        out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts")
        assert out.collect()[0].v == "real"

    def test_null_ts_left_rows_match_nothing(self, spark):
        left = spark.createDataFrame([Row(id=1, k="a", ts=None)],
                                     "id LONG, k STRING, ts LONG")
        right = spark.createDataFrame([Row(k="a", ts=5, v="x")],
                                      "k STRING, ts LONG, v STRING")
        out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts")
        row = out.collect()[0]
        assert row.v is None and row.ts_right is None


class TestCleanCorpus:
    def _docs(self, spark):
        base = ("the data " * 40).strip()          # 80 words, passes filters
        rows = [
            Row(doc_id=1, text=base + " alpha", source="s1"),
            Row(doc_id=2, text=base + " alpha", source="s1"),   # exact dup of 1
            Row(doc_id=3, text="short text", source="s1"),      # fails min_words
            Row(doc_id=4, text=base + " beta mail bob@x.io", source="s2"),
            Row(doc_id=5, text=("word " * 60).strip(), source="s2"),  # TTR too low
        ]
        return spark.createDataFrame(rows)

    def test_pipeline_filters_dedups_redacts_splits(self, spark):
        from incubator_pulsar_spark.functions.corpus import clean_corpus

        out = clean_corpus(self._docs(spark), min_ttr=0.02,
                           min_stopword_ratio=0.01)
        rows = {r.doc_id: r for r in out.collect()}
        # doc 2 is an exact dup of 1 (lowest id wins); 3 too short;
        # 5 has no stopwords ('word' only) → fails stopword ratio
        assert set(rows) == {1, 4}
        assert "[EMAIL]" in rows[4].text and "bob@x.io" not in rows[4].text
        assert rows[1].split in ("train", "val", "test")
        assert rows[1].n_words == 81

    def test_near_dup_stage_drops_cluster_members(self, spark):
        from incubator_pulsar_spark.functions.corpus import clean_corpus

        # high-entropy shared base (distinct words → many distinct
        # shingles) so the near-dup pair's char Jaccard is ~1
        uniq = [chr(97 + i // 26) + chr(97 + i % 26) + "q" for i in range(60)]
        base = " ".join(w if i % 5 else "the" for i, w in enumerate(uniq))
        docs = spark.createDataFrame([
            Row(doc_id=1, text=base + " tailone", source="s"),
            Row(doc_id=2, text=base + " tailtwo", source="s"),  # near-dup of 1
            Row(doc_id=9, text=("the row value " * 30).strip() + " unrelated",
                source="s"),
        ])
        out = clean_corpus(docs, min_ttr=0.02, near_dup=True)
        ids = sorted(r.doc_id for r in out.collect())
        assert ids == [1, 9]  # 2 collapsed into 1's cluster; 9 untouched

    def test_report_shape(self, spark):
        from incubator_pulsar_spark.functions.corpus import (clean_corpus,
                                                             corpus_report)

        rep = corpus_report(clean_corpus(self._docs(spark), min_ttr=0.02))
        assert rep.columns == ["split", "source", "n_docs", "sum_words"]
        assert sum(r.n_docs for r in rep.collect()) == 2


class TestTemperatureWeights:
    def test_natural_and_uniform_limits(self):
        import pytest

        from incubator_pulsar_spark.functions.corpus import temperature_weights

        counts = {"big": 900, "small": 100}
        natural = temperature_weights(counts, alpha=1.0)
        assert natural == {"big": 0.9, "small": 0.1}
        uniform = temperature_weights(counts, alpha=0.0)
        assert uniform == {"big": 0.5, "small": 0.5}
        # 0 < alpha < 1 upweights the small source vs natural
        mid = temperature_weights(counts, alpha=0.5)
        assert 0.1 < mid["small"] < 0.5
        assert abs(sum(mid.values()) - 1.0) < 1e-6
        with pytest.raises(ValueError):
            temperature_weights(counts, alpha=-1)

    def test_zero_count_sources_dropped(self):
        from incubator_pulsar_spark.functions.corpus import temperature_weights

        assert temperature_weights({"a": 10, "b": 0}, alpha=1.0) == {"a": 1.0}

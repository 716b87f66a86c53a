"""Physical-plan regression tests: lock in the plan properties the scale
design depends on (SCALE.md). A semantic refactor that silently converts
a broadcast join to sort-merge, loses parquet filter pushdown, or drops
Python into a JVM-only path fails HERE, not in a later bench round.

Plans are audited AFTER execution so AQE's final decisions are what is
asserted (the same approach as tools/explain_audit.py).
"""

from __future__ import annotations

import re

import pytest

from incubator_pulsar_spark.plans.queries import ALL_QUERIES

from conftest import SF_DIR


def executed_plan(spark, name: str) -> str:
    df = ALL_QUERIES[name].build(spark, SF_DIR)
    df.count()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


JOIN_TPCH = [
    "q3_shipping_priority", "q5_region_revenue", "q7_nation_volume",
    "q8_market_share", "q10_returned_items", "q18_large_orders",
]
JVM_ONLY_TPCH = ["q1_pricing_summary", *JOIN_TPCH]


class TestPlanQuality:
    @pytest.mark.parametrize("name", JOIN_TPCH)
    def test_tpch_joins_broadcast_not_sortmerge(self, spark, name):
        plan = executed_plan(spark, name)
        assert "SortMergeJoin" not in plan, f"{name}: dim join regressed to SMJ"
        assert "BroadcastHashJoin" in plan, f"{name}: expected broadcast joins"

    @pytest.mark.parametrize("name", JVM_ONLY_TPCH)
    def test_tpch_stays_jvm_side(self, spark, name):
        plan = executed_plan(spark, name)
        assert not re.search(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
                             plan), f"{name}: Python stage in a JVM-only path"

    def test_filter_pushdown_reaches_scan(self, spark):
        plan = executed_plan(spark, "q6_forecast_revenue")
        pushed = [p for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if p]
        assert pushed, "q6 predicates must reach the parquet scan"

    def test_column_pruning(self, spark):
        plan = executed_plan(spark, "q6_forecast_revenue")
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m, "no ReadSchema in plan"
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert "l_comment" not in cols and len(cols) <= 5, (
            f"q6 should scan only its needed columns, got {sorted(cols)}")

    def test_topk_no_global_sort(self, spark):
        plan = executed_plan(spark, "topk_orders")
        assert "TakeOrderedAndProject" in plan, (
            "top-k must use TakeOrderedAndProject, not a global sort")

    def test_compaction_partial_agg(self, spark):
        """max_by compaction must keep partial aggregation (map-side
        combine) — the two-phase compactor's memory bound."""
        plan = executed_plan(spark, "compaction_publish_order")
        n_agg = plan.count("HashAggregate") + plan.count("SortAggregate")
        assert n_agg >= 2, "compaction lost its partial (map-side) aggregation"

    # ---- locks for the r1-round additions (LLM-pipeline + consumer ops)

    def test_minhash_lsh_no_cartesian(self, spark):
        """LSH banding must stay a bucketed equi-join — an accidental
        all-pairs would be a CartesianProduct / BroadcastNestedLoop."""
        plan = executed_plan(spark, "minhash_lsh_pairs")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_minhash_lsh_reuses_banded_side(self, spark):
        """The banded signature table feeds BOTH join sides; the plan must
        reuse it (InMemoryTableScan via persist, or ReusedExchange) rather
        than recompute the shingle pipeline twice."""
        plan = executed_plan(spark, "minhash_lsh_pairs")
        assert ("InMemoryTableScan" in plan) or ("ReusedExchange" in plan), (
            "banded table recomputed on both join sides")

    def test_winnow_single_generate(self, spark):
        """Winnowing must explode shingles ONCE (the documented 38×
        re-evaluation trap: CSE does not cross Generate/Project)."""
        plan = executed_plan(spark, "winnow_fingerprints_docs")
        assert plan.count("Generate") <= 2, (
            "winnow plan grew extra Generate barriers (re-evaluation trap)")

    def test_exact_dedup_shuffles_hashes_not_payloads(self, spark):
        """Exact dedup's shuffle must carry (md5, id) only — ReadSchema
        may include text (hash input) but the exchange must not."""
        plan = executed_plan(spark, "exact_dedup")
        assert "Exchange" in plan
        ex = plan[plan.index("Exchange"):]
        assert "text#" not in ex.split("\n")[0], "payload column in the shuffle key"

    def test_embedding_topk_broadcasts_queries(self, spark):
        """Exact top-k must broadcast the small query side; the embedding
        side must not shuffle its vectors before scoring."""
        plan = executed_plan(spark, "embedding_topk")
        assert "BroadcastExchange" in plan
        assert "SortMergeJoin" not in plan

    def test_embedding_neardup_blocked_is_bucketed(self, spark):
        """The gated 100 TB near-dup path: same-bucket equi-join, never
        CartesianProduct, and no driver collect (plan is pure Spark ops +
        Arrow stages)."""
        plan = executed_plan(spark, "embedding_neardup_blocked")
        assert "CartesianProduct" not in plan
        assert "ArrowEvalPython" in plan or "MapInPandas" in plan

    def test_stratified_sample_map_only(self, spark):
        """Deterministic sampling must stay a pure scan+filter: zero
        exchanges, zero Python stages."""
        plan = executed_plan(spark, "stratified_sample_docs")
        assert "Exchange" not in plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_neardup_auto_never_plans_quadratic_above_cutoff(self, spark):
        """strategy='auto' above gram_max_rows must route to the
        LSH-blocked equi-join — the automatic path may NEVER pick the
        O(N²) non-equi pair join that plans as a nested loop. Locked on
        a >100k-row input (plan-only; the UDF never executes)."""
        from pyspark.sql import functions as F

        from incubator_pulsar_spark.functions.similarity import cosine_neardup_pairs

        big = spark.range(200_000).select(
            F.col("id").alias("vec_id"),
            F.array(*[(F.col("id") % (i + 7)).cast("float") for i in range(8)])
            .alias("embedding"))
        out = cosine_neardup_pairs(big, threshold=0.9)
        plan = out._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # the blocked path is an equi-join on the bucket column
        assert "_bkt" in plan

    @pytest.mark.parametrize("name", [
        "simhash_docs", "text_stats", "language_id", "media_frame_schedule",
    ])
    def test_text_ops_stay_jvm_side(self, spark, name):
        """Column-expression text ops must not regress into Python."""
        plan = executed_plan(spark, name)
        assert not re.search(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
                             plan), f"{name}: Python stage appeared"

    def test_bucketed_topic_join_no_shuffle(self, spark, tmp_path):
        """Two topics bucketed by key with the same spec must key-join
        with ZERO Exchange (the pre-paid-shuffle storage layout for
        compaction/TableView/key-joins at 100 TB)."""
        from incubator_pulsar_spark import envelope as env
        from pyspark.sql import functions as F

        a = spark.createDataFrame(
            [(f"k{i % 50}", i, float(i)) for i in range(500)],
            "key string, sequence long, v double")
        b = spark.createDataFrame(
            [(f"k{i % 50}", i, i * 2.0) for i in range(300)],
            "key string, sequence long, w double")
        env.write_topic_bucketed(a, "bkt_topic_a", num_buckets=8)
        env.write_topic_bucketed(b, "bkt_topic_b", num_buckets=8)
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            j = (env.read_topic_table(spark, "bkt_topic_a").groupBy("key")
                 .agg(F.sum("v").alias("sv"))
                 .join(env.read_topic_table(spark, "bkt_topic_b")
                       .groupBy("key").agg(F.sum("w").alias("sw")), on="key"))
            assert j.count() == 50
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, (
                "bucketed key-join/agg should be shuffle-free")
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.sql("DROP TABLE IF EXISTS bkt_topic_a")
            spark.sql("DROP TABLE IF EXISTS bkt_topic_b")

    def test_pane_deltas_single_shuffle(self, spark):
        """Pane lifecycle must stay one explode over one keyed shuffle —
        a member/expired union would rescan and reshuffle the input."""
        plan = executed_plan(spark, "pane_deltas_user")
        assert plan.count("Exchange hashpartitioning") <= 1, (
            "pane_deltas regressed to multi-branch shuffles")
        assert "Union" not in plan

    @pytest.mark.parametrize("name", ["batch_receive_cap", "salted_hot_key_agg"])
    def test_consumer_ops_partial_agg_or_window(self, spark, name):
        plan = executed_plan(spark, name)
        assert "Exchange" in plan  # sanity: these do shuffle, once
        assert plan.count("Exchange hashpartitioning") <= 2, (
            f"{name}: extra shuffles appeared")

    # ---- locks for the r3 additions (training-data pipeline + as-of)

    def test_asof_single_shuffle_no_range_join(self, spark):
        """The as-of join must stay union + ONE keyed window shuffle —
        never a range-condition join (BroadcastNestedLoop/Cartesian) and
        never one shuffle per side."""
        plan = executed_plan(spark, "asof_join_events")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "SortMergeJoin" not in plan
        assert plan.count("Exchange hashpartitioning") <= 1, (
            "as-of join grew extra shuffles")

    def test_contamination_broadcasts_probes(self, spark):
        """Corpus shingles must equi-join a BROADCAST probe set (map-side
        until the tiny hit set) — a shuffled or nested-loop join would
        move the corpus."""
        plan = executed_plan(spark, "contamination_check")
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    @pytest.mark.parametrize("name", [
        "pii_redaction", "train_split_stats", "dataset_mixing",
    ])
    def test_r3_scrub_ops_stay_jvm_side(self, spark, name):
        """Redaction / split / mixing are pure column exprs — a Python
        stage here would put a 10-100× tax on the corpus scan."""
        plan = executed_plan(spark, name)
        assert not re.search(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
                             plan), f"{name}: Python stage appeared"

    def test_split_leakage_equi_join_only(self, spark):
        """Cross-split gram join must stay an equi-join on the gram —
        never a nested-loop/cartesian — with bounded shuffles."""
        plan = executed_plan(spark, "split_leakage")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert plan.count("Exchange hashpartitioning") <= 4

    @pytest.mark.parametrize("name", ["corpus_filter_funnel", "topic_stats"])
    def test_r3_composites_stay_jvm_side(self, spark, name):
        plan = executed_plan(spark, name)
        assert not re.search(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
                             plan), f"{name}: Python stage appeared"

    @pytest.mark.parametrize("name", ["media_ppm_decode", "media_wav_decode"])
    def test_media_decode_arrow_only(self, spark, name):
        """Real decode kernels run as Arrow stages over a map-side
        payload build — no join, no agg shuffle (only the output sort)."""
        plan = executed_plan(spark, name)
        assert re.search(r"ArrowEvalPython|MapInPandas", plan), \
            f"{name}: expected an Arrow kernel stage"
        assert "Join" not in plan
        assert plan.count("Exchange hashpartitioning") == 0, \
            f"{name}: unexpected keyed shuffle"

    def test_repetition_bounded_shuffles(self, spark):
        """Repetition stats: bigram agg + top-1 window + join back, all
        keyed by doc_id — more exchanges means a lost partial agg or a
        re-shuffle of the same keying."""
        plan = executed_plan(spark, "repetition_stats")
        assert plan.count("Exchange hashpartitioning") <= 4, (
            "repetition_stats grew extra shuffles")
        assert "CartesianProduct" not in plan

    # --- round-4b plan locks ---

    def test_heavy_hitters_candidates_broadcast(self, spark):
        """Two-pass MG: the candidate pass is the ONLY Python stage, and
        the recount joins candidates via broadcast — the fact side never
        shuffles its full key domain."""
        plan = executed_plan(spark, "heavy_hitter_words")
        assert "MapInPandas" in plan, "MG candidate stage missing"
        assert "BroadcastHashJoin" in plan, "candidate join must broadcast"
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_bloom_semijoin_jvm_and_broadcast(self, spark):
        """Bloom bitmap check is pure column exprs at scan speed; the
        exactness join broadcasts the key set. No Python anywhere."""
        plan = executed_plan(spark, "bloom_semijoin_orders")
        assert not re.search(r"ArrowEvalPython|MapInPandas", plan)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_levenshtein_blocked_equi_join_only(self, spark):
        """Blocked linkage must plan the block key as an equi-join —
        a cartesian/BNLJ here is the O(N²) failure mode."""
        plan = executed_plan(spark, "levenshtein_neardup_docs")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert not re.search(r"ArrowEvalPython|MapInPandas", plan)

    def test_gapfill_jvm_with_single_locf_window(self, spark):
        """Gap-fill: generated grid + keyed agg + ONE window for LOCF,
        everything JVM-side."""
        plan = executed_plan(spark, "gapfill_events")
        assert not re.search(r"ArrowEvalPython|MapInPandas", plan)
        assert plan.count("Window") <= 2, "extra window stages appeared"
        assert "CartesianProduct" not in plan

    def test_quantiles_single_keyed_shuffle(self, spark):
        """Exact quantiles: window + agg share the group partitioning —
        one keyed exchange, all JVM."""
        plan = executed_plan(spark, "value_quantiles_events")
        assert not re.search(r"ArrowEvalPython|MapInPandas", plan)
        assert plan.count("Exchange hashpartitioning") <= 2
        assert "CartesianProduct" not in plan

    def test_topic_digest_single_agg_shuffle(self, spark):
        """Digest is one map-side partial agg + one keyed exchange —
        the two-scans-and-a-tiny-join anti-entropy shape."""
        plan = executed_plan(spark, "topic_digest_events")
        assert not re.search(r"ArrowEvalPython|MapInPandas", plan)
        assert plan.count("Exchange hashpartitioning") <= 1
        assert "Join" not in plan

    def test_funnel_single_keyed_shuffle(self, spark):
        """Funnel stages are nested window-mins over ONE user
        partitioning + a same-key agg: one exchange, no self-joins."""
        plan = executed_plan(spark, "funnel_conversion_events")
        assert not re.search(r"ArrowEvalPython|MapInPandas", plan)
        assert plan.count("Exchange hashpartitioning") <= 1
        assert "Join" not in plan

    @pytest.mark.parametrize("name", ["html_strip_docs"])
    def test_html_strip_map_only(self, spark, name):
        """HTML cleanup is a pure regexp chain: zero shuffles, zero
        Python, scan-speed."""
        plan = executed_plan(spark, name)
        assert not re.search(r"ArrowEvalPython|MapInPandas", plan)
        assert plan.count("Exchange hashpartitioning") == 0
        assert "Join" not in plan

    def test_bpe_pairs_vocab_sized_work(self, spark):
        """BPE pair counting: corpus scan → vocab agg → pair agg →
        top-k window; all JVM, no joins."""
        plan = executed_plan(spark, "bpe_pair_counts_docs")
        assert not re.search(r"ArrowEvalPython|MapInPandas", plan)
        assert "Join" not in plan
        assert plan.count("Exchange hashpartitioning") <= 2

    def test_label_centroids_broadcast_vectors_never_shuffle(self, spark):
        """Centroid table (|labels|·dim rows) broadcasts back to the
        vectors; the vectors themselves never move through an exchange
        keyed on them — only posexploded (label, dim) cells do."""
        plan = executed_plan(spark, "label_centroid_stats")
        assert not re.search(r"ArrowEvalPython|MapInPandas", plan)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_bigram_lm_stays_jvm_side(self, spark):
        """Bigram LM: explode + model joins + keyed agg — no Python, no
        cartesian (the vocab scalar rides a 1-row broadcast BNLJ, which
        is fine; a CartesianProduct is not)."""
        plan = executed_plan(spark, "bigram_lm_docs")
        assert not re.search(r"ArrowEvalPython|MapInPandas", plan)
        assert "CartesianProduct" not in plan


class TestRound4cPlans:
    def test_range_rolling_single_keyed_window_shuffle(self, spark):
        """Time-RANGE rolling frame: one exchange keyed on user_id, then
        a single window sort pass — no self-join, no Python."""
        plan = executed_plan(spark, "range_rolling_user_value")
        assert not re.search(r"ArrowEvalPython|MapInPandas", plan)
        assert len(re.findall(r"hashpartitioning\(user_id", plan)) == 1
        assert "Join" not in plan

    def test_interval_join_is_equi_not_nested_loop(self, spark):
        """The whole point of operators/interval.py: the containment
        join runs as a hash equi-join on the time-bucket index, never
        the BroadcastNestedLoopJoin Catalyst plans for a raw
        ts-BETWEEN-start-AND-end condition."""
        plan = executed_plan(spark, "interval_join_events")
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan
        assert "BroadcastHashJoin" in plan

    def test_chunk_docs_map_only(self, spark):
        """Chunking is one Generate over the word array: no KEYED
        shuffle, no Python stage. The single allowed Exchange is
        ensure_parallelism's round-robin spread of the one-file scan
        (ships narrow (doc_id, text) rows, disappears on a real
        multi-split input)."""
        plan = executed_plan(spark, "chunk_docs")
        assert not re.search(r"ArrowEvalPython|MapInPandas", plan)
        assert "hashpartitioning" not in plan
        # formatted mode prints each node once in the tree and once as a
        # "(n) Generate" detail header — count the headers
        assert len(re.findall(r"\(\d+\) Generate", plan)) == 1

"""Round-4c operator tests: interval join, RANGE rolling frame."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from incubator_pulsar_spark.operators.interval import interval_join


def _ts(h, m=0, s=0, us=0):
    return dt.datetime(2001, 3, 5, h, m, s, us)


@pytest.fixture(scope="module")
def fixture(spark):
    points = spark.createDataFrame(
        [(i, _ts(h, m, s)) for i, (h, m, s) in enumerate([
            (0, 0, 0), (0, 59, 59), (1, 0, 0), (2, 30, 0),
            (5, 0, 0), (8, 15, 0), (23, 59, 59),
        ])],
        "pid long, ts timestamp_ntz")
    intervals = spark.createDataFrame(
        [
            (100, _ts(0, 0, 0), _ts(0, 59, 59)),    # exact closed bounds
            (101, _ts(0, 30), _ts(2, 30)),          # spans 3 buckets
            (102, _ts(2, 30), _ts(2, 30)),          # zero-length
            (103, _ts(3, 0), _ts(4, 0)),            # matches nothing
            (104, _ts(0, 0), _ts(23, 59, 59)),      # covers everything
        ],
        "iid long, start_ts timestamp_ntz, end_ts timestamp_ntz")
    return points, intervals


class TestIntervalJoin:
    def test_matches_naive_inequality_join(self, spark, fixture):
        points, intervals = fixture
        got = sorted(
            (r["iid"], r["pid"])
            for r in interval_join(points, intervals).collect())
        naive = sorted(
            (r["iid"], r["pid"])
            for r in points.join(
                intervals,
                (points["ts"] >= intervals["start_ts"])
                & (points["ts"] <= intervals["end_ts"])).collect())
        assert got == naive and len(got) > 0

    def test_no_duplicate_pairs_when_interval_spans_buckets(self, spark, fixture):
        """An interval exploded to N buckets must still emit each
        qualifying (point, interval) pair once — the point's single
        bucket intersects the interval's bucket list exactly once."""
        points, intervals = fixture
        rows = interval_join(points, intervals, bucket_seconds=60).collect()
        pairs = [(r["iid"], r["pid"]) for r in rows]
        assert len(pairs) == len(set(pairs))

    @pytest.mark.parametrize("bucket", [7, 61, 3600, 86_400 * 7])
    def test_bucket_width_never_changes_semantics(self, spark, fixture, bucket):
        points, intervals = fixture
        base = sorted((r["iid"], r["pid"])
                      for r in interval_join(points, intervals).collect())
        got = sorted((r["iid"], r["pid"])
                     for r in interval_join(points, intervals,
                                            bucket_seconds=bucket).collect())
        assert got == base

    def test_closed_bounds(self, spark, fixture):
        points, intervals = fixture
        rows = interval_join(points, intervals).collect()
        got = {(r["iid"], r["pid"]) for r in rows}
        assert (100, 0) in got and (100, 1) in got   # both endpoints in
        assert (102, 3) in got                        # zero-length == point
        assert all(iid != 103 for iid, _ in got)

    def test_rejects_bad_bucket(self, spark, fixture):
        points, intervals = fixture
        with pytest.raises(ValueError):
            interval_join(points, intervals, bucket_seconds=0)


class TestDupSpans:
    """dup_spans vs a brute-force pure-Python model on planted overlaps."""

    DOCS = [
        # 0 and 1 share the exact 8-word run "the quick brown fox jumps
        # over the lazy" => 4 matching 5-grams in one diagonal run
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "yesterday the quick brown fox jumps over the lazy cat"),
        # 2 shares two separate 5-gram runs with 3
        (2, "alpha beta gamma delta epsilon zeta unrelated filler words "
            "here omega psi chi phi upsilon tau"),
        (3, "alpha beta gamma delta epsilon eta something else entirely "
            "now omega psi chi phi upsilon sigma"),
        # 4 shares nothing
        (4, "completely disjoint vocabulary only appearing once"),
        # 5/6: repeated gram INSIDE a doc (multiplicity) still works
        (5, "repeat me repeat me repeat me repeat me now"),
        (6, "others also repeat me repeat me sometimes"),
    ]

    @staticmethod
    def _model(docs, k=5):
        import re as _re

        toks = {i: _re.findall(r"[a-z]+", t.lower()) for i, t in docs}
        grams = {
            i: [tuple(w[p:p + k]) for p in range(max(len(w) - k + 1, 1))]
            for i, w in toks.items()
        }
        out = {}
        ids = sorted(grams)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                matches = [(pa, pb) for pa, ga in enumerate(grams[a])
                           for pb, gb in enumerate(grams[b]) if ga == gb]
                if not matches:
                    continue
                diags = {}
                for pa, pb in matches:
                    diags.setdefault(pa - pb, []).append(pa)
                longest = 0
                for ps in diags.values():
                    ps.sort()
                    run = 1
                    for x, y in zip(ps, ps[1:]):
                        run = run + 1 if y == x + 1 else 1
                        longest = max(longest, run)
                    longest = max(longest, run if len(ps) > 1 else 1)
                out[(a, b)] = (len(matches), longest + k - 1)
        return out

    def test_matches_bruteforce_model(self, spark):
        from incubator_pulsar_spark.functions.text import dup_spans

        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        got = {(r["doc_a"], r["doc_b"]): (r["shared_grams"],
                                          r["longest_span_tokens"])
               for r in dup_spans(df, k=5).collect()}
        assert got == self._model(self.DOCS, k=5)
        assert got[(0, 1)] == (4, 8)  # the planted 8-token span


class TestSemanticDedup:
    def test_planted_duplicates_pruned_within_cells(self, spark):
        """Near-identical vectors (cos ≈ 1) must land in the same cell
        and all but the lowest id must drop, pointing dup_of at it;
        orthogonal vectors all survive."""
        import numpy as np

        from incubator_pulsar_spark.functions.similarity import semantic_dedup

        rng_free = []
        base = np.eye(8)  # 8 mutually orthogonal directions
        vid = 0
        for d in range(8):
            for rep in range(3):          # 3 near-copies per direction
                v = base[d] + 1e-4 * rep  # tiny perturbation, cos ≈ 1
                rng_free.append((vid, [float(x) for x in v]))
                vid += 1
        df = spark.createDataFrame(rng_free, "vec_id long, embedding array<float>")
        out = {r["vec_id"]: r for r in
               semantic_dedup(df, threshold=0.95, n_cells=4).collect()}
        assert len(out) == 24
        for d in range(8):
            ids = [3 * d, 3 * d + 1, 3 * d + 2]
            cells = {out[i]["cell"] for i in ids}
            assert len(cells) == 1          # copies share a cell
            assert out[ids[0]]["is_kept"] in (0, 1)
            # all but the group's smallest id must be dropped, and each
            # dropped row's dup_of is a smaller id in the same group
            dropped = [i for i in ids if out[i]["is_kept"] == 0]
            for i in dropped:
                assert out[i]["dup_of"] < i
            kept = [i for i in ids if out[i]["is_kept"] == 1]
            assert min(ids) in kept or out[min(ids)]["dup_of"] >= 0

    def test_auto_n_cells_scales_with_corpus(self, spark):
        """Default n_cells must follow the cells ∝ N contract instead
        of a fixed constant: the formula tracks ceil(N/target) within
        [lo, hi], and the default-arg path actually uses it (observable
        as >lo distinct cells on a corpus big enough to need them)."""
        from incubator_pulsar_spark.functions.similarity import (
            auto_n_cells, knn_graph, semantic_dedup)

        assert auto_n_cells(1_000) == 8              # lo floor
        assert auto_n_cells(4_096 * 12) == 12        # ceil(N/4096)
        assert auto_n_cells(10**9) == 4096           # hi cap
        assert auto_n_cells(50_000, target_cell=1000) == 50

        rows = [(i, [float((i * p) % 23 - 11) for p in (3, 5, 7, 11)])
                for i in range(200)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        # explicit pin unchanged; default auto resolves to lo=8 here and
        # both paths agree when pinned to the same value
        auto = semantic_dedup(df, threshold=0.9).collect()
        pinned = semantic_dedup(df, threshold=0.9, n_cells=8).collect()
        assert sorted(map(tuple, auto)) == sorted(map(tuple, pinned))
        g = knn_graph(df, k=3)
        assert g.count() == g.select("src_id").distinct().count() * 3

    def test_conservative_never_keeps_a_duplicate(self, spark):
        """Order-independent rule: any vector with an earlier same-cell
        neighbor above threshold is dropped — verified by recomputing
        the predicate from the output."""
        import itertools

        import numpy as np

        from incubator_pulsar_spark.functions.similarity import semantic_dedup

        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(40, 6))
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = {r["vec_id"]: r for r in
               semantic_dedup(df, threshold=0.6, n_cells=2).collect()}
        unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        # float32 storage: recompute on the float32-rounded vectors
        unit32 = vecs.astype(np.float32).astype(np.float64)
        unit32 = unit32 / np.linalg.norm(unit32, axis=1, keepdims=True)
        for a, b in itertools.combinations(range(40), 2):
            if out[a]["cell"] != out[b]["cell"]:
                continue
            sim = round(float(unit32[a] @ unit32[b]), 6)
            if sim >= 0.6 + 1e-9:
                assert out[b]["is_kept"] == 0, (a, b, sim)


class TestCompaction:
    def test_flat_dir_compacts_and_preserves_rows(self, spark, tmp_path):
        from incubator_pulsar_spark.operators.maintenance import (
            compact_parquet_dir)

        p = str(tmp_path / "topic")
        spark.range(10_000).withColumn("v", F.col("id") * 2) \
            .repartition(32).write.parquet(p)
        before = sorted(r["id"] for r in spark.read.parquet(p).collect())
        stats = compact_parquet_dir(spark, p, target_file_bytes=1 << 30)
        assert stats[p][0] == 32 and stats[p][1] == 1
        after_df = spark.read.parquet(p)
        assert sorted(r["id"] for r in after_df.collect()) == before
        # second run is a no-op
        assert compact_parquet_dir(spark, p, target_file_bytes=1 << 30) == {}

    def test_partitioned_dir_compacts_per_partition(self, spark, tmp_path):
        from incubator_pulsar_spark.operators.maintenance import (
            compact_parquet_dir)

        p = str(tmp_path / "topic")
        df = spark.range(6_000).withColumn("day", (F.col("id") % 3).cast("int"))
        df.repartition(16).write.partitionBy("day").parquet(p)
        rows_before = sorted((r["id"], r["day"]) for r in
                             spark.read.parquet(p).collect())
        stats = compact_parquet_dir(spark, p, target_file_bytes=1 << 30)
        assert len(stats) == 3 and all(a > b for a, b in stats.values())
        got = spark.read.parquet(p)
        assert sorted((r["id"], r["day"]) for r in got.collect()) == rows_before
        # partition pruning still works after the rewrite
        plan = got.filter(F.col("day") == 1)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "day" in plan

    def test_sort_by_clusters_rowgroups(self, spark, tmp_path):
        import pyarrow.parquet as pq

        from incubator_pulsar_spark.operators.maintenance import (
            compact_parquet_dir)

        p = str(tmp_path / "topic")
        spark.range(50_000).withColumn("k", (F.col("id") * 2654435761) % 1000) \
            .repartition(16).write.parquet(p)
        compact_parquet_dir(spark, p, target_file_bytes=1 << 30, sort_by=["k"])
        f = [n for n in os.listdir(p) if n.endswith(".parquet")]
        assert len(f) == 1
        md = pq.ParquetFile(os.path.join(p, f[0]))
        # clustered: the single file's k column is globally sorted, so
        # first row group min == global min
        first = md.read_row_group(0).to_pandas()["k"]
        assert first.is_monotonic_increasing

    def test_crash_recovery_rolls_back(self, spark, tmp_path):
        from incubator_pulsar_spark.operators.maintenance import (
            compact_parquet_dir)

        p = str(tmp_path / "topic")
        spark.range(1000).repartition(8).write.parquet(p)
        # simulate a crash after old->pre-compact rename, before tmp->live
        os.rename(p, p + ".pre-compact")
        stats = compact_parquet_dir(spark, p, target_file_bytes=1 << 30)
        assert sorted(r["id"] for r in spark.read.parquet(p).collect()) \
            == list(range(1000))
        assert stats[p][1] == 1


class TestSampleQuantiles:
    def test_small_group_is_exact_type1_quantile(self, spark):
        """Groups smaller than k are sampled in full -> type-1 exact."""
        from incubator_pulsar_spark.functions.sketches import sample_quantiles

        rows = [("g", float(v), i) for i, v in enumerate(range(1, 101))]
        df = spark.createDataFrame(rows, "grp string, value double, id long")
        out = sample_quantiles(df, ["grp"], "value", "id", k=512).collect()[0]
        assert out["sample_n"] == 100
        assert out["est_q50"] == 50.0    # ceil(0.5*100) = rank 50
        assert out["est_q90"] == 90.0
        assert out["est_q99"] == 99.0

    def test_sketch_estimate_tracks_exact_quantile(self, spark):
        """k=512 over 20k skewed values: estimates land within a few
        percent of the exact quantiles (sampling error ~1/sqrt(k))."""
        from incubator_pulsar_spark.functions.sketches import sample_quantiles

        rows = [("g", float((i * 2654435761) % 97_003) ** 1.5, i)
                for i in range(20_000)]
        df = spark.createDataFrame(rows, "grp string, value double, id long") \
            .repartition(8)
        out = sample_quantiles(df, ["grp"], "value", "id", k=512).collect()[0]
        vals = sorted(v for _, v, _ in rows)
        assert out["sample_n"] == 512
        for p, est in ((0.5, out["est_q50"]), (0.9, out["est_q90"])):
            exact = vals[int(p * len(vals)) - 1]
            assert abs(est - exact) / exact < 0.15, (p, est, exact)

    def test_partition_layout_does_not_change_result(self, spark):
        """Mergeability: 1 partition vs 16 partitions, identical output
        (the map-side bottom-k loses nothing the global bottom-k needs)."""
        from incubator_pulsar_spark.functions.sketches import sample_quantiles

        rows = [(f"g{i % 3}", float((i * 37) % 1000), i) for i in range(5000)]
        df = spark.createDataFrame(rows, "grp string, value double, id long")
        a = {tuple(r) for r in sample_quantiles(
            df.coalesce(1), ["grp"], "value", "id", k=64).collect()}
        b = {tuple(r) for r in sample_quantiles(
            df.repartition(16), ["grp"], "value", "id", k=64).collect()}
        assert a == b

    def test_string_ids_total_order_matches_python_model(self, spark):
        """Non-integral ids go through the md5 order key (a raw
        cast('long') would NULL them out and break the lexsort
        contract): result must equal a Python replay of the exact
        bottom-k-by-(u, md5-id) algorithm, and must be partition-
        layout independent."""
        import hashlib
        import math

        from incubator_pulsar_spark.functions.sketches import sample_quantiles

        rows = [(f"doc-{i:05d}", float((i * 37) % 1000)) for i in range(3000)]
        df = spark.createDataFrame(rows, "id string, value double") \
            .withColumn("grp", F.lit("g"))
        k = 64
        out = sample_quantiles(df.repartition(16), ["grp"], "value", "id",
                               k=k).collect()[0]
        out1 = sample_quantiles(df.coalesce(1), ["grp"], "value", "id",
                                k=k).collect()[0]
        assert tuple(out) == tuple(out1)

        def u_of(s):
            h = hashlib.md5(f"qsk:{s}".encode()).hexdigest()[:12]
            return int(h, 16) / float(1 << 48)

        def tb_of(s):
            return int(hashlib.md5(f"tb:{s}".encode()).hexdigest()[:15], 16)

        pool = sorted(((u_of(i), tb_of(i), v) for i, v in rows))[:k]
        vals = sorted(v for _, _, v in pool)
        assert out["sample_n"] == k
        for p in (0.5, 0.9, 0.99):
            rank = max(math.ceil(p * k), 1)
            assert out[f"est_q{int(p * 100)}"] == vals[rank - 1]


class TestZorder:
    def test_interleave_matches_python_model(self, spark):
        from incubator_pulsar_spark.functions.layout import zorder_key

        def model(x, y, bits=8):
            z = 0
            for i in range(bits):
                z |= ((x >> i) & 1) << (2 * i)
                z |= ((y >> i) & 1) << (2 * i + 1)
            return z

        rows = [(x, y) for x in (0, 1, 5, 100, 255) for y in (0, 3, 77, 255)]
        df = spark.createDataFrame(rows, "x long, y long")
        got = df.select("x", "y", zorder_key(F.col("x"), F.col("y"))
                        .alias("z")).collect()
        for r in got:
            assert r["z"] == model(r["x"], r["y"]), (r["x"], r["y"])

    def test_locality_aligned_quad_is_contiguous(self, spark):
        """An aligned 2^k x 2^k rectangle maps to one contiguous z-range
        — the property file-level min/max pruning exploits."""
        from incubator_pulsar_spark.functions.layout import zorder_key

        df = spark.createDataFrame(
            [(x, y) for x in range(64) for y in range(64)], "x long, y long")
        z = {(r["x"], r["y"]): r["z"] for r in df.select(
            "x", "y", zorder_key(F.col("x"), F.col("y"), bits=6)
            .alias("z")).collect()}
        quad = sorted(z[(x, y)] for x in range(16, 32) for y in range(16, 32))
        assert quad == list(range(min(quad), min(quad) + 256))

    def test_zorder_write_files_cover_disjoint_zranges(self, spark, tmp_path):
        import os as _os

        import pyarrow.parquet as pq

        from incubator_pulsar_spark.functions.layout import (
            zorder_key, zorder_write)

        df = spark.range(20_000).select(
            (F.col("id") % 251).alias("x"),
            ((F.col("id") * 7) % 241).alias("y"),
            F.col("id"))
        p = str(tmp_path / "z")
        zorder_write(df, p, "x", "y", n_files=8)
        back = spark.read.parquet(p)
        assert back.count() == 20_000
        # recompute each file's z-range: ranges must not overlap
        ranges = []
        for name in _os.listdir(p):
            if not name.endswith(".parquet"):
                continue
            t = pq.read_table(_os.path.join(p, name)).to_pandas()
            if t.empty:
                continue
            zs = [int(z) for z in
                  (lambda xs, ys: [sum((((x >> i) & 1) << (2 * i))
                                       | (((y >> i) & 1) << (2 * i + 1))
                                       for i in range(8))
                                   for x, y in zip(xs, ys)])(t["x"], t["y"])]
            ranges.append((min(zs), max(zs)))
        ranges.sort()
        for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
            assert a_hi <= b_lo, (a_hi, b_lo)

    def test_bits_validation(self, spark):
        from incubator_pulsar_spark.functions.layout import zorder_key

        with pytest.raises(ValueError):
            zorder_key(F.lit(1), F.lit(1), bits=0)


class TestBpeTrainEncode:
    CORPUS = [
        (0, "low lower lowest low low"),
        (1, "new newer newest new lower"),
        (2, "widest wide wider new low"),
        (3, "low low low newest widest"),
    ]

    @staticmethod
    def _model_train(texts, n_merges, min_freq=1):
        import re as _re
        from collections import Counter

        vocab = Counter(w for t in texts for w in _re.findall(r"[a-z]+", t.lower()))
        vocab = Counter({w: c for w, c in vocab.items() if c >= min_freq})
        segs = {w: list(w) for w in vocab}
        merges = []
        for _ in range(n_merges):
            counts = Counter()
            for w, syms in segs.items():
                for i in range(len(syms) - 1):
                    counts[(syms[i], syms[i + 1])] += vocab[w]
            if not counts:
                break
            pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merges.append(pair)
            for w, syms in segs.items():
                out, i = [], 0
                while i < len(syms):
                    if (i < len(syms) - 1
                            and (syms[i], syms[i + 1]) == pair):
                        out.append(pair[0] + pair[1]); i += 2
                    else:
                        out.append(syms[i]); i += 1
                segs[w] = out
        return merges

    @staticmethod
    def _model_encode(text, merges):
        import re as _re

        from incubator_pulsar_spark.functions.text import _bpe_merge_word

        ranks = {tuple(p): i for i, p in enumerate(merges)}
        toks = []
        for w in _re.findall(r"[a-z]+", text.lower()):
            toks.extend(_bpe_merge_word(list(w), ranks))
        return toks

    def test_train_matches_reference_algorithm(self, spark):
        from incubator_pulsar_spark.functions.text import bpe_train

        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        got = bpe_train(df, 8, min_freq=1)       # unpruned reference form
        want = self._model_train([t for _, t in self.CORPUS], 8)
        assert [tuple(m) for m in got] == want

    def test_default_min_freq_prunes_hapax_words(self, spark):
        """Default min_freq=2: hapax words (lowest/newer/wide/wider in
        this corpus) never reach the driver, and the merges equal the
        reference trainer over the PRUNED vocabulary. On a hapax-free
        corpus pruning is a no-op and the default equals the unpruned
        trainer exactly."""
        from incubator_pulsar_spark.functions.text import bpe_train

        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        got = bpe_train(df, 8)                  # default min_freq=2
        want = self._model_train([t for _, t in self.CORPUS], 8, min_freq=2)
        assert [tuple(m) for m in got] == want

        clean = [(i, t + " " + t) for i, t in self.CORPUS]  # every word ≥2
        dfc = spark.createDataFrame(clean, "doc_id long, text string")
        assert ([tuple(m) for m in bpe_train(dfc, 8)]
                == self._model_train([t for _, t in clean], 8))

    def test_top_m_bounds_the_collect(self, spark):
        """top_m keeps only the m most frequent word types (freq desc,
        word asc): training then sees exactly that truncated vocab."""
        from incubator_pulsar_spark.functions.text import bpe_train

        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        # low(7), new(3), lower/newest/widest(2) → top 3 = low,new,lower? no:
        # (7,low) (3,new) then freq-2 ties sorted by word: lower,newest,widest
        texts3 = ["low"] * 7 + ["new"] * 3 + ["lower"] * 2
        got = bpe_train(df, 6, min_freq=1, top_m=3)
        want = self._model_train([" ".join(texts3)], 6)
        assert [tuple(m) for m in got] == want

    def test_encode_matches_model_and_hash(self, spark):
        import hashlib

        from incubator_pulsar_spark.functions.text import (
            bpe_encode, bpe_train)

        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        merges = bpe_train(df, 6)
        out = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
        for doc_id, text in self.CORPUS:
            toks = self._model_encode(text, merges)
            assert out[doc_id]["n_bpe_tokens"] == len(toks)
            want_md5 = hashlib.md5(" ".join(toks).encode()).hexdigest()
            assert out[doc_id]["token_md5"] == want_md5

    def test_zero_merges_is_char_segmentation(self, spark):
        import re as _re

        from incubator_pulsar_spark.functions.text import bpe_encode

        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        out = {r["doc_id"]: r["n_bpe_tokens"]
               for r in bpe_encode(df, []).collect()}
        for doc_id, text in self.CORPUS:
            n_chars = sum(len(w) for w in _re.findall(r"[a-z]+", text.lower()))
            assert out[doc_id] == n_chars

    def test_more_merges_never_increase_tokens(self, spark):
        from incubator_pulsar_spark.functions.text import (
            bpe_encode, bpe_train)

        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        merges = bpe_train(df, 10)
        prev = None
        for n in (0, 3, 6, 10):
            total = sum(r["n_bpe_tokens"]
                        for r in bpe_encode(df, merges[:n]).collect())
            if prev is not None:
                assert total <= prev
            prev = total


class TestChunkDocuments:
    def test_windows_cover_every_word_with_overlap(self, spark):
        from incubator_pulsar_spark.functions.text import chunk_documents

        # purely alphabetic words: word_tokens keeps [a-z]+ only, so the
        # recomputation below must see the same tokens
        words = " ".join(
            "w" + chr(97 + i // 26) + chr(97 + i % 26) for i in range(100))
        df = spark.createDataFrame([(0, words)], "doc_id long, text string")
        out = sorted(chunk_documents(df, chunk_words=64, stride=48).collect(),
                     key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in out] == [0, 1]
        assert out[0]["n_words"] == 64       # words 0..63
        assert out[1]["n_words"] == 52       # words 48..99
        # md5s match a direct recomputation of the window text
        import hashlib
        toks = words.split()
        assert out[0]["chunk_md5"] == hashlib.md5(
            " ".join(toks[0:64]).encode()).hexdigest()
        assert out[1]["chunk_md5"] == hashlib.md5(
            " ".join(toks[48:100]).encode()).hexdigest()

    def test_short_and_empty_docs(self, spark):
        from incubator_pulsar_spark.functions.text import chunk_documents

        df = spark.createDataFrame(
            [(0, "only five words in here"), (1, ""), (2, "one")],
            "doc_id long, text string")
        out = {(r["doc_id"], r["chunk_id"]): r["n_words"]
               for r in chunk_documents(df, chunk_words=64, stride=48).collect()}
        assert out[(0, 0)] == 5 and out[(1, 0)] == 0 and out[(2, 0)] == 1
        assert len(out) == 3   # exactly one chunk each

    def test_validation(self, spark):
        from incubator_pulsar_spark.functions.text import chunk_documents

        df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_words=10, stride=11)
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_words=10, stride=0)


class TestMergeIntoTopic:
    def _write_day(self, spark, path, day, rows):
        df = spark.createDataFrame(rows, "k long, v string, seq long")
        df.write.parquet(f"{path}/publish_date={day}")

    def test_upsert_latest_wins_and_untouched_days_not_rewritten(
            self, spark, tmp_path):
        from incubator_pulsar_spark.operators.maintenance import (
            merge_into_topic)

        p = str(tmp_path / "topic")
        self._write_day(spark, p, "2001-03-05",
                        [(1, "a", 10), (2, "b", 10)])
        self._write_day(spark, p, "2001-03-06", [(9, "z", 10)])
        untouched = f"{p}/publish_date=2001-03-06"
        before_files = sorted(os.listdir(untouched))
        before_mtime = os.path.getmtime(untouched)

        updates = spark.createDataFrame(
            [("2001-03-05", 2, "b2", 20),     # update (newer seq)
             ("2001-03-05", 3, "c", 5),       # insert
             ("2001-03-07", 4, "d", 1)],      # new partition
            "publish_date string, k long, v string, seq long")
        out = merge_into_topic(spark, updates, p,
                               key_cols=["k"], order_col="seq")
        assert out == ["publish_date=2001-03-05", "publish_date=2001-03-07"]
        got = {(r["k"]): (r["v"], r["seq"]) for r in
               spark.read.parquet(f"{p}/publish_date=2001-03-05").collect()}
        assert got == {1: ("a", 10), 2: ("b2", 20), 3: ("c", 5)}
        assert sorted(os.listdir(untouched)) == before_files
        assert os.path.getmtime(untouched) == before_mtime
        new = spark.read.parquet(f"{p}/publish_date=2001-03-07").collect()
        assert [(r["k"], r["v"]) for r in new] == [(4, "d")]

    def test_equal_order_prefers_update_side(self, spark, tmp_path):
        from incubator_pulsar_spark.operators.maintenance import (
            merge_into_topic)

        p = str(tmp_path / "topic")
        self._write_day(spark, p, "2001-03-05", [(1, "old", 10)])
        updates = spark.createDataFrame(
            [("2001-03-05", 1, "new", 10)],
            "publish_date string, k long, v string, seq long")
        merge_into_topic(spark, updates, p, key_cols=["k"], order_col="seq")
        got = spark.read.parquet(f"{p}/publish_date=2001-03-05").collect()
        assert [(r["k"], r["v"]) for r in got] == [(1, "new")]

    def test_crash_between_renames_recovers_preexisting_rows(
            self, spark, tmp_path):
        """A crash between os.rename(leaf, old) and os.rename(tmp, leaf)
        leaves the partition dir missing with the original rows stranded
        in ``.pre-compact``. The next merge must roll that back before
        merging — otherwise it builds the day from the updates alone and
        rmtree's the only copy of the pre-existing data."""
        from incubator_pulsar_spark.operators.maintenance import (
            _OLD_SUFFIX, merge_into_topic)

        p = str(tmp_path / "topic")
        self._write_day(spark, p, "2001-03-05", [(1, "a", 10), (2, "b", 10)])
        leaf = f"{p}/publish_date=2001-03-05"
        # simulate the crash window: first rename done, second never ran
        os.rename(leaf, leaf + _OLD_SUFFIX)
        assert not os.path.exists(leaf)

        updates = spark.createDataFrame(
            [("2001-03-05", 2, "b2", 20)],
            "publish_date string, k long, v string, seq long")
        merge_into_topic(spark, updates, p, key_cols=["k"], order_col="seq")
        got = {r["k"]: (r["v"], r["seq"]) for r in
               spark.read.parquet(leaf).collect()}
        # key 1 survived the crash; key 2 took the update
        assert got == {1: ("a", 10), 2: ("b2", 20)}
        assert not os.path.exists(leaf + _OLD_SUFFIX)

    def test_merge_is_idempotent(self, spark, tmp_path):
        from incubator_pulsar_spark.operators.maintenance import (
            merge_into_topic)

        p = str(tmp_path / "topic")
        self._write_day(spark, p, "2001-03-05", [(1, "a", 1), (2, "b", 1)])
        updates = spark.createDataFrame(
            [("2001-03-05", 1, "a2", 2)],
            "publish_date string, k long, v string, seq long")
        merge_into_topic(spark, updates, p, key_cols=["k"], order_col="seq")
        merge_into_topic(spark, updates, p, key_cols=["k"], order_col="seq")
        got = sorted((r["k"], r["v"], r["seq"]) for r in
                     spark.read.parquet(f"{p}/publish_date=2001-03-05").collect())
        assert got == [(1, "a2", 2), (2, "b", 1)]


class TestCountMinSketch:
    def test_estimate_never_underestimates_and_is_exact_when_sparse(self, spark):
        from incubator_pulsar_spark.functions.sketches import (
            cms_estimate, cms_table)

        rows = [(f"k{i % 37}",) for i in range(5000)]
        df = spark.createDataFrame(rows, "k string")
        counters = cms_table(df, "k", d=4, w=1024)
        est = {r["k"]: r["cms_estimate"] for r in
               cms_estimate(df, counters, "k", d=4, w=1024).collect()}
        exact = {f"k{j}": len([1 for i in range(5000) if i % 37 == j])
                 for j in range(37)}
        for k, n in exact.items():
            assert est[k] >= n                    # CMS never undercounts
        # 37 keys in 4×1024 cells: collisions are essentially impossible,
        # so every estimate is exact
        assert est == exact

    def test_counter_table_is_fixed_size(self, spark):
        from incubator_pulsar_spark.functions.sketches import cms_table

        df = spark.range(50_000).select(F.col("id").cast("string").alias("k"))
        counters = cms_table(df, "k", d=4, w=256)
        assert counters.count() <= 4 * 256
        # total mass per hash row equals the record count
        per_row = {r["row_i"]: r["s"] for r in
                   counters.groupBy("row_i")
                   .agg(F.sum("cnt").alias("s")).collect()}
        assert all(v == 50_000 for v in per_row.values())

    def test_merge_by_addition(self, spark):
        """CMS counters are sums: sketch(A ∪ B) == sketch(A) + sketch(B)
        cell-wise — the mergeability CMS is used for."""
        from incubator_pulsar_spark.functions.sketches import cms_table

        df = spark.range(2000).select((F.col("id") % 97).cast("string").alias("k"))
        a = df.filter(F.col("k").cast("long") % 2 == 0)
        b = df.filter(F.col("k").cast("long") % 2 == 1)
        whole = {(r["row_i"], r["bucket"]): r["cnt"]
                 for r in cms_table(df, "k", d=3, w=128).collect()}
        merged: dict = {}
        for part in (a, b):
            for r in cms_table(part, "k", d=3, w=128).collect():
                key = (r["row_i"], r["bucket"])
                merged[key] = merged.get(key, 0) + r["cnt"]
        assert merged == whole


class TestIncrementalMinhashIndex:
    def test_probe_equals_cross_pairs_of_full_lsh(self, spark, tmp_path, sf_dir):
        """Probing batch B against an index of corpus A finds exactly the
        A×B candidate pairs the full self-join LSH would find."""
        from incubator_pulsar_spark.functions.fuzzy import (
            lsh_candidate_pairs, probe_minhash_index, write_minhash_index)

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = docs.filter(F.col("doc_id") % 2 == 0)
        b = docs.filter(F.col("doc_id") % 2 == 1)
        idx = str(tmp_path / "lsh_idx")
        write_minhash_index(a, idx)

        got = {(r["probe_id"], r["indexed_id"])
               for r in probe_minhash_index(spark, b, idx).collect()}
        full = lsh_candidate_pairs(docs).collect()
        want = set()
        for r in full:
            x, y = r["doc_a"], r["doc_b"]
            if (x % 2 == 0) != (y % 2 == 0):          # cross A/B pairs only
                probe, indexed = (x, y) if x % 2 == 1 else (y, x)
                want.add((probe, indexed))
        assert got == want and len(want) > 0

    def test_append_then_reprobe_finds_new_vs_new(self, spark, tmp_path, sf_dir):
        from incubator_pulsar_spark.functions.fuzzy import (
            append_minhash_index, probe_minhash_index, write_minhash_index)

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = docs.filter(F.col("doc_id") % 2 == 0)
        b = docs.filter(F.col("doc_id") % 2 == 1)
        idx = str(tmp_path / "lsh_idx")
        write_minhash_index(a, idx)
        append_minhash_index(b, idx)
        # re-probing b against the appended index must now ALSO surface
        # b-vs-b candidates, while never matching a doc to itself
        pairs = probe_minhash_index(spark, b, idx).collect()
        assert all(r["probe_id"] != r["indexed_id"] for r in pairs)
        assert any(r["indexed_id"] % 2 == 1 for r in pairs)

    def test_params_pinned_in_sidecar(self, spark, tmp_path, sf_dir):
        import json

        from incubator_pulsar_spark.functions.fuzzy import (
            write_minhash_index)

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
        idx = str(tmp_path / "lsh_idx")
        write_minhash_index(docs, idx, k=4, num_hashes=8, bands=2)
        meta = json.load(open(f"{idx}/_index_meta.json"))
        assert meta == {"k": 4, "num_hashes": 8, "bands": 2}


class TestKnnGraph:
    def test_shape_and_no_self_edges(self, spark, sf_dir):
        from incubator_pulsar_spark.functions.similarity import knn_graph

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        out = knn_graph(emb, k=5, n_cells=8, nprobe=2).collect()
        by_src: dict = {}
        for r in out:
            assert r["src_id"] != r["dst_id"]
            by_src.setdefault(r["src_id"], []).append(r)
        n = emb.count()
        assert len(by_src) == n
        for src, rows in by_src.items():
            ranks = sorted(r["rank"] for r in rows)
            assert ranks == list(range(1, len(rows) + 1))
            assert len(rows) <= 5

    def test_recall_vs_exact_topk(self, spark, sf_dir):
        """Probing 2/8 cells on the near-uniform fixture: recall@5 vs
        exact brute force must beat the random-scan baseline (2/8) by a
        wide margin — the own-cell probe plus the nearest spill-over
        cell is where neighbors live."""
        import numpy as np

        from incubator_pulsar_spark.functions.similarity import knn_graph

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        rows = emb.collect()
        ids = np.array([r["vec_id"] for r in rows])
        mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1
        unit = mat / norms[:, None]
        sims = unit @ unit.T
        np.fill_diagonal(sims, -2)
        exact = {ids[i]: set(ids[np.argsort(-sims[i])[:5]])
                 for i in range(len(ids))}
        got: dict = {}
        for r in knn_graph(emb, k=5, n_cells=8, nprobe=2).collect():
            got.setdefault(r["src_id"], set()).add(r["dst_id"])
        hits = sum(len(got.get(i, set()) & exact[i]) for i in exact)
        recall = hits / (5 * len(exact))
        # measured 0.43 on this NEAR-UNIFORM fixture (no cluster
        # structure for cell probing to exploit — same caveat as
        # ivf_topk's documented recall); random 2-of-8 scan ≈ 0.25
        assert recall > 0.35, recall

    def test_prune_is_exact_on_clustered_and_uniform_data(self, spark, sf_dir):
        """The angular-bound prune must be invisible in the output:
        prune=True == prune=False bit-for-bit, both on tightly
        clustered data (where the bound actually fires — tight radii,
        well-separated centroids) and on the near-uniform fixture
        (where it rarely does)."""
        import numpy as np

        from incubator_pulsar_spark.functions.similarity import knn_graph

        # 6 tight clusters around near-orthogonal anchors: radii are
        # small and centroid separations large, so secondary-probe
        # bounds fall below the own-cell kth and the prune engages.
        rng = np.random.default_rng(11)
        anchors = np.eye(6, 16)
        rows = []
        vid = 0
        for a in range(6):
            for _ in range(40):
                v = anchors[a] + 0.02 * rng.normal(size=16)
                rows.append((vid, [float(x) for x in v]))
                vid += 1
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        for kwargs in ({"n_cells": 6, "nprobe": 3}, {"n_cells": 4, "nprobe": 2}):
            a_ = sorted(map(tuple, knn_graph(df, k=4, prune=True,
                                             **kwargs).collect()))
            b_ = sorted(map(tuple, knn_graph(df, k=4, prune=False,
                                             **kwargs).collect()))
            assert a_ == b_, kwargs

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        a_ = sorted(map(tuple, knn_graph(emb, k=5, n_cells=8, nprobe=2,
                                         prune=True).collect()))
        b_ = sorted(map(tuple, knn_graph(emb, k=5, n_cells=8, nprobe=2,
                                         prune=False).collect()))
        assert a_ == b_


class TestRandomizedEquivalence:
    def test_interval_join_random_batch_vs_naive(self, spark):
        """500 pseudo-random points × 120 pseudo-random intervals
        (deterministic congruential stream, incl. degenerate and
        multi-day spans): bucketed join == naive inequality join."""
        import datetime as dt

        base = dt.datetime(2001, 3, 1)
        pts, ivs = [], []
        x = 7
        for i in range(500):
            x = (x * 1103515245 + 12345) % (1 << 31)
            pts.append((i, base + dt.timedelta(seconds=x % (86400 * 14))))
        for i in range(120):
            x = (x * 1103515245 + 12345) % (1 << 31)
            s = x % (86400 * 14)
            x = (x * 1103515245 + 12345) % (1 << 31)
            dur = x % 90000          # 0s .. ~25h, crosses bucket+day lines
            ivs.append((i, base + dt.timedelta(seconds=s),
                        base + dt.timedelta(seconds=s + dur)))
        points = spark.createDataFrame(pts, "pid long, ts timestamp_ntz")
        intervals = spark.createDataFrame(
            ivs, "iid long, start_ts timestamp_ntz, end_ts timestamp_ntz")
        got = sorted((r["iid"], r["pid"]) for r in
                     interval_join(points, intervals).collect())
        naive = sorted((r["iid"], r["pid"]) for r in points.join(
            intervals, (points["ts"] >= intervals["start_ts"])
            & (points["ts"] <= intervals["end_ts"])).collect())
        assert got == naive and len(got) > 100

    def test_chunk_coverage_and_overlap_invariants(self, spark):
        """Every word position is covered by ≥1 chunk; full-length
        consecutive chunks overlap by exactly chunk_words − stride."""
        from incubator_pulsar_spark.functions.text import chunk_documents

        docs = []
        for doc_id, n in enumerate([1, 5, 47, 48, 49, 63, 64, 65, 100,
                                    111, 200, 500]):
            words = " ".join(
                "w" + chr(97 + i // 676) + chr(97 + (i // 26) % 26)
                + chr(97 + i % 26) for i in range(n))
            docs.append((doc_id, n, words))
        df = spark.createDataFrame([(d, t) for d, _, t in docs],
                                   "doc_id long, text string")
        out = {}
        for r in chunk_documents(df, chunk_words=64, stride=48).collect():
            out.setdefault(r["doc_id"], []).append((r["chunk_id"], r["n_words"]))
        for doc_id, n, _ in docs:
            chunks = sorted(out[doc_id])
            covered = set()
            for cid, nw in chunks:
                covered.update(range(cid * 48, cid * 48 + nw))
            assert covered == set(range(n)), (doc_id, n)
            for (c1, n1), (c2, _) in zip(chunks, chunks[1:]):
                if n1 == 64:
                    assert (c1 * 48 + 64) - c2 * 48 == 16  # exact overlap


class TestDataQualityChecks:
    def test_every_rule_kind_counts_planted_violations(self, spark):
        from incubator_pulsar_spark.functions import checks as C

        df = spark.createDataFrame(
            [(1, "a", 10.0, 100),
             (1, "a", 20.0, 100),     # duplicate id -> 1 excess row
             (2, None, 5.0, 100),     # null name
             (3, "zz", -1.0, 100),    # bad value + below range
             (4, "b", 999.0, 777)],   # above range + orphan ref
            "id long, name string, amount double, fk long")
        ref = spark.createDataFrame([(100,)], "k long")
        out = {r["rule"]: r["n_violations"] for r in C.run_checks(df, [
            C.not_null("name"),
            C.unique(["id"]),
            C.accepted_values("name", ["a", "b"]),
            C.in_range("amount", 0.0, 100.0),
            C.references("fk", ref, "k"),
        ]).collect()}
        assert out == {
            "not_null:name": 1,
            "unique:id": 1,
            "accepted_values:name": 1,   # 'zz' (null not counted here)
            "in_range:amount": 2,        # -1.0 and 999.0
            "references:fk": 1,          # 777
        }

    def test_scalar_rules_share_one_scan(self, spark):
        """All scalar + uniqueness rules fold into a single aggregate
        over one table scan — the plan has exactly one parquet-free
        source and no joins."""
        from incubator_pulsar_spark.functions import checks as C

        df = spark.range(1000).select(
            F.col("id"), (F.col("id") % 5).alias("v"))
        out = C.run_checks(df, [
            C.not_null("v"), C.in_range("v", 0, 3), C.unique(["id"])])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        assert out.count() == 3

    def test_empty_rules(self, spark):
        from incubator_pulsar_spark.functions import checks as C

        df = spark.range(5)
        assert C.run_checks(df, []).count() == 0

    def test_unique_null_keys_count_as_one_distinct(self, spark):
        """SQL-DISTINCT semantics per the docstring: a single null-keyed
        row is NOT a violation; N null-keyed rows are N-1 excess rows
        (they all collapse to the one distinct null)."""
        from incubator_pulsar_spark.functions import checks as C

        one_null = spark.createDataFrame([(None,), (1,)], "id long")
        out = {r["rule"]: r["n_violations"]
               for r in C.run_checks(one_null, [C.unique(["id"])]).collect()}
        assert out == {"unique:id": 0}

        three_nulls = spark.createDataFrame(
            [(None,), (None,), (None,), (1,)], "id long")
        out = {r["rule"]: r["n_violations"] for r in
               C.run_checks(three_nulls, [C.unique(["id"])]).collect()}
        assert out == {"unique:id": 2}

        # composite key: (1, NULL) twice is one excess row
        comp = spark.createDataFrame(
            [(1, None), (1, None), (1, "a")], "a long, b string")
        out = {r["rule"]: r["n_violations"] for r in
               C.run_checks(comp, [C.unique(["a", "b"])]).collect()}
        assert out == {"unique:a,b": 1}

    def test_profile_interval_column_not_numeric(self, spark):
        """'interval day to second'.startswith('int') must not classify
        interval columns as numeric — min(c).cast('double') would raise
        an AnalysisException on them."""
        from incubator_pulsar_spark.functions import checks as C

        df = spark.sql(
            "SELECT id, INTERVAL '1' DAY + make_dt_interval(0, 0, CAST(id AS INT), 0) AS gap "
            "FROM range(3)")
        prof = {r["column"]: r for r in C.profile_table(df).collect()}
        assert prof["gap"]["min_num"] is None
        assert prof["gap"]["max_num"] is None
        assert prof["gap"]["n_nulls"] == 0
        assert prof["id"]["min_num"] == 0.0 and prof["id"]["max_num"] == 2.0


def test_merge_skips_null_day_updates(spark, tmp_path):
    from pyspark.sql import functions as F

    from incubator_pulsar_spark.operators.maintenance import merge_into_topic

    p = str(tmp_path / "topic")
    spark.createDataFrame([(1, "a", 1)], "k long, v string, seq long") \
        .write.parquet(f"{p}/publish_date=2001-03-05")
    updates = spark.createDataFrame(
        [(None, 9, "x", 9), ("2001-03-05", 1, "a2", 2)],
        "publish_date string, k long, v string, seq long")
    out = merge_into_topic(spark, updates, p, key_cols=["k"],
                           order_col="seq")
    assert out == ["publish_date=2001-03-05"]
    got = {(r["k"], r["v"]) for r in
           spark.read.parquet(f"{p}/publish_date=2001-03-05").collect()}
    assert got == {(1, "a2")}


def test_checks_stream_reports_per_batch(spark, tmp_path, sf_dir):
    from pyspark.sql import functions as F

    from incubator_pulsar_spark.functions import checks as C

    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("event_id", "event_type", "value")
    src = str(tmp_path / "src")
    ev.filter(F.col("event_id") % 2 == 0).write.parquet(src)
    out, ck = str(tmp_path / "report"), str(tmp_path / "ck")
    rules = [C.not_null("event_type"),
             C.accepted_values("event_type", ["click", "view"]),
             C.in_range("value", 0.0, 1e9)]

    def run_pass():
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = C.start_checks_stream(stream, rules, out_path=out,
                                  checkpoint_path=ck, available_now=True)
        q.awaitTermination(120)

    run_pass()
    ev.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)
    run_pass()

    rep = spark.read.parquet(out)
    got = {(r["batch_id"], r["rule"]): (r["n_violations"], r["n_rows"])
           for r in rep.collect()}
    assert len({b for b, _ in got}) == 2          # one report per batch
    # whole-table reference: per-batch violations sum to the batch total
    whole = {r["rule"]: r["n_violations"]
             for r in C.run_checks(ev, rules).collect()}
    for rule, total in whole.items():
        assert sum(v for (b, ru), (v, _) in got.items() if ru == rule) == total
    # n_rows sums to the full table
    per_batch_rows = {b: n for (b, ru), (v, n) in got.items()}
    assert sum(per_batch_rows.values()) == ev.count()


def test_compactor_reclusters_with_zorder_key(spark, tmp_path):
    """compact_parquet_dir(sort_by=) composes with zorder_key: an
    append-fragmented topic reclusters into one file whose rows are
    z-sorted — the periodic OPTIMIZE pass of a lakehouse table."""
    import pyarrow.parquet as pq

    from incubator_pulsar_spark.functions.layout import zorder_key
    from incubator_pulsar_spark.operators.maintenance import (
        compact_parquet_dir)

    p = str(tmp_path / "topic")
    df = spark.range(30_000).select(
        (F.col("id") % 251).alias("x"), ((F.col("id") * 13) % 241).alias("y"),
        F.col("id"))
    # simulate fragmented appends
    for i in range(4):
        df.filter(F.col("id") % 4 == i).repartition(8) \
            .write.mode("append").parquet(p)
    keyed = df.withColumn("zkey", zorder_key(F.col("x"), F.col("y")))
    keyed.drop("zkey")  # (zkey recomputed by the compactor sort expr)

    stats = compact_parquet_dir(
        spark, p, target_file_bytes=1 << 30, sort_by=None)
    assert stats[p][0] == 32 and stats[p][1] == 1
    # now recluster by a persisted z-key column
    spark.read.parquet(p) \
        .withColumn("zkey", zorder_key(F.col("x"), F.col("y"))) \
        .repartition(8).write.mode("overwrite").parquet(p + "2")
    stats2 = compact_parquet_dir(
        spark, p + "2", target_file_bytes=1 << 30, sort_by=["zkey"])
    f = [n for n in os.listdir(p + "2") if n.endswith(".parquet")]
    assert len(f) == 1 and stats2
    t = pq.read_table(os.path.join(p + "2", f[0])).to_pandas()
    assert t["zkey"].is_monotonic_increasing
    assert len(t) == 30_000


def test_zorder_write_keep_key_composes_with_compactor(spark, tmp_path):
    """keep_key=True persists _zkey so compact_parquet_dir can
    re-cluster with sort_by=["_zkey"] without recomputing the key —
    the composition the module docstring promises."""
    import pyarrow.parquet as pq

    from incubator_pulsar_spark.functions.layout import zorder_write
    from incubator_pulsar_spark.operators.maintenance import (
        compact_parquet_dir)

    p = str(tmp_path / "zt")
    df = spark.range(10_000).select(
        (F.col("id") % 251).alias("x"), ((F.col("id") * 13) % 241).alias("y"))
    zorder_write(df, p, "x", "y", n_files=6, keep_key=True)
    cols = spark.read.parquet(p).columns
    assert "_zkey" in cols
    stats = compact_parquet_dir(spark, p, target_file_bytes=1 << 30,
                                sort_by=["_zkey"])
    f = [n for n in os.listdir(p) if n.endswith(".parquet")]
    assert len(f) == 1 and stats
    t = pq.read_table(os.path.join(p, f[0])).to_pandas()
    assert t["_zkey"].is_monotonic_increasing and len(t) == 10_000

    # default still drops the helper column
    p2 = str(tmp_path / "zt2")
    zorder_write(df, p2, "x", "y", n_files=2)
    assert "_zkey" not in spark.read.parquet(p2).columns


class TestZorderN:
    @staticmethod
    def _model(vals, bits):
        z = 0
        n = len(vals)
        for d, v in enumerate(vals):
            for i in range(bits):
                z |= ((v >> i) & 1) << (n * i + d)
        return z

    def test_3d_matches_model_and_is_bijective(self, spark):
        from incubator_pulsar_spark.functions.layout import zorder_key_n

        rows = [(x, y, w) for x in (0, 1, 7, 15) for y in (0, 2, 9, 15)
                for w in (0, 5, 15)]
        df = spark.createDataFrame(rows, "x long, y long, w long")
        got = df.select("x", "y", "w", zorder_key_n(
            [F.col("x"), F.col("y"), F.col("w")], bits=4).alias("z")).collect()
        zs = set()
        for r in got:
            assert r["z"] == self._model((r["x"], r["y"], r["w"]), 4)
            zs.add(r["z"])
        assert len(zs) == len(rows)        # injective on the sample

    def test_2d_form_agrees_with_pairwise_function(self, spark):
        from incubator_pulsar_spark.functions.layout import (
            zorder_key, zorder_key_n)

        df = spark.createDataFrame(
            [(x, y) for x in (0, 3, 200, 255) for y in (0, 7, 255)],
            "x long, y long")
        got = df.select(
            (zorder_key(F.col("x"), F.col("y")) ==
             zorder_key_n([F.col("x"), F.col("y")])).alias("eq")).collect()
        assert all(r["eq"] for r in got)

    def test_dims_validation(self, spark):
        from incubator_pulsar_spark.functions.layout import zorder_key_n

        with pytest.raises(ValueError):
            zorder_key_n([], bits=4)
        with pytest.raises(ValueError):
            zorder_key_n([F.lit(1)] * 4, bits=20)   # 4*20 > 62

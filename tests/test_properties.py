"""Property-based tests (hypothesis): operators vs pure-Python models.

The reference's broker tests assert semantics against in-memory maps
(e.g. compaction vs a key→latest dict); these properties replay that
style over generated topic fixtures.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row
from pyspark.sql import functions as F

from incubator_pulsar_spark.operators import compaction, dedup, windows

KEYS = ["a", "b", "c", None]

msg = st.tuples(
    st.sampled_from(KEYS),                      # key
    st.one_of(st.none(), st.integers(0, 5)),    # value (None = tombstone)
)
topics = st.lists(msg, min_size=1, max_size=30)

SLOW = settings(max_examples=15, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture,
                                       HealthCheck.too_slow])


def _df(spark, seq):
    rows = [Row(key=k, value=v, sequence=i) for i, (k, v) in enumerate(seq)]
    return spark.createDataFrame(rows, "key STRING, value INT, sequence LONG")


@given(seq=topics)
@SLOW
def test_compaction_matches_dict_model(spark, seq):
    """compact() == replaying the log into a dict, dropping null winners."""
    model: dict[str, tuple[int | None, int]] = {}
    for i, (k, v) in enumerate(seq):
        if k is not None:
            model[k] = (v, i)
    expect = {k: s for k, (v, s) in model.items() if v is not None}

    out = compaction.compact(_df(spark, seq), key_col="key", value_col="value",
                             sequence_col="sequence")
    got = {r.key: r.sequence for r in out.collect()}
    assert got == expect


@given(seq=st.lists(st.tuples(st.sampled_from(["p1", "p2"]), st.integers(0, 9)),
                    min_size=1, max_size=30))
@SLOW
def test_dedup_matches_highwater_model(spark, seq):
    """dedup_by_sequence == the broker's highestSequencedPushed rule."""
    high: dict[str, int] = {}
    keep = []
    for i, (prod, sid) in enumerate(seq):
        if prod not in high or sid > high[prod]:
            keep.append(i)
            high[prod] = sid
    rows = [Row(producer_name=p, sequence_id=s, sequence=i)
            for i, (p, s) in enumerate(seq)]
    df = spark.createDataFrame(rows, "producer_name STRING, sequence_id LONG, sequence LONG")
    out = dedup.dedup_by_sequence(df)
    assert sorted(r.sequence for r in out.collect()) == keep


@given(n=st.integers(1, 25), count=st.integers(1, 8))
@SLOW
def test_count_window_partition_complete(spark, n, count):
    """Every row lands in exactly one tumbling count pane; pane sizes are
    `count` except possibly the last (CountEvictionPolicy invariant)."""
    rows = [Row(key="k", sequence=i, value=1.0) for i in range(n)]
    df = spark.createDataFrame(rows, "key STRING, sequence LONG, value DOUBLE")
    out = windows.tumbling_count_window(
        df, key_col="key", order_col="sequence", count=count,
        aggs=[F.sum("value").alias("s")],
    ).orderBy("window_id").collect()
    sizes = [r.window_size for r in out]
    assert sum(sizes) == n
    assert all(s == count for s in sizes[:-1])
    assert 1 <= sizes[-1] <= count


asof_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b"]),      # key
              st.integers(0, 50)),              # ts
    min_size=0, max_size=25)


@given(left=asof_rows, right=asof_rows)
@SLOW
def test_asof_join_matches_scan_model(spark, left, right):
    """asof_join == per-row linear scan for the latest right (ts, seq)
    with right.ts <= left.ts on the same key (DuckDB-ASOF semantics;
    duplicate right (key, ts) resolved by the seq tie column)."""
    from incubator_pulsar_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [Row(lid=i, k=k, ts=ts) for i, (k, ts) in enumerate(left)],
        "lid LONG, k STRING, ts LONG")
    rdf = spark.createDataFrame(
        [Row(k=k, ts=ts, seq=i) for i, (k, ts) in enumerate(right)],
        "k STRING, ts LONG, seq LONG")

    def model(k, ts):
        cands = [(rts, seq) for i, (rk, rts) in enumerate(right)
                 for seq in [i] if rk == k and rts <= ts]
        return max(cands) if cands else (None, None)

    out = asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="ts", tie_col="seq")
    got = {r.lid: (r.ts_right, r.seq) for r in out.collect()}
    expect = {i: model(k, ts) for i, (k, ts) in enumerate(left)}
    assert got == expect


texts = st.lists(
    st.text(alphabet="ab @.0-9\n", min_size=0, max_size=40), min_size=1, max_size=8)


@given(ts=texts)
@SLOW
def test_redact_pii_matches_python_re(spark, ts):
    """Spark regexp_replace chain == Python re chain (same patterns,
    same order) — guards the Java-regex/RE2/Python dialect agreement the
    oracle relies on."""
    import re as _re

    from incubator_pulsar_spark.functions import text as t

    def model(s):
        s = _re.sub(t.EMAIL_PATTERN, "[EMAIL]", s)
        s = _re.sub(t.IPV4_PATTERN, "[IP]", s)
        return _re.sub(t.PHONE_PATTERN, "[PHONE]", s)

    df = spark.createDataFrame([Row(i=i, s=s) for i, s in enumerate(ts)],
                               "i LONG, s STRING")
    got = {r.i: r.o for r in df.select("i", t.redact_pii(F.col("s")).alias("o")).collect()}
    assert got == {i: model(s) for i, s in enumerate(ts)}


@given(ts=texts)
@SLOW
def test_word_shingles_match_python_model(spark, ts):
    from incubator_pulsar_spark.functions import text as t
    import re as _re

    def model(s, n=3):
        w = _re.findall(r"[a-z]+", s.lower())
        if len(w) <= n:
            return [" ".join(w)]
        return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]

    df = spark.createDataFrame([Row(i=i, s=s) for i, s in enumerate(ts)],
                               "i LONG, s STRING")
    words = df.select("i", t.word_tokens(F.col("s")).alias("_w"))
    got = {r.i: r.o for r in words.select(
        "i", t.word_shingles(F.col("_w"), 3, distinct=False).alias("o")).collect()}
    assert got == {i: model(s) for i, s in enumerate(ts)}


@given(texts=st.lists(st.text(alphabet="ab cd", min_size=0, max_size=30),
                      min_size=1, max_size=25),
       capacity=st.integers(5, 60),
       n_shards=st.integers(1, 4))
@SLOW
def test_pack_sequences_matches_cumsum_model(spark, texts, capacity, n_shards):
    """pack_sequences == the pure-Python model: shard by the same md5,
    order by the same hash, exclusive-prefix cumsum // capacity."""
    import hashlib

    from incubator_pulsar_spark.functions.sampling import pack_sequences
    from incubator_pulsar_spark.functions.text import TOKEN_PATTERN
    import re

    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r.doc_id: (r.shard, r.bin_id, r.n_tokens)
           for r in pack_sequences(df, capacity, id_col="doc_id",
                                   n_shards=n_shards).collect()}

    pat = re.compile(TOKEN_PATTERN)

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    model = {}
    shards: dict[int, list] = {}
    for i, t in enumerate(texts):
        shards.setdefault(h(f"pack:{i}") % n_shards, []).append(i)
    for shard, ids in shards.items():
        ids.sort(key=lambda i: (hashlib.md5(f"pack-o:{i}".encode()).hexdigest(), i))
        cum = 0
        for i in ids:
            tok = len(pat.findall(texts[i]))
            model[i] = (shard, cum // capacity, tok)
            cum += tok
    assert got == model


@given(ids=st.lists(st.integers(0, 10 ** 6), min_size=1, max_size=40,
                    unique=True),
       frac=st.floats(0.0, 1.0))
@SLOW
def test_hash_sample_matches_python_model(spark, ids, frac):
    """hash_sample == the same md5 threshold computed in pure Python."""
    import hashlib

    from incubator_pulsar_spark.functions.sampling import hash_sample

    df = spark.createDataFrame([Row(doc_id=i) for i in ids], "doc_id LONG")
    got = sorted(r.doc_id for r in hash_sample(df, frac, id_col="doc_id").collect())
    want = sorted(
        i for i in ids
        if int(hashlib.md5(f"sample:{i}".encode()).hexdigest()[:8], 16) / 2 ** 32 < frac)
    assert got == want


@given(vals=st.lists(st.integers(0, 10 ** 5), min_size=1, max_size=60),
       k=st.integers(2, 32))
@SLOW
def test_kmv_matches_python_model(spark, vals, k):
    """kmv_distinct == the pure-Python model: k smallest distinct
    48-bit md5 uniforms, estimate (k-1)/u_k above k else exact."""
    import hashlib

    from incubator_pulsar_spark.functions.sketches import kmv_distinct

    df = spark.createDataFrame([Row(g="g", v=v) for v in vals],
                               "g STRING, v LONG")
    got = kmv_distinct(df, ["g"], "v", k=k).collect()[0]

    us = sorted({int(hashlib.md5(f"kmv:{v}".encode()).hexdigest()[:12], 16) / 2 ** 48
                 for v in vals})[:k]
    n_kept = len(us)
    est = round((k - 1) / us[-1], 6) if n_kept >= k else float(n_kept)
    assert (got.n_kept, got.kmv_estimate) == (n_kept, est)


@given(keys=st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=80),
       phi_den=st.integers(2, 12), k=st.integers(1, 12))
@SLOW
def test_heavy_hitters_exact_vs_counter_model(spark, keys, phi_den, k):
    """heavy_hitters == Counter-threshold model for ANY stream and any
    k ≥ phi_den−1 (the MG guarantee bound); output is exact regardless
    of partitioning."""
    from collections import Counter

    from incubator_pulsar_spark.functions.sketches import heavy_hitters

    k = max(k, phi_den - 1)  # guarantee requires k ≥ den/num − 1
    df = spark.createDataFrame([Row(word=w) for w in keys],
                               "word STRING").repartition(3)
    got = {r.word: r.cnt for r in
           heavy_hitters(df, "word", phi_num=1, phi_den=phi_den,
                         k=k).collect()}
    n = len(keys)
    want = {w: c for w, c in Counter(keys).items() if c * phi_den >= n}
    assert got == want


@given(events=st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 400)),
    min_size=1, max_size=40))
@SLOW
def test_gapfill_matches_pandas_model(spark, events):
    """gapfill_locf == reindex+ffill over the global slot range. Values
    are quarters (exact at the operator's DECIMAL(18,4) quantization),
    and the model replicates the operator's mean formula exactly:
    round(exact_sum / n, 6)."""
    from collections import defaultdict

    from incubator_pulsar_spark.operators.gapfill import gapfill_locf

    rows = [Row(k="a", ts=1_700_000_000 + slot * 900 + 10, v=q / 4.0)
            for slot, q in events]
    df = spark.createDataFrame(rows).select(
        "k", F.timestamp_seconds("ts").alias("ts"), "v")
    got = {r.slot: (r.n_events, r.value_locf, r.filled)
           for r in gapfill_locf(df, key_cols=["k"], ts_col="ts",
                                 value_col="v", slot_seconds=900).collect()}

    per_slot = defaultdict(list)
    for s, q in events:
        per_slot[(1_700_000_000 + s * 900 + 10) // 900].append(q / 4.0)
    lo, hi = min(per_slot), max(per_slot)
    carry = None
    for slot in range(lo, hi + 1):
        vals = per_slot.get(slot, [])
        if vals:
            carry = round(float(sum(vals)) / len(vals), 6)
        g = got[slot]
        assert g[0] == len(vals) and g[2] == (len(vals) == 0)
        assert g[1] == carry


@given(ids=st.lists(st.integers(0, 10 ** 6), min_size=1, max_size=40,
                    unique=True),
       n=st.integers(1, 10))
@SLOW
def test_weighted_sample_prefix_monotone(spark, ids, n):
    """Top-n by the E-S key is a PREFIX of top-(n+5): growing the
    sample never swaps earlier choices (determinism under resizing)."""
    from incubator_pulsar_spark.functions.sampling import weighted_sample_fixed

    df = spark.createDataFrame([Row(doc_id=i, w=1.0 + (i % 5)) for i in ids])
    small = {r.doc_id for r in
             weighted_sample_fixed(df, n, id_col="doc_id",
                                   weight_col="w").collect()}
    big = {r.doc_id for r in
           weighted_sample_fixed(df, n + 5, id_col="doc_id",
                                 weight_col="w").collect()}
    assert small <= big and len(small) == min(n, len(ids))


@given(rows=st.lists(st.tuples(st.sampled_from("xy"), st.integers(0, 50)),
                     min_size=1, max_size=30))
@SLOW
def test_digest_permutation_invariant_duplicate_sensitive(spark, rows):
    """topic_digest is invariant under row order but NOT under
    duplicating a row (the sum-checksum contract)."""
    from incubator_pulsar_spark.operators.digest import topic_digest

    df = spark.createDataFrame([Row(t=t, k=k) for t, k in rows],
                               "t STRING, k LONG")
    rev = spark.createDataFrame([Row(t=t, k=k) for t, k in reversed(rows)],
                                "t STRING, k LONG").repartition(3)
    d1 = {r.t: (r.n_rows, r.checksum)
          for r in topic_digest(df, ["t"], ["k"]).collect()}
    d2 = {r.t: (r.n_rows, r.checksum)
          for r in topic_digest(rev, ["t"], ["k"]).collect()}
    assert d1 == d2
    duped = spark.createDataFrame(
        [Row(t=t, k=k) for t, k in rows + [rows[0]]], "t STRING, k LONG")
    d3 = {r.t: (r.n_rows, r.checksum)
          for r in topic_digest(duped, ["t"], ["k"]).collect()}
    assert d3[rows[0][0]] != d1[rows[0][0]]


@given(rows=st.lists(st.tuples(st.integers(0, 10 ** 6),
                               st.sampled_from("xyz"),
                               st.integers(1, 50),
                               st.integers(0, 9)),
                     min_size=2, max_size=60, unique_by=lambda r: r[0]),
       budget=st.integers(0, 400))
@SLOW
def test_token_budget_prefix_and_monotone(spark, rows, budget):
    """token_budget_select == the naive (quality DESC, md5, id) prefix
    cut, and selections are monotone in budget (smaller budget =>
    subset) — the property a curation pipeline relies on when it
    re-runs with a bigger budget."""
    import hashlib

    from incubator_pulsar_spark.functions import sampling

    df = spark.createDataFrame(
        [Row(doc_id=i, dom=d, toks=t, q=float(q)) for i, d, t, q in rows],
        "doc_id LONG, dom STRING, toks LONG, q DOUBLE")

    def naive(b):
        kept = {}
        by_dom: dict[str, list] = {}
        for i, d, t, q in rows:
            by_dom.setdefault(d, []).append((i, t, q))
        for d, rs in by_dom.items():
            rs.sort(key=lambda r: (
                -r[2], hashlib.md5(f"budget:{r[0]}".encode()).hexdigest(),
                r[0]))
            cum = 0
            for i, t, _ in rs:
                cum += t
                if cum <= b:
                    kept[i] = t
        return kept

    got = {r.doc_id: r.n_tokens_sel for r in sampling.token_budget_select(
        df, budget, quality_col="q", token_col="toks", id_col="doc_id",
        domain_col="dom", n_buckets=4).collect()}
    assert got == naive(budget)
    smaller = {r.doc_id for r in sampling.token_budget_select(
        df, budget // 2, quality_col="q", token_col="toks",
        id_col="doc_id", domain_col="dom", n_buckets=4).collect()}
    assert smaller <= set(got)


@given(ids=st.lists(st.integers(0, 10 ** 6), min_size=1, max_size=50,
                    unique=True),
       n_shards=st.integers(1, 6))
@SLOW
def test_shuffle_shards_is_permutation(spark, ids, n_shards):
    """shuffle_shards emits every row exactly once with contiguous
    1..k positions per shard, and the assignment matches the md5
    model — i.e. it IS a deterministic permutation."""
    import hashlib

    from incubator_pulsar_spark.functions import sampling

    df = spark.createDataFrame([Row(doc_id=i) for i in ids], "doc_id LONG")
    out = sampling.shuffle_shards(df, n_shards, id_col="doc_id").collect()
    assert sorted(r.doc_id for r in out) == sorted(ids)
    per_shard: dict[int, list] = {}
    for r in out:
        h = hashlib.md5(f"shuffle:{r.doc_id}".encode()).hexdigest()
        assert int(h[:8], 16) % n_shards == r.shard
        per_shard.setdefault(r.shard, []).append((r.pos, h))
    for s, ps in per_shard.items():
        ps.sort()
        assert [p for p, _ in ps] == list(range(1, len(ps) + 1))
        assert [h for _, h in ps] == sorted(h for _, h in ps)

"""Fuzzy / near-duplicate detection: shingles, MinHash+LSH, n-gram
Jaccard, SimHash.

Design constraints:
- Deterministic and oracle-reproducible: the "random" hash family is
  ``md5(shingle || '#' || seed)`` and MinHash takes the lexicographic min
  of the hex digests — a valid min-wise permutation family that any ANSI
  SQL engine can replay bit-for-bit (the harness cross-checks DuckDB).
- Scale: the MinHash path never materializes the O(n²) pair space. Per
  doc: shingle explode (map-side), one groupBy(doc) for signatures, one
  self-join on (band_id, band_hash) whose output is only the candidate
  pairs. Exact Jaccard verification joins shingle sets only for
  candidates. This is the standard LSH pipeline (Broder '97 / MMDS ch.3)
  expressed as three hash shuffles, each AQE-coalesced.
- For 100 TB, the shingle explode dominates; shingles are hashed to
  32-hex strings immediately so the shuffle carries fixed-width keys,
  and band signatures collapse to one md5 per band.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import normalize_text


def char_shingles(norm: Column, k: int = 5) -> Column:
    """Distinct character k-grams of an ALREADY-NORMALIZED text column
    (Broder shingling).

    Pure column expr: sequence+transform, no UDF. Documents shorter than
    k yield a single shingle = the whole text (so empty/tiny docs still
    participate instead of vanishing).

    The argument must be a materialized column, not a nested expression:
    Catalyst inlines the argument into the per-element lambda, so passing
    ``normalize_text(text)`` directly would re-run the regexp once per
    shingle position (~300× per doc — measured 9s→1s at sf0.1).

    Implementation: split to a char array, then slice+join per position.
    ``substring(norm, i, k)`` is O(i) per call (UTF-8 indexing scans
    from the string start), making per-position substrings O(n²) per
    document; array slice is O(k) — measured 2.5s→0.8s at sf0.1 with
    bit-identical output. The char array must ALSO be a materialized
    column when hot (``shingle_table`` passes ``chars=``) or the split
    re-runs per position — same inlining trap as ``norm``.
    """
    return _shingles_from_chars(F.split(norm, ""), k)


def _shingles_from_chars(chars: Column, k: int) -> Column:
    idx = F.sequence(F.lit(1), F.greatest(F.size(chars) - F.lit(k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(chars, i, k), ""))
    )


def shingle_table(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
                  k: int = 5) -> DataFrame:
    """(doc_id, shingle) exploded — distinct per doc.

    Per-doc distinct happens in the array (array_distinct) BEFORE the
    explode — no (doc_id, shingle) DISTINCT shuffle is ever needed.
    """
    from ..session import ensure_parallelism

    docs = ensure_parallelism(docs)
    chared = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalize_text(F.col(text_col)), "").alias("_chars"),
    )
    return chared.select(
        "doc_id",
        F.explode(_shingles_from_chars(F.col("_chars"), k)).alias("shingle"),
    )


def minhash_signatures(docs: DataFrame, *, id_col: str = "doc_id",
                       text_col: str = "text", k: int = 5,
                       num_hashes: int = 16) -> DataFrame:
    """MinHash signature per doc: sig_i = min(md5(shingle || '#i')).

    One explode + one groupBy(doc_id) hash agg (partial agg keeps a
    single 32-byte min per hash per task — memory-bounded like the
    reference's two-phase compaction trick).
    """
    sh = shingle_table(docs, id_col=id_col, text_col=text_col, k=k)
    # Derive the hash family from ceil(num_hashes/4) digests: each md5 is
    # 32 hex chars = four disjoint 8-hex (32-bit) slices, and lexicographic
    # min on fixed-width hex == numeric min. 4 digests replace 16 per-seed
    # md5 calls — the hash cost on the exploded shingle table drops 4×.
    n_digests = (num_hashes + 3) // 4
    digests = [
        F.md5(F.concat(F.col("shingle"), F.lit("#" * d))) for d in range(n_digests)
    ]
    aggs = [
        F.min(F.substring(digests[i // 4], (i % 4) * 8 + 1, 8)).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def band_table(docs: DataFrame, *, id_col: str = "doc_id",
               text_col: str = "text", k: int = 5, num_hashes: int = 16,
               bands: int = 4) -> DataFrame:
    """The banded LSH signature table (doc_id, band_id, band_hash) —
    the shared kernel of ``lsh_candidate_pairs`` (self-join form) and
    the persisted incremental index (``write_minhash_index``)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, id_col=id_col, text_col=text_col, k=k,
                              num_hashes=num_hashes)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"sig_{i}")
                 for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(F.struct(
            F.lit(b).alias("band_id"),
            F.md5(F.concat_ws("|", *parts)).alias("band_hash")))
    return sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_hash")


def lsh_candidate_pairs(docs: DataFrame, *, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 5,
                        num_hashes: int = 16, bands: int = 4) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: docs sharing any band
    signature. Output: (doc_a, doc_b) with doc_a < doc_b, distinct.

    rows-per-band = num_hashes/bands; collision in a band ⇒ candidate.
    The self-join is on (band_id, band_hash) — equi-join, hash shuffle,
    and the band groups are tiny, so no O(n²) blowup for non-dup corpora.
    """
    banded = band_table(docs, id_col=id_col, text_col=text_col, k=k,
                        num_hashes=num_hashes, bands=bands)
    # The self-join would otherwise recompute the whole shingle→signature
    # pipeline for BOTH sides (no ReusedExchange across the join — audited
    # with tools/explain_audit.py). The banded table is tiny relative to
    # the corpus (bands × ~50 bytes per doc, no text), so persisting it is
    # the standard LSH practice at any scale; MEMORY_AND_DISK spills
    # rather than OOMs on huge corpora.
    from pyspark import StorageLevel

    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)

    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on=["band_id", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def df_cut_candidates(docs: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 5,
                      max_df: float = 0.05) -> DataFrame:
    """Candidate pairs sharing ≥1 RARE shingle (document frequency ≤
    ``max_df``·N) — the df-cut that tames the inverted index on
    low-diversity corpora.

    SCALING.md measured exact all-pairs Jaccard going ×13.7 on 10×
    docs because hot shingles (31-word vocabulary → 1763 shingles in
    >100 docs each) make the candidate set ~N². Hot shingles carry no
    discriminating signal, so dropping them from CANDIDATE GENERATION
    (never from verification — feed this to ``jaccard_pairs(...,
    candidates=)``, which recomputes exact Jaccard over FULL shingle
    sets) collapses the pair stream while keeping every reported value
    exact. Recall < 1 only for pairs whose every common shingle is
    hot; such pairs are near-dups of boilerplate, the thing a cleanup
    pipeline deliberately ignores.
    """
    sh = shingle_table(docs, id_col=id_col, text_col=text_col, k=k)
    cut = F.greatest(F.lit(1), F.floor(F.lit(max_df) * docs.count()))
    rare = (sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= cut).select("shingle"))
    shr = sh.join(rare, on="shingle")
    a, b = shr.alias("a"), shr.alias("b")
    return (
        a.join(b, on="shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_pairs(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
                  k: int = 5, threshold: float = 0.5,
                  candidates: DataFrame | None = None,
                  max_df: float | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle
    (inverted-index join — never enumerates non-overlapping pairs).

    If ``candidates`` (doc_a, doc_b) is given (e.g. LSH output), verifies
    only those — the scale path: LSH prune then exact verify.
    ``max_df`` (mutually exclusive with ``candidates``) builds the
    candidate set with ``df_cut_candidates`` — the knob for corpora
    whose hot shingles would otherwise make the pair stream quadratic.
    Either way every reported jaccard is EXACT (full shingle sets).
    Output: (doc_a, doc_b, jaccard) with jaccard >= threshold, rounded to
    6 places for cross-engine comparability.
    """
    if max_df is not None:
        if candidates is not None:
            raise ValueError("pass either candidates or max_df, not both")
        candidates = df_cut_candidates(docs, id_col=id_col, text_col=text_col,
                                       k=k, max_df=max_df)
    # The shingle table feeds three plan branches (both join sides +
    # sizes). Recomputing it 3× is DELIBERATE: persisting the exploded
    # 1M-row table was measured 6× SLOWER (cache ser/deser + losing scan
    # pushdown outweigh the ~1s regeneration). Persist pays off only for
    # small derived tables — see the banded signatures in
    # lsh_candidate_pairs.
    sh = shingle_table(docs, id_col=id_col, text_col=text_col, k=k)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))

    # prune BEFORE the quadratic join, not after the aggregation: the
    # inverted index shrinks to candidate docs (full shingle sets kept,
    # so intersection counts stay exact), and the pair stream is
    # restricted to candidate pairs before the count
    sh_j = sh
    if candidates is not None:
        cand_docs = candidates.select(
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id")).distinct()
        sh_j = sh.join(cand_docs, on="doc_id")

    a = sh_j.alias("a")
    b = sh_j.alias("b")
    pair_stream = (
        a.join(b, on="shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    if candidates is not None:
        pair_stream = pair_stream.join(candidates, on=["doc_a", "doc_b"])
    inter = pair_stream.groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("n_common"))

    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common").cast("double")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def prefix_filter_candidates(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    k: int = 5, threshold: float = 0.5,
) -> DataFrame:
    """EXACT candidate generation by prefix filtering (the AllPairs /
    PPJoin principle — Bayardo et al. WWW'07, Chaudhuri et al. SSJoin;
    public algorithms): under any global total order on shingles, two
    sets with Jaccard ≥ t MUST share a shingle within their first
    ``|S| − ⌈t·|S|⌉ + 1`` elements. Joining only those prefixes yields a
    candidate superset with zero false negatives, while hot shingles
    (the quadratic blowup of a full inverted-index join) almost never
    appear in a rarest-first prefix.

    Order: ascending global frequency, shingle as tiebreak — rarest
    first minimizes candidates (the standard heuristic).
    """
    sh = shingle_table(docs, id_col=id_col, text_col=text_col, k=k)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    ranked = (
        sh.join(freq, on="shingle")
        .withColumn("pos", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    )
    prefix_len = F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
    prefix = ranked.filter(F.col("pos") <= prefix_len).select("doc_id", "shingle")
    a = prefix.alias("a")
    b = prefix.alias("b")
    return (
        a.join(b, on="shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_pairs_prefix(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    k: int = 5, threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard pairs via prefix-filter-then-verify: IDENTICAL
    result to ``jaccard_pairs`` (no recall loss, unlike LSH pruning),
    with the quadratic hot-shingle join replaced by a prefix join.
    Candidates are materialized once (localCheckpoint) because the
    verify step references them on two plan branches.

    WHEN TO USE (measured, sf0.1 documents, identical outputs): prefix
    length is ``|S| − ⌈t·|S|⌉ + 1``, so pruning power is ~(1−t)·|S|.
    At t=0.4 the prefix is 60% of every set — the candidate join nearly
    reproduces the full inverted index PLUS the freq/rank overhead
    (33s full vs 245s prefix: 7× WORSE). At t≥0.8 the prefix is ≤20%
    of each set and this is the standard exact-similarity-join win.
    Rule: prefix filter for high-threshold near-dup mining; plain
    inverted-index join (or LSH-prune + verify, recall<1) for low
    thresholds."""
    cand = prefix_filter_candidates(
        docs, id_col=id_col, text_col=text_col, k=k, threshold=threshold
    ).localCheckpoint(eager=True)
    return jaccard_pairs(docs, id_col=id_col, text_col=text_col, k=k,
                         threshold=threshold, candidates=cand)


def jaccard_pairs_auto(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    k: int = 5, threshold: float = 0.5, prefix_cutoff: float = 0.7,
    df_cut_docs: int = 10_000, max_df: float = 0.05,
) -> DataFrame:
    """Jaccard pairs with the physical strategy picked automatically —
    the safe path is the default path at every (threshold, size):

    - threshold ≥ ``prefix_cutoff``: prefix-filter-then-verify (exact,
      no recall loss; prefixes ≤ 30% of each set prune hard);
    - low threshold, corpus ≤ ``df_cut_docs``: plain inverted-index
      join (exact; small enough that hot shingles can't hurt);
    - low threshold, corpus > ``df_cut_docs``: ``max_df`` df-cut
      candidates then exact verify — the same auto-escalation rule as
      ``cosine_neardup_pairs`` switching to LSH blocking. Every
      REPORTED jaccard is still exact (full shingle sets); recall < 1
      only for pairs whose every common shingle sits in > ``max_df``·N
      docs — boilerplate near-dups by construction (the SCALING.md §1
      quadratic-candidate pathology this cut exists to kill).

    Pin behavior explicitly with ``jaccard_pairs(...)`` /
    ``jaccard_pairs(..., max_df=...)`` / ``jaccard_pairs_prefix`` when
    the corpus size is already known. The size probe is one count()
    pass (the cosine_neardup_pairs precedent)."""
    if threshold >= prefix_cutoff:
        return jaccard_pairs_prefix(docs, id_col=id_col, text_col=text_col,
                                    k=k, threshold=threshold)
    if docs.count() > df_cut_docs:
        return jaccard_pairs(docs, id_col=id_col, text_col=text_col,
                             k=k, threshold=threshold, max_df=max_df)
    return jaccard_pairs(docs, id_col=id_col, text_col=text_col,
                         k=k, threshold=threshold)


def simhash16(text: Column, k_prefix: int = 4) -> Column:
    """16-bit SimHash over word tokens, md5-based and oracle-portable.

    For each token take the first ``k_prefix`` hex chars of md5(token)
    (16 bits); each bit votes ±1; the sign of each bit-sum forms the
    fingerprint. Hamming-close fingerprints ⇒ near-dup texts (Charikar
    2002). 16 bits keeps the SQL oracle tractable; the engine-internal
    64-bit variant is simhash64 (xxhash64-based, not oracle-checked).
    """
    n_bits = 4 * k_prefix
    tokens = F.regexp_extract_all(F.lower(text), F.lit(r"[a-z0-9]+"), 0)

    def votes(h):
        # ±1 vote per bit from the token's hex digest, MSB-first per char
        out = []
        for bit in range(n_bits):
            dp = bit // 4             # which hex char holds this bit
            bd = 3 - (bit % 4)        # hex char is 4 bits, MSB-first
            d = F.instr(F.lit("0123456789abcdef"), F.substring(h, dp + 1, 1)) - 1
            out.append(F.when(F.floor(d / (2 ** bd)) % 2 == 1, 1).otherwise(-1))
        return F.array(*out)

    # ONE fold over pre-hashed digests accumulating all bit-sums at once.
    # Two traps measured here (Catalyst inlines expression references):
    # per-bit folds re-evaluate regexp+md5 16×, and hashing inside the
    # fold re-evaluates md5 per VOTE — so hash in a transform first (the
    # lambda variable h below is a bound value, free to reference 16×).
    hexes = F.transform(tokens, lambda t: F.substring(F.md5(t), 1, k_prefix))
    zero = F.array(*[F.lit(0)] * n_bits)
    sums = F.aggregate(
        hexes, zero,
        lambda acc, h: F.zip_with(acc, votes(h), lambda a, v: a + v),
    )
    total = F.aggregate(
        F.zip_with(sums, F.array(*[F.lit(2 ** b) for b in range(n_bits)]),
                   lambda s, w: F.when(s > 0, w).otherwise(F.lit(0))),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )
    return F.when(F.size(tokens) > 0, total).otherwise(F.lit(0).cast("long"))


def simhash64(text: Column) -> Column:
    """64-bit SimHash via xxhash64 — the production-scale variant (fast
    JVM hash, no string materialization). Not ANSI-portable; verified by
    property tests instead of the SQL oracle."""
    tokens = F.regexp_extract_all(F.lower(text), F.lit(r"[a-z0-9]+"), 0)
    # hash once per token (transform), then ONE fold accumulating all 64
    # bit-sums — a per-bit fold would re-run regexp + xxhash64 64× (see
    # simhash16 for the measured Catalyst-inlining trap)
    hashes = F.transform(tokens, F.xxhash64)
    zero = F.array(*[F.lit(0)] * 64)

    def votes(h):
        # h is a bound lambda variable (a value, not an expression tree)
        # so 64 references cost nothing
        return F.array(*[
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            for b in range(64)
        ])

    sums = F.aggregate(
        hashes, zero,
        lambda acc, h: F.zip_with(acc, votes(h), lambda a, v: a + v),
    )
    weights = F.array(*[F.lit(2 ** b).cast("decimal(38,0)") for b in range(64)])
    return F.aggregate(
        F.zip_with(sums, weights,
                   lambda s, w: F.when(s > 0, w).otherwise(F.lit(0).cast("decimal(38,0)"))),
        F.lit(0).cast("decimal(38,0)"), lambda acc, x: acc + x,
    )


def levenshtein_blocked_pairs(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    prefix_len: int = 40, max_dist: int = 8, block_words: int = 2,
) -> DataFrame:
    """Record linkage by edit distance, made tractable by blocking.

    All-pairs Levenshtein is O(N²·L²) — never viable. The standard
    record-linkage decomposition (Fellegi–Sunter blocking): group rows
    into small blocks by a cheap deterministic key, verify the expensive
    distance only within a block. Here the block key is the first
    ``block_words`` WORDS of the normalized text and the verifier is
    Levenshtein over the ``prefix_len``-char normalized prefix — recall
    is defined by the blocking (pairs edited inside the block key are
    unseen, the documented Fellegi-Sunter trade; swap in
    `lsh_candidate_pairs` as the candidate source when edits may hit
    the leading words).

    Sizing ``block_words``: expected candidates ~ N²/(2·V^block_words)
    for an (unrealistically) flat V-word lead-vocabulary — the gated
    31-word fixture measured 417 k candidates at 1 word vs 14 k at 2
    words for 5 000 docs, with 256/256 identical verified pairs. Real
    corpora have Zipfian leads; raise block_words (or pre-filter
    stopword leads à la `df_cut_candidates`) when a hot block's pair
    space shows up in the shuffle.

    Scale shape: one equi-join on the block key (shuffle hash join —
    never a cartesian), distance evaluated JVM-side (`F.levenshtein`,
    whole-stage codegen) on fixed-width prefixes so the comparison cost
    is O(prefix_len²) per candidate, independent of document size.

    Output: (doc_a, doc_b, lev) for in-block pairs with distance ≤
    ``max_dist``, doc_a < doc_b.
    """
    norm = normalize_text(F.col(text_col))
    b = docs.select(
        F.col(id_col),
        F.substring_index(norm, " ", block_words).alias("_blk"),
        F.substring(norm, 1, prefix_len).alias("_pfx"),
    )
    a, c = b.alias("a"), b.alias("b")
    return (
        a.join(c, (F.col(f"a._blk") == F.col(f"b._blk"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("doc_a"),
                F.col(f"b.{id_col}").alias("doc_b"),
                F.levenshtein(F.col("a._pfx"), F.col("b._pfx")).alias("lev"))
        .filter(F.col("lev") <= max_dist)
        .select("doc_a", "doc_b", F.col("lev").cast("int").alias("lev"))
    )


def exact_dedup_docs(docs: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Exact dedup: keep the lowest-id doc per normalized-text fingerprint.

    Shuffle carries (32-byte fingerprint, id) only; winners join back to
    payloads — at 100 TB the payload never moves through the shuffle.
    """
    fp = docs.select(F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fp"))
    winners = fp.groupBy("fp").agg(F.min(id_col).alias(id_col))
    return docs.join(winners.select(id_col), on=id_col, how="inner")


def connected_components(
    edges: DataFrame, *, src_col: str = "doc_a", dst_col: str = "doc_b",
    all_ids: DataFrame | None = None, id_col: str = "doc_id",
    max_iter: int = 50, broadcast_labels: bool = False,
) -> DataFrame:
    """Near-dup CLUSTER resolution: connected components over verified
    pair edges — the step that turns pairwise similarities into "keep
    one canonical document per duplicate cluster".

    Min-label propagation: every node starts labeled with its own id;
    each round takes the min of its label and its neighbors' labels;
    converged when nothing changes. Output: (id, cluster) where
    ``cluster`` is the smallest reachable id (the canonical member).
    ``all_ids`` adds isolated documents as their own singleton clusters.

    Scale: one hash-shuffle join per round; rounds = graph DIAMETER,
    and near-dup clusters are shallow (near-cliques — a handful of
    rounds even at billions of docs; this is the standard
    GraphX-connected-components recipe without the GraphX dependency).
    Labels are ``localCheckpoint``-ed each round to truncate lineage —
    swap for reliable ``checkpoint`` on a cluster.

    ``broadcast_labels=True`` broadcasts the label table into both
    per-round joins — the right call when the NODE set is dimension-
    sized (the nations gate: 25 labels) so each round is a map-only
    job instead of two shuffles; leave False when nodes scale with the
    corpus (the near-dup callers). Convergence is detected on a
    ``_chg`` flag computed inside the checkpointed round frame (one
    cheap filter-count on materialized data, optimization r13 — the
    former old-vs-new join re-ran a shuffle per round just to count
    changes).
    """
    sym = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b")).unionAll(
        edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
    # the edge list joins into EVERY propagation round — materialize it
    # once or the full upstream lineage (e.g. the n-gram Jaccard
    # pipeline) re-executes per round (measured 34s → 9s at sf0.1)
    sym = sym.localCheckpoint(eager=True)
    if all_ids is not None:
        nodes = all_ids.select(F.col(id_col).alias("id")).distinct()
    else:
        nodes = sym.select(F.col("a").alias("id")).distinct()
    labels = nodes.withColumn("label", F.col("id"))
    _maybe_b = F.broadcast if broadcast_labels else (lambda df: df)
    for _ in range(max_iter):
        nb_min = (
            sym.join(_maybe_b(labels.withColumnRenamed("id", "b_id")),
                     F.col("b") == F.col("b_id"))
            .groupBy("a").agg(F.min("label").alias("nb_min"))
        )
        new_labels = (
            labels.join(_maybe_b(nb_min), labels["id"] == nb_min["a"],
                        "left")
            .select(labels["id"],
                    F.least(F.col("label"),
                            F.coalesce(F.col("nb_min"),
                                       F.col("label"))).alias("label"),
                    (F.col("nb_min").isNotNull()
                     & (F.col("nb_min") < F.col("label"))).alias("_chg"))
        )
        # lazy checkpoint: the _chg count materializes the marked RDD
        # in the same job (one driver job per round instead of two —
        # optimization r14); later references reuse the truncated RDD
        new_labels = new_labels.localCheckpoint(eager=False)
        n_changed = new_labels.filter(F.col("_chg")).count()
        labels = new_labels.drop("_chg")
        if n_changed == 0:
            break
    return labels.select(F.col("id"), F.col("label").alias("cluster"))


_INDEX_META = "_index_meta.json"


def write_minhash_index(docs: DataFrame, path: str, *,
                        id_col: str = "doc_id", text_col: str = "text",
                        k: int = 5, num_hashes: int = 16,
                        bands: int = 4) -> None:
    """Persist the banded LSH index — the INCREMENTAL-dedup primitive:
    once the corpus's (band_id, band_hash, doc_id) table is on disk, a
    new batch of documents is checked for near-dups against the WHOLE
    indexed corpus by banding the batch map-side and equi-joining the
    index — the corpus text is never rescanned, and index size is
    bands·~50 B per doc (0.00x of corpus bytes at any scale).

    Parameters are pinned in a JSON sidecar; probe/append verify them
    so two incompatible hash families can never silently join.
    """
    import json as _json
    import os as _os

    banded = band_table(docs, id_col=id_col, text_col=text_col, k=k,
                        num_hashes=num_hashes, bands=bands)
    banded.write.mode("overwrite").partitionBy("band_id").parquet(path)
    with open(_os.path.join(path, _INDEX_META), "w") as f:
        _json.dump({"k": k, "num_hashes": num_hashes, "bands": bands}, f)


def _load_index_meta(path: str) -> dict:
    import json as _json
    import os as _os

    with open(_os.path.join(path, _INDEX_META)) as f:
        return _json.load(f)


def append_minhash_index(docs: DataFrame, path: str, *,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> None:
    """Band a new batch with the index's pinned parameters and append —
    O(batch), never touches existing index rows."""
    meta = _load_index_meta(path)
    banded = band_table(docs, id_col=id_col, text_col=text_col, **meta)
    banded.write.mode("append").partitionBy("band_id").parquet(path)


def probe_minhash_index(spark, docs: DataFrame, path: str, *,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Near-dup candidates between a NEW batch and the indexed corpus:
    batch bands map-side, one equi-join on (band_id, band_hash) against
    the index, distinct pairs. Cost is O(batch + matched bands) —
    corpus-size-independent apart from the index scan, which is the
    narrow 3-column table. Pairs where the batch doc is itself already
    indexed (re-probe after append) drop the self-match.

    Output: (probe_id, indexed_id) distinct. Verification (exact
    Jaccard on the pair set) composes downstream exactly as with
    ``lsh_candidate_pairs``; recall properties are identical — same
    family, same banding.
    """
    meta = _load_index_meta(path)
    banded = band_table(docs, id_col=id_col, text_col=text_col, **meta)
    idx = spark.read.parquet(path).select(
        F.col("doc_id").alias("indexed_id"), "band_id", "band_hash")
    return (
        banded.select(F.col("doc_id").alias("probe_id"), "band_id",
                      "band_hash")
        .join(idx, ["band_id", "band_hash"])
        .filter(F.col("probe_id") != F.col("indexed_id"))
        .select("probe_id", "indexed_id")
        .distinct()
    )


def compact_minhash_index(spark, index_path: str) -> int:
    """Consolidate a STOPPED candidate stream's per-batch band
    directories (``batches/_batch_id=N``) into one ``_batch_id=-1``
    directory — the index-maintenance pass that keeps probe-side file
    counts flat as micro-batches accumulate (same small-files story as
    ``operators.maintenance.compact_parquet_dir``, specialised to the
    streaming index layout).

    Correctness with the stream's replay rule: compacted rows carry
    ``_batch_id=-1``, which is strictly smaller than every real batch
    id, so the stream's "probe strictly-earlier batches" filter always
    sees them, and the next batch id (from the checkpoint) is larger
    than anything compacted. Run only while the stream is stopped; the
    whole-directory two-rename swap recovers from a crash on the next
    call. Returns the number of batch directories folded (0 = no-op).
    """
    import os
    import shutil as _shutil

    from pyspark.sql import functions as _F

    root = os.path.join(index_path, "batches")
    old = root + ".pre-compact"
    if os.path.exists(old):              # crashed mid-swap last time
        if os.path.exists(root):
            _shutil.rmtree(old)
        else:
            os.rename(old, root)
    if not os.path.isdir(root):
        return 0
    dirs = [d for d in os.listdir(root) if d.startswith("_batch_id=")]
    if len(dirs) <= 1:
        return 0
    tmp = root + ".compact-tmp"
    (spark.read.parquet(root).drop("_batch_id")
     .withColumn("_batch_id", _F.lit(-1))
     .write.mode("overwrite").partitionBy("_batch_id").parquet(tmp))
    os.rename(root, old)
    os.rename(tmp, root)
    _shutil.rmtree(old)
    return len(dirs)


def containment_pairs(docs: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 5,
                      threshold: float = 0.8, min_shingles: int = 1,
                      candidates: DataFrame | None = None,
                      max_df: float | None = None) -> DataFrame:
    """Directed shingle CONTAINMENT: C(a ⊆ b) = |S_a ∩ S_b| / |S_a|.

    The subset-duplicate detector Jaccard structurally misses: a short
    document fully quoted inside a long one has near-zero Jaccard
    (union is large) but containment 1.0 — the shape of
    quote-extraction dupes, boilerplate-wrapped reposts and
    train-on-test contamination-by-inclusion. Same inverted-index join
    discipline as ``jaccard_pairs`` (pairs sharing ≥1 shingle only,
    never all-pairs; ``candidates=``/``max_df=`` bound hot-shingle
    corpora the same way), with a directed output: (doc_id,
    container_id) rows where doc_id's shingle set sits inside
    container_id's at ≥ ``threshold``. ``min_shingles`` drops trivially
    containable tiny docs. Every reported value is exact (full shingle
    sets), rounded to 6 places for cross-engine comparability.
    """
    if max_df is not None:
        if candidates is not None:
            raise ValueError("pass either candidates or max_df, not both")
        candidates = df_cut_candidates(docs, id_col=id_col, text_col=text_col,
                                       k=k, max_df=max_df)
    sh = shingle_table(docs, id_col=id_col, text_col=text_col, k=k)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    sh_j = sh
    if candidates is not None:
        cand_docs = candidates.select(
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id")).distinct()
        sh_j = sh.join(cand_docs, on="doc_id")
    a = sh_j.alias("a")
    b = sh_j.alias("b")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_id"),
                F.col("b.doc_id").alias("container_id"))
        .groupBy("doc_id", "container_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    cont = F.round(F.col("n_common") / F.col("n_shingles"), 6)
    return (
        inter.join(sizes, on="doc_id")
        .filter(F.col("n_shingles") >= min_shingles)
        .select("doc_id", "container_id",
                F.col("n_shingles").cast("long").alias("n_shingles"),
                F.col("n_common").cast("long").alias("n_common"),
                cont.alias("containment"))
        .filter(F.col("containment") >= threshold)
    )


def minhash_jaccard_estimate(docs: DataFrame, *, id_col: str = "doc_id",
                             text_col: str = "text", k: int = 5,
                             num_hashes: int = 16, bands: int = 4,
                             candidates: DataFrame | None = None,
                             with_exact: bool = True) -> DataFrame:
    """MinHash Jaccard ESTIMATE for candidate pairs: the fraction of
    agreeing signature components — the number production dedup
    actually thresholds on (the exact shingle-set join is the
    verification path, not the scale path: signatures are
    num_hashes·4 bytes per doc vs the full shingle set).

    Candidates default to the LSH band pairs (so the whole chain is
    signature-driven end to end). ``with_exact=True`` joins the exact
    Jaccard alongside for estimator-quality visibility (costs the
    shingle join over candidate docs only — drop it at scale).
    Output: (doc_a, doc_b, n_agree, est_jaccard [, jaccard]).

    E[est] = J and the estimate is a deterministic function of the
    md5 family — same run, any engine, any partitioning.
    """
    if candidates is None:
        candidates = lsh_candidate_pairs(docs, id_col=id_col,
                                         text_col=text_col, k=k,
                                         num_hashes=num_hashes, bands=bands)
    # the candidate pair table feeds THREE lazy branches and the
    # signature table two, so each branch re-derives the shingle→
    # signature→band chain — r13 eagerly checkpointed both, which cut
    # the plan (1169→508 lines) but COST time at bench scale: the
    # driver measured 0.83× (1.73→2.08 s) and the r14 sentinel-
    # normalized A/B confirmed it (norm 2.42 eager / 2.45 lazy / 1.90
    # none — materializing two tables up front loses to recomputing a
    # ~0.3 s chain). Reverted to the lazy form; at corpus scale
    # (where the chain is hours, not 0.3 s) persist the signatures
    # explicitly or pass precomputed ``candidates`` — the operator
    # deliberately does not second-guess that tradeoff with a count.
    sigs = minhash_signatures(docs, id_col=id_col, text_col=text_col,
                              k=k, num_hashes=num_hashes)
    sig_a = sigs.select(F.col("doc_id").alias("doc_a"),
                        *[F.col(f"sig_{i}").alias(f"_a{i}")
                          for i in range(num_hashes)])
    sig_b = sigs.select(F.col("doc_id").alias("doc_b"),
                        *[F.col(f"sig_{i}").alias(f"_b{i}")
                          for i in range(num_hashes)])
    agree = sum(F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0)
                for i in range(num_hashes))
    est = (candidates.join(sig_a, on="doc_a").join(sig_b, on="doc_b")
           .select("doc_a", "doc_b",
                   agree.cast("long").alias("n_agree"))
           .withColumn("est_jaccard",
                       F.round(F.col("n_agree") / F.lit(float(num_hashes)),
                               6)))
    if not with_exact:
        return est
    exact = jaccard_pairs(docs, id_col=id_col, text_col=text_col, k=k,
                          threshold=0.0, candidates=candidates)
    return (est.join(exact, on=["doc_a", "doc_b"], how="left")
            .select("doc_a", "doc_b", "n_agree", "est_jaccard",
                    F.coalesce(F.col("jaccard"), F.lit(0.0))
                    .alias("jaccard")))


def neardup_keep_best(docs: DataFrame, pairs: DataFrame,
                      score_col: str, *, id_col: str = "doc_id",
                      src_col: str = "doc_a", dst_col: str = "doc_b",
                      higher_is_better: bool = True) -> DataFrame:
    """Quality-aware dedup cluster resolution: label every document
    with its near-dup cluster and keep the HIGHEST-SCORING member —
    the step real pipelines ship instead of keep-lowest-id (when a
    page is crawled five times, you keep the cleanest capture, not the
    smallest doc_id).

    ``pairs`` is any verified pair table (exact Jaccard, LSH-verified,
    containment); clusters come from ``connected_components``;
    selection is a deterministic window: (score DESC|ASC, doc_id) —
    score ties fall back to the lowest id, so the output is stable
    under any partitioning. Output: (doc_id, cluster_id, score, keep);
    singletons keep themselves.
    """
    cc = connected_components(pairs, src_col=src_col, dst_col=dst_col,
                              all_ids=docs, id_col=id_col)
    scored = cc.join(
        docs.select(F.col(id_col).alias("id"),
                    F.col(score_col).alias("_score")), on="id")
    order = (F.col("_score").desc() if higher_is_better
             else F.col("_score").asc())
    w = Window.partitionBy("cluster").orderBy(order, F.col("id"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .select(F.col("id").alias("doc_id"),
                    F.col("cluster").alias("cluster_id"),
                    F.col("_score").alias("score"),
                    (F.col("_rn") == 1).alias("keep")))

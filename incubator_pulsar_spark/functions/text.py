"""Text analysis for training-data pipelines.

All pure column expressions (JVM-side, codegen'd — no Python UDFs):
token counting, quality scoring, language ID, fingerprinting. Designed
so an ANSI-SQL oracle can reproduce every output bit-for-bit (the
correctness harness cross-checks against DuckDB).

Scale: these are map-only — no shuffle, no state; they run at scan
speed and vectorize under whole-stage codegen. At 100 TB that matters
more than constant factors: a single pass annotates every document.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword lists per language for the n-gram/stopword
# language-ID heuristic. Order matters: ties break toward earlier entries.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht", "mit", "sich", "auf"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "una", "por"],
}

# Word-ish tokens: letter runs, digit runs, or single punctuation — a
# BPE-ish pre-tokenizer split (GPT-2 style coarse classes).
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
WORD_PATTERN = r"[a-z]+"


def normalize_text(text: Column) -> Column:
    """Lowercase + collapse whitespace — canonical form for fingerprints."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def char_count(text: Column) -> Column:
    return F.length(text).cast("long")


def word_tokens(text: Column) -> Column:
    """Lowercased alphabetic word list."""
    return F.regexp_extract_all(F.lower(text), F.lit(WORD_PATTERN), 0)


def word_count(text: Column) -> Column:
    return F.size(word_tokens(text)).cast("long")


def token_count(text: Column) -> Column:
    """BPE-ish token count (letter runs / digit runs / punct singletons)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0)).cast("long")


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^A-Za-z0-9\s]"), 0))
    return F.when(F.length(text) > 0,
                  F.round(n_punct.cast("double") / F.length(text), 6)).otherwise(F.lit(0.0))


def stopword_count(text: Column, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(word_tokens(text), lambda x: F.array_contains(arr, x))).cast("long")


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    wc = word_count(text)
    return F.when(wc > 0,
                  F.round(stopword_count(text, lang).cast("double") / wc, 6)).otherwise(F.lit(0.0))


def detect_language(text: Column) -> Column:
    """Stopword-vote language ID over STOPWORDS; 'und' (undetermined) when
    no stopword hits. Ties break by language order (en, de, fr, es)."""
    scores = [(lang, stopword_count(text, lang)) for lang in STOPWORDS]
    best = F.lit("und")
    best_score = F.lit(0).cast("long")
    # fold right-to-left so earlier languages win ties with strict '>'
    for lang, score in reversed(scores):
        cond = score > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, score).otherwise(best_score)
    return best


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: rewards mid-length docs,
    normal punctuation density, and stopword presence (a Gopher-rules-like
    filter reduced to three portable terms)."""
    wc = word_count(text)
    len_term = F.least(wc.cast("double") / F.lit(100.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 2.0, F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
    return F.round((len_term + punct_term + stop_term) / 3.0, 6)


# Conservative, RE2-safe patterns (no lookaround) so DuckDB's regex
# engine reproduces counts bit-for-bit in the oracle.
URL_PATTERN = r"https?://[^\s]+"
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
DIGIT_RUN_PATTERN = r"[0-9]{6,}"


def url_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(URL_PATTERN), 0)).cast("long")


def email_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(EMAIL_PATTERN), 0)).cast("long")


def long_digit_run_count(text: Column) -> Column:
    """Runs of ≥6 digits — ids/phone-ish density, a cheap PII/boilerplate
    signal for corpus filtering."""
    return F.size(F.regexp_extract_all(text, F.lit(DIGIT_RUN_PATTERN), 0)).cast("long")


def pattern_density(text: Column) -> Column:
    """(urls + emails + long digit runs) per 100 words — the filter
    column a training-data pipeline thresholds on (high density ⇒ link
    farms, logs, boilerplate)."""
    hits = (url_count(text) + email_count(text) + long_digit_run_count(text))
    wc = word_count(text)
    return F.when(wc > 0, F.round(hits.cast("double") * 100.0 / wc, 6)) \
        .otherwise(hits.cast("double") * 100.0)


# PII patterns for redaction. RE2-safe AND backtracking-free in spirit:
# no lookaround, no optional groups, fixed separators — so Java regex
# (Spark) and RE2 (DuckDB) agree on every match boundary and the
# redacted text hashes identically across engines.
PHONE_PATTERN = r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
IPV4_PATTERN = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def phone_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(PHONE_PATTERN), 0)).cast("long")


def ipv4_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(IPV4_PATTERN), 0)).cast("long")


def redact_pii(text: Column) -> Column:
    """Redact emails/IPv4s/phones to typed placeholder tokens — the
    standard pre-training scrub pass. Replacement order matters and is
    fixed: emails first (user@host strings contain dots and digits),
    then IPv4 (would otherwise partially match as a phone with '.'
    separators), then phones. Pure regexp_replace — JVM-side, map-only,
    scan-speed at any scale."""
    out = F.regexp_replace(text, EMAIL_PATTERN, "[EMAIL]")
    out = F.regexp_replace(out, IPV4_PATTERN, "[IP]")
    return F.regexp_replace(out, PHONE_PATTERN, "[PHONE]")


def type_token_ratio(text: Column) -> Column:
    """Distinct words / total words — the cheapest repetition signal
    (low TTR ⇒ template/boilerplate text). 1.0 for empty docs."""
    words = word_tokens(text)
    return F.when(F.size(words) > 0,
                  F.round(F.size(F.array_distinct(words)).cast("double") / F.size(words), 6)
                  ).otherwise(F.lit(1.0))


def word_shingles(words: Column, n: int, *, distinct: bool = True) -> Column:
    """n-word shingles from a MATERIALIZED word-array column (distinct
    per doc by default; ``distinct=False`` keeps multiplicity for
    repetition counting).

    Same Catalyst-inlining trap as ``fuzzy.char_shingles``: pass a
    column materialized in a previous select (under the Generate
    barrier), never ``word_tokens(text)`` inline, or the tokenizer
    regex re-runs once per shingle position. Docs shorter than n yield
    one shingle = the whole doc.
    """
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - F.lit(n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(words, i, n), " "))
    return F.array_distinct(grams) if distinct else grams


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of normalized text. Exact-dup key that
    ships 32 bytes through the dedup shuffle instead of the payload."""
    return F.md5(normalize_text(text))


def tfidf_top_terms(docs, *, id_col: str = "doc_id", text_col: str = "text",
                    k: int = 3):
    """Top-k characteristic terms per document by tf·idf — the corpus
    summarization / keyword-extraction pass of a training-data pipeline.

    idf is the RATIONAL variant n_docs/(1+df) rather than the log form:
    one IEEE division + one multiply are bit-identical across engines,
    while ln() can differ in the last ulp between libm implementations
    and flip top-k ranks at near-ties — the oracle hash would be flaky.
    Ties break by term ascending on both engines.

    Scale: explode → two hash aggs (term counts shuffle by (doc, term)
    then by term) → broadcast of the tiny global count → top-k via
    windowed rank per doc. No driver-side data, no UDFs.
    """
    from pyspark.sql import DataFrame, Window  # local: column-only module

    assert isinstance(docs, DataFrame)
    tokens = docs.select(F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("term"))
    tf = tokens.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # document frequency as a window over term instead of a separate
    # agg + join back: one shuffle by term replaces two (agg shuffle +
    # join re-shuffle of tf) — 5 → 4 total exchanges, identical values,
    # and no vocabulary-sized join side to mis-broadcast at corpus scale
    df_col = F.count(F.lit(1)).over(Window.partitionBy("term"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.withColumn("df", df_col)
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col), F.col("term"), F.col("tf"),
            F.round(F.col("tf") * (F.col("n_docs") / (F.lit(1.0) + F.col("df"))), 6)
             .alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", "rank")
    )


def winnow_gram_hashes(chars: Column, *, k: int = 5) -> Column:
    """Positional k-gram hash array for winnowing: first 8 md5 hex chars
    of each k-gram (fixed width ⇒ lexicographic min == numeric min).

    ``chars`` must be a materialized char-array column (the fuzzy.py
    inlining trap). The returned array is safe to explode — Generate
    evaluates it once per row; do NOT feed it into another higher-order
    lambda (project collapse would re-inline the whole transform per
    element — measured as a hang at sf0.01 in the array-only variant).
    """
    n_grams = F.greatest(F.size(chars) - F.lit(k - 1), F.lit(1))
    gram_idx = F.sequence(F.lit(1), n_grams)
    return F.transform(
        gram_idx,
        lambda i: F.substring(F.md5(F.array_join(F.slice(chars, i, k), "")), 1, 8),
    )


def dup_spans(docs, *, k: int = 5, id_col: str = "doc_id",
              text_col: str = "text"):
    """Cross-document repeated-span detection at word granularity — the
    public exact-substring-dedup semantic ("Deduplicating Training Data
    Makes Language Models Better", Lee et al. 2021) approximated on
    word k-grams instead of a suffix array: for every doc pair sharing
    at least one k-gram, report the total positional matches and the
    LONGEST contiguous run of matching k-grams, i.e. the longest shared
    token span (run + k − 1 words).

    Run extraction is the classic dot-plot diagonal trick, in pure
    window algebra both engines share: a positional match (pos_a,
    pos_b) lies on diagonal d = pos_a − pos_b; within a (pair, d)
    group, consecutive pos_a values belong to one run, found by the
    gaps-and-islands key pos_a − row_number().

    Scale shape: grams ship as md5 (32 B) through ONE equi-join
    shuffle; the runs window shuffles only the matched-pair rows
    (corpus-size-independent once near-dup density is fixed). Ubiquitous
    k-grams fan out quadratically per gram — the same df-cut used by
    ``fuzzy.jaccard_pairs(max_df=)`` applies upstream if a corpus has
    boilerplate; the synthetic fixture does not need it. Docs shorter
    than k words degrade to one whole-doc gram (the ``word_shingles``
    convention), so their "span" is the doc itself.
    """
    from pyspark.sql import Window  # local: column-only module

    words_tbl = docs.select(F.col(id_col).alias("doc_id"),
                            word_tokens(F.col(text_col)).alias("_words"))
    grams = words_tbl.select(
        "doc_id",
        F.posexplode(word_shingles(F.col("_words"), k, distinct=False))
         .alias("pos", "gram"))
    g = grams.select("doc_id", "pos", F.md5("gram").alias("_g"))
    a = g.select(F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"),
                 "_g")
    b = g.select(F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b"),
                 "_g")
    m = (a.join(b, "_g")
         .filter(F.col("doc_a") < F.col("doc_b"))
         .select("doc_a", "doc_b", "pos_a",
                 (F.col("pos_a") - F.col("pos_b")).alias("_diag")))
    w = Window.partitionBy("doc_a", "doc_b", "_diag").orderBy("pos_a")
    runs = m.withColumn("_run", F.col("pos_a") - F.row_number().over(w))
    run_len = (runs.groupBy("doc_a", "doc_b", "_diag", "_run")
               .agg(F.count(F.lit(1)).alias("_len")))
    return (
        run_len.groupBy("doc_a", "doc_b")
        .agg(F.sum("_len").cast("long").alias("shared_grams"),
             (F.max("_len") + F.lit(k - 1)).cast("long")
             .alias("longest_span_tokens"))
    )


def top_vocabulary(docs, n: int, *, text_col: str = "text"):
    """Top-n corpus words by frequency (ties broken by word) — the
    reference vocabulary for OOV-rate quality filtering. The global
    rank runs over the AGGREGATED vocabulary (|vocab| rows, corpus-size
    independent), so the single-task window is metadata-scale."""
    from pyspark.sql import Window  # local: column-only module

    words = docs.select(F.explode(word_tokens(F.col(text_col))).alias("w"))
    counts = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    win = Window.orderBy(F.col("n").desc(), "w")
    return (counts.withColumn("_r", F.row_number().over(win))
            .filter(F.col("_r") <= n).select("w"))


def strip_html(text: Column) -> Column:
    """C4-style HTML cleanup: drop <script>/<style> blocks wholesale,
    strip remaining tags, decode the common entities, collapse
    whitespace. Pure regexp_replace chain — map-only scan-speed, and
    each pattern sits in the RE2 ∩ java.util.regex dialect so the SQL
    oracle replays it exactly ((?is) dotall+case, non-greedy, no
    lookbehind)."""
    t = F.regexp_replace(text, r"(?is)<script\b.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b.*?</style>", " ")
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    for ent, rep in [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                     ("&quot;", "\""), ("&#39;", "'"), ("&nbsp;", " ")]:
        t = F.regexp_replace(t, ent, rep)
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def tag_count(text: Column) -> Column:
    """Number of HTML tags in the raw text (markup-density signal for
    quality filtering)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"<[^>]+>"), 0)).cast("long")


def bpe_pair_counts(docs, k: int = 20, *, text_col: str = "text"):
    """The first BPE-trainer merge iteration at corpus scale: corpus-
    frequency-weighted counts of adjacent CHARACTER pairs inside words,
    top-k candidates ranked (count desc, pair asc).

    The scale property BPE trainers rely on: pair counting runs over
    the AGGREGATED word-frequency table (|vocab| rows), never the
    corpus — one corpus scan builds the vocab table, then each merge
    iteration is vocab-sized work. This implements that shape: words →
    (word, freq) → explode the ≤ len−1 in-word pairs → weighted sum.
    Iterating merges (re-segmenting against a learned merge list) is a
    driver loop over the same vocab-table kernel.

    Output: (rank, pair, cnt) — the merge candidates of iteration 1.
    """
    from pyspark.sql import Window  # local: column-only module

    words = docs.select(F.explode(word_tokens(F.col(text_col))).alias("w"))
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    # SQL-expr transform: F.substring takes only Python-int pos, so the
    # per-index slice runs as a SQL lambda (w is a plain column here —
    # words are ≤ ~20 chars, the O(pos) substring walk is noise)
    pairs = vocab.select(
        "freq",
        F.explode(F.expr("transform(sequence(1, length(w) - 1), "
                         "i -> substring(w, i, 2))")).alias("pair"),
    ).filter(F.length("pair") == 2)
    counted = pairs.groupBy("pair").agg(F.sum("freq").alias("cnt"))
    win = Window.orderBy(F.col("cnt").desc(), "pair")
    return (counted.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k)
            .select(F.col("rank").cast("int").alias("rank"), "pair",
                    F.col("cnt").cast("long").alias("cnt")))


def bigram_lm_scores(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document corpus-LM fluency score: mean log₂ P(w₂|w₁) under an
    add-one-smoothed bigram model estimated on the corpus itself — the
    classic perplexity-style quality signal (a document of improbable
    word transitions scores low; boilerplate scores high).

    P(w₂|w₁) = (c(w₁,w₂)+1) / (c(w₁·)+V), with c(w₁·) the count of w₁
    as a bigram PREFIX and V the corpus unigram vocabulary.

    Cross-engine exactness: the per-bigram log-likelihood is snapped to
    integer micro-units (round(log₂p·10⁶) → BIGINT) before summing, so
    the per-document sum is order-independent integer arithmetic on
    both engines — no float-accumulation drift can reach the gate. The
    final score divides that exact sum by 10⁶·n once.

    Scale shape: tokens materialize ONCE per doc (the documented
    Catalyst-inlining trap — slicing an unmaterialized regexp column
    re-runs the regexp per element), bigrams explode map-side, the
    model join keys on the bigram (broadcast under AQE when the
    aggregated model is small; keyed shuffle otherwise), and one keyed
    agg lands the per-doc sums. Corpus-size-independent state: the
    MODEL is |bigram vocab| rows, never the corpus.

    Output: (doc_id, n_bigrams, lm_score) for docs with ≥ 1 bigram.
    """
    ws = docs.select(F.col(id_col), word_tokens(F.col(text_col)).alias("_ws"))
    n = F.size("_ws")
    bigrams = ws.select(
        F.col(id_col),
        F.explode(F.zip_with(
            F.slice("_ws", 1, F.greatest(n - 1, F.lit(0))),
            F.slice("_ws", 2, F.greatest(n - 1, F.lit(0))),
            lambda w1, w2: F.struct(w1.alias("w1"), w2.alias("w2")),
        )).alias("_bg"),
    ).select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))

    c12 = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c12"))
    c1 = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("_c1"))
    vocab = (docs.select(F.explode(word_tokens(F.col(text_col))).alias("_w"))
             .agg(F.countDistinct("_w").alias("_v")))

    model = c12.join(c1, "w1").crossJoin(F.broadcast(vocab)).select(
        "w1", "w2",
        F.round(F.log2((F.col("_c12") + F.lit(1.0)) / (F.col("_c1") + F.col("_v")))
                * F.lit(1000000.0), 0).cast("long").alias("_ll_micro"),
    )
    return (
        bigrams.join(model, ["w1", "w2"])
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("_ll_micro").alias("_s"))
        .select(
            id_col, F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.round(F.col("_s") / (F.lit(1000000.0) * F.col("n_bigrams")), 6)
            .alias("lm_score"),
        )
    )


def oov_rate(docs, vocab, *, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document out-of-vocabulary rate: 1 − (tokens in ``vocab`` /
    word tokens); 0.0 for wordless docs. ``vocab`` broadcasts (it is
    top-n by contract), so the corpus side is explode + map-side join +
    one keyed agg — the scan-speed quality-filter shape."""
    w = docs.select(F.col(id_col),
                    F.explode_outer(word_tokens(F.col(text_col))).alias("_w"))
    v = vocab.select(F.col("w").alias("_vw"))
    hits = w.join(F.broadcast(v), w["_w"] == v["_vw"], "left")
    return (
        hits.groupBy(id_col)
        .agg(F.count("_w").alias("n_words"), F.count("_vw").alias("_n_in"))
        .select(
            id_col,
            F.col("n_words").cast("long").alias("n_words"),
            F.when(F.col("n_words") > 0,
                   F.round(1 - F.col("_n_in") / F.col("n_words"), 6))
            .otherwise(F.lit(0.0)).alias("oov_rate"),
        )
    )


def _bpe_merge_word(symbols: list[str], ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word greedily by rank (the standard BPE
    segmenter: always merge the lowest-rank adjacent pair present)."""
    while len(symbols) > 1:
        best = None
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, i)
        if best is None:
            break
        a, b = symbols[best[1]], symbols[best[1] + 1]
        out, i = [], 0
        while i < len(symbols):
            if i < len(symbols) - 1 and symbols[i] == a and symbols[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


def bpe_train(docs, n_merges: int, *, text_col: str = "text",
              min_freq: int = 2,
              top_m: int | None = None) -> list[tuple[str, str]]:
    """Train a BPE merge list at corpus scale, the way real trainers do:
    ONE distributed pass builds the word-frequency table (the only
    corpus-sized step), then every merge iteration is pure-Python work
    over that vocab dict — corpus-size-independent, exactly the scale
    property ``bpe_pair_counts`` documents. Ties break (count desc,
    pair asc), matching ``bpe_pair_counts``' ranking, so iteration 1 of
    this trainer reproduces that query's top candidate.

    Heaps' law keeps |vocab| sublinear on CLEAN corpora, but a noisy
    web-scale corpus has hundreds of millions of word types (URLs,
    hex hashes, typos) and an unpruned collect OOMs the driver — so,
    like real trainers, the distributed pass prunes BEFORE collecting:
    ``min_freq`` (default 2) drops hapax junk inside the aggregation,
    and ``top_m`` optionally hard-bounds the collect at the m most
    frequent word types (freq desc, word asc — deterministic). Set
    ``min_freq=1, top_m=None`` to reproduce the unpruned reference
    trainer exactly; with pruning, merges learned from words at or
    above the cut are unchanged — only pair counts contributed by the
    pruned tail (rare by construction) can differ.
    """
    words = docs.select(F.explode(word_tokens(F.col(text_col))).alias("w"))
    freqs = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    if min_freq > 1:
        freqs = freqs.filter(F.col("freq") >= min_freq)
    if top_m is not None:
        # global (freq desc, w) order bounded at m rows — a TakeOrdered,
        # never a full sort at the driver
        freqs = freqs.orderBy(F.col("freq").desc(), F.col("w")).limit(top_m)
    vocab_rows = freqs.collect()
    vocab = {r["w"]: (list(r["w"]), int(r["freq"])) for r in vocab_rows}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.values():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(pair)
        rank = {pair: 0}
        vocab = {w: (_bpe_merge_word(syms, rank), f)
                 for w, (syms, f) in vocab.items()}
    return merges


def bpe_encode(docs, merges: list[tuple[str, str]], *,
               id_col: str = "doc_id", text_col: str = "text"):
    """Apply a trained BPE merge list to every document — the
    tokenizer-APPLY path (the trainer's counterpart): per doc, the BPE
    token count and the md5 of the token stream (cheap equality witness
    for tests and downstream dedup-by-tokenization).

    Distributed shape: merges ship as a broadcast rank dict;
    segmentation runs in Arrow batches with a per-batch word cache
    (Zipf reuse makes the cache hit rate high), so the corpus text
    never leaves the executors. Output: (doc_id, n_bpe_tokens,
    token_md5).
    """
    import hashlib

    import pandas as pd

    spark = docs.sparkSession
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)
    pre = docs.select(F.col(id_col).alias("doc_id"),
                      word_tokens(F.col(text_col)).alias("_words"))

    def seg(batches):
        rk = bc.value
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            n_out, h_out = [], []
            for ws in pdf["_words"]:
                toks: list[str] = []
                for w in ws:
                    s = cache.get(w)
                    if s is None:
                        s = _bpe_merge_word(list(w), rk)
                        cache[w] = s
                    toks.extend(s)
                n_out.append(len(toks))
                h_out.append(hashlib.md5(" ".join(toks).encode()).hexdigest())
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "n_bpe_tokens": n_out, "token_md5": h_out})

    return pre.mapInPandas(
        seg, "doc_id long, n_bpe_tokens long, token_md5 string")


def chunk_documents(docs, *, chunk_words: int = 64, stride: int = 48,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Sliding-window document chunking — the context-window prep step
    of an embedding/RAG pipeline: split each doc into word windows of
    ``chunk_words`` starting every ``stride`` words (overlap =
    chunk_words − stride keeps boundary context in two chunks).

    Map-only: the chunk list is a higher-order transform over the
    materialized word array (one Generate, no shuffle, no Python), so
    chunking runs at scan speed at any corpus size. Docs shorter than
    one window yield exactly one whole-doc chunk. Chunk count is
    ⌈max(n_words − overlap, 1) / stride⌉, which covers every word
    because stride ≤ chunk_words (enforced).

    Output: (doc_id, chunk_id, n_words, chunk_md5) — the md5 is the
    join key downstream embedding/dedup stages use, so the text itself
    never needs to ship.
    """
    if not 1 <= stride <= chunk_words:
        raise ValueError("need 1 <= stride <= chunk_words")
    overlap = chunk_words - stride
    pre = docs.select(F.col(id_col).alias("doc_id"),
                      word_tokens(F.col(text_col)).alias("_words"))
    n_chunks = F.greatest(
        F.ceil((F.greatest(F.size("_words") - F.lit(overlap), F.lit(1)))
               / F.lit(stride)), F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(F.col("_words"), i * stride + 1, chunk_words), " "))
    return (
        pre.select("doc_id", F.posexplode(chunks).alias("chunk_id", "_chunk"))
        .select("doc_id", F.col("chunk_id").cast("int").alias("chunk_id"),
                F.when(F.length("_chunk") > 0,
                       F.size(F.split("_chunk", " ")))
                 .otherwise(F.lit(0)).cast("long").alias("n_words"),
                F.md5("_chunk").alias("chunk_md5"))
    )


def bm25_scores(docs, query_terms: list[str], *, id_col: str = "doc_id",
                text_col: str = "text", k1: float = 1.2, b: float = 0.75):
    """Okapi BM25 retrieval scores for a query over the corpus — the
    lexical-retrieval half of a RAG / data-curation stack (the
    embedding ops are the dense half). Lucene-form idf:
    ln((N - df + 0.5)/(df + 0.5) + 1), per-term tf saturation with k1,
    length normalization with b against the average doc length.

    Cross-engine exactness discipline (the tfidf_top_terms ln-parity
    note): idf is snapped to 9 decimals BEFORE use (libm ln can differ
    in the last ulp between engines), avgdl is a round-9 decimal mean,
    and the per-doc sum runs through decimal(27,12) so addend order
    can't move the hash. Scale: explode → term filter (query terms are
    a tiny literal list) → one (doc, term) agg; df piggybacks as a
    term-window count; the corpus stats broadcast as one row. Docs
    with zero query-term hits are absent from the output (a retrieval
    engine returns matches, not the corpus).
    """
    from pyspark.sql import DataFrame, Window  # local: column-only module

    assert isinstance(docs, DataFrame)
    terms = sorted({t.lower() for t in query_terms})
    base = docs.select(F.col(id_col), word_tokens(F.col(text_col)).alias("_w"))
    base = base.withColumn("dl", F.size("_w").cast("long"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum(F.col("dl").cast("decimal(27,12)")).cast("double")
                / F.count(F.lit(1)), 9).alias("avgdl"))
    tokens = (base.select(F.col(id_col), F.col("dl"),
                          F.explode("_w").alias("term"))
              .filter(F.col("term").isin(terms)))
    tf = tokens.groupBy(id_col, "dl", "term").agg(
        F.count(F.lit(1)).alias("tf"))
    df_w = F.count(F.lit(1)).over(Window.partitionBy("term"))
    scored = (tf.withColumn("df", df_w)
              .crossJoin(F.broadcast(stats)))
    idf = F.round(F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5)) + F.lit(1.0)), 9)
    tfn = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b)
                                   + F.lit(b) * F.col("dl") / F.col("avgdl")))
    addend = (idf * tfn).cast("decimal(27,12)")
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits"),
                 F.round(F.sum(addend).cast("double"), 6).alias("score")))


def remove_boilerplate(docs, *, window: int = 3, min_df: int = 3,
                       id_col: str = "doc_id", text_col: str = "text",
                       segment: str = "words"):
    """Corpus-level boilerplate removal at segment granularity — the
    CCNet/C4 paragraph-dedup step (drop lines/paragraphs that repeat
    across many pages: nav bars, cookie banners, footers), re-expressed
    for Spark. Reference framing: this is a data-CURATION op with no
    Pulsar analogue; it complements doc-level dedup (fuzzy.py) by
    cutting WITHIN-doc repeated content.

    ``segment="words"`` (default): segments are consecutive
    non-overlapping ``window``-word chunks of the lowercased word
    stream (suits corpora without line structure, e.g. the test
    fixtures). ``segment="lines"``: the C4/CCNet production mode —
    each trimmed non-empty line of the raw text is one segment
    (``window`` is ignored), and survivors are rejoined with
    newlines. Either way a segment is boilerplate when its exact text
    occurs in >= ``min_df`` DISTINCT documents. Output: one row per
    input doc — (id, clean_text, n_kept, n_removed), with surviving
    segments rejoined in original order.

    Scale: one explode + one (hash-keyed) distinct-doc count + one
    equi-join back + one per-doc reassembly — all hash-partitioned on
    bounded keys. The shuffle carries md5(segment) (16 bytes), never
    segment text; the reassembly groups by doc id, so state per task is
    one doc's segments. No Python, no windows over the whole corpus.
    """
    from pyspark.sql import DataFrame  # local: column-only module

    assert isinstance(docs, DataFrame)
    if segment not in ("words", "lines"):
        raise ValueError(f"segment must be 'words' or 'lines', got {segment!r}")
    if segment == "lines":
        # one line = one segment: split on \r?\n, trim, drop empties —
        # positions keep the ORIGINAL line index so reassembly order is
        # stable even after empty lines vanish
        line_arr = F.split(F.col(text_col), r"\r?\n")
        segs = (docs.select(F.col(id_col),
                            F.posexplode(line_arr).alias("pos", "seg"))
                .withColumn("seg", F.trim(F.col("seg")))
                .filter(F.length("seg") > 0))
        joiner = "\n"
    else:
        toks = word_tokens(F.col(text_col))
        n_segs = F.ceil(F.size("_toks") / F.lit(float(window))).cast("int")
        base = docs.select(F.col(id_col), toks.alias("_toks"))
        # segment in one projection: sequence+slice builds the segment
        # array, posexplode emits (pos, seg) — no self-join, no window
        seg_arr = F.transform(
            F.sequence(F.lit(0), n_segs - 1),
            lambda i: F.array_join(F.slice(F.col("_toks"),
                                           i * window + 1, window), " "))
        segs = (base.filter(F.size("_toks") > 0)
                .select(F.col(id_col),
                        F.posexplode(seg_arr).alias("pos", "seg")))
        joiner = " "
    segs = segs.withColumn("_h", F.md5(F.col("seg")))
    dfc = (segs.groupBy("_h")
           .agg(F.count_distinct(F.col(id_col)).alias("_df")))
    # one aggregation computes kept text, kept count AND total count
    # together (collect_list/count skip the NULLs the boilerplate rows
    # become) — one fewer corpus agg + join than the totals-separately
    # form, and the only scans left are the two sides of the df join
    # plus the final doc spine
    keep_seg = F.when(F.col("_df") < min_df,
                      F.struct(F.col("pos"), F.col("seg")))
    rebuilt = (segs.join(dfc, "_h")
               .groupBy(id_col)
               .agg(F.array_join(
                        F.transform(F.array_sort(F.collect_list(keep_seg)),
                                    lambda s: s["seg"]),
                        joiner).alias("clean_text"),
                    F.count(keep_seg).cast("long").alias("n_kept"),
                    F.count(F.lit(1)).cast("long").alias("_n_segs")))
    out = (docs.select(id_col).join(rebuilt, id_col, "left")
           .select(F.col(id_col),
                   F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
                   F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
                   (F.coalesce(F.col("_n_segs"), F.lit(0))
                    - F.coalesce(F.col("n_kept"), F.lit(0)))
                   .cast("long").alias("n_removed")))
    return out


def hashed_feature_bucket(token: Column, n_buckets: int,
                          salt: str = "qb") -> Column:
    """Hashing-trick feature index (Weinberger et al. 2009): md5 the
    token, take 32 bits, mod the bucket count. Bounds the feature
    space of any text model to ``n_buckets`` regardless of vocabulary
    size — the reason fastText-style classifiers scale to web corpora
    with no vocab pass and no driver-side dictionary."""
    h = F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(salt), token)),
                           1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(n_buckets)).cast("int")


def quality_classifier_scores(docs, *, n_buckets: int = 1024,
                              weights: list[float] | None = None,
                              weight_salt: str = "qw",
                              id_col: str = "doc_id",
                              text_col: str = "text"):
    """Model-based quality scoring via the hashing trick — the shape of
    a fastText / CCNet quality classifier applied at corpus scale:
    score(doc) = mean over tokens of w[bucket(token)], a linear model
    over hashed unigram features.

    ``weights`` is the trained weight table (length ``n_buckets``),
    shipped as ONE broadcast data column — never a literal array (the
    measured literal-codegen trap, see functions/bloom.py). When
    ``weights`` is None a deterministic placeholder table is derived
    from md5: w_b = h_b/2³¹ − 1 ∈ [−1, 1), a dyadic value with full
    32-bit precision — so tests and the oracle can replay the exact
    pipeline without a training artifact; swapping in real trained
    weights changes no plan shape. The dyadic form matters doubly for
    cross-engine parity: (a) w_b·10¹² is never EXACTLY x.5 (that
    would need h_b ≥ 2¹⁸·5¹² > 2³²), so the double→decimal(27,12)
    cast rounds identically under Spark's HALF_UP and DuckDB's
    HALF_EVEN; (b) the per-doc mean sum/n is a messy 12-decimal
    rational, so it essentially never lands exactly halfway at the
    output's 6 decimals — unlike few-decimal weights, whose clean
    quotients DO hit exact halves (measured: 3-decimal weights gave
    -4.047/16 = -0.2529375 and a one-ulp cross-engine flip).

    Output: (id, n_tokens, quality_score round-6, keep) — keep is
    score >= 0. The sum runs through decimal(27,12) so addend order
    cannot move the cross-engine hash. Scale: map-only over the corpus
    (one scan, no shuffle, no vocab state); the weight table is O(2^b)
    bytes broadcast once.
    """
    import hashlib

    from pyspark.sql import DataFrame  # local: column-only module

    assert isinstance(docs, DataFrame)
    if weights is None:
        weights = [
            int(hashlib.md5(f"{weight_salt}:{b}".encode())
                .hexdigest()[:8], 16) / 2.0 ** 31 - 1.0
            for b in range(n_buckets)]
    if len(weights) != n_buckets:
        raise ValueError(f"weights must have n_buckets={n_buckets} entries")
    spark = docs.sparkSession
    wdf = spark.createDataFrame([(weights,)], "_w ARRAY<DOUBLE>")
    toks = word_tokens(F.col(text_col))
    addend = F.transform(
        toks,
        lambda t: F.element_at(
            F.col("_w"), hashed_feature_bucket(t, n_buckets) + 1)
        .cast("decimal(27,12)"))
    total = F.aggregate(addend, F.lit(0).cast("decimal(27,12)"),
                        lambda acc, x: (acc + x).cast("decimal(27,12)"))
    n_tok = F.size(toks).cast("long")
    # divide as DOUBLE on both engines: decimal division has
    # engine-specific result scales/rounding; double-of-exact-decimal
    # divided by an int is bit-identical, and no double is exactly
    # halfway at 6 decimals, so the final round agrees everywhere
    score = F.when(n_tok > 0,
                   F.round(total.cast("double") / n_tok, 6)
                   ).otherwise(F.lit(0.0))
    return (docs.crossJoin(F.broadcast(wdf))
            .select(F.col(id_col), n_tok.alias("n_tokens"),
                    score.alias("quality_score"))
            .withColumn("keep", (F.col("quality_score") >= 0)
                        .cast("boolean")))

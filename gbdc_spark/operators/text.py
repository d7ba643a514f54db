"""Text-analysis operators for large-scale training-data pipelines:
language-ID heuristic, quality scoring, token counting, fingerprinting.

All expressions are JVM-side pyspark.sql.functions (whole-stage
codegen, Catalyst-prunable) — no Python in any path.  Operates on the
driver `documents` table shape (doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "STOPWORDS",
    "with_text_stats",
    "with_lang_guess",
    "with_token_counts",
    "with_fingerprint",
    "with_winnow_fingerprints",
    "ngram_topk",
    "tfidf_topk",
    "source_divergence",
    "vocab_oov",
    "pmi_topk",
    "with_lexical_diversity",
    "zipf_fit",
    "ngram_novelty",
    "word_burstiness",
    "heaps_fit",
    "source_ngram_overlap",
    "rank_fuse",
]

# fixed marker set for the n-gram/stopword language heuristic
STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")


def _words(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: word count, average word length,
    stopword ratio, short-doc flag."""
    w = _words(text_col)
    n_words = F.size(w)
    total_len = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    stop_hits = F.aggregate(
        w,
        F.lit(0),
        lambda acc, x: acc + F.when(x.isin(*STOPWORDS), 1).otherwise(0),
    )
    return (
        df.withColumn("n_words", n_words.cast("long"))
        .withColumn("avg_word_len", (total_len / n_words).cast("double"))
        .withColumn("stopword_ratio", (stop_hits / n_words).cast("double"))
        .withColumn("is_short", (n_words < F.lit(10)).cast("int"))
    )


def with_lang_guess(df: DataFrame, text_col: str = "text",
                    threshold: float = 0.08, out: str = "lang_guess") -> DataFrame:
    """Marker-word language heuristic: stopword density above threshold
    → 'en', else 'unk'.  (A real system swaps in per-language marker
    tables; the Spark plumbing — one pass, no shuffle — is the point.)"""
    w = _words(text_col)
    stop_hits = F.aggregate(
        w, F.lit(0), lambda acc, x: acc + F.when(x.isin(*STOPWORDS), 1).otherwise(0)
    )
    ratio = stop_hits / F.size(w)
    return df.withColumn(out, F.when(ratio > threshold, "en").otherwise("unk"))


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish estimate
    (≈ chars/4, the standard subword heuristic)."""
    w = _words(text_col)
    return (
        df.withColumn("n_ws_tokens", F.size(w).cast("long"))
        .withColumn(
            "n_bpe_est", F.ceil(F.length(F.col(text_col)) / F.lit(4.0)).cast("long")
        )
    )


def with_fingerprint(df: DataFrame, text_col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Canonical-text fingerprint: md5 of lowercased, whitespace-collapsed
    text — the document analogue of CNF::gbdhash content addressing."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.withColumn(out, F.md5(norm))


def ngram_topk(df: DataFrame, text_col: str = "text", n: int = 2,
               k: int = 20) -> DataFrame:
    """Corpus-level top-k word n-grams: shingle JVM-side (no Python),
    explode, count with map-side partial aggregation (Catalyst plans
    groupBy(count) as partial+final HashAggregate around one shuffle of
    the distinct grams, never the rows), deterministic tie-break on the
    gram.  The vocabulary-statistics primitive of corpus curation."""
    words = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return (
        df.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.col("gram"))
        .limit(k)
    )


def with_winnow_fingerprints(df: DataFrame, text_col: str = "text",
                             k: int = 8, window: int = 4,
                             out: str = "winnow_fp") -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS scheme): hash every character k-gram, keep the
    minimum hash of each sliding window of ``window`` k-grams, emit the
    distinct sorted set.  Guarantees every exact match of length
    >= k + window - 1 shares a fingerprint.

    Entirely JVM-side (md5 over substrings + array ops inside
    whole-stage codegen) — this replaced a per-row-per-byte Python UDF.
    """
    from ..functions import bind_once as _bind

    t = F.col(text_col)
    n_grams = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
    hashes = F.transform(
        F.sequence(F.lit(1), n_grams), lambda i: F.md5(F.substring(t, i, k))
    )
    fps = _bind(
        hashes,
        lambda h: F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size(h) - F.lit(window - 1), F.lit(1))),
                    lambda j: F.array_min(F.slice(h, j, window)),
                )
            )
        ),
    )
    return df.withColumn(out, fps)


def tfidf_topk(df: DataFrame, text_col: str = "text", group: str = "source",
               key: str = "doc_id", k: int = 10) -> DataFrame:
    """Characteristic vocabulary per group: top-k terms by TF-IDF with
    the smoothed sklearn-convention IDF, idf = ln((N+1)/(df+1)) + 1
    (N = corpus docs, df = docs containing the term), tf = term
    occurrences within the group.  Deterministic tie-break on the term.

    Returns (group, term, tf, df_docs, tfidf, rank), rank 1..k.

    Scale shape: two independent partial-agg passes over the corpus —
    (group, term) counts and per-doc-distinct term doc frequencies —
    joined on term (both join sides are model-sized: distinct terms,
    not token occurrences).  Two embarrassingly-parallel scans beat
    materializing a (doc, term)-sized intermediate here; N travels as
    a broadcast 1-row cross join; the final top-k is a per-group
    window over ranked model rows.  No Python workers anywhere.
    """
    ws = _words(text_col)
    tf = (
        df.select(F.col(group), F.explode(ws).alias("term"))
        .groupBy(group, "term")
        .agg(F.count("*").alias("tf"))
    )
    docfreq = (
        df.select(F.col(key), F.explode(F.array_distinct(ws)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df_docs"))
    )
    n_docs = df.agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy(group).orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df_docs") + 1)) + 1),
                6,
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group, "term", "tf", "df_docs", "tfidf", "rank")
    )


def source_divergence(df: DataFrame, text_col: str = "text",
                      group: str = "source") -> DataFrame:
    """Training-mixture drift analysis: KL divergence of each group's
    unigram distribution from the corpus distribution,
    KL(P_g || P_corpus) = sum_t p_g(t) * ln(p_g(t) / p_c(t)).
    Well-defined without smoothing — every group term is in the corpus
    by construction, so p_c(t) > 0 wherever p_g(t) > 0.

    Returns (group, n_tokens, n_terms, kl_to_corpus); near-zero KL =
    the group looks like the mixture, large KL = a distributional
    outlier (the per-source screen run before reweighting a mixture).

    Scale shape: one explode feeding a (group, term) partial-agg
    shuffle; corpus term totals, group totals and the grand total are
    all re-aggregations of that model-sized table.  The counts table is
    persisted at the branch point — join-pushed isnotnull filters give
    each branch a differently-canonicalized subtree, so Catalyst's
    ReuseExchange does NOT fire here and an unpersisted plan re-scans
    the corpus once per branch (verified with explain; the plan audit
    asserts the InMemoryTableScan).  With the persist, the corpus is
    scanned exactly once and the four consumers read the model-sized
    cache.  Group totals and the 1-row grand total join back as
    broadcasts.
    """
    from ..functions import persist_slot

    ws = _words(text_col)
    # single-slot persist (functions.persist_slot): a long session
    # holds at most one cached divergence counts table, not one per
    # call, and the previous occupant is retired BEFORE this persist
    counts = persist_slot(
        df.select(F.col(group), F.explode(ws).alias("term"))
        .groupBy(group, "term")
        .agg(F.count("*").alias("c_gt")),
        slot="source_divergence",
    )
    term_tot = counts.groupBy("term").agg(F.sum("c_gt").alias("c_t"))
    group_tot = counts.groupBy(group).agg(
        F.sum("c_gt").alias("n_tokens"), F.count("*").alias("n_terms")
    )
    grand_tot = counts.agg(F.sum("c_gt").alias("n_total"))
    return (
        counts.join(term_tot, "term")
        .join(F.broadcast(group_tot), group)
        .crossJoin(F.broadcast(grand_tot))
        .select(
            F.col(group),
            F.col("n_tokens"),
            F.col("n_terms"),
            (
                (F.col("c_gt") / F.col("n_tokens"))
                * F.log(
                    (F.col("c_gt") / F.col("n_tokens"))
                    / (F.col("c_t") / F.col("n_total"))
                )
            ).alias("term_kl"),
        )
        .groupBy(group, "n_tokens", "n_terms")
        .agg(F.round(F.sum("term_kl"), 6).alias("kl_to_corpus"))
    )


def rank_fuse(
    df: DataFrame,
    key: str = "doc_id",
    ranker_col: str = "ranker",
    score_col: str = "score",
    k: int = 60,
    bucketed: bool | None = None,
    quant: float = 1e6,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR'09)
    over a LONG-form score table (key, ranker, score): each ranker
    contributes ``1 / (k + rank)`` to every doc it scored, and docs
    are fused by the sum — the standard way to combine BM25, embedding
    cosine and heuristic rankings without calibrating their score
    scales (only ranks matter).

    Determinism contract: the contribution is computed in INTEGER
    micro-units ``floor(1e9 / (k + rank))`` so the fused sum is an
    associative integer sum — engine- and partition-order-exact (a
    float 1/(k+rank) sum would differ in the last ulp with summation
    order).  ``rrf_score`` = micro-units / 1e9 as the UNROUNDED
    correctly-rounded double — identical in every IEEE engine because
    the dividend is the shared integer (a decimal re-round here would
    reintroduce half-tie divergence: Spark rounds the decimal string,
    DuckDB the binary double).  Ranks are per-ranker
    (score desc, key asc); NULL scores contribute nothing but the doc
    row survives with ``n_rankers`` counting only real contributions.

    Scale shape: per-ranker ranking via the shared two-phase
    score-bucketed rank (no single-partition window over a
    corpus-sized ranker, ``bucketed``/``quant`` as in
    :func:`~gbdc_spark.operators.quality.ccnet_buckets`), then one
    map-side-combined sum per key.
    """
    from .quality import _group_rank_sizes

    ranked = _group_rank_sizes(
        df.select(key, ranker_col, score_col),
        score_col, ranker_col, key,
        ascending=False, bucketed=bucketed,
        bucket_threshold=2_000_000, quant=quant,
        max_group_rows=None,
    )
    micro = F.when(
        F.col("_rn").isNotNull(),
        F.floor(
            F.lit(1_000_000_000) / (F.lit(int(k)) + F.col("_rn"))
        ).cast("long"),
    )
    return (
        ranked.groupBy(key)
        .agg(
            F.coalesce(F.sum(micro), F.lit(0).cast("long"))
            .alias("rrf_micro"),
            F.count(F.col("_rn")).alias("n_rankers"),
        )
        .withColumn("rrf_score", F.col("rrf_micro") / F.lit(1e9))
    )


def bm25_topk(df: DataFrame, query: list[str], text_col: str = "text",
              key: str = "doc_id", k: int = 10,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """BM25 retrieval over the corpus (Robertson et al.; the Lucene
    idf variant, which is always positive):

        idf(t)  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        s(d, t) = idf(t) * tf * (k1 + 1) / (tf + k1*(1 - b + b*dl/avgdl))
        score(d) = sum over query terms t of s(d, t)

    with N = corpus docs, df_t = docs containing t, tf = t's count in
    d, dl = d's word length, avgdl the corpus mean.  Returns the top-k
    docs as (key, n_matched, score, rank) — the corpus-side half of a
    retrieval stack (dedup-by-query, eval-set mining, hard-negative
    sampling against a training corpus).

    Deterministic: score is rounded to 6 before ranking and ties break
    on ``key`` asc, so the cut at rank k never depends on float
    summation order.

    Scale shape: the explode is filtered to the query's terms BEFORE
    the (doc, term) partial agg, so the shuffled stream is
    query-matches-sized, not token-stream-sized; df_t (≤ |query| rows)
    and the 1-row (N, avgdl) aggregate come back as broadcasts; doc
    lengths join on the doc key (the (doc,term) side is post-agg ≤
    |query| rows per doc).  The final top-k is a global
    ``TakeOrdered`` (per-partition heaps + driver merge of k·P rows),
    never a full sort.  All JVM expressions, no Python workers.
    """
    terms = [t for t in query if t]
    if not terms:
        raise ValueError("query must contain at least one non-empty term")
    ws = _words(text_col)
    lengths = df.select(F.col(key), F.size(ws).alias("_dl"))
    stats = lengths.agg(
        F.count("*").alias("_n_docs"), F.avg("_dl").alias("_avgdl")
    )
    tf = (
        df.select(F.col(key), F.explode(ws).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy(key, "term")
        .agg(F.count("*").alias("_tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("_df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(lengths, key)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_s",
            F.log(
                1
                + (F.col("_n_docs") - F.col("_df") + 0.5)
                / (F.col("_df") + 0.5)
            )
            * (F.col("_tf") * (k1 + 1))
            / (
                F.col("_tf")
                + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
            ),
        )
        .groupBy(key)
        .agg(
            F.count("*").alias("n_matched"),
            F.round(F.sum("_s"), 6).alias("score"),
        )
    )
    from pyspark.sql import Window

    top = scored.orderBy(F.desc("score"), F.asc(key)).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc(key))
    return top.withColumn("rank", F.row_number().over(w)).select(
        key, "n_matched", "score", "rank"
    )


def vocab_oov(
    df: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    key: str = "doc_id",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Tokenizer-coverage diagnostic: build the corpus top-``vocab_size``
    word vocabulary (count desc, word asc — deterministic cut) and
    report, per doc, how much of it falls outside that vocabulary:
    ``(key, n_words, n_oov, oov_rate)`` with the rate rounded to 6.
    High OOV concentration is how pipelines find the junk a fixed
    tokenizer will shred into bytes (non-language content, encoding
    damage) before paying to train on it.

    Pass ``vocab`` (a 1-column ``word`` frame — e.g. a real tokenizer's
    word list) to score against a FIXED vocabulary instead of the
    self-induced one.

    Scale shape: vocabulary induction is one word-count partial agg
    (model-sized output) + a top-V cut; scoring is the
    :func:`~gbdc_spark.operators.quality.dsir_weights` shape — explode
    words, broadcast-join the model-sized vocab, ONE partial-agg
    regroup per doc.  No Python workers, nothing driver-side.
    """
    ws = _words(text_col)
    if vocab is None:
        vocab = (
            df.select(F.explode(ws).alias("word"))
            .groupBy("word")
            .agg(F.count("*").alias("_c"))
            .orderBy(F.desc("_c"), F.asc("word"))
            .limit(int(vocab_size))
            .select("word")
        )
    hits = vocab.withColumn("_in", F.lit(1))
    return (
        df.select(F.col(key), F.explode(ws).alias("word"))
        .join(F.broadcast(hits), "word", "left")
        .groupBy(key)
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .withColumn("oov_rate", F.round(F.col("n_oov") / F.col("n_words"), 6))
    )


def pmi_topk(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    min_count: int = 5,
) -> DataFrame:
    """Collocation mining: corpus top-``k`` adjacent word pairs by
    pointwise mutual information — the phrase-detection statistic
    (word2phrase-style) curation uses to find multiword units worth
    protecting from tokenizer splits.  ``pmi = ln((c12/N2) /
    ((c1/N1)·(c2/N1)))`` with N1 = total words, N2 = total bigrams,
    rounded to 6; pairs below ``min_count`` are pruned BEFORE the model
    joins (rare-pair PMI is noise and unpruned tails are where the
    join cardinality lives).  Deterministic order: pmi desc, then
    (w1, w2) asc.

    Returns (w1, w2, n_pair, n_w1, n_w2, pmi).

    Scale shape: one bigram partial-agg shuffle + one unigram
    partial-agg (model-sized outputs), unigram table broadcast onto
    the pruned pair table twice, totals as 1-row broadcast cross
    joins, final cut via TakeOrdered.  No Python workers.
    """
    from ..functions import bind_once as _bind

    pairs = _bind(
        F.split(F.col(text_col), " "),
        lambda ws: F.when(
            F.size(ws) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - 1),
                lambda i: F.struct(
                    F.element_at(ws, i).alias("w1"),
                    F.element_at(ws, i + 1).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>")),
    )
    big = (
        df.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= int(min_count))
    )
    uni = (
        df.select(F.explode(_words(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n_word"))
    )
    n1 = uni.agg(F.sum("n_word").alias("_n1"))
    n2 = df.select(F.explode(pairs).alias("p")).agg(F.count("*").alias("_n2"))
    u1 = uni.select(F.col("word").alias("w1"), F.col("n_word").alias("n_w1"))
    u2 = uni.select(F.col("word").alias("w2"), F.col("n_word").alias("n_w2"))
    return (
        big.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("_n2"))
                    / ((F.col("n_w1") / F.col("_n1"))
                       * (F.col("n_w2") / F.col("_n1")))
                ),
                6,
            ),
        )
        .orderBy(F.desc("pmi"), F.col("w1"), F.col("w2"))
        .limit(int(k))
        .select("w1", "w2", "n_pair", "n_w1", "n_w2", "pmi")
    )


def with_lexical_diversity(
    df: DataFrame, text_col: str = "text", key: str = "doc_id"
) -> DataFrame:
    """Per-document lexical-diversity signals — the vocabulary-richness
    complement to the surface stats in :func:`with_text_stats` and the
    repetition family in :mod:`~gbdc_spark.operators.quality`:

    - ``n_words`` / ``n_types`` — token and distinct-type counts,
    - ``ttr`` — type/token ratio (low = template/boilerplate text),
    - ``hapax_frac`` — fraction of types occurring exactly once in the
      doc (high on natural prose, near 0 on generated/looped content),
    - ``entropy`` — Shannon entropy (nats) of the doc's unigram
      distribution, computed as ``ln(N) - sum(c·ln c)/N`` so the fold
      is a single pass over the per-word counts.

    All ratios rounded to 6 for cross-engine float parity.

    Scale shape: one (key, word) partial-agg shuffle then one per-key
    partial-agg regroup — both map-side combined, output bounded by
    per-doc vocabulary.  No window over the corpus, no Python workers.
    """
    wc = (
        df.select(F.col(key), F.explode(_words(text_col)).alias("word"))
        .groupBy(key, "word")
        .agg(F.count("*").alias("_c"))
    )
    return (
        wc.groupBy(key)
        .agg(
            F.sum("_c").alias("n_words"),
            F.count("*").alias("n_types"),
            F.sum(F.when(F.col("_c") == 1, 1).otherwise(0)).alias("_h"),
            F.sum(F.col("_c") * F.log("_c")).alias("_clnc"),
        )
        .select(
            key,
            "n_words",
            "n_types",
            F.round(F.col("n_types") / F.col("n_words"), 6).alias("ttr"),
            F.round(F.col("_h") / F.col("n_types"), 6).alias("hapax_frac"),
            F.round(
                F.log("n_words") - F.col("_clnc") / F.col("n_words"), 6
            ).alias("entropy"),
        )
    )


def zipf_fit(
    df: DataFrame,
    group: str = "source",
    topk: int = 200,
    text_col: str = "text",
) -> DataFrame:
    """Per-``group`` Zipf-law fit: OLS of ``ln(freq)`` on ``ln(rank)``
    over the group's top-``topk`` words (rank = count desc, word asc —
    deterministic cut).  Natural text sits near slope -1; a source
    whose slope is shallow (flat head) or whose fit is poor (low r²)
    is machine-generated, templated, or encoding-damaged — the
    corpus-level screen data cards report next to volume stats.

    Returns ``(group, n_ranked, slope, intercept, r2)`` rounded to 6.

    Scale shape: one (group, word) count shuffle (map-side combined,
    model-sized output), a per-group rank window over that MODEL-sized
    table (never the corpus), then the OLS moments as one partial agg
    per group.  No Python workers.
    """
    from pyspark.sql import Window

    counts = (
        df.select(F.col(group), F.explode(_words(text_col)).alias("word"))
        .groupBy(group, "word")
        .agg(F.count("*").alias("_c"))
    )
    w = Window.partitionBy(group).orderBy(F.desc("_c"), F.asc("word"))
    ranked = (
        counts.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= int(topk))
        .select(
            group,
            F.log(F.col("_r").cast("double")).alias("_lx"),
            F.log(F.col("_c").cast("double")).alias("_ly"),
        )
    )
    # explicit OLS moments, NOT F.corr: Spark 4 ANSI corr raises
    # DIVIDE_BY_ZERO on zero variance; try_divide + the var_pop(y)=0
    # special case reproduce the SQL-standard regr_* semantics DuckDB
    # implements (slope/intercept NULL when var(x)=0; r2 = 1 when
    # var(y)=0 but var(x)>0)
    slope = F.try_divide(F.col("_cov"), F.col("_vx"))
    return (
        ranked.groupBy(group)
        .agg(
            F.count("*").alias("n_ranked"),
            F.covar_pop("_lx", "_ly").alias("_cov"),
            F.var_pop("_lx").alias("_vx"),
            F.var_pop("_ly").alias("_vy"),
            F.avg("_lx").alias("_mx"),
            F.avg("_ly").alias("_my"),
        )
        .select(
            group,
            "n_ranked",
            F.round(slope, 6).alias("slope"),
            F.round(F.col("_my") - slope * F.col("_mx"), 6).alias("intercept"),
            F.round(
                F.when(F.col("_vx") == 0, F.lit(None))
                .when(F.col("_vy") == 0, F.lit(1.0))
                .otherwise(
                    F.col("_cov") * F.col("_cov")
                    / (F.col("_vx") * F.col("_vy"))
                ),
                6,
            ).alias("r2"),
        )
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Per-document recycled-content measurement: the fraction of the
    doc's word ``n``-gram OCCURRENCES whose corpus-wide first occurrence
    (smallest ``(key, position)``) lies elsewhere — i.e. how much of
    the doc is text the corpus already contains.  The read-only
    counterpart of :func:`~gbdc_spark.operators.dedup.span_dedup`:
    dedup rewrites the doc, novelty just scores it (dedup-debt ranking,
    near-dup triage, memorization-risk screens).

    Returns (key, n_grams, n_recycled, novelty) — row-preserving;
    docs shorter than ``n`` words have 0 grams and NULL novelty.

    Scale shape: one posexplode to (key, pos, md5-of-gram), one
    min-struct hash shuffle on the gram (map-side combined), one
    equi-join back, one per-doc partial-agg regroup.  No corpus
    window, no Python workers.
    """
    from ..functions import bind_once as _bind

    units = _words(text_col)

    def gram_hashes(us: Column) -> Column:
        # sequence(1, k) with k < 1 runs downward (step -1): guard
        return F.when(
            F.size(us) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(us) - F.lit(n - 1)),
                lambda i: F.md5(F.concat_ws("\x1f", F.slice(us, i, n))),
            ),
        ).otherwise(F.array().cast("array<string>"))

    occ = df.select(
        F.col(key), F.posexplode(_bind(units, gram_hashes)).alias("pos", "g")
    )
    first = occ.groupBy("g").agg(
        F.min(F.struct(F.col(key), F.col("pos"))).alias("first")
    )
    per = (
        occ.join(first, "g")
        .groupBy(key)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(
                    (F.col("first." + key) != F.col(key))
                    | (F.col("first.pos") != F.col("pos")),
                    1,
                ).otherwise(0)
            ).alias("n_recycled"),
        )
    )
    return (
        df.select(key)
        .join(per, key, "left")
        .select(
            key,
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("n_recycled"), F.lit(0)).cast("long")
            .alias("n_recycled"),
            F.round(
                F.try_divide(F.col("n_recycled"), F.col("n_grams")), 6
            ).alias("recycled_frac"),
        )
    )


def word_burstiness(
    df: DataFrame,
    topk: int = 100,
    text_col: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Corpus top-``topk`` words (total count desc, word asc —
    deterministic cut) with their Church–Gale burstiness: the
    variance-to-mean ratio of the per-document count, zeros included.
    Function words sit near VMR 1 (Poisson); topical/templated words
    are bursty (VMR >> 1) — the screen that separates vocabulary that
    spreads from vocabulary that clumps, reported on corpus data cards
    next to volume stats.

    Returns (word, n_docs_with, total, mean, vmr) rounded to 6, where
    ``mean = total / N`` and ``vmr = var_pop / mean`` over all N docs
    (docs not containing the word contribute count 0: only Σc and Σc²
    are needed, so zero rows are never materialized).

    Scale shape: one (key, word) count shuffle, one per-word moment
    agg (both map-side combined, model-sized outputs), the 1-row doc
    total joined as a broadcast, final cut via TakeOrdered.
    """
    wc = (
        df.select(F.col(key), F.explode(_words(text_col)).alias("word"))
        .groupBy(key, "word")
        .agg(F.count("*").alias("_c"))
    )
    n_docs = df.agg(F.count("*").alias("_n"))
    moments = wc.groupBy("word").agg(
        F.count("*").alias("n_docs_with"),
        F.sum("_c").alias("total"),
        F.sum(F.col("_c") * F.col("_c")).alias("_c2"),
    )
    mean = F.col("total") / F.col("_n")
    var = F.col("_c2") / F.col("_n") - mean * mean
    return (
        moments.crossJoin(F.broadcast(n_docs))
        .select(
            "word",
            "n_docs_with",
            "total",
            F.round(mean, 6).alias("mean"),
            F.round(var / mean, 6).alias("vmr"),
        )
        .orderBy(F.desc("total"), F.asc("word"))
        .limit(int(topk))
    )


def heaps_fit(
    df: DataFrame,
    checkpoints: int = 10,
    text_col: str = "text",
    key: str = "doc_id",
    buckets: int = 256,
    max_id: int | None = None,
) -> DataFrame:
    """Heaps'-law vocabulary-growth curve and fit: reading the corpus
    in ``key`` order, V(n) = distinct words seen in the first ``n``
    tokens, sampled at ``checkpoints`` evenly spaced n's, with the OLS
    fit of ``ln V = lnc + beta·ln n`` (natural text sits at
    beta ≈ 0.4–0.6; saturating vocabulary — templated/generated text —
    bends the curve down).  The data-card companion of :func:`zipf_fit`
    (the two laws are duals).

    Returns one row per checkpoint: (k, n_tokens, vocab, beta, lnc) —
    beta/lnc repeated (they are corpus constants; checkpoints with
    vocab 0 are excluded from the fit but still reported).

    Scale shape: global token offsets WITHOUT a single-partition
    window — docs bucket by ``key`` range (``max_id`` skips the probe
    job if the caller knows it), a ≤``buckets``-row cumulative agg
    broadcasts bucket token offsets back, and each bucket's per-doc
    offsets window independently (the epoch_shuffle two-phase shape).
    Per-word first positions are then ONE min agg (map-side combined,
    model-sized output), checkpoint counts a broadcast cross join over
    the vocab table, the fit a 1-row agg.  No Python workers.
    """
    ws = _words(text_col)
    lens = df.select(F.col(key), ws.alias("_ws")).withColumn(
        "_n", F.size("_ws")
    )
    if max_id is None:
        max_id = lens.agg(F.max(key)).first()[0]
    width = max(1, (int(max_id) + buckets) // buckets)
    scored = lens.withColumn("_b", (F.col(key) / F.lit(width)).cast("int"))
    bsum = scored.groupBy("_b").agg(F.sum("_n").alias("_bn"))
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    boff = bsum.withColumn(
        "_boff", F.coalesce(F.sum("_bn").over(wb), F.lit(0))
    ).select("_b", "_boff")
    wd = Window.partitionBy("_b").orderBy(key).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        scored.join(F.broadcast(boff), "_b")
        .withColumn(
            "_off", F.col("_boff") + F.coalesce(F.sum("_n").over(wd), F.lit(0))
        )
    )
    first = (
        offs.select(F.col("_off"), F.posexplode("_ws").alias("_p", "word"))
        .groupBy("word")
        .agg(F.min(F.col("_off") + F.col("_p")).alias("_fp"))
    )
    total = lens.agg(F.sum("_n").alias("_tot"))
    ck = (
        total.select(
            F.explode(F.sequence(F.lit(1), F.lit(int(checkpoints)))).alias("k"),
            "_tot",
        )
        .withColumn(
            "n_tokens",
            F.floor(F.col("k") * F.col("_tot") / F.lit(float(checkpoints)))
            .cast("long"),
        )
        .select(F.col("k").cast("long").alias("k"), "n_tokens")
    )
    v = (
        first.crossJoin(F.broadcast(ck))
        .groupBy("k", "n_tokens")
        .agg(
            F.sum(
                F.when(F.col("_fp") < F.col("n_tokens"), 1).otherwise(0)
            ).cast("long").alias("vocab")
        )
    )
    pts = v.filter((F.col("vocab") > 0) & (F.col("n_tokens") > 0)).select(
        F.log(F.col("n_tokens").cast("double")).alias("_lx"),
        F.log(F.col("vocab").cast("double")).alias("_ly"),
    )
    beta = F.try_divide(F.col("_cov"), F.col("_vx"))
    fit = pts.agg(
        F.covar_pop("_lx", "_ly").alias("_cov"),
        F.var_pop("_lx").alias("_vx"),
        F.avg("_lx").alias("_mx"),
        F.avg("_ly").alias("_my"),
    ).select(
        F.round(beta, 6).alias("beta"),
        F.round(F.col("_my") - beta * F.col("_mx"), 6).alias("lnc"),
    )
    return v.crossJoin(F.broadcast(fit)).select(
        "k", "n_tokens", "vocab", "beta", "lnc"
    )


def source_ngram_overlap(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    group: str = "source",
) -> DataFrame:
    """Cross-source contamination matrix: for every pair of sources,
    how much word-``n``-gram vocabulary they share.  This is the
    corpus-curation diagnostic behind mixing decisions — two "distinct"
    sources with high containment are the same crawl twice, and a
    benchmark-derived source overlapping a training source is leakage
    the per-document decontamination operators
    (:func:`~gbdc_spark.operators.quality.ngram_contamination`) flag
    row-by-row; this gives the corpus-level view.

    Returns one row per unordered source pair (``source_a`` <
    ``source_b``): distinct-gram counts of both sides, ``shared_grams``,
    ``jaccard`` = shared/(a+b−shared) and ``containment`` =
    shared/min(a,b), round-6 (NULL when a side has no grams).  Pairs
    with zero overlap are kept — absence of overlap is the signal a
    mixing decision wants to see.

    Scale shape: one explode to gram hashes, one distinct on
    (source, gram) — map-side combined; one self equi-join on the gram
    hash whose per-key fanout is bounded by the number of SOURCES
    carrying that gram (≤ #sources, a catalog property, never corpus
    size); one count aggregate into ≤ #sources² groups.  The per-source
    totals and the pair scaffold are #sources-row tables, broadcast.
    """
    us = F.split(F.col(text_col), " ")
    grams = F.when(
        F.size(us) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(us) - F.lit(n - 1)),
            lambda i: F.md5(F.concat_ws("\x1f", F.slice(us, i, n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sg = df.select(F.col(group), F.explode(grams).alias("g")).distinct()
    per = (
        df.select(group)
        .distinct()
        .join(sg.groupBy(group).agg(F.count("*").alias("n_grams")), group, "left")
        .select(group, F.coalesce("n_grams", F.lit(0)).alias("n_grams"))
    )
    shared = (
        sg.select(F.col(group).alias("source_a"), "g")
        .join(sg.select(F.col(group).alias("source_b"), "g"), "g")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("shared_grams"))
    )
    pa = per.select(F.col(group).alias("source_a"), F.col("n_grams").alias("grams_a"))
    pb = per.select(F.col(group).alias("source_b"), F.col("n_grams").alias("grams_b"))
    scaffold = pa.crossJoin(pb).filter(F.col("source_a") < F.col("source_b"))
    sh = F.coalesce(F.col("shared_grams"), F.lit(0))
    return (
        scaffold.join(F.broadcast(shared), ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "grams_a",
            "grams_b",
            sh.cast("long").alias("shared_grams"),
            F.round(
                F.try_divide(sh, F.col("grams_a") + F.col("grams_b") - sh), 6
            ).alias("jaccard"),
            F.round(
                F.try_divide(sh, F.least("grams_a", "grams_b")), 6
            ).alias("containment"),
        )
        .orderBy("source_a", "source_b")
    )

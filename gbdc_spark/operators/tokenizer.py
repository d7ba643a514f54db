"""Distributed BPE tokenizer induction and encoding (Sennrich, Haddow &
Birch, ACL 2016 — "Neural Machine Translation of Rare Words with Subword
Units").  The missing front end of the token pipeline: everything else in
this engine consumes pre-tokenized sequences; this module LEARNS the
subword vocabulary from raw text and applies it, at corpus scale.

Scale shape (the classic industrial trainer split):

* ONE corpus-wide shuffle builds the compact word-frequency table
  (``bpe_word_freqs``) — distinct words ≪ corpus, so the K merge rounds
  that follow never touch the corpus again.
* Each round is a map-side-combined pair-count aggregate over the word
  table plus a 1-row argmax reduction; only that single (left, right,
  count) row ever reaches the driver — the model state itself is K rows
  by definition (like k-means centroids), the data never is.
* Merge application is a LITERAL string replace, JVM-side whole-stage
  codegen — no Python in any per-row path.

The double-separator encoding is what makes the greedy merge exactly
reproducible in any engine with non-overlapping left-to-right
``replace`` semantics (Spark, DuckDB, Python ``str.replace`` all
agree): symbols are joined with TWO separators and a merge pattern
``" l  r "`` borrows one separator from each side, so consecutive
disjoint occurrences all match in one pass while overlapping ones
resolve leftmost-first — e.g. rule (a,a) on ``a a a`` gives ``aa a``,
the greedy BPE result.  Each learned rule is applied in one forward
pass per round (the Sennrich training loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "EOW",
    "bpe_word_freqs",
    "bpe_train",
    "bpe_apply",
    "bpe_encode",
    "bpe_fertility",
    "bpe_vocab_ids",
    "bpe_encode_ids",
]

# end-of-word marker: its own symbol appended to every word (Sennrich's
# </w> variant) so merges can distinguish word-final subwords.  chr(30)
# is the ASCII record separator — never whitespace, sorts below every
# printable symbol identically in Spark and DuckDB binary collation.
EOW = "\x1e"
_SEP = " "


def _sym_string(word: Column) -> Column:
    """Word → initial symbol string: its characters plus the EOW marker,
    double-space joined, one guard separator at each end.

    ``F.split(word, "")`` appends a trailing ``""`` (Java limit=-1) —
    sliced off to ``length(word)`` per the documented pitfall."""
    chars = F.slice(F.split(word, ""), 1, F.length(word))
    syms = F.concat(chars, F.array(F.lit(EOW)))
    return F.concat(
        F.lit(_SEP), F.array_join(syms, _SEP * 2), F.lit(_SEP)
    )


def _merge_pattern(left: str, right: str) -> tuple[str, str]:
    return (
        f"{_SEP}{left}{_SEP}{_SEP}{right}{_SEP}",
        f"{_SEP}{left}{right}{_SEP}",
    )


def bpe_word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The compact trainer input: (word, freq, syms) over distinct
    words.  One explode + one count aggregate — the only corpus-wide
    pass in the whole training loop.  Words containing the EOW marker
    byte are dropped defensively (it must stay a reserved symbol)."""
    words = df.select(
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    ).filter((F.col("word") != "") & (~F.col("word").contains(EOW)))
    return (
        words.groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
        .withColumn("syms", _sym_string(F.col("word")))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency: one
    map-side explode over the compact word table, one combined sum.
    ``F.sequence(0, n-2)`` on a 1-symbol word would yield ``[0, -1]``
    (negative default step) — guarded to an empty array."""
    toks = F.split(F.trim(F.col("syms")), _SEP * 2)
    n = F.size(toks)
    idx = F.when(n >= 2, F.sequence(F.lit(0), n - 2)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(toks, i + 1).alias("merge_left"),
            F.element_at(toks, i + 2).alias("merge_right"),
        ),
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), "freq")
        .groupBy("p.merge_left", "p.merge_right")
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merge rules over the corpus.  Returns
    ``(merges, vocab)``: merges is the K-row rule table (round,
    merge_left, merge_right, cnt, new_token), vocab the final
    word-frequency table with fully merged symbol strings (the
    encoder's lookup table).

    Per round: distributed pair count → 1-row argmax collected to the
    driver (ties broken by count DESC then lexicographic left, right —
    binary collation, identical in any engine) → literal-pattern merge
    applied JVM-side.  ``localCheckpoint`` truncates the per-round plan
    (the documented iterative-algorithm rule: lineage depth O(rounds)
    otherwise re-derives every prior round per action)."""
    spark = df.sparkSession
    vocab = bpe_word_freqs(df, text_col).localCheckpoint()
    merges: list[tuple[int, str, str, int, str]] = []
    for k in range(1, int(n_merges) + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(
                F.desc("cnt"),
                F.asc("merge_left"),
                F.asc("merge_right"),
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = (
            top[0]["merge_left"],
            top[0]["merge_right"],
            int(top[0]["cnt"]),
        )
        merges.append((k, left, right, cnt, left + right))
        pat, rep = _merge_pattern(left, right)
        vocab = vocab.withColumn(
            "syms", F.replace(F.col("syms"), F.lit(pat), F.lit(rep))
        ).localCheckpoint()
    merges_df = spark.createDataFrame(
        merges,
        schema=(
            "round int, merge_left string, merge_right string,"
            " cnt long, new_token string"
        ),
    )
    return merges_df, vocab


def _as_rules(merges) -> list[tuple[str, str]]:
    """Accept the merges DataFrame (K rows — driver-sized model state)
    or a pre-collected [(left, right), ...] list."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("round").collect()
        return [(r["merge_left"], r["merge_right"]) for r in rows]
    rules = []
    for m in merges:
        if len(m) >= 3 and isinstance(m[0], int):
            rules.append((m[1], m[2]))  # (round, left, right, ...) rows
        else:
            rules.append((m[0], m[1]))
    return rules


def bpe_apply(word: Column, rules: list[tuple[str, str]]) -> Column:
    """Encode one word column with an ordered rule list: K chained
    literal replaces over the symbol string (each referenced exactly
    once — a linear codegen chain, no re-evaluation blow-up), then
    split back to the subword array (EOW marker kept as learned)."""
    expr = _sym_string(word)
    for left, right in rules:
        pat, rep = _merge_pattern(left, right)
        expr = F.replace(expr, F.lit(pat), F.lit(rep))
    return F.split(F.trim(expr), _SEP * 2)


def bpe_encode(
    df: DataFrame,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
    out: str = "bpe_tokens",
) -> DataFrame:
    """Encode every document with a learned rule table.  The per-row
    work runs once per DISTINCT word (the replaces apply on the
    deduplicated word table), then a broadcast join fans the encodings
    back to word occurrences and an order-preserving re-assembly
    (array_sort over (pos, toks) structs — pos is the leading struct
    field, so the sort is by position) rebuilds each document's subword
    stream.  Documents with no words keep an empty token array via the
    left join back to the input."""
    rules = _as_rules(merges)
    words = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias(
            "pos", "word"
        ),
    ).filter((F.col("word") != "") & (~F.col("word").contains(EOW)))
    distinct = (
        words.select("word")
        .distinct()
        .withColumn("toks", bpe_apply(F.col("word"), rules))
    )
    enc = words.join(F.broadcast(distinct), "word")
    per_doc = enc.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "toks"))
                ),
                lambda s: s["toks"],
            )
        ).alias(out)
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .withColumn(
            out,
            F.coalesce(F.col(out), F.array().cast("array<string>")),
        )
        .withColumn("n_bpe", F.size(out).cast("int"))
    )


def bpe_fertility(
    df: DataFrame,
    merges,
    text_col: str = "text",
    by: str = "source",
) -> DataFrame:
    """Tokenizer-evaluation metrics per ``by`` group — the numbers you
    check before committing to a learned vocabulary: fertility
    (subword tokens per word; SentencePiece's headline metric) and
    chars per token (compression; the EOW marker counts as one char of
    every word's subword stream).

    Same scale shape as :func:`bpe_encode`: the replace chain runs once
    per DISTINCT word to get its token count, broadcast-joins back to
    word occurrences, then ONE map-side-combined aggregate per group —
    the corpus is never re-tokenized per row.
    """
    rules = _as_rules(merges)
    words = df.select(
        F.col(by),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word"),
    ).filter((F.col("word") != "") & (~F.col("word").contains(EOW)))
    distinct = (
        words.select("word")
        .distinct()
        .withColumn(
            "n_tok", F.size(bpe_apply(F.col("word"), rules)).cast("long")
        )
        .withColumn("n_chars", (F.length("word") + 1).cast("long"))
    )
    return (
        words.join(F.broadcast(distinct), "word")
        .groupBy(by)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_tok").alias("n_bpe"),
            F.sum("n_chars").alias("n_chars"),
        )
        .select(
            by,
            "n_words",
            "n_bpe",
            F.round(F.col("n_bpe") / F.col("n_words"), 6).alias(
                "fertility"
            ),
            F.round(F.col("n_chars") / F.col("n_bpe"), 6).alias(
                "chars_per_token"
            ),
        )
    )


def bpe_vocab_ids(encoded: DataFrame, tokens_col: str = "bpe_tokens") -> DataFrame:
    """Subword → integer id table from an encoded corpus: ids are dense
    ranks by (corpus frequency DESC, token ASC), starting at 1 — id 0
    stays reserved for EOS/padding, and frequent subwords get small ids
    (the convention every tokenizer file follows).  The id table is
    vocabulary-sized; the window runs over it, never the corpus."""
    from pyspark.sql import Window

    freq = (
        encoded.select(F.explode(tokens_col).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return freq.select(
        "token", "freq", F.row_number().over(w).cast("int").alias("id")
    )


def bpe_encode_ids(
    df: DataFrame,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
    out: str = "tokens",
) -> DataFrame:
    """Text → BPE subwords → integer token ids: the full tokenizer
    front end, producing exactly the pre-tokenized-sequence shape the
    rest of the engine consumes (doc_id, tokens:array<int>, n_tok).

    Same distinct-word economics as :func:`bpe_encode`: the replace
    chain and the id lookup both run once per distinct word (the
    word's subword-id array is precomputed on the deduplicated word
    table via one explode + vocabulary-sized broadcast join +
    order-preserving re-assembly), then fan back to occurrences."""
    rules = _as_rules(merges)
    words = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias(
            "pos", "word"
        ),
    ).filter((F.col("word") != "") & (~F.col("word").contains(EOW)))
    distinct = (
        words.select("word")
        .distinct()
        .withColumn("toks", bpe_apply(F.col("word"), rules))
    ).persist()
    vocab = bpe_vocab_ids(
        words.join(F.broadcast(distinct), "word").select(
            F.col("toks").alias("bpe_tokens")
        ),
        tokens_col="bpe_tokens",
    )
    word_ids = (
        distinct.select(
            "word", F.posexplode("toks").alias("tpos", "token")
        )
        .join(F.broadcast(vocab.select("token", "id")), "token")
        .groupBy("word")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tpos", "id"))),
                lambda s: s["id"],
            ).alias("ids")
        )
    )
    per_doc = (
        words.join(F.broadcast(word_ids), "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "ids"))
                    ),
                    lambda s: s["ids"],
                )
            ).alias(out)
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .withColumn(
            out, F.coalesce(F.col(out), F.array().cast("array<int>"))
        )
        .withColumn("n_tok", F.size(out).cast("int"))
    )

"""Token-side training-set build — the end-to-end composition the
token-family operators exist for, over the pre-tokenized sequences
shape (doc_id, tokens, n_tok, source):

    eval-slice holdout  →  exact substring dedup (ExactSubstr)
    →  minimum-length gate  →  benchmark decontamination (token
    n-grams vs the held-out slice)  →  weighted sampling under a doc
    budget (Efraimidis–Spirakis, weight = surviving token count)
    →  context-window next-fit packing  →  deterministic epoch order.

Stage order follows cost and correctness: dedup before the gate (a doc
may fall under the length floor only after its duplicated spans are
removed), decontamination on the DEDUPED tokens (what would actually
be trained on) against the ORIGINAL eval tokens (eval sets are
external and never rewritten), sampling before packing (packs are laid
out only for docs that made the budget).

Every stage is an already-oracled operator; the composition is one
DataFrame program with one composed DuckDB oracle — no stage hides
behind another's shuffle.  Scale notes live with each operator; the
composition adds nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup
from ..operators.packing import (
    epoch_shuffle,
    pack_next_fit_scalable,
    stratified_sample,
    weighted_sample,
)
from ..operators.quality import token_ngram_contamination

__all__ = ["build_training_set"]


def build_training_set(
    seqs: DataFrame,
    bench_fraction: float = 0.05,
    l: int = 12,
    contam_n: int = 8,
    min_tok: int = 24,
    k: int = 150,
    max_tokens: int = 256,
    seed: int = 1,
    checkpoint: bool = True,
) -> DataFrame:
    """One row per doc in the built training set:
    (doc_id, source, n_tok, n_kept, score, pack_id, pack_fill,
    position).  ``n_tok`` is the original token count, ``n_kept`` the
    post-substring-dedup count (the sampling weight), ``score`` the
    A-ES rank key, ``position`` the epoch-``seed`` training order.
    """
    # branch points are localCheckpoint'ed: seqs feeds both sides of the
    # holdout, bench feeds the anti-join AND the contamination grams,
    # and the deduped frame feeds contamination AND the clean anti-join
    # — without the checkpoints each branch re-runs its upstream
    # (tokenization ×3, the ExactSubstr explode ×2; the repo's Catalyst
    # pitfall list, item 4).  At 100 TB these materializations are the
    # pipeline's natural durable stage boundaries (written tables).
    def _cp(frame: DataFrame) -> DataFrame:
        return frame.localCheckpoint() if checkpoint else frame

    bench = _cp(
        stratified_sample(
            seqs, {}, strata_col="source", key="doc_id",
            default_fraction=bench_fraction,
        )
    )
    corpus = _cp(seqs.join(bench.select("doc_id"), "doc_id", "left_anti"))

    dd = dedup.substring_dedup(corpus, l=l)
    dd = _cp(
        dd.withColumn(
            "n_kept", F.size("tokens_dedup").cast("int")
        ).filter(F.col("n_kept") >= min_tok)
    )

    flagged = token_ngram_contamination(
        dd.select("doc_id", F.col("tokens_dedup").alias("tokens")),
        bench.select("doc_id", "tokens"),
        n=contam_n,
    )
    clean = dd.join(flagged.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id", "source", F.col("n_tok").cast("int").alias("n_tok"),
        "n_kept",
    )

    sampled = weighted_sample(
        clean, k=k, weight_col="n_kept", key="doc_id", salt="ws1"
    )
    # scalable variant: identical output to pack_next_fit, but no task
    # ever materializes a whole source — at corpus scale the sampled
    # set can still be billions of rows across a handful of sources.
    # chunk_prefix=9 matters: ids are docNNNNNNNN (3 + 8 digits), so
    # the default prefix 4 is 'doc'+1 digit = at most 10 chunks per
    # source below 10^9 docs, while prefix 9 = 'doc'+6 digits gives
    # 100-doc chunks — the real bounded-task shape without drowning in
    # 10-row groups (prefix 10)
    packed = pack_next_fit_scalable(
        sampled, max_tokens=max_tokens, size_col="n_kept",
        by="source", order="doc_id", chunk_prefix=9,
    )
    ordered = epoch_shuffle(packed, seed=seed, key="doc_id")
    return ordered.select(
        "doc_id", "source", "n_tok", "n_kept", "score",
        "pack_id", "pack_fill", "position",
    )

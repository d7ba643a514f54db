#!/usr/bin/env python
"""Physical-plan audit: prints (and writes PLANS.md) the load-bearing
plan properties of representative queries — the "is this the plan you'd
want at 100x scale" checklist:

* broadcast vs shuffle join choices,
* TakeOrderedAndProject for top-k (no full sort),
* WholeStageCodegen coverage for JVM-only operators,
* parquet PushedFilters / partition pruning (IVF probe),
* single-stage Arrow crossings for the fused extractor.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHECKS = {
    # query name -> list of (description, regex that must appear)
    "q3_segment_revenue": [
        ("customer broadcast (small dim)", r"BroadcastHashJoin"),
        # at sf0.01 AQE rightly broadcasts orders too; at warehouse scale
        # the same plan degrades gracefully to a shuffle join
        ("lineitem x orders joined via hash strategy", r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
    ],
    "region_revenue": [
        ("all three dims broadcast", r"BroadcastHashJoin"),
    ],
    "cosine_topk": [
        ("global top-k without full sort", r"TakeOrderedAndProject"),
    ],
    "topk_per_group": [
        ("per-group rank inside window exec", r"(RunningWindowFunction|Window)"),
    ],
    "winnow_fingerprint": [
        ("whole-stage codegen (no Python anywhere)", r"codegen id"),
        ("no Arrow eval in plan", r"^(?!.*ArrowEvalPython)"),
    ],
    "text_stats": [
        ("whole-stage codegen (no Python anywhere)", r"codegen id"),
        ("no Arrow eval in plan", r"^(?!.*ArrowEvalPython)"),
    ],
    "repetition_signals": [
        ("shuffle-free projection over the scan", r"^(?!.*Exchange)"),
        ("no Arrow eval in plan", r"^(?!.*ArrowEvalPython)"),
    ],
    "gopher_quality_filter": [
        ("shuffle-free projection over the scan", r"^(?!.*Exchange)"),
        ("no Arrow eval in plan", r"^(?!.*ArrowEvalPython)"),
    ],
    "c4_filter": [
        ("shuffle-free projection over the scan", r"^(?!.*Exchange)"),
        ("no Arrow eval in plan", r"^(?!.*ArrowEvalPython)"),
    ],
    "charset_filter": [
        ("shuffle-free projection over the scan", r"^(?!.*Exchange)"),
        ("no Arrow eval in plan", r"^(?!.*ArrowEvalPython)"),
    ],
    # the one Exchange here is ensure_parallelism's input-split
    # rebalance (single local parquet file) — what must NOT appear is
    # a gram group-by or join: the signals are per-row folds
    "token_repetition_signals": [
        ("per-row folds: no gram aggregation or join", r"^(?!.*(HashAggregate|SortMergeJoin|BroadcastHashJoin))"),
        ("no Arrow eval in plan", r"^(?!.*ArrowEvalPython)"),
    ],
    "minhash_pairs": [
        ("band equi-join is a real join (never cross)", r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("signature computed JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "training_build": [
        ("packing is the only Python family (chunked applyInPandas stages)", r"FlatMapGroupsInPandas"),
        ("dedup/contamination/sampling all JVM-side (no Arrow eval)", r"^(?!.*ArrowEvalPython)"),
        ("budget top-k is TakeOrderedAndProject (no full sort)", r"TakeOrderedAndProject"),
    ],
    "length_batches": [
        ("bucketed-path sub-bucket offsets broadcast back (no corpus-wide rank shuffle)", r"BroadcastHashJoin"),
        ("pure window/aggregate plan — no Python workers", r"^(?!.*ArrowEvalPython)"),
        ("no cartesian anywhere (the path-label union is literal-tagged)", r"^(?!.*CartesianProduct)"),
    ],
    "padding_stats": [
        ("rollup is one map-side-combined aggregate pass", r"partial"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "budget_select": [
        ("quantized-bucket offsets broadcast back (no single global running-sum window)", r"BroadcastHashJoin"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
        ("no cartesian", r"^(?!.*CartesianProduct)"),
    ],
    "interleave_sources": [
        ("bucketed-path sub-bucket offsets broadcast back", r"BroadcastHashJoin"),
        ("pure window/projection plan — no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "balanced_shards": [
        ("size-value offsets broadcast back (no single global rank window)", r"BroadcastHashJoin"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "interleave_temperature": [
        ("derived weight table broadcast to the ranked corpus", r"BroadcastHashJoin"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "hard_negatives": [
        ("centroid table broadcast for both assign passes", r"Broadcast"),
        ("candidates only within shared cells (no all-pairs cross)", r"^(?!.*CartesianProduct)"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "padding_sweep": [
        ("per-width totals are one map-side-combined aggregate", r"partial"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "loader_prep": [
        ("both two-phase offset tables broadcast back", r"BroadcastHashJoin"),
        ("no Python workers end-to-end", r"^(?!.*ArrowEvalPython)"),
        ("no cartesian", r"^(?!.*CartesianProduct)"),
    ],
    "cell_prototypes": [
        ("centroid table broadcast (nested-loop over a k-row side)", r"Broadcast"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "label_balance": [
        ("minority-class target broadcast (nested-loop on 1 row, no shuffle of the corpus)", r"Broadcast"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "weighted_sample": [
        ("global top-k is TakeOrderedAndProject (no full sort)", r"TakeOrderedAndProject"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "epoch_order": [
        ("bucket offsets broadcast back (no single-partition window over the corpus)", r"BroadcastHashJoin"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "pq_adc_topk": [
        ("ADC lookup table broadcast to the codes", r"BroadcastHashJoin"),
        ("per-vector sum is a map-side-combined partial agg", r"partial"),
        ("no Python workers anywhere", r"^(?!.*ArrowEvalPython)"),
    ],
    "ivfpq_topk": [
        ("per-cell ADC tables broadcast to the codes", r"BroadcastHashJoin"),
        ("approx top-k is TakeOrderedAndProject (no full sort)", r"TakeOrderedAndProject"),
        ("no Python workers anywhere", r"^(?!.*ArrowEvalPython)"),
    ],
    "substring_dedup": [
        ("gram hashing JVM-side (no Python workers)", r"^(?!.*ArrowEvalPython)"),
        ("global keeper pick is a map-side-combined partial agg", r"partial_min"),
        ("occurrence->keeper join is a real equi-join (never cross)", r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
    ],
    "token_minhash_pairs": [
        ("band equi-join is a real join (never cross)", r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("token signature computed JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "token_ngram_contamination": [
        ("eval-set gram side broadcast", r"BroadcastHashJoin"),
        ("gram explode JVM-side (no Python)", r"^(?!.*ArrowEvalPython)"),
    ],
    "quality_signals": [
        ("whole-stage codegen (no Python anywhere)", r"codegen id"),
        ("no Arrow eval in plan", r"^(?!.*ArrowEvalPython)"),
    ],
    "base_features_docs": [
        ("one Arrow crossing for the 58-feature extraction", r"ArrowEvalPython|MapInPandas|PythonUDF"),
    ],
    "q4_order_priority": [
        ("correlated EXISTS planned as semi join", r"Semi"),
    ],
    "anti_join": [
        ("NOT IN planned as anti join", r"Anti"),
    ],
    # ------------------------------------------------ round-3 surfaces
    "simhash": [
        ("pure JVM expressions (no Python workers)", r"^(?!.*ArrowEvalPython)"),
        ("whole-stage codegen", r"codegen id"),
    ],
    "embedding_near_dups": [
        ("bucket equi-join is a real join (never cross)",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("hyperplane projections JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "dedup_clusters_star": [
        ("final labels via hash aggregate (no sort)", r"HashAggregate"),
    ],
    "pack_next_fit": [
        ("per-group pandas scan (order-dependent packing)",
         r"FlatMapGroupsInPandas"),
    ],
    "pack_next_fit_scalable": [
        # three bounded group-map stages: per-(group,chunk) summary,
        # per-group carry scan over the tiny summary, per-(group,chunk)
        # re-pack — NO stage groups on the bare by-cols over row data
        ("chunked pandas stages present",
         r"FlatMapGroupsInPandas"),
        ("state join-back is a real equi-join (never cross)",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
    ],
    "stratified_sample": [
        ("md5-uniform filter stays JVM-side", r"^(?!.*ArrowEvalPython)"),
        # the filter lands directly above the 2-column scan, below the
        # repartition — a shuffle-then-filter plan would be wrong
        ("filter evaluated before any exchange", r"Filter"),
    ],
    "tfidf_topk": [
        ("tf x docfreq joined on model-sized term keys",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("corpus N broadcast (1-row cross join)", r"BroadcastNestedLoopJoin"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "bm25_topk": [
        ("global top-k without full sort", r"TakeOrderedAndProject"),
        ("df_t and (N, avgdl) broadcast, never shuffled",
         r"BroadcastHashJoin"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "ccnet_buckets": [
        # the two-phase rank's offset and group-size tables join back as
        # broadcasts; no per-language giant window partition exists
        ("offsets/sizes broadcast join-back", r"BroadcastHashJoin"),
        ("per-(group, quantized-cell) rank window", r"Window"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "embedding_decontam": [
        # the eval set collapses to one struct-list row and broadcasts;
        # the corpus-side max is a JVM array fold — no shuffle, no Python
        ("eval list broadcast to the corpus", r"BroadcastNestedLoopJoin"),
        ("corpus never hash/range-shuffles",
         r"^(?!.*(hashpartitioning|rangepartitioning))"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "percentile_gate": [
        # same two-phase rank shape as ccnet_buckets: offset/size
        # tables broadcast back, rank windows per quantized cell
        ("offsets/sizes broadcast join-back", r"BroadcastHashJoin"),
        ("per-(group, quantized-cell) rank window", r"Window"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "mask_tokens": [
        # the only exchange is ensure_parallelism's deliberate
        # round-robin input-split fix — never a key shuffle
        ("no hash/range shuffle (per-row array transform)",
         r"^(?!.*(hashpartitioning|rangepartitioning))"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "pmi_topk": [
        ("unigram model broadcast onto the pruned pair table",
         r"BroadcastHashJoin"),
        ("final cut is TakeOrderedAndProject (no full sort)",
         r"TakeOrderedAndProject"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "vocab_oov": [
        ("vocab broadcast to the exploded corpus words",
         r"BroadcastHashJoin"),
        ("per-doc OOV regroup is a map-side-combined partial agg",
         r"partial_count"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "data_card": [
        ("dup counts + rollup are map-side-combined partial aggs",
         r"partial_count"),
        ("dup join-back is a real equi-join (never cross)",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "sft_mask": [
        # render + mask is one bound per-row transform over the scan
        ("no hash/range shuffle (per-row template render)",
         r"^(?!.*(hashpartitioning|rangepartitioning))"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "temperature_mix": [
        ("boost table broadcast back to the corpus", r"BroadcastHashJoin"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "score_norm_minmax": [
        ("group stats broadcast back to the corpus", r"BroadcastHashJoin"),
        ("per-group moments are map-side-combined partial aggs",
         r"partial_(min|max|avg)"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "sq8_topk": [
        ("top-k is TakeOrdered, not a global sort",
         r"TakeOrderedAndProject"),
        ("no hash/range shuffle (per-row dequantize + fold)",
         r"^(?!.*(hashpartitioning|rangepartitioning))"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "unimax_expand": [
        ("gate stats + epochs tables broadcast back",
         r"BroadcastHashJoin"),
        ("repeats expansion is a per-row explode (no extra key "
         "shuffle beyond the source aggs)", r"Generate"),
        ("no cartesian product", r"^(?!.*CartesianProduct)"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "unimax_mix": [
        ("epochs table broadcast back to the corpus",
         r"BroadcastHashJoin"),
        ("per-source size is a map-side-combined partial agg",
         r"partial_(sum|count)"),
        ("no cartesian product", r"^(?!.*CartesianProduct)"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "ngram_containment": [
        ("candidate x shingle-set joins are real equi-joins (never cross)",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("no cartesian product", r"^(?!.*CartesianProduct)"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "dedup_keep_best": [
        ("per-cluster argmax is a map-side-combined partial agg",
         r"partial_min"),
        ("corpus x labels and argmax join-backs are real equi-joins",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "dedup_against": [
        ("band probe is a left-semi equi-join (never cross)",
         r"LeftSemi"),
        ("hash/band probes are real equi-joins (never cross)",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("no cartesian product", r"^(?!.*CartesianProduct)"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "fim_transform": [
        ("no hash/range shuffle (per-row slice/concat)",
         r"^(?!.*(hashpartitioning|rangepartitioning))"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "span_corrupt": [
        # the only exchange is ensure_parallelism's deliberate
        # round-robin input-split fix — never a key shuffle
        ("no hash/range shuffle (per-row span assembly)",
         r"^(?!.*(hashpartitioning|rangepartitioning))"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "asof_forward": [
        ("cogrouped Arrow merge on hash buckets", r"FlatMapCoGroupsInPandas"),
    ],
    "asof_nearest": [
        ("cogrouped Arrow merge on hash buckets", r"FlatMapCoGroupsInPandas"),
    ],
    "source_divergence": [
        # the model-table branch point is persisted (join-pushed
        # isnotnull filters defeat ReuseExchange canonicalization), so
        # the corpus explode runs once and branches read the cache
        ("branch point cached — corpus scanned once", r"InMemoryTableScan"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "lm_perplexity": [
        ("bigram model + scoring all JVM-side", r"^(?!.*ArrowEvalPython)"),
        # model build must partial-aggregate map-side: distinct grams
        # shuffle, not every bigram occurrence
        ("map-side partial aggregation for the LM counts",
         r"partial_count|HashAggregate"),
        # both model tables broadcast-hinted: the token-stream-sized
        # bigram explode reaches its doc-key partial agg without ever
        # shuffling on the Zipf-skewed gram keys
        ("model joins broadcast (corpus stream never gram-shuffled)",
         r"BroadcastHashJoin"),
        # the only allowed SMJ is the doc-level row-preserving
        # join-back (keyed on the doc key); none may key on gram cols
        ("no sort-merge join on gram keys",
         r"^(?!.*SortMergeJoin Left keys \[\d+\]: \[w[12]#)"),
        ("unigram model cached (vocab count reads it, not the corpus)",
         r"InMemoryTableScan"),
    ],
    # same scale contract as lm_perplexity, over token-id units
    "token_lm_perplexity": [
        ("bigram model + scoring all JVM-side", r"^(?!.*ArrowEvalPython)"),
        ("map-side partial aggregation for the LM counts",
         r"partial_count|HashAggregate"),
        ("model joins broadcast (token stream never pair-shuffled)",
         r"BroadcastHashJoin"),
        ("no sort-merge join on token-pair keys",
         r"^(?!.*SortMergeJoin Left keys \[\d+\]: \[w[12]#)"),
        ("unigram model cached (vocab count reads it, not the corpus)",
         r"InMemoryTableScan"),
    ],
    "line_dedup": [
        ("all JVM-side (explode/agg/join, no Python)",
         r"^(?!.*ArrowEvalPython)"),
        ("keeper pick is a map-side-combined partial agg",
         r"partial_min|HashAggregate"),
        ("line join-back is a real equi-join (never cross)",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
    ],
    "pii_scrub": [
        ("pure projection over the scan — codegen, no shuffle",
         r"codegen id"),
        ("no exchange anywhere in the scrub",
         r"^(?!.*Exchange)"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "dsir_weights": [
        ("log-ratio table broadcast to the corpus words",
         r"BroadcastHashJoin"),
        ("per-doc score is a map-side-combined partial agg",
         r"partial_count|partial_avg|HashAggregate"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "chunk_sequences": [
        # the only exchange is ensure_parallelism's deliberate
        # round-robin input-split fix — never a key shuffle
        ("no hash/range shuffle (transform+explode is per-row)",
         r"^(?!.*(hashpartitioning|rangepartitioning))"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "semantic_dedup": [
        ("centroid table broadcast for assignment",
         r"BroadcastNestedLoopJoin|BroadcastExchange"),
        ("in-cell pair scan is a real equi-join on cell (never cross)",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "embedding_near_dups_ivf": [
        ("centroid table broadcast for the multi-probe assignment",
         r"BroadcastNestedLoopJoin|BroadcastExchange"),
        ("candidate pairs via a real equi-join on cell (never cross)",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("cosine verify JVM-side (no Python workers)",
         r"^(?!.*ArrowEvalPython)"),
    ],
    "source_temperature": [
        ("single count-per-source shuffle, totals broadcast",
         r"BroadcastNestedLoopJoin|BroadcastExchange"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "lexical_diversity": [
        ("(doc, word) counts + per-doc fold are map-side-combined",
         r"partial_count"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "zipf_fit": [
        ("count agg before the model-sized rank window is partial "
         "(map-side combined)",
         r"partial_count"),
        ("OLS moments are one partial agg per group", r"partial_avg"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "logreg_langid": [
        # the returned SCORING plan: one pass, no shuffle beyond the
        # broadcast-free scan (gradient epochs already ran as aggs)
        ("scoring is shuffle-free (per-row sigmoid over the scan)",
         r"^(?!.*(hashpartitioning|rangepartitioning))"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "bloom_dedup_against": [
        ("bit_or fold into the fixed-size filter is map-side combined",
         r"partial_bit_or"),
        ("filter table broadcast onto the probe",
         r"BroadcastHashJoin"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "cms_words": [
        ("count fold into the fixed-size sketch is map-side combined",
         r"partial_count"),
        ("sketch broadcast onto the point queries", r"BroadcastHashJoin"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "logreg_auc": [
        ("rank window runs over DISTINCT scores (count agg partial, "
         "map-side combined, before the model-sized window)",
         r"partial_count"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "heaps_fit": [
        ("bucket token offsets broadcast back (two-phase, no global "
         "single-partition window)",
         r"BroadcastHashJoin"),
        ("per-word first-position agg is map-side combined",
         r"partial_min"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "ngram_novelty": [
        ("global first-occurrence keeper is a map-side-combined min",
         r"partial_min"),
        ("join-back on the gram hash is a real equi-join (never cross)",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "word_burstiness": [
        ("moment aggs are map-side-combined partials", r"partial_count"),
        ("doc total joined as a 1-row broadcast",
         r"BroadcastNestedLoopJoin|BroadcastExchange"),
        ("final cut is TakeOrderedAndProject (no full sort)",
         r"TakeOrderedAndProject"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "span_dedup": [
        ("global first-occurrence keeper is a map-side-combined min",
         r"partial_min"),
        ("join-back on the span hash is a real equi-join (never cross)",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("coverage mask + rebuild JVM-side (no Python workers)",
         r"^(?!.*ArrowEvalPython)"),
    ],
    "bpe_merges": [
        # the returned plan is the K-row collected rule table; the
        # load-bearing plan is the per-round pair count, audited via
        # bpe_encode_docs below (same trainer) — here just assert the
        # rule table stays a local scan (model state is driver-sized
        # by definition, like k-means centroids)
        ("rule table is a local K-row scan (no shuffle, no Python)",
         r"^(?!.*(Exchange|ArrowEvalPython))"),
    ],
    "pagerank_dups": [
        # per-sweep plan properties (map-side-combined contrib sum,
        # equi-join against the rank vector, 1-row broadcasts) are
        # asserted in tests/test_dedup.py with checkpoint=False — the
        # registered query localCheckpoints per sweep BY DESIGN (the
        # iterative-algorithm rule), so its returned plan is a scan
        ("final rank vector is a checkpoint scan (iteration lineage "
         "truncated by design)", r"Scan ExistingRDD"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "funnel": [
        # counts collect per step (K driver scalars, like k-means
        # centroids); the returned frame is the K-row local summary —
        # audit just pins it Python-free
        ("K-row summary is local and Python-free",
         r"^(?!.*ArrowEvalPython)"),
    ],
    "cohort_retention": [
        ("first-activity min agg is map-side combined", r"partial_min"),
        ("cohort size joins back as a real equi-join",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "hits_words": [
        # half-steps localCheckpoint (iterative rule); returned plan
        # is the final node-sized join pair
        ("final hub/authority vectors join nodes as real equi-joins",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "markov_transitions": [
        ("pair count is map-side combined", r"partial_count"),
        ("row normalization is a state-sized equi-join",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("one lead window partitioned by the user key",
         r"Window"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "markov_stationary": [
        # iterations are localCheckpoint'd (the iterative rule) — the
        # returned plan is the final state-sized join
        ("final vector joins states in a real equi-join",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "stream_cms": [
        ("sketch point queries broadcast-join the sunk cells",
         r"BroadcastHashJoin"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "stream_hll": [
        ("estimate over the sunk registers is a bounded agg, "
         "exact count crossed in as a 1-row broadcast",
         r"BroadcastNestedLoopJoin|BroadcastExchange"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "incremental_read": [
        ("incremental scan is a plain parquet read of the window's "
         "append dirs (no shuffle)", r"^(?!.*Exchange)"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "domain_weights": [
        ("per-doc LM scoring joins are real equi-joins (never cross, "
         "the domain-sized tail is 1-row broadcasts)",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "tokenize_pack": [
        ("id lookup + encodings broadcast to occurrences",
         r"BroadcastHashJoin"),
        ("block re-assembly is a real equi-join/agg (never cross)",
         r"^(?!.*CartesianProduct)"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "jaccard_join": [
        ("prefix candidates + verification are real equi-joins "
         "(never cross)", r"(SortMergeJoin|ShuffledHashJoin|"
         r"BroadcastHashJoin)"),
        ("no cartesian anywhere", r"^(?!.*CartesianProduct)"),
        ("doc-frequency fold is map-side combined", r"partial_count"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "rank_fuse": [
        ("per-key fusion is a map-side-combined partial agg",
         r"partial_sum"),
        ("rank offsets broadcast back (two-phase rank path available)",
         r"(BroadcastHashJoin|RunningWindowFunction|Window)"),
        ("no cartesian product", r"^(?!.*CartesianProduct)"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "platt_scale": [
        # the per-epoch gradient aggs ran at plan-BUILD time (weights
        # fold back as literals), so the returned plan is the scoring
        # pass: base-score stats + one sigmoid projection
        ("base-score stats are map-side-combined partial aggs",
         r"partial_(min|max)"),
        ("no cartesian product on data (1-row weight folds are "
         "literals)", r"^(?!.*CartesianProduct)"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "ks_drift": [
        ("per-side distinct-score folds are map-side combined",
         r"partial_count"),
        ("no cartesian on data (only the 1-row totals broadcast)",
         r"^(?!.*CartesianProduct)"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "psi_drift": [
        ("bin counts are map-side-combined partial aggs",
         r"partial_count"),
        ("no cartesian on data (only the 1-row totals broadcast)",
         r"^(?!.*CartesianProduct)"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "time_resample": [
        ("bucket agg is map-side combined", r"partial_count"),
        ("gap generation is a per-entity explode", r"Generate"),
        ("grid x agg join is a real equi-join (never cross)",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "group_auc": [
        ("distinct-(group,score) fold is a map-side-combined partial "
         "agg", r"partial_count"),
        ("no cartesian product", r"^(?!.*CartesianProduct)"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "perplexity_conformal": [
        ("LM model tables broadcast to the scoring pass",
         r"BroadcastHashJoin"),
        ("no cartesian product", r"^(?!.*CartesianProduct)"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "conformal_gate": [
        ("threshold table broadcast back to the rows",
         r"BroadcastHashJoin"),
        ("no cartesian product", r"^(?!.*CartesianProduct)"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "isotonic_calibrate": [
        ("distinct-score fold is a map-side-combined partial agg",
         r"partial_count"),
        ("fitted map broadcast back to the rows", r"BroadcastHashJoin"),
        ("no cartesian product", r"^(?!.*CartesianProduct)"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "platt_metrics": [
        ("metric summary is one map-side-combined partial avg",
         r"partial_avg"),
        ("label join-back is a real equi-join (never cross)",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "cluster_agreement": [
        ("contingency + marginals are map-side-combined partial aggs",
         r"partial_count"),
        ("one equi-join on the key (never cross on data)",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "weighted_dedup": [
        # the star-contraction rounds ran at plan-BUILD time
        # (localCheckpoint per round), so the returned lineage is the
        # final keeper fold over the converged edge table — the band +
        # verify join shapes are audited on weighted_minhash_pairs
        ("no cartesian product", r"^(?!.*CartesianProduct)"),
        ("all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "weighted_minhash_pairs": [
        ("band equi-join is a real join (never cross)",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("no cartesian product", r"^(?!.*CartesianProduct)"),
        ("signature fold is all JVM-side", r"^(?!.*ArrowEvalPython)"),
    ],
    "minhash_lsh_eval": [
        ("band + prefix + verify joins are real equi-joins (the "
         "1-row count tables may broadcast-nested-loop)",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("no cartesian product", r"^(?!.*CartesianProduct)"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "textrank_words": [
        ("top-k keywords via TakeOrderedAndProject (no full sort)",
         r"TakeOrderedAndProject"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "triangle_stats": [
        ("wedge enumeration + closing probe are real equi-joins "
         "(never cross)", r"(SortMergeJoin|ShuffledHashJoin|"
         r"BroadcastHashJoin)"),
        ("no cartesian anywhere", r"^(?!.*CartesianProduct)"),
        ("per-node fold is map-side combined", r"partial_count"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "bpe_fertility": [
        ("per-word token counts broadcast back to occurrences",
         r"BroadcastHashJoin"),
        ("per-source fold is map-side combined", r"partial_count"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "kn_perplexity": [
        ("bigram model build is map-side combined", r"partial_count"),
        ("model tables meet the token stream in real equi-joins",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("type total is a 1-row broadcast",
         r"BroadcastNestedLoopJoin|BroadcastExchange"),
        ("no Python workers", r"^(?!.*ArrowEvalPython)"),
    ],
    "hll_distinct": [
        ("register fold is a map-side-combined max into <= 2^p groups",
         r"partial_max"),
        ("estimates + exacts meet in a real equi-join on grp",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("hash/rho math JVM-side (no Python workers)",
         r"^(?!.*ArrowEvalPython)"),
    ],
    "bpe_encode_docs": [
        ("encodings computed once per DISTINCT word (map-side-combined "
         "distinct before the replace chain)", r"partial_first|HashAggregate"),
        ("encoded vocab broadcast back to word occurrences",
         r"BroadcastHashJoin"),
        ("replace chain + re-assembly JVM-side (no Python workers)",
         r"^(?!.*ArrowEvalPython)"),
    ],
    "embedding_covariance": [
        # the only corpus-touching stage: explode to (d+1)(d+2)/2 Gram
        # cells, ONE map-side-combined sum into that many groups; the
        # mean/count join-backs are broadcast joins among d-row tables
        ("Gram cells summed via hash aggregate (map-side combined)",
         r"HashAggregate.*partial_sum"),
        ("mean/count join-back broadcast (d-row tables)",
         r"(BroadcastHashJoin|BroadcastNestedLoopJoin)"),
        ("all arithmetic JVM-side (no Python workers)",
         r"^(?!.*ArrowEvalPython)"),
    ],
    "embedding_pca": [
        # the PROJECTION plan: basis baked as literals, centered dots as
        # JVM folds — a map-only stage, nothing aggregates or joins
        ("projection is map-only (no aggregation, no join)",
         r"^(?!.*(HashAggregate|SortMergeJoin|BroadcastHashJoin))"),
        ("fold arithmetic JVM-side (no Python workers)",
         r"^(?!.*ArrowEvalPython)"),
    ],
    "source_ngram_overlap": [
        ("gram self-join is a real equi-join on the gram hash",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("distinct (source, gram) map-side combined",
         r"HashAggregate"),
        ("gram hashing JVM-side (no Python workers)",
         r"^(?!.*ArrowEvalPython)"),
    ],
    "cluster_split": [
        ("component join-back is a real equi-join on the key",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("band self-join never cross", r"^(?!.*CartesianProduct)"),
        ("split assignment JVM-side (no Python workers)",
         r"^(?!.*ArrowEvalPython)"),
    ],
    "sketch_quantiles": [
        ("register fold map-side combined (corpus -> <=1.7k bins/group)",
         r"partial_count"),
        ("quantile pick windows over the REGISTER table, not the corpus",
         r"Window"),
        ("string binning JVM-side (no Python workers)",
         r"^(?!.*ArrowEvalPython)"),
    ],
    # broadcast_benchmark=False: the val-gram side must NOT carry a
    # broadcast hint (AQE may still pick broadcast at sf0.01 from
    # runtime sizes — that is fine; a compile-time hint on a
    # corpus-scale side is not)
    "split_contamination": [
        ("gram join is a real equi-join (never cross)",
         r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
        ("tokenize + gram hashing JVM-side (no Python workers)",
         r"^(?!.*ArrowEvalPython)"),
    ],
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E
    from gbdc_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8,
                      extra={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    lines = [
        "# PLANS — physical-plan audit (auto-generated by tools/plan_audit.py)",
        "",
        f"Scale factor dir: `{sf_dir}`.  Each check greps the",
        "`explain('formatted')` output for the plan property that makes the",
        "query scale-shaped; FAIL means the optimizer picked something else",
        "and the query needs attention.",
        "",
        "| query | check | result |",
        "|---|---|---|",
    ]
    n_fail = 0
    for name, checks in CHECKS.items():
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        flat = " ".join(plan.split())
        for desc, pat in checks:
            if pat.startswith("^(?!"):
                ok = re.match(pat, flat) is not None
            else:
                ok = re.search(pat, flat) is not None
            lines.append(f"| {name} | {desc} | {'ok' if ok else '**FAIL**'} |")
            if not ok:
                n_fail += 1
                print(f"FAIL {name}: {desc}")

    # IVF probe partition pruning needs a written index
    import tempfile

    from gbdc_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = sim.centroids_from_rows(emb, list(range(8)))
    qv = [float(x) for x in emb.first()["embedding"]]
    path = tempfile.mkdtemp(prefix="plan_ivf_")
    sim.ivf_index_write(emb, cents, path)
    cells = sim._probe_cells(cents, qv, 2)
    scan = spark.read.parquet(path).filter(E.F.col("cell").isin(cells))
    plan = scan._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pruned = "PartitionFilters: [" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]
    lines.append(f"| ivf_probe | cell filter reaches PartitionFilters (pruned scan) | {'ok' if pruned else '**FAIL**'} |")
    if not pruned:
        n_fail += 1

    lines += ["", f"Failures: {n_fail}", ""]
    out = "\n".join(lines)
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write(out)
    print(out)
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

"""Partition-invariance contract: same bits under any layout.

The repo's determinism story (README rule 3) claims results are pure
functions of the input — content-hash sampling instead of RNG,
integer fixed-point iteration, order-invariant aggregates, unique
tiebreaks on every LIMIT.  This test pins the claim directly: a
representative query from every family runs once under the suite's
layout (2 shuffle partitions), then again with the shuffle width,
scan-split size, and broadcast threshold all changed mid-session —
the row sets must match EXACTLY (tuple-for-tuple after sorting),
not approximately.

Excluded by design (and only these): q_approx_users and
q_approx_percentiles ride Spark's built-in HLL++/KLL sketches whose
merge results are spec-stable but not bit-pinned across layouts by
this repo's own claims — they are rows-only at the driver for the
same reason.  Every md5-based custom sketch (Bloom/CMS/KMV/HLL-det)
stays in scope.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from open_street_map_data_wrangling_spark.plans import load_all_queries

SF = "/root/testdata/sf0.001"

# one per family, weighted toward ops whose docstrings claim
# layout-independence outright
SAMPLE = (
    "q_sample",                # systematic sampler (content ordering)
    "q_stratified_sample",     # md5-hash keep rule
    "q_weighted_sample",       # md5 threshold vs weight
    "q_reservoir_per_key",     # per-key md5 order row_number
    "q_curriculum",            # global sequence via bucket offsets
    "q_top_users",             # heap top-k with tiebreak
    "q_rank_users",            # dense_rank + WindowGroupLimit
    "q_tpch_q15",              # rank()=1 max-with-ties
    "q_dedup_exact",           # hash-groupBy representative
    "q_dedup_near",            # LSH banding pipeline
    "q_dedup_clusters",        # iterative connected components
    "q_pagerank",              # integer fixed-point iteration
    "q_triangle_count",        # degree-oriented wedge join
    "q_semantic_dedup",        # Lloyd fixed rounds + greedy prune
    "q_contrastive_pairs",     # hash-ring negatives
    "q_mixture_plan",          # md5 Bernoulli keep
    "q_dsir_weights",          # integer log-weights
    "q_lm_surprisal",          # trained LM scoring
    "q_bpe_merges",            # sequential argmax merges
    "q_hll_det",               # md5-deterministic HLL
    "q_cms_topk",              # md5-deterministic CMS
    "q_bloom_prune",           # md5-deterministic Bloom
    "q_funnel_window",         # chained window mins + guarded ratios
    "q_boilerplate_strip",     # corpus rewrite
    "q_ivfpq_serve",           # persisted-index build + serve
    "q_winnow",                # winnowing full-window minima
    "q_label_prop",            # fixed-round synchronous propagation
    "q_shard_plan",            # two-stage distributed prefix sum
    "q_dup_spans",             # stride-1 gram coverage windows
    # round 9 additions
    "q_dup_strip",             # exact-md5-gram destructive rewrite
    "q_training_corpus",       # 4-stage composed rewrite manifest
    "q_hard_negatives",        # scaled codebook + md5 cell sampling
    "q_batch_plan",            # ceil-pow2 buckets, integer waste
    "q_bpe_efficiency",        # BPE state join, per-lang fertility
    "q_bitext_mine",           # margin mining in IVF cells
    "q_fuzzy_contamination",   # LSH pairs across the md5 split
    "q_kcore",                 # fixed-round degree peel
    "q_dedup_savings",         # component token accounting
    "q_image_pixels",          # PNG codec roundtrip sums
    "q_text_search",           # conjunctive posting intersection
    "q_ann_lsh_multiprobe",    # Hamming-1 bucket probing
    "q_lsh_audit",             # sampled exact-Jaccard audit
    "q_budget_select",         # quality-ranked budget admission
    "q_embedding_health",      # integer-quantized norm envelope
    # round 10 additions
    "q_bm25",                  # integer fixed-point ranked retrieval
    "q_ann_rerank",            # ADC shortlist -> exact integer rerank
    "q_temperature_mix",       # integer-sqrt temperature shares
    "q_containment",           # candidate-bounded hashed intersection
    "q_gram_novelty",          # min-doc gram attribution
    "q_pmi_phrases",           # floor-decomposed whole-bit PMI
    "q_keep_best",             # quality-ranked cluster survivor
    "q_audio_pcm",             # WAV/PCM codec roundtrip sums
    "q_source_overlap",        # gram-keyed source-pair matrix
    "q_int8_quant",            # fixed-point recon-error sums
    "q_int8_recall",           # literal-scale integer ranking
    "q_langid_confusion",      # classifier-audit roll-up
    "q_rrf_fusion",            # integer reciprocal-rank fusion
    "q_vec_topk_filtered",     # pushed-predicate vector top-k
    "q_jaccard_hist",          # integer-bucketed candidate Jaccard
    # round 11 additions
    "q_keep_best_containment",  # LSH ∪ containment edge clustering
    "q_image_jpeg",            # baseline-JFIF codec roundtrip sums
    "q_image_gif",             # GIF87a/LZW codec roundtrip sums
    "q_maxsim",                # candidate-bounded integer MaxSim
    "q_epoch_shuffle",         # seeded permutation, two-pass rank
    "q_loader_batches",        # prefix-sum token batching
    "q_rrf_served",            # persisted-index hybrid serve
    "q_loss_mask",             # islands-merged dup-span intervals
    "q_bm25_batch",            # one-pass multi-query ranked retrieval
    "q_ivfpq_batch",           # union-cell batched ANN serving
    "q_rrf_batch",             # two-scan batched hybrid fusion
    "q_maxsim_batch",          # in-engine lane-vector MaxSim batch
)

_ALT = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.files.maxPartitionBytes": "262144",
    "spark.sql.autoBroadcastJoinThreshold": "1024",
}


def _rows(spark, name):
    df = load_all_queries()[name].spark(spark, SF)
    return sorted(tuple(r) for r in df.collect())


def test_sampled_queries_identical_under_relayout(spark):
    qs = load_all_queries()
    missing = [n for n in SAMPLE if n not in qs]
    assert not missing, missing
    baseline = {n: _rows(spark, n) for n in SAMPLE}
    saved = {k: spark.conf.get(k, None) for k in _ALT}
    try:
        for k, v in _ALT.items():
            spark.conf.set(k, v)
        mismatches = []
        for n in SAMPLE:
            again = _rows(spark, n)
            if again != baseline[n]:
                mismatches.append(
                    f"{n}: {len(baseline[n])} rows -> {len(again)} rows, "
                    f"first diff {next((a, b) for a, b in zip(baseline[n], again) if a != b) if len(again) == len(baseline[n]) else 'row-count'}"
                )
        assert not mismatches, "\n".join(mismatches)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

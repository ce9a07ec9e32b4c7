"""Physical-plan regression tests — the PLANS.md claims, CI-guarded.

Each assertion pins a plan property the 100 TB posture depends on;
if a refactor silently reintroduces a global sort, a second fact
scan, or a lost pushdown, these fail before any bench regression is
even measured. Plans are inspected pre-execution (AQE isFinalPlan=
false), which is sufficient for node-type and scan-count checks.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pytest

from open_street_map_data_wrangling_spark.plans import load_all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plans(spark):
    qs = load_all_queries()

    def plan_of(name):
        return qs[name].spark(spark, SF)._jdf.queryExecution().executedPlan().toString()

    return plan_of


def test_topk_uses_heap_not_global_sort(plans):
    p = plans("q_top_users")
    assert "TakeOrderedAndProject" in p


def test_topk_per_group_prunes_map_side(plans):
    assert "WindowGroupLimit" in plans("q_topk_per_group")


def test_q15_single_lineitem_scan_with_group_limit(plans):
    p = plans("q_tpch_q15")
    assert p.count("lineitem.parquet") == 1
    assert "WindowGroupLimit" in p


def test_filter_pushdown_reaches_scan(plans):
    p = plans("q_filter")
    assert "PushedFilters: [" in p and "IsNotNull" in p


def test_star_join_broadcasts_dimensions(plans):
    p = plans("q_star_join")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p  # no dim join should shuffle lineitem


def test_tpch_q8_all_dims_broadcast(plans):
    """The two-fact five-dim market-share join: every dim side must
    broadcast (r05 flagged a +18 % bench drift; isolated profiling
    attributed it to suite scheduling noise with this plan unchanged —
    this pin turns any real broadcast loss into a CI failure, not a
    bench mystery)."""
    p = plans("q_tpch_q8")
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    assert p.count("BroadcastHashJoin") >= 7


def test_asof_join_single_exchange(plans):
    p = plans("q_asof_join")
    # one hash exchange for the unioned stream; broadcasts don't count
    assert p.count("Exchange hashpartitioning") == 1


def test_curriculum_no_corpus_global_window(plans):
    p = plans("q_curriculum")
    # the only single-partition exchange feeds the tiny offset table,
    # which sits under a HashAggregate of the bucket counts
    assert p.count("Exchange SinglePartition") == 1


def test_no_cartesian_products_anywhere(spark):
    qs = load_all_queries()
    offenders = []
    for name, q in qs.items():
        plan = q.spark(spark, SF)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"CartesianProduct in: {offenders}"


def test_ntile_no_global_sort_over_fact(plans):
    """q_ntile's distributed exact-rank rewrite: ranking happens in a
    window hash-partitioned on the range-bucket id; the orders table
    is never globally sorted (no rangepartitioning exchange) and no
    un-partitioned WindowExec exists anywhere in the plan."""
    p = plans("q_ntile")
    assert "Exchange hashpartitioning(bid" in p
    assert "rangepartitioning" not in p
    # exactly one WindowExec — the bid-partitioned row_number; the
    # 32-row offset cumsum is a broadcast self-join, not a window
    assert p.count("Window [") == 1
    # cutpoint + sizes passes materialized via localCheckpoint at
    # build time; the final plan scans orders exactly once
    assert p.count("orders.parquet") == 1


def test_sequence_gaps_block_partitioned(plans):
    """q_sequence_gaps: the fact-table lead() rides a hashpartitioning
    exchange on the block id; the only SinglePartition exchange feeds
    the per-block (min,max) summary — i.e. post-aggregation, n/1024
    rows — never the raw events."""
    p = plans("q_sequence_gaps")
    assert "Exchange hashpartitioning(blk" in p
    assert "rangepartitioning" not in p
    # the block-summary lead() runs in an explicitly-pinned one-task
    # window (partitionBy(blk % 1) over n/1024 aggregated rows); the
    # raw events never hit a SinglePartition exchange
    assert "Exchange SinglePartition" not in p


def test_lsh_pair_generation_shape(plans):
    """Round-4 form: candidate pairs come from a count-prepass-pruned
    bucket aggregate + row-local combinations.  The only joins allowed
    are the co-partitioned bucket-size prune (and, for simhash, the
    recall-preserving over-cap fallback); the quadratic shapes stay
    banned: no broadcast/nested-loop pair join, no single-partition
    exchange, no count-over-window sort (the round-2 form paid a
    window plus a full band-table self-join)."""
    for q in ("q_dedup_near", "q_simhash_near"):
        p = plans(q)
        assert "BroadcastNestedLoopJoin" not in p, q
        assert "CartesianProduct" not in p, q
        assert "Exchange SinglePartition" not in p, q
        assert "Window" not in p, q


def test_lsh_prune_reuses_band_exchange(spark):
    """The bucket-size count prepass must ride the SAME
    hashpartitioning(bi, bv) exchange as the member aggregate
    (ReusedExchange in the post-execution adaptive plan) — the prepass
    is only ~free because the band shuffle happens once."""
    qs = load_all_queries()
    df = qs["q_dedup_near"].spark(spark, SF)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in p, "count prepass no longer shares the band exchange"


def test_ngram_jaccard_reuses_shingle_exchange(spark):
    """The fused ngram form shingles the corpus text once; the other
    consumers of the (lang, sh) aggregate must ride a ReusedExchange
    in the POST-execution adaptive plan (pre-AQE plans repeat the
    subtree textually, so this property is only visible on the final
    plan of an executed query)."""
    qs = load_all_queries()
    df = qs["q_dedup_ngram"].spark(spark, SF)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in p, "shingle exchange no longer shared"


def test_sparse_sim_posting_join_reuses_exchange(spark):
    """The posting self-join's two sides are canonically identical
    subtrees (one corpus scan + one tf aggregate + two windows), so
    the second side must be a ReusedExchange in the post-execution
    adaptive plan, and the top-20 must be a heap, not a global sort.
    The first draft re-derived the tf aggregate from the scan for the
    df cutoff, the norms, and each join side — 8 corpus scans."""
    qs = load_all_queries()
    df = qs["q_sparse_sim"].spark(spark, SF)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in p, "posting join no longer shares the exchange"
    assert "TakeOrderedAndProject" in p


def test_funnel_steps_one_exchange_one_sort(plans):
    """Three stacked sequence flags + the per-user reduction must ride
    ONE user_id exchange and ONE sort (the chained Window operators
    share the spec; the groupBy reuses the partitioning)."""
    p = plans("q_funnel_steps")
    assert p.count("Exchange hashpartitioning") == 1
    assert p.count("+- Sort") == 1


def test_repetition_is_shuffle_free(plans):
    """Per-document statistics must never leave their row: the
    round-3 q_repetition plan contains no exchange of any kind (the
    round-2 form shuffled the exploded gram stream twice)."""
    p = plans("q_repetition")
    assert "Exchange" not in p


def test_scd2_merge_broadcasts_delta_snapshot_never_shuffles(plans):
    """cdc.py's core claim: the SCD2 merge is two broadcastable LEFT
    joins (a full-outer would hash-shuffle the snapshot); the customer
    snapshot must stream map-side through both."""
    p = plans("q_scd2_merge")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "ShuffledHashJoin" not in p
    # r07: the fixture-derived delta is checkpoint-fed — without the
    # pin, re-deriving it per reference cost 23 FileScans (3 snapshot
    # filters x 3 consumers + the joins' own scans); now it is the
    # documented full-rows + keys-only snapshot split plus the one
    # embedded lazy-checkpoint subplan.
    assert p.count("Scan parquet") <= 3


def test_reservoir_per_key_prunes_map_side(plans):
    """Per-key reservoir must plan WindowGroupLimit so each map task
    keeps only its local top-20 per lang before the exchange — the
    bounded-shuffle property that survives language skew at scale."""
    assert "WindowGroupLimit" in plans("q_reservoir_per_key")


def test_weighted_sample_is_scan_side(plans):
    """The weighted-sample predicate is rowwise against a 1-row
    broadcast scalar: no shuffle of the corpus may appear."""
    p = plans("q_weighted_sample")
    assert "SortMergeJoin" not in p
    assert "ShuffledHashJoin" not in p
    assert p.count("Exchange hashpartitioning") == 0


def test_pq_code_assignment_is_row_local(plans):
    """PQ code assignment folds over plan-literal codebooks: no hash
    exchange may appear (the only exchange is the presentation
    sort's range partitioning)."""
    p = plans("q_pq_codes")
    assert "Exchange hashpartitioning" not in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_interval_bucket_join_is_equi_not_nlj(plans):
    """The bucketized interval join must plan a hash join on the
    bucket key — no nested loop anywhere (the rewrite's entire
    point; with two huge sides it degrades to a keyed shuffle,
    never to O(points x intervals))."""
    p = plans("q_interval_bucket_join")
    assert "BroadcastHashJoin" in p
    assert "NestedLoop" not in p


def test_winsorize_broadcasts_cutpoints(plans):
    """The percentile cutpoint table is O(groups): it must broadcast
    back onto the fact scan, never shuffle the fact for the join."""
    p = plans("q_winsorize")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_user_overlap_reuses_distinct_exchange(spark):
    """The audience-overlap self-join runs on the DEDUPLICATED
    (type, user) table; its multiple consumers must share the
    distinct's exchange at runtime (ReusedExchange in the
    post-execution adaptive plan — pre-AQE plans repeat the subtree
    textually, so this is only visible after execution, same caveat
    as the LSH reuse pins)."""
    qs = load_all_queries()
    df = qs["q_user_overlap"].spark(spark, SF)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in p
    assert "CartesianProduct" not in p


def test_bloom_probe_never_shuffles_fact(plans):
    """q_bloom_prune's whole point: the lineitem probe side must see
    only broadcast joins (words + truth) — a SortMergeJoin would mean
    the fact shuffled for a membership test a few-KB broadcast bitmap
    answers row-local."""
    p = plans("q_bloom_prune")
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") >= 4  # 3 word probes + truth
    # the only hash-partitioned exchange is the tiny word build side
    assert p.count("lineitem.parquet") == 1


def test_hll_det_single_scan_single_fact_shuffle(plans):
    """HLL + exact distinct share ONE events scan; the only wide
    exchange carries the (event_type, bucket) partial aggregate —
    at most m=256 rows per group per mapper."""
    p = plans("q_hll_det")
    assert p.count("events.parquet") == 1


def test_funnel_window_one_exchange(plans):
    """Three chained whole-partition MIN windows + the per-user
    reduction must all ride ONE hashpartitioning(user_id) exchange —
    the q_funnel_steps floor plan, preserved under the time-bounded
    variant."""
    p = plans("q_funnel_window")
    assert p.count("Exchange hashpartitioning") == 1
    assert p.count("events.parquet") == 1


def test_ann_recall_family_is_checkpoint_fed(plans):
    """The r06 scan-amplification finding, closed: the recall audits
    used to re-derive assignment + query helpers per branch — 24
    FileScans of the embeddings parquet for the multiprobe curve, 12
    for IVF-PQ.  Both now build ONE row-local scored base (literal
    codebook/query, no assignment join, no window shuffle), lazily
    localCheckpoint it, and fan every branch out from the checkpoint:
    the executed plan must contain NO parquet scans at all (the base
    materializes once, in the checkpoint job)."""
    for q in ("q_ann_recall_multiprobe", "q_ivfpq_recall", "q_ann_recall"):
        p = plans(q)
        assert p.count("Scan parquet") == 0, q
        assert "ExistingRDD" in p, q


def test_ivfpq_serve_is_partition_pruned(plans):
    """The persisted-index serving path: the returned plan must read
    ONLY the codes/ parquet (never the corpus table), and the scan
    must carry PartitionFilters on cid — IVF pruning realized as
    partition-directory pruning, the property that makes the probe
    read nprobe/C of the index at any scale."""
    p = plans("q_ivfpq_serve")
    assert p.count("Scan parquet") == 1
    assert "embeddings.parquet" not in p
    assert "PartitionFilters" in p and "cid" in p
    assert "TakeOrderedAndProject" in p


def test_rrf_served_is_partition_pruned(plans):
    """The hybrid-retrieval serving path (q_rrf_served): the returned
    plan must read ONLY index artifacts — the BM25 postings scan
    partition-pruned on the token-hash bucket and the codes/ scan
    partition-pruned on the probed IVF cells — and NEVER the
    documents or embeddings corpus tables.  Two FileScans total; the
    raw vectors ride in codes/ where column pruning serves them to
    the rerank without a separate artifact."""
    p = plans("q_rrf_served")
    assert p.count("Scan parquet") == 2
    assert "documents.parquet" not in p
    assert "embeddings.parquet" not in p
    assert "PartitionFilters" in p
    assert "bkt" in p and "cid" in p


def test_bm25_batch_filtered_prunes_buckets_not_sources(plans):
    """q_bm25_batch_filtered: the postings scan stays pruned to the
    union of the batch's token-hash buckets (PartitionFilters on
    bkt) with NO source predicate pushed into it — per-term df is
    computed from the scanned postings, and a scan-level source
    filter would silently turn global idf into per-source idf.  The
    per-query equality lives above the df window instead; zero
    corpus scans."""
    p = plans("q_bm25_batch_filtered")
    assert "documents.parquet" not in p
    assert "PartitionFilters" in p and "bkt" in p
    # the source column is read (ReadSchema) but never pushed as a
    # scan filter — 'source' must not appear in the pushed/partition
    # filter clauses
    import re

    scan = re.search(r"PushedFilters: \[[^\]]*\]", p)
    assert scan and "source" not in scan.group(0)
    assert "WindowGroupLimit" in p


def test_proximity_served_is_partition_pruned(plans):
    """q_proximity_served: the serve plan must read ONLY the grid
    store — one FileScan, never the customer table — with the union
    of the queries' probe superblocks as PartitionFilters (gbx/gby):
    the spatial realization of index pruning, the property that
    keeps a batch of radius queries reading O(probe blocks) of a
    100 TB point corpus."""
    p = plans("q_proximity_served")
    assert p.count("Scan parquet") == 1
    assert "customer.parquet" not in p
    assert "PartitionFilters" in p and "gbx" in p and "gby" in p


def test_ivfpq_batch_filtered_pushes_label_predicate(plans):
    """q_ivfpq_batch_filtered: the union of the batch's requested
    labels must reach the codes FileScan as a data filter (the index
    carries the label column, so row groups prune before any ADC
    arithmetic) ON TOP of the union-probe-cell partition pruning —
    and the corpus table stays untouched at serve time (the bounded
    probe-vector collect is the only embeddings read, driver-side)."""
    p = plans("q_ivfpq_batch_filtered")
    assert "PartitionFilters" in p and "cid" in p
    assert "label" in p and "IN (2,5,7)" in p
    assert "WindowGroupLimit" in p


def test_rrf_batch_filtered_pushes_per_leg_semantics(plans):
    """q_rrf_batch_filtered: the per-leg filter placement is a PLAN
    property — the union of requested sources must reach the codes
    scan as a PushedFilter (X92 semantics: nothing statistical
    derives from it) while the postings scan must NOT carry a source
    pushdown (X97 semantics: df is computed from the scanned
    postings; pushing would corrupt global idf).  Zero corpus
    scans."""
    import re

    p = plans("q_rrf_batch_filtered")
    assert "documents.parquet" not in p
    assert "embeddings.parquet" not in p
    assert "PartitionFilters" in p and "bkt" in p and "cid" in p
    pushed = re.findall(r"PushedFilters: \[[^\]]*\]", p)
    assert any("In(source, [src1,src3,src7]" in s for s in pushed)
    assert not any("source" in s and "In(tok" in s for s in pushed)
    assert "WindowGroupLimit" in p


def test_maxsim_batch_filtered_reads_only_index(plans):
    """q_maxsim_batch_filtered: candidates, their metadata, and the
    token rows all come from the persisted posting index (the doc's
    source rides in the same pruned scan that found it) — zero
    corpus scans, no cartesian, per-query heaps."""
    p = plans("q_maxsim_batch_filtered")
    assert "documents.parquet" not in p
    assert p.count("Scan parquet") <= 5
    assert "PartitionFilters" in p and "bkt" in p
    assert "CartesianProduct" not in p
    assert "WindowGroupLimit" in p


def test_image_dedup_checkpoint_fed_no_allpairs(plans):
    """q_image_dedup: the codec+fingerprint stage materializes ONCE
    into a checkpoint (the band explode and both verify sides consume
    12 bytes/image from it — re-entering the Python codec per
    consumer is the q_simhash_near scan-amplification trap), and the
    candidate join is band-bucketed equi-join only — an all-pairs
    plan here would be quadratic in corpus size."""
    p = plans("q_image_dedup")
    assert "ExistingRDD" in p
    assert p.count("Scan parquet") == 0
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p


def test_audio_dedup_checkpoint_fed_no_allpairs(plans):
    """q_audio_dedup: same contract as its image sibling — the
    codec+fingerprint stage materializes once into a checkpoint
    (banding and both verify sides consume 12 bytes/clip from it),
    and the candidate join is band-bucketed equi-join only."""
    p = plans("q_audio_dedup")
    assert "ExistingRDD" in p
    assert p.count("Scan parquet") == 0
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p


def test_tombstone_served_reads_only_purged_indexes(plans):
    """The four-way post-purge serve (q_tombstone_served): the
    returned plan must read ONLY purged index artifacts — never the
    documents or embeddings corpus tables — with the postings scans
    partition-pruned on the token-hash bucket and the codes scans on
    the probed IVF cells.  Seven index scans total (bm25 1, rrf's two
    legs, maxsim's candidate+token pair, ivfpq's codes probe); if a
    corpus table ever reappears here the purge stopped being the
    thing that answers queries."""
    p = plans("q_tombstone_served")
    assert "documents.parquet" not in p
    assert "embeddings.parquet" not in p
    assert p.count("Scan parquet") <= 7
    assert "PartitionFilters" in p
    assert "bkt" in p and "cid" in p


def test_multimodal_dedup_checkpoint_cuts_hold(plans):
    """q_multimodal_dedup (VERDICT r12 #8, r13: pair CACHE): the
    four pair pipelines live behind the content-tagged pair cache,
    so the returned components+report plan must read ONLY the
    |pairs|-sized cached relations — documents.parquet must never
    appear, and a future edit that silently re-expands the codec/LSH
    stages into the components iteration re-adds document scans and
    fails here.  The pair caches themselves are parquet, so scans of
    `pairs_` dirs are exactly what SHOULD be visible."""
    p = plans("q_multimodal_dedup")
    assert "documents.parquet" not in p
    assert "osm_spark_idx_pairs_" in p  # reads the pair cache...
    assert "mapInPandas" not in p.lower()  # ...never the codecs
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p


def test_family_registry_serves_from_store_only(plans):
    """q_family_registry: the served per-family report must read
    ONLY the maintained label store — one parquet scan, zero
    documents scans, no pair pipeline in the serve plan (the edge
    folding happened at merge time, behind the cache)."""
    p = plans("q_family_registry")
    assert "documents.parquet" not in p
    assert p.count("Scan parquet") == 1
    assert "CartesianProduct" not in p


def test_contamination_served_checks_from_store_only(plans):
    """q_contamination_served: the gate's returned plan must answer
    from the band STORE plus the test batch's checkpointed bands —
    zero documents scans at check time (the train corpus was read
    once, during the amortized store build).  Two store reads by
    design: the bucket-cap sizes prepass and the pair join."""
    p = plans("q_contamination_served")
    assert "documents.parquet" not in p
    assert p.count("Scan parquet") == 2
    assert "ExistingRDD" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p


def test_image_gate_checks_from_store_only(plans):
    """q_image_gate: screening the upload batch must read ONLY the
    fingerprint store (one scan) and the batch's checkpointed
    fingerprints — zero documents scans and zero corpus re-decodes
    at check time; the candidate join stays a band equi-join."""
    p = plans("q_image_gate")
    assert "documents.parquet" not in p
    assert p.count("Scan parquet") == 1
    assert "ExistingRDD" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p


def test_epoch_order_family_has_no_single_partition_window(plans):
    """q_epoch_shuffle / q_loader_batches: the global rank and the
    running token prefix sum must compile to a BUCKET-partitioned
    window (hashpartitioning on the ordered hash-range bucket) plus a
    range-partitioned output sort — NEVER a SinglePartition exchange,
    which is the global-window trap that serializes the whole corpus
    through one task at 100 TB.  The bounded ≤64-row offset
    prefix-sum lives driver-side and leaves no plan node."""
    import re

    for q in ("q_epoch_shuffle", "q_loader_batches",
              "q_loader_batches_model"):
        p = plans(q)
        assert "SinglePartition" not in p, q
        assert re.search(r"hashpartitioning\(bkt", p), q
        assert "rangepartitioning" in p, q


def test_plan_report_fresh_and_scan_claims_hold():
    """PLAN_REPORT.md is the judge-facing evidence artifact; a stale
    one silently re-reports plan defects that were already fixed (the
    r06 report carried pre-collapse scan counts for the sketch
    family).  Two checks: (1) the report's recorded Operators-digest
    must equal a live recompute over operators/*.py — content-based,
    because the first (git-timestamp) form of this rule could not see
    that a regeneration which changed no plans leaves nothing to
    commit, so the report's commit time never advances past a
    plan-neutral operators commit; (2) the report's scans column must
    agree with the pinned zero-scan families, so the report and the
    plan tests cannot tell different stories."""
    import re
    import sys as _sys

    repo = Path(__file__).resolve().parents[1]
    _sys.path.insert(0, str(repo / "tools"))
    from gen_plan_report import operators_digest

    text = (repo / "PLAN_REPORT.md").read_text()
    m = re.search(r"Operators-digest: `([0-9a-f]{16})`", text)
    assert m, "PLAN_REPORT.md predates the digest stamp — regenerate it"
    assert m.group(1) == operators_digest(str(repo)), (
        "PLAN_REPORT.md was generated against different operators/ "
        "sources — rerun tools/gen_plan_report.py and commit the result"
    )
    scans = {}
    with open(Path(repo) / "PLAN_REPORT.md") as f:
        for line in f:
            if line.startswith("## Scan-count drift"):
                break
            parts = [p.strip() for p in line.split("|")]
            if len(parts) >= 4 and parts[1].startswith("q_"):
                try:
                    scans[parts[1]] = int(parts[2])
                except ValueError:
                    pass
    assert len(scans) > 150  # the whole registry is inventoried
    for q in ("q_ann_recall_multiprobe", "q_ivfpq_recall", "q_kmv_overlap"):
        assert scans[q] == 0, f"{q} re-amplified to {scans[q]} scans"
    assert scans["q_ivfpq_serve"] == 1  # codes/ only, never the corpus


def test_semantic_dedup_serving_is_checkpoint_fed(plans):
    """semantic_dedup's tagged table feeds three consumers (both
    self-join sides + the is_kept join-back); the lazy checkpoint
    makes the serving plan read zero parquet — the corpus is scanned
    only inside the bounded Lloyd-training jobs, not per branch."""
    p = plans("q_semantic_dedup")
    assert p.count("Scan parquet") == 0
    assert "ExistingRDD" in p


def test_ann_probe_queries_single_scan_no_window(plans):
    """r07 collapse of the probe family: q_ann_ivf / multiprobe /
    lsh each compile to exactly ONE table scan with literal
    codebook/plane assignment — no join-based assignment, no
    per-vector window shuffle, top-k as a heap.  (The recall audits
    are pinned at zero scans separately — they fan multiple branches
    off a checkpoint; a single-consumer probe keeps the straight
    scan shape instead.)"""
    for q in ("q_ann_ivf", "q_ann_ivf_multiprobe", "q_ann_lsh"):
        p = plans(q)
        assert p.count("Scan parquet") == 1, q
        assert "Window [" not in p, q
        assert "SortMergeJoin" not in p, q
        assert "TakeOrderedAndProject" in p, q
    # the LSH probe is fully join-free — bucket is a row-local sum
    assert "Join" not in plans("q_ann_lsh")


def test_round7_text_pipeline_scan_counts(plans):
    """The r07 text-pipeline additions hold their scan budgets:
    q_lm_surprisal reads the corpus once (the LM-counts diamond is
    checkpoint-cut, not compiled twice), q_dsir_weights reads it once
    (bucket stats checkpoint + broadcast), and q_mixture_plan's apply
    pass reads once with its 5-row stats behind the checkpoint (the
    stats pass pays its own single scan at materialization, like the
    LM counts).  q_boilerplate_strip (re-pinned r08 after the
    write_clean_corpus refactor re-amplified it to 3 scans): the
    hash-only chunks relation is checkpoint-cut so freq and
    removed_map share one base — 1 visible FileScan (the row-local
    rebuild join) + 2 ExistingRDD consumers of the chunk base, i.e.
    exactly two corpus reads at runtime."""
    assert plans("q_lm_surprisal").count("documents.parquet") == 1
    assert plans("q_dsir_weights").count("documents.parquet") == 1
    p = plans("q_boilerplate_strip")
    assert p.count("documents.parquet") == 1
    assert p.count("ExistingRDD") == 2
    assert plans("q_mixture_plan").count("documents.parquet") == 1


def test_round8_dedup_family_scan_collapse(plans):
    """r08 extension of the r07 ANN scan-collapse sweep to the
    simhash/minhash family (the two `weak` items in VERDICT r07):
    q_simhash_near's fingerprint base is checkpoint-cut before the
    band self-join (was 8 executed FileScans — every join side
    recompiled tokenize+score from the corpus), and
    q_minhash_estimate's candidate-member shingle relation is
    checkpoint-cut before its three consumers (was 7).  Both now
    compile to ZERO visible corpus FileScans — the corpus is read
    once per checkpointed base at materialization."""
    for q in ("q_simhash_near", "q_minhash_estimate"):
        assert plans(q).count("documents.parquet") == 0, q


def test_round8_residual_diamond_cuts(plans):
    """Last two same-table rescans found by the r08 full-registry
    sweep, closed with the standard checkpoint cut:
    q_domain_shift's 64-row head-token table fed THREE consumers
    (score filter join, dots join, n2c norm), each recompiling the
    full-vocabulary corpus aggregate — was 4 compiled documents
    scans, now 1 visible (the sc tokenize pass) + the checkpointed
    head base. q_bloom_prune's (word, mask) filter table fed k=3
    probe joins, each rebuilding the dim aggregate — was 4 compiled
    orders scans, now 1 visible (the exact-truth side) + the
    checkpointed words base; probe side stays broadcast-only
    (pinned separately in test_bloom_probe_never_shuffles_fact)."""
    assert plans("q_domain_shift").count("documents.parquet") == 1
    assert plans("q_bloom_prune").count("orders.parquet") == 1


def test_triangle_count_checkpoint_fed_no_blowup(plans):
    """q_triangle_count follows the graph-family discipline: the LSH
    pair pipeline lives inside the edge checkpoint (zero visible
    corpus scans — materialized once), the oriented edge list is one
    checkpoint shared by all three join roles, and the wedge/closure
    joins are equi-joins — no nested-loop or cartesian forms, so the
    only quadratic risk (wedge count) is bounded by the degree
    orientation, not by the join strategy."""
    p = plans("q_triangle_count")
    assert p.count("documents.parquet") == 0
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_contrastive_pairs_candidate_bounded(plans):
    """q_contrastive_pairs: the embeddings joins live inside the
    checkpointed verified-pairs relation (computed once — uncut, the
    direction union recompiled them per branch: measured 4 compiled
    embeddings scans), so the compiled plan shows ZERO embeddings
    scans and exactly one documents scan (the negative-sampling hash
    ring).  No all-pairs forms anywhere: positives are
    candidate-bounded, negatives are a per-bucket window."""
    p = plans("q_contrastive_pairs")
    assert p.count("embeddings.parquet") == 0
    assert p.count("documents.parquet") == 1
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_hard_negatives_cell_bounded(plans):
    """q_hard_negatives: the tagged (vec_id, cid, embedding) base is
    checkpoint-fed (zero visible embeddings scans — assignment is a
    row-local fold computed once), the within-cell self-join is an
    equi-join on cid (never an all-pairs form), and the per-anchor
    top-1 window carries a map-side WindowGroupLimit prune.  The two
    documents scans are the inline LSH pair pipeline's own pinned
    shape (ReusedExchange at runtime, see the q_dedup_near pins)."""
    p = plans("q_hard_negatives")
    assert p.count("embeddings.parquet") == 0
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "WindowGroupLimit" in p


def test_comovement_checkpoint_fed_heap_topk(plans):
    """q_comovement: the distinct-visits base is checkpointed once
    (zero visible events scans — read at materialization) and feeds
    the occupancy filter, both self-join sides, and the size lookups;
    the pair join is an equi-join on (cell, hr) and the final top-20
    is a heap (TakeOrderedAndProject), never a global sort."""
    p = plans("q_comovement")
    assert p.count("events.parquet") == 0
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p


def test_pq_recall_no_query_row_rescan(plans):
    """The probe vector rides as a plan literal (r07 close-out item
    1): q_pq_recall is two embeddings scans (codes side + exact
    ground-truth side) with no BroadcastNestedLoopJoin left."""
    p = plans("q_pq_recall")
    assert p.count("embeddings.parquet") == 2
    assert "BroadcastNestedLoopJoin" not in p


def test_round8_wave4_scan_shapes(plans):
    """Round-8 wave-4 ops enter with their scan budgets pinned:
    q_winnow is the ideal shape — ONE documents scan, every window
    (lead, min-over-frame) and the final groupBy partitioned by
    doc_id so the whole op is one shuffle; q_shard_plan reads
    documents exactly TWICE by design (the inherent two-pass shape
    of a distributed prefix sum: subtotal pass, then place pass —
    see its docstring for why a checkpoint cut would be worse);
    q_label_prop follows the graph-family discipline (edge +
    label checkpoints, zero visible corpus scans, equi-joins only)."""
    assert plans("q_winnow").count("documents.parquet") == 1
    assert plans("q_shard_plan").count("documents.parquet") == 2
    p = plans("q_label_prop")
    assert p.count("documents.parquet") == 0
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_winnow_single_exchange_pipeline(plans):
    """All three window specs and the final aggregation in q_winnow
    hash-partition on doc_id: exactly one Exchange hashpartitioning
    round for the doc column, no second shuffle for the groupBy."""
    p = plans("q_winnow")
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\(([^,]+)", p)
    assert exchanges, p
    assert all(e.startswith("doc_id") for e in exchanges), exchanges


def test_dup_spans_checkpoint_fed_single_derivation(plans):
    """q_dup_spans: the hash-only gram base is checkpointed once
    (0 visible documents scans — read at materialization), so the
    dup-set groupBy and the flag join share one derivation; no
    cartesian/BNLJ forms anywhere in the span pipeline."""
    p = plans("q_dup_spans")
    assert p.count("documents.parquet") == 0
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_winnow_pairs_checkpoint_fed_capped(plans):
    """q_winnow_pairs: the distinct print relation is checkpointed
    once feeding the crowd count and both join sides (0 visible
    documents scans), the pair join is an equi-join on the print
    (no cartesian/BNLJ), and the crowd cap sits before the self-join
    so no quadratic bucket can form."""
    p = plans("q_winnow_pairs")
    assert p.count("documents.parquet") == 0
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_dup_strip_two_pass_no_text_on_gram_shuffle(plans):
    """q_dup_strip reads documents exactly twice — the checkpointed
    hash-only gram pass (invisible) plus the token rebuild pass —
    and keeps every join an equi-join."""
    p = plans("q_dup_strip")
    assert p.count("documents.parquet") == 1  # rebuild scan; gram base checkpointed
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_training_corpus_stagewise_checkpoints(plans):
    """q_training_corpus (r09 composition): each rewrite stage's
    corpus-sized output is checkpointed exactly once, so the visible
    plan reads documents ONCE (the input-manifest count row) and
    every other stage/manifest branch consumes a materialization
    (ExistingRDD), never a re-derived subtree; no all-pairs join
    anywhere in the composition."""
    p = plans("q_training_corpus")
    assert p.count("documents.parquet") == 1
    assert "ExistingRDD" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_fuzzy_contamination_split_checkpointed(plans):
    """q_fuzzy_contamination: the split projection is checkpointed
    once (both pair endpoints consume the materialization), so the
    only documents scans are the LSH pair pipeline's own pinned
    pair; no all-pairs join anywhere."""
    p = plans("q_fuzzy_contamination")
    assert p.count("documents.parquet") == 2
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_bitext_mine_cell_bounded_single_base(plans):
    """q_bitext_mine: the cell-tagged bilingual base is checkpointed
    once (0 visible scans), the cross-language candidate join is an
    equi-join on cid, and the top-2-per-source window carries a
    map-side WindowGroupLimit prune."""
    p = plans("q_bitext_mine")
    assert p.count("documents.parquet") == 0
    assert p.count("embeddings.parquet") == 0
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "WindowGroupLimit" in p


def test_kcore_shrinking_equi_join_rounds(plans):
    """q_kcore: every peel round is a degree aggregate plus
    node-keyed equi-joins over the checkpointed shrinking edge list
    — zero visible corpus scans, no all-pairs form."""
    p = plans("q_kcore")
    assert p.count("documents.parquet") == 0
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_training_corpus_no_cartesian_addendum(plans):
    """q_batch_plan / q_bpe_efficiency / q_image_pixels: single
    pruned documents scan each (q_bpe_efficiency's second pass rides
    the checkpointed word-type state), no join blow-ups."""
    for name in ("q_batch_plan", "q_image_pixels"):
        p = plans(name)
        assert p.count("documents.parquet") == 1, name
        assert "CartesianProduct" not in p, name


def test_bm25_single_scan_heap_topk(plans):
    """q_bm25 (X61, r10): the narrow tf/dl base is computed with
    per-row array functions (no explode shuffle) and checkpoint-cut
    before the stats/score diamond — ZERO visible corpus FileScans;
    the 1-row stats ride the established scalar-broadcast shape and
    the top-k is a heap, never a global sort."""
    p = plans("q_bm25")
    assert p.count("documents.parquet") == 0
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_ann_rerank_two_stage_shape(plans):
    """q_ann_rerank (X62, r10): stage 1 is the compressed ADC scan
    ending in a shortlist heap, stage 2 broadcasts the shortlist into
    a hash join against one embeddings scan — exact math on O(k)
    rows, never a SortMergeJoin or cartesian over the corpus."""
    p = plans("q_ann_rerank")
    assert p.count("embeddings.parquet") == 2  # codes scan + rerank scan
    assert "TakeOrderedAndProject" in p
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_temperature_mix_stats_then_apply(plans):
    """q_temperature_mix (X63, r10): one checkpointed language-stats
    base (the mixture_plan discipline), rate table broadcast onto the
    flag pass — a single visible corpus scan, no corpus-wide
    SortMergeJoin."""
    p = plans("q_temperature_mix")
    assert p.count("documents.parquet") == 1
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_containment_candidate_bounded_rescore(plans):
    """q_containment (X64, r10): the exact intersection is candidate-
    bounded — hash-keyed equi-joins against the LSH pair list over a
    checkpointed hashed-shingle base (zero visible corpus scans),
    never an all-pairs set comparison."""
    p = plans("q_containment")
    assert p.count("documents.parquet") == 0
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_gram_novelty_single_hashed_base(plans):
    """q_gram_novelty (X65, r10): one checkpointed (doc, source,
    gram-hash) base feeds attribution, owner join, and the per-source
    roll-up — zero visible corpus scans, no join blow-ups."""
    p = plans("q_gram_novelty")
    assert p.count("documents.parquet") == 0
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_pmi_phrases_bounded_marginal_joins(plans):
    """q_pmi_phrases (X66, r10): unigram/bigram counts are
    checkpoint-cut vocabulary-sized relations, B is DERIVED (T - nd,
    never a fourth corpus pass), marginal joins key on the token, and
    the result is a heap — no global sort, no cartesian beyond the
    1-row totals."""
    p = plans("q_pmi_phrases")
    assert p.count("documents.parquet") <= 3
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_keep_best_group_limit_argmax(plans):
    """q_keep_best (X67, r10): the per-cluster representative is a
    WindowGroupLimit argmax over the checkpointed sized relation —
    no corpus-wide sort, no cartesian."""
    p = plans("q_keep_best")
    assert "WindowGroupLimit" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_audio_pcm_single_scan_fanout(plans):
    """q_audio_pcm (X68, r10; r16 fan-out): one pruned documents scan
    feeding ONE round-robin fan-out exchange of two ints per row, then
    the Arrow Python stage — the codec no longer inherits the scan's
    1-2-file parallelism (guide §2.5/§4); still no join, and exactly
    one exchange."""
    p = plans("q_audio_pcm")
    assert p.count("documents.parquet") == 1
    assert p.count("Exchange") == 1
    assert "roundrobin" in p.lower()
    assert "CartesianProduct" not in p


def test_source_overlap_no_gram_self_join(plans):
    """q_source_overlap (X69, r10): intersections come from a
    gram-keyed collect_set + row-local pair explosion — NEVER a
    shd⋈shd self-join (whose boilerplate-gram skew is the classic
    quadratic blow-up).  One checkpointed base, no cartesian."""
    p = plans("q_source_overlap")
    assert p.count("documents.parquet") == 0
    assert "SortMergeJoin" not in p  # pair build is aggregate-side
    assert "CartesianProduct" not in p


def test_int8_quant_dimension_keyed_only(plans):
    """q_int8_quant (X70, r10): the per-dim scale is a 64-key
    aggregate broadcast back onto the exploded stream — broadcast
    join, no SMJ, no cartesian."""
    p = plans("q_int8_quant")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_int8_recall_literal_scales_one_scan_each_side(plans):
    """q_int8_recall (X71, r10): the 64-dim scale vector re-enters as
    plan literals (bounded collect), so each ranking side is one scan
    + heap — no SMJ, no cartesian, WindowGroupLimit-free heaps."""
    p = plans("q_int8_recall")
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_langid_confusion_rides_classifier(plans):
    """q_langid_confusion (X72, r10): the heavy lifting is q_langid's
    broadcast-profile join; the confusion roll-up is a checkpointed
    #langs²-bounded aggregate — no cartesian, no extra corpus scans
    past the classifier's own."""
    p = plans("q_langid_confusion")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_rrf_fusion_bounded_outer_join(plans):
    """q_rrf_fusion (X73, r10): each ranker ends in a heap; the
    fusion outer join touches only the two bounded candidate lists —
    no cartesian, no corpus-wide SMJ."""
    p = plans("q_rrf_fusion")
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_filtered_vec_search_pushes_label_predicate(plans):
    """q_vec_topk_filtered (X74, r10): the metadata predicate reaches
    the parquet scan (PushedFilters on label) so file-level pruning
    happens BEFORE any distance math; top-k is a heap."""
    p = plans("q_vec_topk_filtered")
    assert "PushedFilters: [" in p and "label" in p
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_jaccard_hist_candidate_bounded(plans):
    """q_jaccard_hist (X75, r10): same candidate-bounded rescore
    class as q_containment — checkpointed pair list + hashed-shingle
    base, zero visible corpus scans, no cartesian."""
    p = plans("q_jaccard_hist")
    assert p.count("documents.parquet") == 0
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_registry_purge_serves_from_store_only(plans):
    """q_registry_purge: delete-then-serve must read ONLY the purged
    label store — one parquet scan, zero documents scans, no pair
    pipeline and no purge machinery in the serve plan (the copy +
    purge happened at build time, behind the cache)."""
    p = plans("q_registry_purge")
    assert "documents.parquet" not in p
    assert p.count("Scan parquet") == 1
    assert "CartesianProduct" not in p


def test_proximity_served_filtered_pushes_category(plans):
    """q_proximity_served_filtered: the union of the queries'
    required categories must reach the grid-store FileScan as a data
    filter (the category rides in the index files) ON TOP of the
    probe-superblock PartitionFilters — and the customer table stays
    untouched at serve time."""
    p = plans("q_proximity_served_filtered")
    assert p.count("Scan parquet") == 1
    assert "customer.parquet" not in p
    assert "PartitionFilters" in p and "gbx" in p and "gby" in p
    assert "cat" in p and "In(cat" in p


def test_ingest_registry_serves_from_store_only(plans):
    """q_ingest_registry: after the 3-wave ingest (behind the
    cache), the served report must read ONLY the maintained registry
    labels — one parquet scan, zero documents scans, no codec or
    gate machinery in the serve plan."""
    p = plans("q_ingest_registry")
    assert "documents.parquet" not in p
    assert p.count("Scan parquet") == 1
    assert "mapInPandas" not in p.lower()
    assert "CartesianProduct" not in p


def test_registry_report_serves_from_stores_only(plans):
    """q_registry_report: the full capstone report must come from
    the two maintained stores alone — the label store (scanned
    twice: the n_docs aggregate and the edge-classification join,
    each column-pruned) plus the channel-tagged edge side-store —
    with no documents scan and no codec stage."""
    p = plans("q_registry_report")
    assert "documents.parquet" not in p
    assert p.count("Scan parquet") == 3
    assert p.count("_edges") == 1
    assert "mapInPandas" not in p.lower()
    assert "CartesianProduct" not in p


def test_purged_report_serves_from_stores_only(plans):
    """q_purged_report: after the cached copy+purge, the post-delete
    report reads only the purged label store (twice, column-pruned)
    plus the channel-tagged edge store — no documents scan, no codec
    stage, no purge machinery."""
    p = plans("q_purged_report")
    assert "documents.parquet" not in p
    assert p.count("Scan parquet") == 3
    assert p.count("_edges") == 1
    assert "mapInPandas" not in p.lower()
    assert "CartesianProduct" not in p


# ---------------------------------------------------------------------------
# Round-15 operators (X122–X127) + the round-16 calibration rank fix


def test_pii_audit_one_scan_one_exchange(plans):
    """q_pii_audit: injection, all four regexp detectors, and both
    validators (octet forall, Luhn aggregate fold) are rowwise
    Projects inside the single documents scan's span; the ONLY
    exchange is the final groupBy(source) hash aggregate."""
    p = plans("q_pii_audit")
    assert p.count("Scan parquet") == 1
    assert p.count("documents.parquet") == 1
    assert p.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in p
    assert "Join" not in p


def test_ann_range_zero_joins_one_output_sort(plans):
    """q_ann_range: the codebook and probe batch ride as plan
    literals — one embeddings scan, zero joins, the probe explode is
    a Generate, and the only exchange is the output sort of the
    already-radius-filtered rows (output size IS the shuffle size)."""
    p = plans("q_ann_range")
    assert p.count("Scan parquet") == 1
    assert "Join" not in p
    assert "Generate" in p
    assert "Exchange hashpartitioning" not in p
    assert "Exchange SinglePartition" not in p
    assert p.count("Exchange rangepartitioning") == 1


def test_ann_range_served_is_partition_pruned(plans):
    """q_ann_range_served (X129): the persisted-index range-search
    path must read ONLY the codes/ parquet — never the corpus — with
    PartitionFilters on cid (the union of every probe's cells), zero
    joins, the probe explode a Generate, and the only exchange the
    output sort of the already-radius-filtered rows (exactly the
    inline q_ann_range shape, minus the corpus scan)."""
    p = plans("q_ann_range_served")
    assert p.count("Scan parquet") == 1
    assert "embeddings.parquet" not in p
    assert "PartitionFilters" in p and "cid" in p
    assert "Join" not in p
    assert "Generate" in p
    assert "Exchange hashpartitioning" not in p
    assert "Exchange SinglePartition" not in p
    assert p.count("Exchange rangepartitioning") == 1


def test_pareto_front_is_staircase_join_not_quadratic(plans):
    """q_pareto_front (X130): the oracle declares the quadratic NOT
    EXISTS; the engine must ship the staircase instead — the
    checkpointed scored relation joined to the ≤10001-row broadcast
    front.  No parquet scan in the returned plan (checkpoint-fed),
    one BroadcastHashJoin, never a sort-merge or nested-loop self
    join, no single-partition exchange."""
    p = plans("q_pareto_front")
    assert p.count("Scan parquet") == 0
    assert "ExistingRDD" in p
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Exchange SinglePartition" not in p


def test_embedding_drift_one_scan_no_single_partition(plans):
    """q_embedding_drift (X132): one embeddings scan, posexplode
    Generate, hashpartitioned aggregates over the 64x2 key space —
    no single-partition exchange anywhere."""
    p = plans("q_embedding_drift")
    assert p.count("Scan parquet") == 1
    assert "Generate" in p
    assert "Exchange hashpartitioning" in p
    assert "Exchange SinglePartition" not in p
    assert "Join" not in p


def test_benford_single_scan_bounded_window(plans):
    """q_benford (X133): exactly ONE events scan (the grand total is
    a window over the ALREADY-GROUPED ≤9-row relation, never a
    second corpus pass) with the scan pruned to the value column;
    the only SinglePartition exchange feeds that bounded window."""
    p = plans("q_benford")
    assert p.count("Scan parquet") == 1
    assert "ReadSchema: struct<value:double>" in p
    assert p.count("Exchange SinglePartition") == 1
    assert "Exchange hashpartitioning" in p
    assert "Join" not in p


def test_gini_two_pass_rank_no_global_window(plans):
    """q_gini (X134): events collapse to per-user then per-distinct-
    count aggregates; the prefix is the range-bucketed two-pass rank
    (per-bucket running-sum window hashpartitioned on the log2
    bucket, offsets from the ≤64-row collect) — the only
    SinglePartition exchange is the final 1-row scalar aggregate
    over the already-tiny relation, never a corpus-order window."""
    p = plans("q_gini")
    assert p.count("Scan parquet") == 1
    assert "Exchange hashpartitioning" in p
    assert p.count("Exchange SinglePartition") == 1
    assert "Window" in p and "bkt" in p


def test_embedding_drift_served_never_scans_corpus(plans):
    """q_embedding_drift_served (X136): the registered plan serves
    from the maintained 128-row sums store alone — one store scan,
    never the embeddings corpus, no single-partition exchange."""
    p = plans("q_embedding_drift_served")
    assert p.count("Scan parquet") == 1
    assert "embeddings.parquet" not in p
    assert "Exchange SinglePartition" not in p
    assert "Join" not in p


def test_gini_by_source_grouped_prefix_no_global_order(plans):
    """q_gini_by_source (X137): one documents scan, the per-source
    prefix a window hashpartitioned on source over the compact
    per-(source, length) relation — zero SinglePartition exchanges,
    zero joins, the corpus never globally ordered."""
    p = plans("q_gini_by_source")
    assert p.count("Scan parquet") == 1
    assert "Exchange hashpartitioning" in p
    assert "Exchange SinglePartition" not in p
    assert "Join" not in p
    assert "Window" in p


def test_ks_drift_two_pass_prefix(plans):
    """q_ks_drift (X138): one events scan collapsed to the value-
    bounded per-cent relation; the inclusive CDF prefix is the
    two-pass rank (bucket windows hashpartitioned on the log2
    bucket); the only SinglePartition exchange is the final scalar
    max over the already-tiny relation."""
    p = plans("q_ks_drift")
    assert p.count("Scan parquet") == 1
    assert "Exchange hashpartitioning" in p
    assert p.count("Exchange SinglePartition") == 1
    assert "Window" in p and "bkt" in p


def test_quality_calibration_no_single_partition_window(plans):
    """q_quality_calibration (the r15 `weak`, fixed r16): the decile
    assignment must be the range-bucketed two-pass rank — a window
    hashpartitioned on the (pred_bp, dbkt) bucket pair over the
    localCheckpoint'd signal relation — NEVER the single-partition
    global ntile that serializes the corpus through one task."""
    import re

    p = plans("q_quality_calibration")
    assert "SinglePartition" not in p
    assert re.search(r"hashpartitioning\(pred_bp", p)
    assert "ExistingRDD" in p  # signals materialized once, shared


def test_datasheet_single_scan_rollup(plans):
    """q_datasheet: per-source AND grand-total rows from ONE
    documents scan via Expand (rollup) — no second job, no union of
    two aggregates."""
    p = plans("q_datasheet")
    assert p.count("Scan parquet") == 1
    assert p.count("documents.parquet") == 1
    assert "Expand" in p
    assert "Union" not in p
    assert "Exchange SinglePartition" not in p


def test_source_quota_gate_ledger_only_plan(plans):
    """q_source_quota_gate: the registered query plans over the
    |waves|x|sources|-row ledger only (one parquet scan of the
    cached store) — the wave machinery ran behind the content-tagged
    cache; serving the gate report never rescans the corpus."""
    p = plans("q_source_quota_gate")
    assert "documents.parquet" not in p
    assert p.count("Scan parquet") == 1
    assert p.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in p


def test_decayed_topk_heap_not_global_sort(plans):
    """q_decayed_topk: one events scan + the 1-row max-ts scalar
    aggregate re-entering as a broadcast (the only SinglePartition,
    bounded by construction), rowwise integer shift decay, and the
    top-10 via TakeOrderedAndProject — never a global sort."""
    p = plans("q_decayed_topk")
    assert "TakeOrderedAndProject" in p
    assert p.count("Exchange SinglePartition") == 1
    assert p.count("Exchange hashpartitioning") == 1
    assert "Sort " not in p or "rangepartitioning" not in p


def test_decayed_topk_served_from_store_only(plans):
    """q_decayed_topk_served (X128): the serve plan must read ONLY
    the maintained (user, bucket) count store — zero events scans
    (the stream folded in behind the cache), two store scans (the
    1-row newest-bucket aggregate + the re-weight pass), and the
    top-k via TakeOrderedAndProject."""
    p = plans("q_decayed_topk_served")
    assert "events.parquet" not in p
    assert p.count("Scan parquet") == 2
    assert "TakeOrderedAndProject" in p
    assert p.count("Exchange SinglePartition") == 1

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``open_street_map_data_wrangling_spark``;
this module only adapts the query registry (plans/registry.py) to the
driver's three-function surface.
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from open_street_map_data_wrangling_spark.plans import load_all_queries
from open_street_map_data_wrangling_spark.session import apply_runtime_conf


def _stamped_names() -> set[str]:
    """Query names already green in a prior round's CORRECTNESS_r*.json.

    The driver checks at most ~50 registry entries per round, in the
    order ``queries()`` yields them.  To rotate every query through that
    window we order not-yet-stamped queries first; a query counts as
    stamped once some prior round recorded a hash match (or completed
    the rows-only check for oracle-less entries).
    """
    stamped: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, rec in rows.items():
            if not isinstance(rec, dict):
                continue
            if rec.get("hash_match") is True or rec.get("err") == "no_oracle":
                stamped.add(name)
    return stamped


def _source_closure(func) -> str:
    """Source of ``func`` plus every module-level function it
    transitively references through ``co_names`` / ``co_consts``.

    Hashing only the registered function's own body left a blind spot:
    a rewrite of a shared helper (e.g. the LSH pair generator used by
    three dedup queries) changed behaviour without changing any
    registered function's source, so stamped queries were classified
    unchanged and never rotated back into the verification window.
    Walking the reference graph closes that gap; helpers are visited
    once and concatenated in deterministic (name-sorted) order.
    """
    import types

    # Keyed by (module, qualname): two same-named module-level helpers
    # in different operator modules must BOTH enter the fingerprint
    # (a bare-qualname key silently dropped one of them — the exact
    # blind-spot class this closure exists to close).
    seen: dict[tuple[str, str], str] = {}

    def visit(fn) -> None:
        qualname = getattr(fn, "__qualname__", getattr(fn, "__name__", None))
        if qualname is None:
            return
        key = (getattr(fn, "__module__", "") or "", qualname)
        if key in seen:
            return
        try:
            seen[key] = inspect.getsource(fn)
        except (OSError, TypeError):
            # stable identity, not repr(fn) — a repr embeds the object's
            # memory address and would make the fingerprint flap run-to-run
            seen[key] = f"<unsourceable {key[0]}.{key[1]}>"
            return
        code = getattr(fn, "__code__", None)
        globalns = getattr(fn, "__globals__", {})
        if code is None:
            return
        # co_names covers direct calls; nested lambdas/defs live in
        # co_consts and carry their own co_names against the same globals.
        stack = [code]
        referenced: list[str] = []
        while stack:
            c = stack.pop()
            referenced.extend(c.co_names)
            stack.extend(
                k for k in c.co_consts if isinstance(k, types.CodeType)
            )
        for ref in sorted(set(referenced)):
            target = globalns.get(ref)
            if isinstance(target, types.FunctionType) and getattr(
                target, "__module__", ""
            ).startswith("open_street_map_data_wrangling_spark"):
                visit(target)

    visit(func)
    return "\n--helper--\n".join(src for _, src in sorted(seen.items()))


def _fingerprint(spec) -> str:
    """Content hash of a query's implementation (transitive source
    closure over package-local helpers) + oracle.

    A stamp certifies a *specific* implementation; editing the Spark
    function, any helper it calls, or the oracle SQL after the driver
    stamped it must put the query back in the verification window
    (otherwise a round-2 rewrite of a round-1-stamped query would
    never be re-checked).
    """
    body = _source_closure(spec.spark) + "\n--oracle--\n" + (spec.oracle or "")
    return hashlib.sha256(body.encode()).hexdigest()[:16]


def _stamp_fingerprints() -> dict[str, str]:
    """name -> fingerprint recorded when the driver stamp was earned
    (STAMPS.json, maintained by tools/update_stamps.py after each
    round's CORRECTNESS file lands)."""
    try:
        with open(os.path.join(_HERE, "STAMPS.json")) as fh:
            data = json.load(fh)
        return {k: v for k, v in data.items() if isinstance(v, str)}
    except (OSError, ValueError):
        return {}


# Builder-maintained risk ranking WITHIN the modified group: when a
# shared-helper or catalog edit re-queues a large slice of the
# registry at once (round 4: the events.ts normalization re-queued all
# 139 stamped queries), the ~50-entry window should spend its slots on
# the queries whose implementations actually changed this round before
# the ones that merely share an edited helper.  Names absent from the
# registry are ignored; an empty tuple restores pure registration
# order.
_MODIFIED_PRIORITY: tuple[str, ...] = (
    # Round 13: q_multimodal_dedup gained the audio channel (new
    # output columns + concat_ws modality); bm25_search_many gained
    # the fail-fast meta-column validation (r12 ADVICE);
    # rrf_search_many / maxsim_search_many gained the filters
    # machinery (X100/X101); and every inline-build serving query
    # switched to the content-tagged build cache
    # (operators/index_cache.py — VERDICT r12 #6).  ALL rotated
    # dependents re-verified green at sf0.01 AND sf0.1 this round.
    "q_multimodal_dedup",
    "q_tombstone_served",
    "q_rrf_served",
    "q_rrf_batch",
    "q_maxsim_batch",
    "q_bm25_batch_filtered",
    "q_ivfpq_serve",
    "q_ivfpq_batch",
    "q_ivfpq_batch_filtered",
    "q_proximity_served",
    # Round 12: the r11-ADVICE fixes (GIF LZW end-of-stream width
    # sync, JPEG DQT guard, bm25 batch-oracle dl qualification)
    # touched the codec and bm25 closures; build_ivfpq_index gained
    # the meta-columns parameter (X92) which rotates every
    # ivfpq-store dependent; q_loader_batches' prefix sum is factored
    # into _ordered_token_prefix / _loader_manifest (shared with the
    # X91 model-token variant).  ALL 10 re-verified green at sf0.01
    # this round (plus the 6 new r12 queries, which lead the window
    # as never-stamped).
    "q_image_gif",
    "q_image_jpeg",
    "q_bm25_batch",
    "q_rrf_batch",
    "q_bm25",
    "q_rrf_fusion",
    "q_rrf_served",
    "q_ivfpq_serve",
    "q_ivfpq_batch",
    "q_loader_batches",
    # Round 11: r10-ADVICE fixes — q_audio_pcm's oracle now uses
    # explicit pmod (double-mod) on n_chars and the sample expression
    # so negative inputs agree with the Python worker's non-negative
    # %; _bm25_score_sql is parameterized by term count (demo-width
    # default, so q_bm25/q_rrf_fusion compile byte-identically).  All
    # re-verified green at sf0.01 this round.
    "q_audio_pcm",
    "q_bm25",
    "q_rrf_fusion",
    # Round 11 wave 2: q_ivfpq_serve's codes artifact now carries the
    # raw embedding column (column-pruned away from the ADC scan;
    # feeds rrf_search's exact rerank); q_keep_best's policy tail is
    # factored into _keep_best_policy / _KEEP_BEST_TAIL_SQL, shared
    # with q_keep_best_containment; q_containment untouched but its
    # module siblings moved.  All re-verified green at sf0.01.
    "q_ivfpq_serve",
    "q_keep_best",
    # Round 11 wave 12: _bm25_contrib refactored into the named-column
    # _bm25_contrib_cols (byte-identical expression text for the
    # pivoted callers — q_bm25/q_rrf_fusion/q_rrf_served re-verified
    # green at sf0.01 post-refactor; the long form feeds q_bm25_batch).
    "q_bm25_batch",
    # Round 11 wave 4: q_lsh_audit's four fan-out relations are each
    # checkpoint-cut (25 visible scans -> 0); result hash re-verified
    # unchanged at sf0.01.
    "q_lsh_audit",
    # Round 11 wave 3: q_int8_recall's scoring core factored into
    # _int8_recall_audit (explicit scales), shared with the served
    # int8_recall_served path; re-verified green at sf0.01.
    "q_int8_recall",
    # Round 10: the r09-ADVICE fixes touched two query closures —
    # q_image_pixels' oracle gained the dims-level LEFT JOIN so a
    # NULL doc_id/n_chars doc emits a NULL-features row (matching the
    # worker, which already did), and q_ivfpq_serve's serve helper
    # now reads seeds/ with an explicit schema so the empty-index
    # guard is reachable.  Both re-verified green against DuckDB at
    # sf0.01 this round.  The other advice fixes (bounded seeds
    # fallback in build_hardneg_index, explicit postings schema in
    # text_index_merge_fn) live outside every query closure and are
    # pytest-pinned instead.
    "q_image_pixels",
    "q_ivfpq_serve",
    # Wave 2: _adc_top10 gained a k parameter for q_ann_rerank's
    # shortlist stage (default unchanged — byte-identical results for
    # the historical callers, all re-verified green at sf0.01).
    "q_pq_adc",
    "q_pq_recall",
    "q_pq_recall_trained",
    # Wave 10: q_langid's oracle now reads from the shared
    # _LANGID_SQL constant (byte-equivalent CTE chain, whitespace
    # shifted) so q_langid_confusion scores the same classifier;
    # re-verified green at sf0.01 + sf0.1.
    "q_langid",
)


def _ordered_specs():
    """Registry specs ordered for the driver's ~50-entry window:
    never-stamped first, then stamped-but-modified-since (fingerprint
    mismatch vs STAMPS.json), then stamped-and-unchanged; stable by
    registration order within each group, except that
    _MODIFIED_PRIORITY names lead the modified group."""
    specs = load_all_queries()
    stamped = _stamped_names()
    recorded = _stamp_fingerprints()
    fresh, modified, seen = {}, {}, {}
    for n, s in specs.items():
        if n not in stamped:
            fresh[n] = s
        elif recorded.get(n) != _fingerprint(s):
            modified[n] = s
        else:
            seen[n] = s
    prio = {
        n: modified.pop(n) for n in _MODIFIED_PRIORITY if n in modified
    }
    return {**fresh, **prio, **modified, **seen}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_runtime_conf(spark)
    specs = load_all_queries()
    name = "q_star_join" if "q_star_join" in specs else "q_top_users"
    return specs[name].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_conf(spark)
            return spec.spark(spark, sf_dir)

        run.__doc__ = spec.doc
        return run

    return {name: wrap(spec) for name, spec in _ordered_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin for each SQL-expressible query; omissions are
    rows-only checked by the driver."""
    return {
        name: spec.oracle
        for name, spec in _ordered_specs().items()
        if spec.oracle is not None
    }

"""Query registry: the single source of truth for the driver contract.

Every operator family from SURVEY.md §2 registers one or more named
queries here. ``__spark_entry__.py`` re-exports the registry as
``queries()`` / ``oracle_sql()``; ``bench.py`` runs the subset marked
``headline``. Keeping registration declarative means the coverage
checklist (SURVEY §2) maps 1:1 onto ``REGISTRY`` keys.

Determinism rules for oracle hash-matching (both engines must produce
bit-identical values):

* Never SUM/AVG raw doubles — shuffle order makes double addition
  non-deterministic. Cast to a small-scale decimal first (exact,
  order-independent), then cast the final aggregate back to double.
* Keep decimal scale low (≤4 for money, ≤10 for unit-scale products):
  the two engines take different double→decimal conversion paths
  (shortest-repr vs exact-binary), which can disagree only within
  ~1 ulp of a rounding midpoint — vanishingly rare at low scale.
* Scale the ROUND to the magnitude: round-6 is only safe for
  unit-scale values. A ~1e10 double rounded to 6 decimals asks for
  16-17 significant digits — beyond double precision — and the
  engines' last-ulp choices diverge (monthly_revenue_seasonality,
  caught by the sf0.1 sweep). Money/cents-scale aggregates round to
  ≤2 before exact-decimal accumulation.
* Emit doubles / longs / strings, not decimals or timestamps, in final
  schemas; render timestamps with an explicit format string.
* Alias every computed column identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: QueryFn
    oracle: str | None = None     # DuckDB SQL over the pre-registered views
    headline: bool = False        # included in bench.py
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# The driver's correctness gate verifies queries in dict order and has
# only ever recorded a 50-entry prefix per round. load_all() reorders
# via this tuple so every recorded slot is deliberately chosen. The
# tuple is EXACTLY 50 entries (r9 advisor: a 59-entry tuple silently
# gave slots 51+ no record while claiming otherwise).
# Round 16's prefix (optimization round 2 — no new queries):
#
# 1. THE BENCH BASKET, restoring driver verification of r15's
#    rewrites (the r15 verdict's task 2: of the 14 builders that
#    round restructured — the sort drops in a7f15b6, the
#    upsert_keep_last one-scan rewrite in c4b55c1 — only
#    events_asof_last_order landed in the r15 prefix; the whole
#    oracle-backed basket records now, rewrite-first order).
# 2. IMPL-TOUCHED this round: the CDF demos that lost drains and
#    tail jobs, the incremental-dedup pair whose two AllPairs prefix
#    passes became one shared frame + threaded CC ladders, the CMS
#    digest hoist, the drain/probe collapses in the linegen stream +
#    KMV state + monthly loops, the asof name-based type path, the
#    grouping-sets sort drop.
# 3. Rotation re-checks, oldest last-green first per
#    tools/next_verify_prefix.py (the queue the r15 prefix displaced,
#    verbatim in tool order).
#
# The rows-only quartet got its one deliberate record in r7 and never
# takes a slot again. Local ground truth for every query at BOTH scale
# factors: CORRECTNESS_LOCAL_sf001.json / CORRECTNESS_LOCAL_sf01.json
# (regenerate with tools/verify_oracle.py --json).
VERIFY_FIRST: tuple[str, ...] = (
    # bucket 1 (r16, the r15 verdict's task 2): the 13 oracle-backed
    # bench-basket builders, led by the three the r15 rotation left
    # driver-unrecorded after their rewrites (upsert_keep_last's
    # one-scan conditional-aggregate form, the sort drops). The
    # basket's 14th member (doc_minhash_lsh_pairs) is rows-only by
    # design and never takes a slot (r7 policy).
    "upsert_keep_last",
    "top3_orders_per_segment",
    "ytd_running_total",
    "pricing_summary",
    "region_revenue",
    "monthly_segment_totals",
    "doc_exact_dedup",
    "doc_pack_chunks",
    "doc_decontaminate_splits",
    "ann_cosine_topk_brute",
    "events_sessionization_30min",
    "events_asof_last_order",
    "ingest_warehouse_build",
    # bucket 2: queries whose INTERNALS this round's optimizations
    # restructured — fewer CDF drains / one-action tail probes, the
    # shared AllPairs prefix pass + threaded CC ladders, the
    # once-per-side CMS digest, processAllAvailable drains, overlapped
    # monthly-loop writes, the asof name-based type path, the
    # grouping-sets sort drop
    "orders_cdf_stream_subscribe",
    "orders_cdf_schema_evolution_feed",
    "doc_neardup_dropset_incremental",
    "doc_jaccard_incremental_pairs",
    "part_freq_count_min",
    "source_linegen_stream_agg",
    "events_stream_kmv_state",
    "ingest_monthly_snapshot_loop",
    "ingest_monthly_mor_restatement",
    "events_asof_next_order",
    "grouping_sets_flag_year",
    # bucket 3: rotation re-checks, oldest last-green first per
    # tools/next_verify_prefix.py (the r14/r15-displaced queue:
    # ytd_running_total and grouping_sets_flag_year appear above, the
    # rest in tool order; the registry-wide r16 sort strip is
    # order-only — the gate hashes order-insensitively — and is
    # covered whole-registry by the stamped CORRECTNESS_LOCAL files)
    "events_session_window_builtin",
    "events_stream_mv_refresh",
    "events_top_paths_3step",
    "media_feature_histograms",
    "media_shared_frame_neardup",
    "monthly_revenue_seasonality",
    "mv_incremental_refresh",
    "partitioned_join_dpp",
    "q4_priority_with_returns",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "rolling_median_monthly_revenue",
    "skew_salted_segment_revenue",
    "top_customers_concat_per_nation",
    "trailing_30d_customer_revenue",
    "approx_distinct_parts_kmv",
    "doc_block_dedup_rebuild",
    "doc_bpe_pair_step",
    "doc_importance_resample",
    "doc_priority_sample",
    "doc_shingle_jaccard_blocked",
    "doc_simhash_neardup_pairs",
    "doc_source_mixing_weights",
    "embedding_power_iteration",
    "events_ab_test_zscore",
)
assert len(VERIFY_FIRST) == 50, len(VERIFY_FIRST)


def query(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, headline=headline,
            tags=tags, doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so registration side effects run.

    Returns the registry reordered so VERIFY_FIRST names lead (see the
    comment there); remaining queries keep registration order.
    """
    from financial_data_warehouse_automation_spark import queries as _q  # noqa: F401

    missing = [n for n in VERIFY_FIRST if n not in REGISTRY]
    if missing:
        raise KeyError(f"VERIFY_FIRST names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in VERIFY_FIRST}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered

"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line the driver parses into BENCH_r{N}.json.

Timing methodology: each query is built lazily and forced with a
count-shaped action (``df.foreach(noop)`` would skip the final project;
``collect()`` is fine — headline results are small aggregates). One
warm-up pass primes parquet footers / JVM JIT; the reported time is the
best of ``BENCH_REPS`` timed passes (min, not mean — GC noise only adds).

Load-excursion hardening (round 10; PERF.md "r9 bench preview and the
box, quantified"): this box shows hours-long HOST-level load
excursions (ambient load 2.7-4.3 with zero local processes) that
inflated BENCH_r09's whole basket uniformly by ~+32% — min-of-5 with a
warm sweep cannot defend against an excursion spanning the entire run.
Two additions: (1) a PRE-FLIGHT GATE — before any Spark work, if the
1-minute loadavg exceeds $BENCH_LOAD_GATE (default 2.0) the harness
sleeps in 15 s steps up to $BENCH_LOAD_MAX_WAIT (default 600 s) waiting
for calm; (2) the emitted JSON carries the ambient pre-flight loadavg,
the gate, the wait spent, and the end-of-run loadavg so the artifact
self-adjudicates — a reader seeing load1_preflight ≈ 4 knows the
composite measured weather. NOTE load1_end includes this process's own
local[32] executor threads (loadavg is system-wide and decays on a
~1-minute constant); only load1_preflight is ambient.

Queries run in the PINNED order below, NOT registry order: a query's
position in a fresh JVM moves its time by up to 2x (whole-stage codegen
and shuffle infrastructure reach C2-compiled steady state only after
the first handful of queries). Round 3's apparent regressions were the
three queries the verify-prefix reorder moved to positions 1-3; round
4's (events_sessionization_30min +18%, ingest_warehouse_build +20%)
were the two queries a REGISTRATION-order drift moved from positions
8/10 to 1/3 — so the order is now a literal tuple (round 3's order),
immune to both reorders. An untimed full-basket sweep runs first so
even position 1 is timed against a C2-warm JVM.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    from financial_data_warehouse_automation_spark.registry import REGISTRY, load_all
    from financial_data_warehouse_automation_spark.session import (
        cpu_count,
        get_spark,
        sf_dir,
    )

    # 5 timed reps (was 3): this box shows ±15% run-to-run swings under
    # background load, and the driver records a single bench invocation
    # — two extra reps tighten the min at ~25s extra wall for the
    # whole basket.
    reps = int(os.environ.get("BENCH_REPS", "5"))
    d = sf_dir()
    sf = d.rstrip("/").rsplit("sf", 1)[-1]

    # pre-flight load gate: wait (bounded) for ambient calm BEFORE the
    # Spark session exists, so the reading is the box, not us
    gate = float(os.environ.get("BENCH_LOAD_GATE", "2.0"))
    max_wait = float(os.environ.get("BENCH_LOAD_MAX_WAIT", "600"))
    waited = 0.0
    load_pre = os.getloadavg()[0]
    while load_pre > gate and waited < max_wait:
        time.sleep(15.0)
        waited += 15.0
        load_pre = os.getloadavg()[0]

    spark = get_spark("bench")

    load_all()  # populate REGISTRY via import side effects
    basket = (
        "upsert_keep_last",
        "ytd_running_total",
        "top3_orders_per_segment",
        "doc_exact_dedup",
        "doc_pack_chunks",
        "doc_decontaminate_splits",
        "ann_cosine_topk_brute",
        "events_sessionization_30min",
        "events_asof_last_order",
        "ingest_warehouse_build",
        "pricing_summary",
        "monthly_segment_totals",
        "region_revenue",
        "doc_minhash_lsh_pairs",
    )
    headline = {n for n, s in REGISTRY.items() if s.headline}
    assert headline == set(basket), (
        f"headline flags drifted from the pinned basket: "
        f"only-flagged={headline - set(basket)} only-pinned={set(basket) - headline}"
    )
    specs = {n: REGISTRY[n] for n in basket}
    for spec in specs.values():  # untimed sweep: C2-warm JVM for all
        spec.builder(spark, d).collect()

    # box-speed calibration (round 10): two same-evening previews an
    # hour apart read 10.18s and 11.93s with the CALMER loadavg on the
    # slower run — the box's throughput wanders ~±20% on an hours
    # timescale and loadavg does not capture it. So the artifact now
    # carries a same-run denominator: the min-of-3 time of a FIXED
    # workload (pure-JVM whole-stage-codegen range sum — no I/O, no
    # shuffle, no Python), measured against the same warm JVM moments
    # before the basket. value / calib_spark_sec is comparable across
    # rounds in a way raw seconds are not.
    calib = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(3_000_000_000).selectExpr(
            "bit_xor(xxhash64(id))"  # xor: no ANSI overflow
        ).collect()
        calib = min(calib, time.perf_counter() - t0)

    # Round 11 makes the calibration LOAD-BEARING (r10 verdict task 2:
    # "calib_spark_sec is emitted but nothing consumes it"). The pinned
    # reference is the round-10 artifact's reading — BENCH_r10.json
    # calib_spark_sec = 0.6029, measured at sf0.1 on the same box and
    # recorded once here and in PERF.md ("Calibration reference").
    # value_calibrated_cpu = value * CALIB_REF / calib, i.e. the
    # composite the same code would have read at r10 box speed: calib >
    # ref means the box is currently slower and the raw composite is
    # deflated back, and vice versa. Cross-round deltas quote the
    # two-probe value_calibrated (below); raw value remains the ground
    # truth for within-run comparisons.
    CALIB_REF = 0.6029

    # Second probe (r11's two-same-HEAD-previews finding: a +20% basket
    # inflation arrived with a near-reference CPU calib, so pure-JVM
    # codegen speed is not the only drift mode): calib_scan_sec times a
    # FIXED scan-path workload — full pass over lineitem's price column
    # with an exact-decimal sum — exercising file open, parquet decode,
    # task scheduling, and the memory subsystem. Reading the CPU and
    # scan probes together separates "box CPU slower" from "storage/
    # scheduler weather". Round 12 pins the reference (r11 verdict
    # task 2): CALIB_SCAN_REF is BENCH_r11.json's driver-recorded
    # calib_scan_sec, same provenance as CALIB_REF (BENCH_r10's CPU
    # probe). value_calibrated now derives from BOTH probes — the
    # geometric mean of the two per-probe corrections — so a drift
    # mode either probe misses still moves the quoted number halfway,
    # and calib_probe_disagreement_pct flags when the probes tell
    # different stories (the documented CPU-probe blind spot: read the
    # per-probe fields before trusting the composite).
    CALIB_SCAN_REF = 0.0845
    calib_scan = float("inf")
    li_price = spark.read.parquet(os.path.join(d, "lineitem.parquet")) \
        .select("l_extendedprice")
    for _ in range(3):
        t0 = time.perf_counter()
        li_price.agg({"l_extendedprice": "sum"}).collect()
        calib_scan = min(calib_scan, time.perf_counter() - t0)
    timings: dict[str, float] = {}
    for name, spec in specs.items():
        spec.builder(spark, d).collect()  # per-query warm-up
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            spec.builder(spark, d).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        # scaling self-documentation (r16, additive only): the core
        # count and master string this run actually used, so a reader
        # of two artifacts at different $SPARK_GRAFT_CPUS can anchor
        # per-query ratios on ground truth instead of guessing — the
        # r15 scaling heuristic mis-read "serial" because sub-second
        # sf0.1 queries are driver/latency-bound, and the artifact
        # carried nothing to say what N even was.
        "cpus": cpu_count(),
        "master": spark.sparkContext.master,
        # self-adjudication fields (see module docstring): ambient
        # load before any Spark work, the gate + wait applied, and the
        # end-of-run load (self-inclusive — our own executor threads)
        "load1_preflight": round(load_pre, 2),
        "load_gate": gate,
        "load_wait_sec": waited,
        "load1_end_self_inclusive": round(os.getloadavg()[0], 2),
        "calib_spark_sec": round(calib, 4),
        "calib_ref_spark_sec": CALIB_REF,
        "calib_scan_sec": round(calib_scan, 4),
        "calib_scan_ref_sec": CALIB_SCAN_REF,
        # value_calibrated_cpu keeps the r10/r11 definition (CPU probe
        # only) so cross-round deltas compare like with like; the
        # two-probe value_calibrated below exists since r12 and MUST
        # NOT be compared against pre-r12 artifacts' value_calibrated
        # (different quantity — r12 advisor finding, pinned here and
        # in PERF.md "Calibration reference").
        "value_calibrated_cpu": round(total * CALIB_REF / calib, 4),
        "value_calibrated_scan": round(
            total * CALIB_SCAN_REF / calib_scan, 4
        ),
        # headline calibrated composite: both probes, geometric mean
        "value_calibrated": round(
            total
            * ((CALIB_REF / calib) * (CALIB_SCAN_REF / calib_scan)) ** 0.5,
            4,
        ),
        "calib_probe_disagreement_pct": round(
            100.0
            * abs(
                (CALIB_REF / calib) / (CALIB_SCAN_REF / calib_scan) - 1.0
            ),
            2,
        ),
    }))


if __name__ == "__main__":
    main()

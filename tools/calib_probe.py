"""Measure bench.py's two box-speed probes in the current window and
print ONE JSON line — the mechanical half of the symmetric-calibration
discipline (r11 verdict task 6: sweeps must carry probe readings from
BOTH their windows, measured pre and post, so compare_sweeps --calib
--calib-scan can cancel box weather instead of the builder eyeballing
loadavg).

    python tools/calib_probe.py                  # sf0.1 scan probe
    SPARK_GRAFT_SF_DIR=... python tools/calib_probe.py

The probes are copied from bench.py by CONTRACT (same workloads, same
min-of-3): cpu = pure-JVM whole-stage-codegen range hash (no I/O, no
shuffle, no Python); scan = full pass over lineitem's price column
(file open, parquet decode, task scheduling, memory). References:
CALIB_REF = 0.6029 (BENCH_r10), CALIB_SCAN_REF = 0.0845 (BENCH_r11),
both driver-recorded at sf0.1.

Usage pattern per sweep: run this immediately BEFORE and AFTER
tools/scale_sweep.py, keep the four readings with the sweep TSV, and
pass the window means to compare_sweeps. A pre/post disagreement
inside ONE window means the window itself was unstable — re-run the
sweep rather than calibrating over a cliff."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from financial_data_warehouse_automation_spark.session import get_spark, sf_dir

    d = sf_dir()
    spark = get_spark("calib-probe")

    # Warm-up: a fresh JVM needs the ACTUAL probe workloads run at
    # full size before timing, or the first readings measure C2
    # compilation, not the box (observed r12: a minimally-warmed
    # probe read 1.09s CPU in the same hour bench.py's in-basket
    # probe read ~0.67s). Even so, a standalone probe in a fresh JVM
    # reads a few percent above bench.py's (which times after a full
    # basket sweep) — compare standalone probes ONLY to standalone
    # probes; the pinned refs remain bench.py-provenance and are
    # reported for orientation, not identity.
    li = spark.read.parquet(os.path.join(d, "lineitem.parquet")).select(
        "l_extendedprice"
    )
    for _ in range(2):
        spark.range(3_000_000_000).selectExpr(
            "bit_xor(xxhash64(id))"
        ).collect()
        li.agg({"l_extendedprice": "sum"}).collect()

    calib = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(3_000_000_000).selectExpr(
            "bit_xor(xxhash64(id))"
        ).collect()
        calib = min(calib, time.perf_counter() - t0)
    calib_scan = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        li.agg({"l_extendedprice": "sum"}).collect()
        calib_scan = min(calib_scan, time.perf_counter() - t0)

    print(json.dumps({
        "calib_spark_sec": round(calib, 4),
        "calib_scan_sec": round(calib_scan, 4),
        "calib_ref_spark_sec": 0.6029,
        "calib_scan_ref_sec": 0.0845,
        "sf_dir": d,
        "load1": round(os.getloadavg()[0], 2),
        "unix_minute": int(time.time() // 60),
    }))


if __name__ == "__main__":
    main()

"""Run EVERY registered query at a scale point and record wall time +
row count — the whole-registry companion to bench.py, built for the
fabricated 10× directory from tools/scale_testdata.py:

    python tools/scale_testdata.py                  # once: build testdata_sf1
    python tools/scale_sweep.py --sf-dir testdata_sf1 --log artifacts/sweep_sf1.tsv \
        --reps 3

The log is TSV: ``name  min_sec  rows  median_sec  reps`` (ERR/SKIP +
detail in the second column on failure), appended and RESUMABLE:
already-logged names are skipped, so a killed run continues where it
stopped. Compare two logs (e.g. sf0.1 vs sf1) to get the per-query
scaling ratio — the evidence behind PERF.md's scaling section, which
found one quadratic formulation and seven single-task scan stages that
no sf0.1 run could surface.

``--reps N`` (default 3) runs each query N times back-to-back and logs
the MIN and MEDIAN — single-rep sweeps on this box carry 2-3 random
contention spikes per pass (round 7 needed three full sweeps and
manual cross-sweep minima; the min column IS the honest composite
input, per-query deltas should quote it). Reps must agree on the row
count; disagreement logs an ERR (a nondeterministic query is a bug,
not noise). Queries can be skipped up front with --skip name[,name...];
a SKIP line documents the reason in the log.

``--only name[,name...]`` restricts the pass to the listed queries —
the re-measure path for the bench discipline (any >15% regression on
an untouched plan gets a fresh-session re-check; quote the min across
passes, each pass itself a same-session min-of-N).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Exactness anchors whose cost is intentionally superlinear would be
# listed here; the set is EMPTY since round 8 (doc_shingle_jaccard_
# blocked — the one entry rounds 5-7 carried — now runs on prefix-
# filter candidates and sweeps fine at 10×).
DEFAULT_SKIP: dict[str, str] = {}


def main() -> None:
    from financial_data_warehouse_automation_spark.registry import load_all
    from financial_data_warehouse_automation_spark.session import get_spark

    sf_dir = os.path.join(REPO, "testdata_sf1")
    log_path = os.path.join(REPO, "artifacts", "sweep_sf1.tsv")
    skip = dict(DEFAULT_SKIP)
    reps = 3
    only: set[str] | None = None
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--sf-dir":
            sf_dir = argv[i + 1]; i += 2
        elif argv[i] == "--log":
            log_path = argv[i + 1]; i += 2
        elif argv[i] == "--reps":
            reps = max(1, int(argv[i + 1])); i += 2
        elif argv[i] == "--skip":
            for n in argv[i + 1].split(","):
                skip.setdefault(n, "skipped via --skip")
            i += 2
        elif argv[i] == "--no-skip":
            skip.clear(); i += 1
        elif argv[i] == "--only":
            only = set(argv[i + 1].split(",")); i += 2
        else:
            raise SystemExit(f"unknown arg {argv[i]}")

    # resume: only SUCCESSFUL lines count as done — ERRed queries are
    # retried on the next run (a transient failure must not silently
    # shrink the sweep), and a SKIP line only sticks while the name is
    # still in the skip set (so --no-skip really re-runs it)
    done = set()
    if os.path.exists(log_path):
        for line in open(log_path):
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 2 and parts[1] == "ERR":
                continue
            if len(parts) >= 2 and parts[1] == "SKIP" and parts[0] not in skip:
                continue
            done.add(parts[0])

    spark = get_spark("scale-sweep")
    specs = load_all()
    out = open(log_path, "a")
    n_run = n_err = 0
    for name in sorted(specs):
        if only is not None and name not in only:
            continue
        if name in done:
            continue
        if name in skip:
            print(f"{name}\tSKIP\t{skip[name]}", file=out, flush=True)
            continue
        times: list[float] = []
        counts: set[int] = set()
        try:
            for _ in range(reps):
                t0 = time.perf_counter()
                counts.add(specs[name].builder(spark, sf_dir).count())
                times.append(time.perf_counter() - t0)
            if len(counts) != 1:
                raise RuntimeError(
                    f"row count varies across reps: {sorted(counts)}"
                )
            rows = counts.pop()
            line = (
                f"{name}\t{min(times):.2f}\t{rows}"
                f"\t{statistics.median(times):.2f}\t{len(times)}"
            )
            print(line, file=out, flush=True)
            print(line)
            n_run += 1
        except Exception as e:  # noqa: BLE001
            print(f"{name}\tERR\t{type(e).__name__}: {str(e)[:160]}",
                  file=out, flush=True)
            n_err += 1
    print(f"{n_run} ran, {n_err} errors, log at {log_path}")


if __name__ == "__main__":
    main()

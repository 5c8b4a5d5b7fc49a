"""Per-query cost breakdown for the bench basket (optimization rounds).

For each headline query (or --only list) at $SPARK_GRAFT_SF_DIR:

* ``build_sec``  — time for ``spec.builder(spark, d)`` alone, i.e. the
  Python/py4j DataFrame-construction cost bench.py pays on EVERY timed
  rep (round-5 found 0.9s of doc_minhash_lsh_pairs was construction);
  median of 3 builds after one discarded warm build.
* ``run_sec``    — best-of-N ``collect()`` on a pre-built frame, i.e.
  the pure planning+execution cost.
* ``e2e_sec``    — best-of-N build+collect, the quantity bench.py times.

Optionally (--plans DIR) writes ``<name>_<suffix>.txt`` files with
``explain('formatted')`` output for each profiled query, the judge's
plan evidence for OPTIMIZATION_r*.md claims.

Usage:
    python tools/profile_basket.py [--only a,b,c] [--reps 5]
        [--plans plans/r15 --suffix before] [--tsv out.tsv]
"""

from __future__ import annotations

import argparse
import io
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def formatted_plan(df) -> str:
    out = io.StringIO()
    old = sys.stdout
    sys.stdout = out
    try:
        df.explain("formatted")
    finally:
        sys.stdout = old
    return out.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--plans", default="")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--tsv", default="")
    args = ap.parse_args()

    from financial_data_warehouse_automation_spark.registry import REGISTRY, load_all
    from financial_data_warehouse_automation_spark.session import get_spark, sf_dir

    d = sf_dir()
    spark = get_spark("profile-basket")
    load_all()
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
    else:
        names = [n for n, s in REGISTRY.items() if s.headline]

    # full warm sweep first (C2-warm JVM, same as bench.py)
    for n in names:
        REGISTRY[n].builder(spark, d).collect()

    rows = []
    for n in names:
        spec = REGISTRY[n]
        spark.sparkContext.setJobDescription(f"profile:{n}")
        # build cost: 1 discarded + 3 measured
        spec.builder(spark, d)
        builds = []
        for _ in range(3):
            t0 = time.perf_counter()
            spec.builder(spark, d)
            builds.append(time.perf_counter() - t0)
        build = statistics.median(builds)
        # run cost on a pre-built frame
        df = spec.builder(spark, d)
        run = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df.collect()
            run = min(run, time.perf_counter() - t0)
        # end-to-end, what bench.py measures
        e2e = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            spec.builder(spark, d).collect()
            e2e = min(e2e, time.perf_counter() - t0)
        rows.append((n, build, run, e2e))
        print(f"{n:32s} build={build:7.3f}  run={run:7.3f}  e2e={e2e:7.3f}",
              flush=True)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            with open(os.path.join(args.plans, f"{n}_{args.suffix}.txt"), "w") as f:
                f.write(formatted_plan(spec.builder(spark, d)))
        spark.sparkContext.setJobDescription(None)

    total_e2e = sum(r[3] for r in rows)
    total_build = sum(r[1] for r in rows)
    print(f"{'TOTAL':32s} build={total_build:7.3f}  {'':13s}e2e={total_e2e:7.3f}")
    if args.tsv:
        with open(args.tsv, "w") as f:
            f.write("name\tbuild_sec\trun_sec\te2e_sec\n")
            for n, b, r, e in rows:
                f.write(f"{n}\t{b:.4f}\t{r:.4f}\t{e:.4f}\n")


if __name__ == "__main__":
    main()

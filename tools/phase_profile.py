"""Catalyst phase decomposition for basket queries (r15 optimization).

For each headline query (or --only list): build the DataFrame, run one
collect(), then read the QueryExecution tracker's phase durations
(analysis / optimization / planning, in ms) plus the measured wall
times. The e2e-(build+exec) gap in tools/profile_basket.py is Catalyst
work the bench pays on every rep; this splits it by phase so the fix
targets the right layer.

Usage: python tools/phase_profile.py [--only a,b,c]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def phase_ms(df) -> dict:
    je = df._jdf.queryExecution()
    tracker = je.tracker()
    phases = tracker.phases()
    out = {}
    it = phases.keysIterator()
    while it.hasNext():
        k = it.next()
        summ = phases.apply(k)
        out[str(k)] = summ.endTimeMs() - summ.startTimeMs()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    from financial_data_warehouse_automation_spark.registry import REGISTRY, load_all
    from financial_data_warehouse_automation_spark.session import get_spark, sf_dir

    d = sf_dir()
    spark = get_spark("phase-profile")
    load_all()
    names = (
        [n.strip() for n in args.only.split(",") if n.strip()]
        if args.only
        else [n for n, s in REGISTRY.items() if s.headline]
    )
    for n in names:  # warm sweep
        REGISTRY[n].builder(spark, d).collect()

    print(f"{'query':32s} {'build':>7s} {'analys':>7s} {'optim':>7s} "
          f"{'plan':>7s} {'exec':>7s} {'e2e':>7s}")
    for n in names:
        spec = REGISTRY[n]
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            df = spec.builder(spark, d)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            ph = phase_ms(df)
            rec = {
                "build": t1 - t0,
                "analysis": ph.get("analysis", 0) / 1e3,
                "optimization": ph.get("optimization", 0) / 1e3,
                "planning": ph.get("planning", 0) / 1e3,
                "e2e": t2 - t0,
            }
            rec["exec"] = (
                rec["e2e"] - rec["build"] - rec["analysis"]
                - rec["optimization"] - rec["planning"]
            )
            if best is None or rec["e2e"] < best["e2e"]:
                best = rec
        print(f"{n:32s} {best['build']:7.3f} {best['analysis']:7.3f} "
              f"{best['optimization']:7.3f} {best['planning']:7.3f} "
              f"{best['exec']:7.3f} {best['e2e']:7.3f}", flush=True)


if __name__ == "__main__":
    main()

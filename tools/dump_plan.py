"""Dump ``explain('formatted')`` for named registry queries — ONE
builder execution per query (profile_basket.py runs each builder ~11
times, which is prohibitive for the streaming/loop demos whose builder
IS the demo). The judge's plan evidence for OPTIMIZATION_r*.md claims.

Usage:
    python tools/dump_plan.py --out plans/r16 --suffix before name ...
"""

from __future__ import annotations

import argparse
import io
import os
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
    ap.add_argument("names", nargs="+")
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from financial_data_warehouse_automation_spark.registry import (
        REGISTRY,
        load_all,
    )
    from financial_data_warehouse_automation_spark.session import (
        get_spark,
        sf_dir,
    )

    d = sf_dir()
    spark = get_spark("dump-plan")
    load_all()
    os.makedirs(args.out, exist_ok=True)
    for n in args.names:
        spark.sparkContext.setJobDescription(f"dump_plan:{n}")
        t0 = time.perf_counter()
        df = REGISTRY[n].builder(spark, d)
        build = time.perf_counter() - t0
        path = os.path.join(args.out, f"{n}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        print(f"{n}: build {build:.2f}s -> {path}", flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()

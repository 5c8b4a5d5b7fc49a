"""Interleaved A/B isolated sweep for the r16 optimization round:
pre-round tree (worktree .ab_pre16 @ 8a159f0, the r15 close) vs
current HEAD, same box window, alternating leg order per pair so slow
load/thermal trends cancel — the non-basket companion of
tools/ab_bench_r15.py for queries the bench does not time.

Each leg is a full tools/scale_sweep.py subprocess (own JVM) over the
QUERIES list with --reps AB_SWEEP_REPS (default 2), writing to a
throwaway per-leg TSV (scale_sweep logs are resumable, so legs must
not share one). Output: one JSON line per leg appended to
artifacts/ab_r16_opt2.jsonl with {"side", "pair", "order", "queries":
{name: min_sec}}.

Usage: AB_PAIRS=3 python tools/ab_sweep_r16.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "artifacts", "ab_r16_opt2.jsonl")
SIDES = {"pre": os.path.join(REPO, ".ab_pre16"), "post": REPO}
QUERIES = ",".join([
    "orders_cdf_stream_subscribe",
    "orders_cdf_schema_evolution_feed",
    "doc_neardup_dropset_incremental",
    "doc_jaccard_incremental_pairs",
    "part_freq_count_min",
    "source_linegen_stream_agg",
    "events_stream_kmv_state",
    "ingest_monthly_snapshot_loop",
    "ingest_monthly_mor_restatement",
])


def run_leg(side: str, pair: int, order: int) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log = tempfile.mktemp(prefix=f"ab16_{side}_{pair}_", suffix=".tsv")
    t0 = time.time()
    subprocess.run(
        [sys.executable, os.path.join("tools", "scale_sweep.py"),
         "--sf-dir", env["SPARK_GRAFT_SF_DIR"], "--log", log,
         "--reps", env.get("AB_SWEEP_REPS", "2"), "--only", QUERIES],
        cwd=SIDES[side], env=env, capture_output=True, text=True,
        timeout=1800,
    )
    queries = {}
    if os.path.exists(log):
        for ln in open(log):
            parts = ln.rstrip("\n").split("\t")
            try:
                queries[parts[0]] = float(parts[1])
            except (IndexError, ValueError):
                pass
        os.unlink(log)
    rec = {"side": side, "pair": pair, "order": order,
           "wall": round(time.time() - t0, 1), "queries": queries}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    total = sum(queries.values())
    print(f"pair {pair} leg {order} {side}: total {total:.2f}s "
          f"({len(queries)} queries)", flush=True)
    return rec


def main() -> None:
    pairs = int(os.environ.get("AB_PAIRS", "3"))
    for p in range(pairs):
        order = ["pre", "post"] if p % 2 == 0 else ["post", "pre"]
        for i, side in enumerate(order):
            run_leg(side, p, i)
    # summarize: per-query min across legs per side
    mins: dict[str, dict[str, float]] = {"pre": {}, "post": {}}
    for ln in open(OUT):
        rec = json.loads(ln)
        if rec.get("pair") is None:
            continue
        side = rec["side"]
        for q, v in rec["queries"].items():
            if v < mins[side].get(q, 1e9):
                mins[side][q] = v
    print(f"\n{'query':36s} {'pre':>6s} {'post':>6s}  ratio")
    tp = tq = 0.0
    for q in sorted(mins["post"]):
        a, b = mins["pre"].get(q), mins["post"][q]
        if a is None:
            continue
        tp += a
        tq += b
        print(f"{q:36s} {a:6.2f} {b:6.2f}  {a / b:5.2f}x")
    print(f"{'TOTAL of per-query mins':36s} {tp:6.2f} {tq:6.2f}  "
          f"{tp / tq:5.2f}x")


if __name__ == "__main__":
    main()

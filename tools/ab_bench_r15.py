"""Interleaved A/B bench for the r15 optimization round: pre-optimization
build HEAD (worktree .ab_pre @ de4bb21) vs current HEAD, same box window,
alternating leg order per pair so slow thermal/load trends cancel.

Each leg is a full bench.py subprocess (own JVM, pinned basket order, its
own pre-flight load gate + calibration probes). Output: one JSON line per
leg appended to artifacts/ab_r15_opt1.jsonl with {"side", "pair", "order",
full parsed bench payload}.

Usage: AB_PAIRS=4 AB_BENCH_REPS=3 python tools/ab_bench_r15.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "artifacts", "ab_r15_opt1.jsonl")
SIDES = {"pre": os.path.join(REPO, ".ab_pre"), "post": REPO}


def run_leg(side: str, pair: int, order: int) -> dict:
    env = dict(os.environ)
    env["BENCH_REPS"] = env.get("AB_BENCH_REPS", "3")
    env.setdefault("BENCH_LOAD_MAX_WAIT", "120")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=SIDES[side], env=env, capture_output=True, text=True,
        timeout=1800,
    )
    line = ""
    for ln in proc.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith('{"metric"'):
            line = ln
    rec = {
        "side": side, "pair": pair, "order": order,
        "wall": round(time.time() - t0, 1), "rc": proc.returncode,
        "load1_at_start": round(os.getloadavg()[0], 2),
    }
    if line:
        rec.update(json.loads(line))
    else:
        rec["stderr_tail"] = proc.stderr[-500:]
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def main() -> None:
    pairs = int(os.environ.get("AB_PAIRS", "3"))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    for p in range(pairs):
        legs = ["pre", "post"] if p % 2 == 0 else ["post", "pre"]
        for i, side in enumerate(legs):
            rec = run_leg(side, p, i)
            v = rec.get("value")
            print(f"pair {p} {side}: raw={v} "
                  f"calib_cpu={rec.get('value_calibrated_cpu')} "
                  f"calib_probe={rec.get('calib_spark_sec')}",
                  flush=True)


if __name__ == "__main__":
    main()

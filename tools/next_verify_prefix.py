"""Plan the next round's VERIFY_FIRST prefix.

The external driver records only a 50-entry prefix of ``queries()`` per
round. This tool diffs the registry against every committed
``CORRECTNESS_r*.json`` and prints, in priority order:

1. oracle-backed queries whose MOST RECENT driver record is a failure
   (must re-verify — a later failure overrides an earlier green, so
   regressions in rotation re-checks land here, not in stale-green),
2. oracle-backed queries no driver round has ever recorded,
3. rotation re-checks of green queries (oldest green round first,
   then name — deterministic),

capped at 50. Rows-only-by-design queries (no oracle entry) are
excluded from bucket 1 — the driver's weaker rows-only check can never
hash-match, so a slot spent there re-records the same non-green row;
they are listed in a trailing comment instead. Paste the result into
``registry.VERIFY_FIRST`` at the start of a round.

    python tools/next_verify_prefix.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from financial_data_warehouse_automation_spark.registry import REGISTRY, load_all

    load_all()
    rounds = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    # last-seen status per name: process rounds in order and OVERWRITE,
    # so a query green in r2 but failing in r4 classifies as failed
    # (the regression case the rotation re-checks exist to catch).
    last_status: dict[str, bool] = {}     # name -> last record was green
    last_green_round: dict[str, str] = {}  # name -> newest green round tag
    for path in rounds:
        tag = os.path.basename(path)
        rec = json.load(open(path))
        for name, row in rec.items():
            ok = bool(row.get("hash_match"))
            last_status[name] = ok
            if ok:
                last_green_round[name] = tag

    oracle_backed = {n for n, s in REGISTRY.items() if s.oracle}
    rows_only = sorted(n for n, s in REGISTRY.items() if not s.oracle)

    failed = sorted(
        n for n, ok in last_status.items()
        if not ok and n in oracle_backed
    )
    never = [n for n in REGISTRY
             if n in oracle_backed and n not in last_status]  # registration order
    # oldest-green first, name-tiebroken: reproducible rotation order
    stale_green = sorted(
        (n for n in last_green_round if n in REGISTRY),
        key=lambda n: (last_green_round[n], n),
    )

    prefix: list[str] = []
    for bucket in (failed, never, stale_green):
        for n in bucket:
            if len(prefix) >= 50:
                break
            if n not in prefix:
                prefix.append(n)

    n_green_now = sum(1 for ok in last_status.values() if ok)
    print(f"# registry: {len(REGISTRY)} ({len(oracle_backed)} oracle-backed, "
          f"{len(rows_only)} rows-only)")
    print(f"# driver last-status green: {n_green_now}; failed-last (oracle-backed): "
          f"{len(failed)}; never-checked: {len(never)}")
    if rows_only:
        print(f"# rows-only by design (excluded from failed bucket): "
              f"{', '.join(rows_only)}")
    print("VERIFY_FIRST: tuple[str, ...] = (")
    for n in prefix:
        print(f'    "{n}",')
    print(")")


if __name__ == "__main__":
    main()

"""Plan the next round's VERIFY_FIRST prefix.

The external driver records only a 50-entry prefix of ``queries()`` per
round. This tool diffs the registry against every committed
``CORRECTNESS_r*.json`` and prints, in priority order:

1. queries that FAILED a driver round and were since touched (must
   re-verify),
2. oracle-backed queries no driver round has ever recorded,
3. suggested rotation re-checks (oldest-green first),

capped at 50. Paste the result into ``registry.VERIFY_FIRST`` at the
start of a round.

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
    green: dict[str, str] = {}   # name -> last green round
    failed: set[str] = set()
    for path in rounds:
        tag = os.path.basename(path)
        rec = json.load(open(path))
        for name, row in rec.items():
            if row.get("hash_match"):
                green[name] = tag
                failed.discard(name)
            elif row.get("err") or not row.get("hash_match"):
                if name not in green:
                    failed.add(name)

    oracle_backed = [n for n, s in REGISTRY.items() if s.oracle]
    rows_only = [n for n, s in REGISTRY.items() if not s.oracle]
    never = [n for n in oracle_backed if n not in green and n not in failed]
    stale_green = sorted(green, key=lambda n: green[n])  # oldest first

    prefix: list[str] = []
    prefix += [n for n in failed if n in REGISTRY]
    prefix += never
    for n in stale_green:
        if len(prefix) >= 50:
            break
        if n in REGISTRY and n not in prefix:
            prefix.append(n)
    prefix = prefix[:50]

    print(f"# registry: {len(REGISTRY)} ({len(oracle_backed)} oracle-backed, "
          f"{len(rows_only)} rows-only)")
    print(f"# driver-green cumulative: {len(green)}; failed-last: "
          f"{len(failed)}; never-checked: {len(never)}")
    print("VERIFY_FIRST: tuple[str, ...] = (")
    for n in prefix:
        print(f'    "{n}",')
    print(")")


if __name__ == "__main__":
    main()

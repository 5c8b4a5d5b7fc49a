"""Command-line front door: list and run registered queries.

    python -m financial_data_warehouse_automation_spark.cli list [--tag TAG]
    python -m financial_data_warehouse_automation_spark.cli run QUERY [--sf-dir DIR] [-n N]
    python -m financial_data_warehouse_automation_spark.cli explain QUERY [--sf-dir DIR]

The reference's two entry points (run the monthly build / open the
sheet) map onto ``run ingest_warehouse_build`` and any analytical query
by name; ``explain`` prints the formatted physical plan for plan
review.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="financial_data_warehouse_automation_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("--tag", help="filter by tag")

    for name in ("run", "explain"):
        sp = sub.add_parser(name)
        sp.add_argument("query")
        sp.add_argument("--sf-dir", default=None)
        if name == "run":
            sp.add_argument("-n", type=int, default=20, help="rows to show")

    args = p.parse_args(argv)

    from financial_data_warehouse_automation_spark.registry import load_all

    specs = load_all()

    if args.cmd == "list":
        for name, spec in sorted(specs.items()):
            if args.tag and args.tag not in spec.tags:
                continue
            mark = "*" if spec.headline else " "
            oracle = "oracle" if spec.oracle else "rows-only"
            print(f"{mark} {name:38s} [{oracle}] {', '.join(spec.tags)}")
        return 0

    if args.query not in specs:
        print(f"unknown query {args.query!r}; try 'list'", file=sys.stderr)
        return 2

    from financial_data_warehouse_automation_spark.session import get_spark, sf_dir as default_sf

    spark = get_spark("cli")
    d = args.sf_dir or default_sf()
    df = specs[args.query].builder(spark, d)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.n, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

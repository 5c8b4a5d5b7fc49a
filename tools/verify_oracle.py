"""Local stand-in for the driver's correctness gate.

Runs every registered query at sf0.01 (or --sf-dir), runs its DuckDB
oracle over the same parquet files, and compares row count + column
names + order-insensitive value hash. Usage:

    python tools/verify_oracle.py [name ...] [--sf-dir DIR]
"""

from __future__ import annotations

import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def norm_cell(v) -> str:
    import datetime
    import math
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> None:
    sf_dir = SF_DIR
    json_out: str | None = None
    args: list[str] = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--sf-dir":
            sf_dir = argv[i + 1]
            i += 2
        elif argv[i] == "--json":
            json_out = argv[i + 1]
            i += 2
        else:
            args.append(argv[i])
            i += 1

    from financial_data_warehouse_automation_spark.registry import load_all
    from financial_data_warehouse_automation_spark.session import get_spark

    spark = get_spark("verify")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    specs = load_all()
    names = args or list(specs)
    n_pass = n_fail = n_rowsonly = 0
    record: dict[str, dict] = {}
    for name in names:
        spec = specs[name]
        try:
            sdf = spec.builder(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            record[name] = {"status": "fail",
                            "err": f"spark {type(e).__name__}: {e}"[:300]}
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"rows-only  {name}: {len(s_rows)} rows")
            record[name] = {"status": "rows_only", "spark_rows": len(s_rows)}
            n_rowsonly += 1
            continue
        try:
            res = con.execute(spec.oracle)
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error {type(e).__name__}: {e}")
            record[name] = {"status": "fail",
                            "err": f"oracle {type(e).__name__}: {e}"[:300]}
            n_fail += 1
            continue
        problems = []
        if len(s_rows) != len(o_rows):
            problems.append(f"rows {len(s_rows)} vs {len(o_rows)}")
        if sorted(s_cols) != sorted(o_cols):
            problems.append(f"cols {sorted(s_cols)} vs {sorted(o_cols)}")
        if not problems:
            sh, oh = table_hash(s_cols, s_rows), table_hash(o_cols, o_rows)
            if sh != oh:
                problems.append(f"hash {sh} vs {oh}")
                # show first differing line for debugging
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_o = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
                ls = sorted("|".join(norm_cell(r[i]) for i in order_s) for r in s_rows)
                lo = sorted("|".join(norm_cell(r[i]) for i in order_o) for r in o_rows)
                for a, b in zip(ls, lo):
                    if a != b:
                        problems.append(f"first diff:\n  spark  {a}\n  oracle {b}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            record[name] = {"status": "fail", "err": "; ".join(problems)[:300]}
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(s_rows)} rows)")
            record[name] = {"status": "pass", "rows": len(s_rows)}
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                 "n_rows_only": n_rowsonly, "queries": record},
                f, indent=1,
            )
        print(f"wrote {json_out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

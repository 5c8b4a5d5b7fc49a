"""Scale the driver's sf0.1 testdata up N× for LOCAL scaling runs.

The driver only ships sf0.001/0.01/0.1; the scale claims in PERF.md
("would this plan survive 100×?") deserve a measured point, not prose.
This tool fabricates an sfN directory (default 10× sf0.1 ≈ "sf1")
inside the repo by replicating every fact table N times with
consistent key offsets, so all FK joins keep exactly their sf0.1
selectivity while cardinalities grow linearly:

- copy i offsets every custkey-family key (c_custkey, o_custkey,
  events.user_id) by i·(max+1), orderkeys by i·(max+1), and so on —
  each copy is a disjoint, internally-consistent shard.
- bounded dims (region, nation) are NOT replicated: their role at any
  scale is "broadcastable", and growing them would change plan shape.
- document text gets every token suffixed with the copy index, so
  WITHIN-copy dup/near-dup structure is preserved exactly ×N while
  CROSS-copy similarity drops to zero (shingles differ). Naive
  replication would make every doc an exact dup of its N−1 clones and
  blow the LSH candidate count up quadratically — a different
  workload, not a bigger one.
- embeddings roll the vector by i positions (norms and pairwise
  geometry within a copy unchanged; cross-copy neighbors decorrelate).
- timestamps are left alone: more data per period is the realistic
  scale path (the period grain is fixed by the calendar).

Output is written with many ROW GROUPS per file (~64k rows each), the
shape cluster files actually have — which also exercises the
`load_table(spread_by=...)` guard's no-op path at scale.

Usage:
    python tools/scale_testdata.py [--mult 10] [--out testdata_sf1]

The output dir is .gitignored: it is a measurement input, not an
artifact.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
ROW_GROUP = 64 * 1024

# per-key-family offset bases, computed from the source data
KEY_FAMILIES = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey"),
                ("events", "user_id")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event_id": [("events", "event_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}
REPLICATED = ("customer", "orders", "lineitem", "part", "supplier",
              "events", "documents", "embeddings")
PASSTHROUGH = ("region", "nation")


def scale(src: str, out: str, mult: int, row_group: int = ROW_GROUP,
          hot_frac: float = 0.0) -> None:
    """``hot_frac`` > 0 additionally redirects that fraction of EVERY
    copy's orders (and events) to one hot customer — the lowest
    custkey — producing a join/aggregation key carrying hot_frac of
    the fact table. FK selectivity stays intact (the hot key exists);
    what changes is the key histogram, which is exactly what AQE's
    skew-join split and the salted_join operator are for. Use it to
    measure skew posture, not correctness (oracle artifacts always run
    on the driver's uniform testdata)."""
    os.makedirs(out, exist_ok=True)

    src_tables = {t: pq.read_table(f"{src}/{t}.parquet") for t in REPLICATED}
    if hot_frac > 0:
        import numpy as np

        hot_key = pc.min(src_tables["customer"]["c_custkey"]).as_py()
        for t, c in (("orders", "o_custkey"), ("events", "user_id")):
            tbl = src_tables[t]
            keys = np.asarray(tbl[c].combine_chunks())
            # deterministic pick: hash-free stride over row position
            stride = max(1, int(round(1 / hot_frac)))
            keys = keys.copy()
            keys[::stride] = hot_key
            src_tables[t] = tbl.set_column(
                tbl.schema.get_field_index(c), c,
                pa.array(keys, type=tbl.schema.field(c).type))
    bases: dict[tuple[str, str], int] = {}
    for fam, cols in KEY_FAMILIES.items():
        base = 1 + max(
            pc.max(src_tables[t][c]).as_py() for t, c in cols
        )
        for t, c in cols:
            bases[(t, c)] = base

    for t in PASSTHROUGH:
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"),
                       f"{out}/{t}.parquet", row_group_size=row_group)
        print(f"{t}: passthrough")

    for t in REPLICATED:
        base_tbl = src_tables[t]
        copies = []
        for i_copy in range(mult):
            cols = {}
            for name in base_tbl.column_names:
                col = base_tbl[name]
                if (t, name) in bases:
                    col = pc.add(col, i_copy * bases[(t, name)])
                elif t == "documents" and name == "text" and i_copy > 0:
                    # suffix every token with the copy index: within-copy
                    # similarity exact, cross-copy similarity zero
                    col = pc.replace_substring_regex(
                        col, r"(\S+)", rf"\1{i_copy}")
                elif t == "embeddings" and name == "embedding" and i_copy:
                    arrs = col.to_pylist()
                    k = i_copy % (len(arrs[0]) or 1)
                    col = pa.array([v[k:] + v[:k] for v in arrs],
                                   type=base_tbl.schema.field(name).type)
                cols[name] = col
            copies.append(pa.table(cols, schema=base_tbl.schema))
        big = pa.concat_tables(copies)
        pq.write_table(big, f"{out}/{t}.parquet", row_group_size=row_group)
        f = pq.ParquetFile(f"{out}/{t}.parquet")
        print(f"{t}: {f.metadata.num_rows} rows, {f.num_row_groups} row groups")


def main() -> None:
    mult = 10
    src = SRC
    hot_frac = 0.0
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "testdata_sf1")
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--mult":
            mult = int(argv[i + 1]); i += 2
        elif argv[i] == "--out":
            out = argv[i + 1]; i += 2
        elif argv[i] == "--src":
            src = argv[i + 1]; i += 2
        elif argv[i] == "--hot-frac":
            hot_frac = float(argv[i + 1]); i += 2
        else:
            raise SystemExit(f"unknown arg {argv[i]}")
    scale(src, out, mult, hot_frac=hot_frac)


if __name__ == "__main__":
    main()

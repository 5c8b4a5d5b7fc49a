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
- document text: copy 0 is kept VERBATIM (so literal-keyword queries
  like BM25 search still match real vocabulary at scale); copies
  1..N−1 get every token suffixed with \x1f + the copy index, so
  WITHIN-copy dup/near-dup structure is preserved exactly ×N while
  CROSS-copy similarity drops to zero (original text never contains
  \x1f, so no suffixed token can collide with a verbatim or
  differently-suffixed one). Naive replication would make every doc
  an exact dup of its N−1 clones and blow the LSH candidate count up
  quadratically — a different workload, not a bigger one.
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
    """``hot_frac`` > 0 additionally redirects that fraction of ALL
    orders (and events) — across every copy, AFTER key offsetting — to
    ONE hot customer (copy 0's lowest custkey), producing a single
    join/aggregation key that really carries hot_frac of the fact
    table. FK selectivity stays intact (the hot key exists in copy 0's
    customer shard); what changes is the key histogram, which is
    exactly what AQE's skew-join split and the salted_join operator
    are for. The fraction is applied as a positional mask accurate to
    1/1000, not a rounded stride. Use it to measure skew posture, not
    correctness (oracle artifacts always run on the driver's uniform
    testdata)."""
    os.makedirs(out, exist_ok=True)

    src_tables = {t: pq.read_table(f"{src}/{t}.parquet") for t in REPLICATED}
    hot_key = pc.min(src_tables["customer"]["c_custkey"]).as_py()
    hot_cols = {("orders", "o_custkey"), ("events", "user_id")}
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
                    if hot_frac > 0 and (t, name) in hot_cols:
                        # post-offset remap to the GLOBAL hot key, so
                        # the skew concentrates in one key — not one
                        # diluted key per copy (review finding, r6)
                        import numpy as np

                        keys = np.asarray(col.combine_chunks()
                                          if hasattr(col, "combine_chunks")
                                          else col).copy()
                        # Bresenham spread: exactly floor(n*frac) rows
                        # regardless of n (a blocked `i % 1000` mask
                        # over-selects whenever n % 1000 != 0)
                        pos = np.arange(len(keys), dtype=np.float64)
                        mask = np.floor((pos + 1) * hot_frac) > np.floor(
                            pos * hot_frac)
                        keys[mask] = hot_key
                        col = pa.array(
                            keys, type=base_tbl.schema.field(name).type)
                elif t == "documents" and name == "text" and i_copy:
                    # suffix every token with \x1f + copy index for
                    # copies 1..N−1 ONLY; copy 0 stays VERBATIM
                    # (review finding, r8). The \x1f separator alone
                    # guarantees the invariant: original text never
                    # contains \x1f, so copy 0 tokens can't equal any
                    # suffixed token, and 'x1'+'\x1f1' can never
                    # collide with 'x'+'\x1f11' — cross-copy
                    # similarity is exactly zero while literal-term
                    # vocabulary (e.g. BM25 keyword probes) survives
                    # at scale. Within-copy dup structure is preserved
                    # verbatim in every copy.
                    col = pc.replace_substring_regex(
                        col, r"(\S+)", "\\1\x1f" + str(i_copy))
                elif t == "embeddings" and name == "embedding" and i_copy:
                    arrs = col.to_pylist()
                    k = i_copy % (len(arrs[0]) or 1)
                    col = pa.array([v[k:] + v[:k] for v in arrs],
                                   type=base_tbl.schema.field(name).type)
                cols[name] = col
            copies.append(pa.table(cols, schema=base_tbl.schema))
        big = pa.concat_tables(copies)
        # per-table sizing: even the smallest replicated table must
        # carry enough row groups to split (documents/embeddings at
        # default mult stay < 64k rows — review finding, r6)
        rg = min(row_group, max(1024, big.num_rows // 16))
        pq.write_table(big, f"{out}/{t}.parquet", row_group_size=rg)
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

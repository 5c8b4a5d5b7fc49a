"""tools/scale_testdata.py must produce internally-consistent shards:
every FK keeps its sf selectivity, dedup structure grows linearly, and
the files carry enough row groups to split (the property the whole
scaling study rests on)."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo/tools")


@pytest.fixture(scope="module")
def scaled(tmp_path_factory, sf_dir):
    from scale_testdata import scale

    out = tmp_path_factory.mktemp("sfx")
    scale(sf_dir, str(out), mult=3, row_group=2048)
    return str(out)


def test_row_counts_scale_linearly(scaled, sf_dir):
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "events", "documents",
              "embeddings", "part", "supplier"):
        n0 = con.execute(f"SELECT COUNT(*) FROM '{sf_dir}/{t}.parquet'").fetchone()[0]
        n1 = con.execute(f"SELECT COUNT(*) FROM '{scaled}/{t}.parquet'").fetchone()[0]
        assert n1 == 3 * n0, t
    for t in ("region", "nation"):  # bounded dims untouched
        n0 = con.execute(f"SELECT COUNT(*) FROM '{sf_dir}/{t}.parquet'").fetchone()[0]
        n1 = con.execute(f"SELECT COUNT(*) FROM '{scaled}/{t}.parquet'").fetchone()[0]
        assert n1 == n0, t


def test_fk_selectivity_preserved(scaled, sf_dir):
    con = duckdb.connect()
    # every lineitem still matches exactly one order; every order one customer
    for big, key, dim, dkey in (
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("events", "user_id", "customer", "c_custkey"),
    ):
        dangling = con.execute(f"""
            SELECT COUNT(*) FROM '{scaled}/{big}.parquet' b
            WHERE NOT EXISTS (
              SELECT 1 FROM '{scaled}/{dim}.parquet' d
              WHERE d.{dkey} = b.{key})
        """).fetchone()[0]
        base_dangling = con.execute(f"""
            SELECT COUNT(*) FROM '{sf_dir}/{big}.parquet' b
            WHERE NOT EXISTS (
              SELECT 1 FROM '{sf_dir}/{dim}.parquet' d
              WHERE d.{dkey} = b.{key})
        """).fetchone()[0]
        assert dangling == 3 * base_dangling, (big, key)


def test_keys_disjoint_across_copies(scaled, sf_dir):
    con = duckdb.connect()
    n0, u0 = con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT doc_id) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()
    n1, u1 = con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT doc_id) FROM '{scaled}/documents.parquet'"
    ).fetchone()
    assert (u1, n1) == (3 * u0, 3 * n0)


def test_dedup_structure_grows_linearly_not_quadratically(scaled, sf_dir):
    # exact-dup groups: each copy reproduces the base corpus's dup
    # structure, and token suffixing keeps copies from colliding — so
    # the duplicated-row count is exactly 3x, not the 3x+cross-copy
    # blowup naive replication would give.
    con = duckdb.connect()
    q = """
      SELECT COALESCE(SUM(n - 1), 0) FROM (
        SELECT COUNT(*) AS n FROM '{p}/documents.parquet'
        GROUP BY lower(trim(text)) HAVING COUNT(*) > 1)
    """
    base = con.execute(q.format(p=sf_dir)).fetchone()[0]
    scaled_dups = con.execute(q.format(p=scaled)).fetchone()[0]
    assert scaled_dups == 3 * base


def test_copy0_text_verbatim_and_suffix_confined_to_later_copies(scaled, sf_dir):
    # r8 verdict finding: suffixing EVERY copy (including 0) left
    # literal-keyword queries (doc_bm25_search) probing an empty
    # vocabulary at scale. Copy 0 must stay VERBATIM — its text
    # multiset equals the base corpus exactly — while copies 1..N−1
    # carry the \x1f suffix that keeps cross-copy similarity at zero.
    con = duckdb.connect()
    n0 = con.execute(
        f"SELECT COUNT(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    assert con.execute(
        f"SELECT COUNT(*) FROM '{sf_dir}/documents.parquet' "
        "WHERE contains(text, chr(31))"
    ).fetchone()[0] == 0, "base corpus must be \\x1f-free for the invariant"
    plain, suffixed = con.execute(
        f"SELECT COUNT(*) FILTER (NOT contains(text, chr(31))), "
        f"COUNT(*) FILTER (contains(text, chr(31))) "
        f"FROM '{scaled}/documents.parquet'"
    ).fetchone()
    assert (plain, suffixed) == (n0, 2 * n0)
    # verbatim = multiset equality, not mere \x1f-freedom
    mismatch = con.execute(f"""
      WITH b AS (SELECT text, COUNT(*) AS n FROM '{sf_dir}/documents.parquet' GROUP BY 1),
           s AS (SELECT text, COUNT(*) AS n FROM '{scaled}/documents.parquet'
                 WHERE NOT contains(text, chr(31)) GROUP BY 1)
      SELECT COUNT(*) FROM b FULL JOIN s USING (text)
      WHERE b.n IS DISTINCT FROM s.n
    """).fetchone()[0]
    assert mismatch == 0, "copy 0 text multiset must equal the base corpus"


def test_files_split_into_row_groups(scaled):
    import pyarrow.parquet as pq

    f = pq.ParquetFile(f"{scaled}/lineitem.parquet")
    assert f.num_row_groups >= 3, "scaled files must be splittable"

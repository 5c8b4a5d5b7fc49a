"""Property tests for the scalar parsers (SURVEY §5.2 item 3):
round-trips and algebraic identities that hold for *any* input, driven
by hypothesis. Each property evaluates a whole batch of generated
values in one Spark job to keep runtime sane."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.functions.scalars import (
    clean_amount,
    currency_string,
    month_name,
    month_num_from_name,
    normalize_gl_code,
)

_SETTINGS = dict(max_examples=12, deadline=None)

amounts = st.decimals(
    min_value=Decimal("-9999999.99"),
    max_value=Decimal("9999999.99"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)


def _one_col(spark, values, schema, expr):
    df = spark.createDataFrame([(v,) for v in values], schema)
    return [r.out for r in df.select(expr.alias("out")).collect()]


@settings(**_SETTINGS)
@given(st.lists(amounts, min_size=1, max_size=30))
def test_amount_render_parse_roundtrip(spark, xs):
    """clean_amount(currency_string(x)) == x — the F1 inverse pair
    (render as $1,234.56 / ($1,234.56), parse back)."""
    out = _one_col(
        spark, [str(x) for x in xs], "v string",
        clean_amount(currency_string(F.col("v").cast("decimal(18,2)"))),
    )
    assert out == list(xs)


@settings(**_SETTINGS)
@given(st.lists(amounts.filter(lambda d: d > 0), min_size=1, max_size=30))
def test_parenthesized_amount_is_negation(spark, xs):
    """clean_amount('(x)') == -clean_amount('x') (build_warehouse.py:44-47)."""
    pos = _one_col(spark, [str(x) for x in xs], "v string", clean_amount("v"))
    neg = _one_col(
        spark, [f"({x})" for x in xs], "v string", clean_amount("v")
    )
    assert neg == [-p for p in pos]


@settings(**_SETTINGS)
@given(st.lists(st.integers(min_value=1, max_value=12), min_size=1, max_size=24))
def test_month_name_num_inverse(spark, ms):
    """month_num_from_name(month_name(m)) == m (F5 inverse pair)."""
    out = _one_col(
        spark, ms, "v int", month_num_from_name(month_name(F.col("v")))
    )
    assert out == ms


@settings(**_SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=9999), min_size=1, max_size=30))
def test_gl_pad_idempotent(spark, codes):
    """normalize_gl_code is idempotent: pad(pad(x)) == pad(x), and the
    result is always exactly 4 digits (Code.gs:251-256)."""
    once = _one_col(
        spark, [str(c) for c in codes], "v string", normalize_gl_code("v")
    )
    twice = _one_col(spark, once, "v string", normalize_gl_code("v"))
    assert twice == once
    assert all(len(c) == 4 and c.isdigit() for c in once)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Zs")),
            max_size=12,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_non_codes_never_pass_gl_filter(spark, junk):
    """Alphabetic/whitespace junk never normalizes to a GL code."""
    out = _one_col(spark, junk, "v string", normalize_gl_code("v"))
    assert all(
        o is None for o, j in zip(out, junk) if not j.strip().isdigit()
    )


words = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=6),
    min_size=1,
    max_size=40,
)


@settings(**_SETTINGS)
@given(words)
def test_shingle_count_and_jaccard_identities(spark, toks):
    """word_shingles yields exactly max(n-k+1, 1) k-grams (short docs
    keep one shingle so they still participate in dedup), and Jaccard
    is 1 on identical sets, symmetric, and within [0, 1] against a
    perturbed copy — the algebra the whole dedup ladder rests on."""
    from financial_data_warehouse_automation_spark.operators.text import jaccard, word_shingles

    df = spark.createDataFrame([(toks, toks[: max(len(toks) // 2, 1)])], "a: array<string>, b: array<string>")
    row = df.select(
        F.size(word_shingles(F.col("a"), 3)).alias("n_sh"),
        jaccard(F.array_distinct("a"), F.array_distinct("a")).alias("self_j"),
        jaccard(F.array_distinct("a"), F.array_distinct("b")).alias("ab"),
        jaccard(F.array_distinct("b"), F.array_distinct("a")).alias("ba"),
    ).collect()[0]
    assert row.n_sh == max(len(toks) - 2, 1)
    assert row.self_j == 1.0
    assert row.ab == row.ba
    assert 0.0 <= row.ab <= 1.0


@settings(**_SETTINGS)
@given(words)
def test_minhash_signature_width_and_permutation_invariance(spark, toks):
    """Signatures are always k wide, and shuffling the shingle order
    of a document never changes its signature (min is order-free) —
    the property that makes MinHash shard-safe."""
    from financial_data_warehouse_automation_spark.operators.text import minhash_signatures

    rev = list(reversed(toks))
    df = spark.createDataFrame(
        [(0, toks), (1, rev)], "doc_id: long, sh: array<string>"
    )
    sigs = {
        r.doc_id: r.signature
        for r in minhash_signatures(df, "doc_id", F.col("sh"), k=8).collect()
    }
    assert len(sigs[0]) == 8 and len(sigs[1]) == 8
    assert sigs[0] == sigs[1]


def test_cusum_closed_form_equals_recurrence_property():
    """events_cusum_drift relies on the identity
    max(0, C_{t-1} + d_t) == S_t - min(0, S_0..S_{t-1}) (with S the
    prefix sums). Property-check it over random integer series so the
    window formulation can never silently diverge from the textbook
    recurrence."""
    from hypothesis import given, strategies as st

    @given(st.lists(st.integers(min_value=-10**9, max_value=10**9),
                    min_size=1, max_size=200))
    def check(ds):
        c = 0
        s = 0
        prefix_min = 0  # min over S_{-1}=0 and earlier prefixes
        for d in ds:
            c = max(0, c + d)          # recurrence
            # closed form: max(0, S_t - min(0, S_0..S_{t-1}))
            closed = max(0, (s + d) - min(0, prefix_min))
            assert c == closed, (ds, c, closed)
            s += d
            prefix_min = min(prefix_min, s)

    check()


def test_two_pass_cumulative_equals_global_property():
    """part_abc_pareto's scale pattern: bucketing values by magnitude,
    broadcasting per-bucket offsets, and accumulating within buckets
    must equal the single global running sum, for ANY value multiset —
    including ties across bucket boundaries (descending order inside
    bucket == descending across buckets because buckets partition the
    value range monotonically)."""
    from hypothesis import given, strategies as st

    @given(st.lists(st.integers(min_value=0, max_value=10**6),
                    min_size=1, max_size=300))
    def check(vals):
        items = sorted(
            ((v, i) for i, v in enumerate(vals)),
            key=lambda t: (-t[0], t[1]),
        )
        # global running sum (the single-partition formulation)
        want, acc = {}, 0
        for v, i in items:
            acc += v
            want[i] = acc
        # two-pass: bucket 0 = largest values (mirrors the query)
        mx = max(v for v, _ in items)
        nb = 32

        def bkt(v):
            return 31 - (v * nb) // (mx + 1)

        totals = [0] * nb
        for v, _ in items:
            totals[bkt(v)] += v
        offsets = [sum(totals[:b]) for b in range(nb)]
        got = {}
        for b in range(nb):
            acc = 0
            for v, i in items:  # items already in global desc order
                if bkt(v) != b:
                    continue
                acc += v
                got[i] = offsets[b] + acc
        assert got == want

    check()

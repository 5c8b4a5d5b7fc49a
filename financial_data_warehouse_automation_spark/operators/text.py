"""Text-analysis / dedup operators for LLM data pipelines (SURVEY §2.10).

Everything is built from native column expressions and higher-order
functions — tokenization, shingling, MinHash, SimHash and fingerprints
all run inside whole-stage codegen / vectorized exec with zero Python in
the row path, so the same code scales from the 500-doc harness table to
a 100 TB corpus (the only shuffles are the documented groupBys/joins).

Dedup strategy ladder (cheapest first):
  1. exact       — md5 of normalized text, groupBy key          (1 shuffle)
  2. fingerprint — rolling-hash (winnowing-lite) key, groupBy   (1 shuffle)
  3. MinHash+LSH — banded signature join: only same-bucket pairs
     are compared, never all-pairs                              (2 shuffles)
  4. SimHash     — 64-bit near-dup sketch, bucket by band       (1 shuffle)
Brute-force token-set Jaccard exists as the small-scale correctness
anchor for 3 (oracle-checked at sf0.01) — it is O(n²) and must never
run on a full corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.lineage import cut

# Small english function-word set for quality / language heuristics.
EN_STOPWORDS = (
    "the", "a", "an", "of", "and", "to", "in", "is", "on", "for",
    "with", "as", "by", "at", "or", "be", "this", "that", "it", "are",
)


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (already-normalized corpora)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def norm_text(col: Column | str) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, strip
    non-alphanumerics (the canonical key for exact dedup)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", ""), r"\s+", " "
        )
    )


def bpe_ish_token_count(col: Column | str) -> Column:
    """Token counting with a BPE-ish regex: word pieces, digits, and
    stray symbols each count once — a cheap LLM-token estimator."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"), 0))


def stopword_ratio(toks: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of tokens that are function words — the core of both the
    quality score and the language heuristic."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def mean_token_len(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def word_shingles(toks: Column, n: int) -> Column:
    """Word n-gram shingles as an array column — no explode until the
    caller wants one row per shingle. Docs shorter than ``n`` tokens
    yield a single shingle of whatever is there (so they still
    participate in dedup).

    Built by ``zip_with``-folding ``n`` shifted slices of the token
    array (shingle i = toks[i] ⊕ toks[i+1] ⊕ … ⊕ toks[i+n-1]) instead
    of the obvious ``transform(sequence(i), concat_ws(slice(toks,i,n)))``:
    the per-index slice allocates an n-array per shingle inside an
    interpreted lambda, and measured 4.6× slower end-to-end through the
    explode (3.0s → 0.65s for 260k shingles at sf0.1). Identical output
    strings — pinned by the property tests in
    tests/test_scalar_properties.py."""
    sz = F.size(toks)
    m = sz - (n - 1)  # shingle count when sz >= n
    out = F.slice(toks, 1, m)
    for j in range(2, n + 1):
        out = F.zip_with(
            out,
            F.slice(toks, j, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(sz < n, F.array(F.concat_ws(" ", toks))).otherwise(out)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# Deterministic permutation parameters: odd multipliers + offsets over
# a 31-bit fold of xxhash64. Operands are bounded (a < 2^8, h' < 2^31,
# b < 2^60) so the expression can never overflow int64 — ANSI mode
# (Spark 4 default) turns silent wrap-around into a job-killing error.
def _perm(h: Column, i: int) -> Column:
    h31 = F.pmod(h, F.lit(1 << 31))
    return h31 * F.lit(2 * i + 1) + F.lit((0x9E3779B97F4A7C15 * (i + 1)) % (1 << 60))


def minhash_signatures(
    df: DataFrame, id_col: str, shingle_arr: Column, k: int = 64,
    include_set: bool = False,
) -> DataFrame:
    """doc → k-wide MinHash signature (array<long>).

    Explodes shingles once, then one hash-aggregate computes all k mins
    map-side-combined — the shuffle carries k longs per doc, not the
    shingle set, and the signature exists exactly once in the plan.

    The shingle hash is materialized in its own projection before the
    aggregate: aggregate expressions referencing a plain column
    expression get it inlined per function, i.e. ``xxhash64`` would run
    k times per shingle (verified in the executed plan); through the
    attribute it runs once and the k mins are pure long arithmetic.

    ``include_set=True`` additionally emits ``shingle_set`` — the
    distinct 64-bit shingle hashes (``collect_set``) — from the SAME
    aggregate, so a verify stage downstream can compute exact hashed
    Jaccard without re-scanning/re-shingling the corpus (longs shuffle
    ~an order of magnitude lighter than the raw shingle strings, and a
    64-bit collision inside one doc pair is ~s²/2⁶⁴ ≈ never).

    A shuffle-free per-row HOF formulation (``array_min`` over k
    ``transform`` permutations) was measured and rejected: identical
    values, but the k-wide lambda tree is codegen-heavy and re-enters
    the plan wherever the signature is consumed, losing end-to-end
    (7.7s vs 4.5s at sf0.1 through the LSH pipeline).
    """
    ex = (
        df.select(F.col(id_col), F.explode(shingle_arr).alias("_sh"))
        .selectExpr(id_col, "xxhash64(_sh) AS _h64")
        .selectExpr(id_col, "_h64", f"pmod(_h64, {1 << 31}) AS _h31")
    )
    # the whole k-wide signature as ONE parsed expression —
    # array(min(...), ..., min(...)) nested inside the aggregate — so
    # construction is a single py4j round trip instead of k (r5 had
    # already collapsed each min to one F.expr; r15 collapses the loop
    # itself: 64 expr parses + the re-array select were ~0.25s of
    # build per call at k=64). Identical SQL semantics: the final
    # aggregate's result projection array()s the k mins either way.
    mins_csv = ", ".join(
        f"min(_h31 * {2 * i + 1} + "
        f"{(0x9E3779B97F4A7C15 * (i + 1)) % (1 << 60)})"
        for i in range(k)
    )
    aggs = [F.expr(f"array({mins_csv})").alias("signature")]
    if include_set:
        aggs.append(F.collect_set("_h64").alias("shingle_set"))
    return ex.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    bands: int = 16,
    rows: int = 4,
    max_bucket: int = 4096,
    observation=None,
) -> DataFrame:
    """Banded LSH: hash each r-row slice of the signature; docs agreeing
    on any band become a candidate pair. Candidates come from a groupBy
    on (band_idx, band_hash) + per-bucket pair expansion — ONE shuffle,
    and the signature subtree is evaluated exactly once (a self-join
    formulation computes it on both sides; measured 2× slower end-to-end
    at sf0.1 because the exchanges are not canonically reusable).
    Returns distinct (id_a, id_b) with id_a < id_b.

    Hot-bucket cap: a band bucket larger than ``max_bucket`` (e.g. a
    boilerplate template shared by millions of docs) would expand to
    n²/2 pairs and dominate the job. Such buckets degrade to STAR
    expansion — every id paired with the bucket's smallest id — which
    is linear and deterministic. RECALL CAVEAT (review finding): the
    star preserves connectivity only at CANDIDATE level. A downstream
    Jaccard-verify stage (doc_minhash_lsh_pairs) filters edges
    independently, so if the hub doc is dissimilar to two docs that
    are similar to each other, both star edges fail verification and
    the true pair is lost — over-cap buckets trade within-bucket pair
    recall for linear cost, which is the standard, unavoidable deal
    (n²/2 pairs cannot be kept linearly). Two mitigations: size
    bands×rows so real buckets stay under the cap (the knob that
    grows with corpus size), and run dedup CLUSTERING on candidates
    rather than verified pairs when caps fire. Observability is
    OPT-IN: pass a ``pyspark.sql.Observation`` (or metric name) as
    ``observation`` and the action reports ``hot_buckets`` and
    ``pairs_capped`` (the count of intra-bucket edges replaced by
    the star). With no argument the observe node — and its two
    aggregate expressions over every bucket — is omitted entirely:
    the always-on variant cost +23% on the driver bench
    (BENCH_r06 2.15s vs r05 1.74s; PERF.md round 7), which is the
    wrong default for a hot path whose cap fires ~never on honest
    data. Oracle twins replaying the
    banded construction in SQL assume every bucket is under the cap —
    true at test scale by orders of magnitude (default 4096)."""
    # the whole bands array as ONE parsed expression — the nested
    # Column-composition loop (bands x ~10 py4j calls) was ~0.3s of
    # DataFrame construction per build; identical SQL semantics
    band_parts = ", ".join(
        f"struct({i} AS band_idx, xxhash64(concat_ws(',', "
        + ", ".join(
            f"element_at(signature, {i * rows + j + 1})" for j in range(rows)
        )
        + ")) AS band_hash)"
        for i in range(bands)
    )
    # construction is parsed-SQL throughout (r15): the Column-composed
    # band explode + pair-expansion lambdas were ~700 py4j round trips
    # (~0.2-0.3s of build under load); inline() + one CASE expression
    # emit the identical plan in a handful of calls.
    b = sig_df.selectExpr(id_col, f"inline(array({band_parts}))")
    buckets = (
        b.groupBy("band_idx", "band_hash")
        .agg(F.expr(f"array_sort(collect_list({id_col}))").alias("ids"))
        .where("size(ids) >= 2")
    )
    hot_sql = f"size(ids) > {max_bucket}"
    if observation is not None:
        # pairs_capped = intra-bucket edges a hot bucket does NOT emit:
        # n*(n-1)/2 all-pairs minus the n-1 star edges
        buckets = buckets.observe(
            observation,
            F.expr(
                f"coalesce(sum(cast(({hot_sql}) as long)), 0)"
            ).alias("hot_buckets"),
            F.expr(
                f"coalesce(sum(case when {hot_sql} then "
                "cast(size(ids) * (size(ids) - 1) / 2 - (size(ids) - 1) "
                "as long) end), 0)"
            ).alias("pairs_capped"),
        )
    # All ordered pairs within a sub-cap bucket: for each ids[i], pair
    # with every later element. Bucket = one shared band hash, i.e. a
    # near-dup group, so sizes stay small in a deduplicated corpus; a
    # hot (over-cap) bucket degrades to the linear star instead.
    return (
        buckets.selectExpr(
            f"""explode(CASE WHEN {hot_sql}
              THEN transform(slice(ids, 2, size(ids)),
                             y -> named_struct('id_a', element_at(ids, 1),
                                               'id_b', y))
              ELSE flatten(transform(ids, (x, i) ->
                     transform(slice(ids, i + 2, size(ids)),
                               y -> named_struct('id_a', x, 'id_b', y))))
              END) AS p"""
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def allpairs_prefix_candidates(
    sets: DataFrame, id_col: str = "doc_id", set_col: str = "s",
    tau: float = 0.5, positional: bool = True,
) -> DataFrame:
    """Candidate (id_a, id_b) pairs for exact Jaccard >= ``tau`` via
    PREFIX FILTERING in canonical document-frequency order (Bayardo et
    al., "Scaling Up All Pairs Similarity Search", WWW'07).

    ``sets`` holds (id, array<string> of DISTINCT set elements). Any
    total order over elements makes the prefix filter CORRECT (a
    qualifying pair must collide inside each side's first
    |A| - ceil(tau*|A|) + 1 elements); df-ASCENDING order is what
    makes it SUB-quadratic: prefixes then hold each doc's rarest
    elements, so candidate join keys have low fan-out by construction.
    A random order puts corpus-common elements in ~half of all
    prefixes — one hot key then yields O(n²) candidates (measured:
    the md5-ordered round-6 form was the slowest query in the sf1
    sweep at 21.6s on a corpus with NO true stop-shingles; df order
    cut candidates ~an order of magnitude — PERF.md round 7).

    Also applies the result-neutral symmetric LENGTH filter
    (tau*|A| <= |B| <= |A|/tau). Ties in df break by the first 15 hex
    chars (60 bits) of md5(element); the raw element tail would be
    dead weight in every downstream payload (the per-doc sort, the
    prefix arrays, the candidate-join shuffle keys). A 60-bit
    tiebreak COLLISION between distinct elements is recall-safe, not
    just improbable: colliding elements carry IDENTICAL keys, so
    wherever the ambiguous sort puts them, each doc's prefix KEY SET
    is unchanged, and a qualifying pair still collides on that shared
    key value — collisions can only ADD candidates, and verification
    is exact. The final pair set does not depend on WHICH total order
    both sides use, only that it is one global order, so the oracle
    may order by (df, full md5, element) while this side uses the
    slim key: the verified pairs hash-match.

    Shape: explode → df aggregate → df join-back → per-doc sort+slice
    → prefix-keyed shuffle. Three shuffles, all keyed on high-
    cardinality columns (element / id); no stage is ever doc×doc.
    The exploded element stream feeds both the df aggregate and the
    join-back, and Spark re-evaluates shared subplans, so it is
    lazily localCheckpoint'ed (one explode over the corpus, not
    two).

    The recall-critical bounds ceil(tau*|A|) are computed as
    ceil(round(tau*sz, 9)) — the raw float product can land one ulp
    ABOVE the exact rational (e.g. 0.1*30 = 3.0000000000000004), and
    a bare ceil then inflates the bound, shortening the prefix below
    the theorem's length and over-tightening the length filter —
    silently DROPPING qualifying pairs (advisor finding; pinned by
    test_prefix_filter_tau_float_ceil_exact). round-9 is safe both
    ways: a true bound is an integer or has fractional part >= 1/sz
    (>= 1e-9 for any real corpus), while float error is ~1 ulp
    (~1e-15 relative), so rounding to 9 decimals restores the exact
    value without ever crossing a true bound. VALIDITY BOUND (r8
    advisor): that cancellation argument needs the ABSOLUTE float
    error (~ tau*sz * 1e-16) to stay under the 5e-10 rounding
    granularity, i.e. tau*sz below ~5e6 — fine for any document
    (sz = distinct shingles per doc, not corpus size), since a doc
    with >5M distinct shingles is ~gigabytes of text and should be
    chunked long before a similarity join. If that regime ever
    matters, pass tau as an exact rational and compare with integer
    arithmetic (sz_b * den >= num * sz_a) instead. Registered
    queries use tau = 0.5, where tau*sz is exactly representable at
    ANY sz and the round is a no-op.

    ``positional=True`` (default) additionally applies the PPJoin
    POSITIONAL filter (Xiao, Wang, Lin & Yu, "Efficient Similarity
    Joins for Near Duplicate Detection", WWW'08) at pair grain —
    measured 1211:1 candidates:verified at the 10x scale point, so
    pruning candidates BEFORE the full-array verify join is where the
    time goes. See :func:`_positional_keep` for the completeness
    proof (including why within-doc duplicate slim keys exempt a pair
    from pruning). The filter rides the same (id_a, id_b) shuffle the
    old ``.distinct()`` used — a groupBy with four extra aggregates —
    so candidate generation costs the same and verification shrinks.
    ``positional=False`` restores the plain AllPairs candidate set
    (the fallback; final verified pairs are identical either way,
    pinned by test_positional_filter_final_pairs_unchanged)."""
    pre = _allpairs_prefix_arrays(sets, id_col, set_col, tau)
    return allpairs_candidates_from_prefix(
        pre, id_col, tau=tau, positional=positional
    )


def allpairs_candidates_from_prefix(
    pre: DataFrame, id_col: str = "doc_id",
    tau: float = 0.5, positional: bool = True,
) -> DataFrame:
    """:func:`allpairs_prefix_candidates` from a PREBUILT prefix frame
    (the ``(id, ks, sz, dup)`` output of ``_allpairs_prefix_arrays``) —
    split out (r16, guide §1.2) so the incremental dedup pipeline can
    run the explode → df aggregate → join-back → per-doc sort chain
    ONCE over the full corpus and feed both its base and delta
    candidate generators from the same frame. Correctness: the prefix
    theorem only requires ONE global total order over elements shared
    by both join sides (see the order-invariance note above), so
    restricting a full-corpus prefix frame to the base docs yields a
    complete candidate set for base-vs-base pairs even though the
    prior epoch's literal run ordered by base-only df — the VERIFIED
    pair set is identical, which is the invariant the oracle pins."""
    ka = pre.select(
        F.col(id_col).alias("id_a"),
        F.col("sz").alias("sz_a"),
        F.col("dup").alias("dup_a"),
        F.posexplode("ks").alias("p0_a", "k"),
    )
    kb = pre.select(
        F.col(id_col).alias("id_b"),
        F.col("sz").alias("sz_b"),
        F.col("dup").alias("dup_b"),
        F.posexplode("ks").alias("p0_b", "k"),
    )
    joined = ka.join(kb, "k").where(
        (F.col("id_a") < F.col("id_b"))
        & (F.col("sz_b") >= F.ceil(F.round(tau * F.col("sz_a"), 9)))
        & (F.col("sz_a") >= F.ceil(F.round(tau * F.col("sz_b"), 9)))
    )
    if not positional:
        return joined.select("id_a", "id_b").distinct()
    agg = joined.groupBy("id_a", "id_b").agg(
        F.count_distinct(F.struct("p0_a", "p0_b")).alias("m"),
        (F.max("p0_a") + 1).alias("i_star"),
        (F.max("p0_b") + 1).alias("j_star"),
        F.first("sz_a").alias("sz_a"),
        F.first("sz_b").alias("sz_b"),
        F.max("dup_a").alias("dup_a"),
        F.max("dup_b").alias("dup_b"),
    )
    return agg.where(_positional_keep(tau)).select("id_a", "id_b")


def _positional_keep(tau: float) -> Column:
    """The PPJoin positional-filter keep predicate over the per-pair
    collision aggregate (m, i_star, j_star, sz_a, sz_b, dup_a, dup_b).

    THEOREM (candidate completeness). Let each doc's DISTINCT elements
    be keyed and sorted ascending by the global slim key; sz = element
    count; prefix = the first sz - ceil(tau*sz) + 1 slots. For a
    candidate pair let R = the set of prefix key collisions, m = |R|
    (as distinct position pairs), i* = 1 + max row position on the A
    side, j* = same on the B side. If NEITHER doc's key array holds a
    duplicated key value (dup flags false), then the true overlap
    O = |A ∩ B| satisfies

        O  <=  m + min(sz_a - i*, sz_b - j*).

    Proof. Each element c of A ∩ B occupies one slot per doc at
    positions (i_c, j_c). Split on whether c is in BOTH prefixes.
    (1) If i_c <= p_a and j_c <= p_b then (i_c, j_c) ∈ R, and the map
    c -> (i_c, j_c) is injective (one slot per element), so at most m
    such elements. (2) Otherwise w.l.o.g. i_c > p_a >= i*. With no
    duplicate keys the arrays are STRICTLY increasing, so
    key(c) = A[i_c] > A[i*] = the largest collision key = B[j*],
    hence j_c > j* and i_c > i* both hold; distinct such c occupy
    distinct positions beyond (i*, j*) in both docs, so at most
    min(sz_a - i*, sz_b - j*) of them. ∎

    Since Jaccard >= tau forces O >= ceil(tau/(1+tau) * (sz_a+sz_b))
    (O(1+tau) >= tau(sz_a+sz_b), O integer), a pair whose bound falls
    below that threshold cannot verify and is safely pruned.

    The DUPLICATE-KEY exemption is load-bearing, not cosmetic: with a
    duplicated key value, step (2)'s strict inequality degrades to >=
    and a common element equal to the last collision key can hide at a
    position <= j* without being a collision — the exact subtlety that
    deferred this filter in round 7 ("common elements before the first
    collision can exist"). A within-doc duplicate requires a 60-bit
    md5 collision between two distinct elements of ONE document, so
    the exemption fires ~never; when it does, the pair is simply kept
    and exact verification decides. The m aggregate counts DISTINCT
    position pairs so double-oriented rows (the incremental variant
    probes delta-vs-all, which yields each delta-delta collision
    twice) never inflate... and an inflated m would only ever RAISE
    the bound, which keeps pairs — overcounting is recall-safe by
    construction. tau/(1+tau) is rational (n/(n+d) for tau = n/d), so
    the same round-before-ceil discipline keeps the threshold exact.
    """
    alpha = F.ceil(
        F.round(tau / (1.0 + tau) * (F.col("sz_a") + F.col("sz_b")), 9)
    )
    bound = F.col("m") + F.least(
        F.col("sz_a") - F.col("i_star"), F.col("sz_b") - F.col("j_star")
    )
    return F.col("dup_a") | F.col("dup_b") | (bound >= alpha)


def _allpairs_prefix_arrays(
    sets: DataFrame, id_col: str, set_col: str, tau: float,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, ks, sz, dup [, carry...]) prefix frame shared by the batch
    and incremental AllPairs candidate generators: df-ordered slim
    keys, per-doc sort, prefix slice of the |s| - ceil(tau*|s|) + 1
    rarest elements. ``dup`` flags a doc whose key array holds a
    duplicated key value (a 60-bit tiebreak collision between two of
    ITS OWN distinct elements) — the positional filter must exempt
    such pairs from pruning (see :func:`_positional_keep`). ``carry``
    columns (e.g. a new-batch flag) ride along untouched."""
    ex = cut(
        sets.select(
            F.col(id_col), *[F.col(c) for c in carry],
            F.explode(set_col).alias("x"),
        ),
        eager=False,
    )
    dfreq = ex.groupBy("x").agg(F.count(F.lit(1)).alias("df"))
    keyed = ex.join(dfreq, "x").select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.concat(
            F.lpad(F.col("df").cast("string"), 12, "0"),
            F.substring(
                F.md5(F.col("x").cast("string").cast("binary")), 1, 15
            ),
        ).alias("kx"),
    )
    return (
        keyed.groupBy(id_col, *carry)
        .agg(
            F.array_sort(F.collect_list("kx")).alias("arr"),
            F.count(F.lit(1)).alias("sz"),
        )
        .select(
            F.col(id_col),
            *[F.col(c) for c in carry],
            F.slice(
                "arr",
                F.lit(1),
                F.col("sz")
                - F.ceil(F.round(tau * F.col("sz"), 9)).cast("int")
                + F.lit(1),
            ).alias("ks"),
            "sz",
            (F.size("arr") != F.size(F.array_distinct("arr"))).alias("dup"),
        )
    )


def allpairs_prefix_candidates_delta(
    sets: DataFrame, id_col: str = "doc_id", set_col: str = "s",
    delta_col: str = "is_new", tau: float = 0.5, positional: bool = True,
) -> DataFrame:
    """INCREMENTAL AllPairs candidates: (id_a, id_b) pairs with
    Jaccard possibly >= ``tau`` where AT LEAST ONE side has
    ``delta_col`` true — the candidate set an incremental dedup run
    needs when a delta batch arrives on top of an already-deduped
    corpus (new-vs-all and new-vs-new; old-vs-old pairs were found by
    the previous run and are never re-generated).

    Completeness (same theorem as :func:`allpairs_prefix_candidates`):
    prefixes are computed over the FULL corpus (base + delta) under
    one global df-ascending order, so any qualifying pair collides
    inside both prefixes; probing only delta-side prefix entries
    against all entries therefore reaches every qualifying pair with a
    delta member. The probe side is the delta batch only, so join
    fan-in scales with |delta|, not |corpus| — the full-corpus side of
    the join is the same prefix frame a rebuild would shuffle, but the
    expensive pair expansion + verify work is delta-proportional.
    At 100 TB the df counts and prefix arrays of the base corpus are
    maintained incrementally (df is additive per element; a doc's
    prefix changes only when global df order shifts across its
    boundary — the standard practical relaxation is recomputing
    prefixes per run from the stored df table, which is one agg over
    the element stream); here both runs recompute from parquet, and
    the INVARIANT the oracle pins is the one that matters:
    base pairs ∪ delta-involving pairs == full-rebuild pairs."""
    pre = _allpairs_prefix_arrays(
        sets, id_col, set_col, tau, carry=(delta_col,)
    )
    return allpairs_delta_candidates_from_prefix(
        pre, id_col, delta_col, tau=tau, positional=positional
    )


def allpairs_delta_candidates_from_prefix(
    pre: DataFrame, id_col: str = "doc_id", delta_col: str = "is_new",
    tau: float = 0.5, positional: bool = True,
) -> DataFrame:
    """:func:`allpairs_prefix_candidates_delta` from a PREBUILT prefix
    frame carrying ``delta_col`` — the sharing seam of r16 (see
    :func:`allpairs_candidates_from_prefix`)."""
    kd = pre.where(F.col(delta_col)).select(
        F.col(id_col).alias("id_d"),
        F.col("sz").alias("sz_d"),
        F.col("dup").alias("dup_d"),
        F.posexplode("ks").alias("p0_d", "k"),
    )
    ko = pre.select(
        F.col(id_col).alias("id_o"),
        F.col("sz").alias("sz_o"),
        F.col("dup").alias("dup_o"),
        F.posexplode("ks").alias("p0_o", "k"),
    )
    joined = (
        kd.join(ko, "k")
        .where(
            (F.col("id_d") != F.col("id_o"))
            & (F.col("sz_o") >= F.ceil(F.round(tau * F.col("sz_d"), 9)))
            & (F.col("sz_d") >= F.ceil(F.round(tau * F.col("sz_o"), 9)))
        )
        .select(
            F.least("id_d", "id_o").alias("id_a"),
            F.greatest("id_d", "id_o").alias("id_b"),
            # orient the positional payload with the pair so (a, b)
            # rows from both probe directions aggregate consistently
            F.when(F.col("id_d") < F.col("id_o"), F.col("p0_d"))
             .otherwise(F.col("p0_o")).alias("p0_a"),
            F.when(F.col("id_d") < F.col("id_o"), F.col("p0_o"))
             .otherwise(F.col("p0_d")).alias("p0_b"),
            F.when(F.col("id_d") < F.col("id_o"), F.col("sz_d"))
             .otherwise(F.col("sz_o")).alias("sz_a"),
            F.when(F.col("id_d") < F.col("id_o"), F.col("sz_o"))
             .otherwise(F.col("sz_d")).alias("sz_b"),
            F.when(F.col("id_d") < F.col("id_o"), F.col("dup_d"))
             .otherwise(F.col("dup_o")).alias("dup_a"),
            F.when(F.col("id_d") < F.col("id_o"), F.col("dup_o"))
             .otherwise(F.col("dup_d")).alias("dup_b"),
        )
    )
    if not positional:
        return joined.select("id_a", "id_b").distinct()
    agg = joined.groupBy("id_a", "id_b").agg(
        # distinct position pairs: a delta-delta collision arrives once
        # per probe direction; both orientations carry the SAME
        # (p0_a, p0_b) after the reorientation above, so the distinct
        # count is the true m
        F.count_distinct(F.struct("p0_a", "p0_b")).alias("m"),
        (F.max("p0_a") + 1).alias("i_star"),
        (F.max("p0_b") + 1).alias("j_star"),
        F.first("sz_a").alias("sz_a"),
        F.first("sz_b").alias("sz_b"),
        F.max("dup_a").alias("dup_a"),
        F.max("dup_b").alias("dup_b"),
    )
    return agg.where(_positional_keep(tau)).select("id_a", "id_b")


def jaccard(tok_a: Column, tok_b: Column) -> Column:
    """Exact token-set Jaccard via array HOFs (distinct semantics)."""
    inter = F.size(F.array_intersect(tok_a, tok_b))
    union = F.size(F.array_union(tok_a, tok_b))
    return inter / F.greatest(union, F.lit(1))


def xxhash64_set(arr: Column) -> Column:
    """Distinct xxhash64 image of a string array — the slim element
    representation for the exact-Jaccard dedup pipelines (round 9).

    Jaccard is a function of |A ∩ B| and |A ∪ B| only, both invariant
    under any INJECTIVE element mapping, so computing candidates AND
    verification over 8-byte hashes instead of ~30-char shingle
    strings yields the identical pair set and identical jac values
    while cutting explode/shuffle/verify bytes ~4x — measured
    interleaved at the 10x scale point: doc_jaccard_prefix_filter's
    full pipeline 8.15s over strings vs 4.28s hashed (min-of-3, same
    2,560 pairs). Injectivity failure = an xxhash64 collision between
    two distinct shingles of the SAME candidate pair's union:
    ~|union|²/2⁶⁴ ≈ 1e-15 per pair — the same ~never argument the
    MinHash signature build has carried since round 3
    (minhash_signatures), and the DuckDB oracles still compute
    STRING Jaccard, so the driver's hash gate independently
    re-checks the equivalence every round."""
    return F.array_distinct(F.transform(arr, lambda x: F.xxhash64(x)))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(toks: Column, bits: int = 64) -> Column:
    """64-bit SimHash over token xxhash64s, pure expressions: per bit,
    majority vote of the token-hash bits. (Rows-only check — hash
    algorithms are engine-specific.)"""
    def bit_vote(i: int) -> Column:
        votes = F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1)) == 1, 1)
               .otherwise(-1),
        )
        return F.when(votes > 0, F.lit(1)).otherwise(F.lit(0))

    out = F.lit(0).cast("long")
    for i in range(bits - 1):  # top bit left clear: stay in signed range
        out = out + F.shiftleft(bit_vote(i).cast("long"), i)
    return out


def simhash_md5(toks: Column, bits: int = 32) -> Column:
    """SimHash with md5-derived bit votes — the engine-replicable twin
    of :func:`simhash64`. Bit ``i`` of a token's contribution is the
    top bit of hex digit ``i`` of ``md5(token)`` (digit >= '8'), so any
    engine with md5 replays the sketch bit-for-bit; DuckDB mirrors it
    with ``list_filter(hs, h -> substr(h, i+1, 1) >= '8')``. Same
    majority-vote semantics over the token multiset; md5 costs more
    than xxhash64, so prefer simhash64 when no cross-engine anchor is
    needed. bits <= 32 (one vote per md5 hex digit)."""
    assert bits <= 32
    hashes = F.transform(toks, lambda t: F.md5(t.cast("binary")))
    n = F.size(hashes)

    def bit(i: int) -> Column:
        ge8 = F.size(
            F.filter(hashes, lambda h: F.substring(h, i + 1, 1) >= "8")
        )
        return F.when(2 * ge8 - n > 0, F.lit(1)).otherwise(F.lit(0))

    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(bit(i).cast("long"), i)
    return out


def simhash_block_pairs(
    sig: DataFrame, id_col: str = "doc_id", sig_col: str = "simhash",
    bits: int = 32, max_hamming: int = 1,
) -> DataFrame:
    """Exact near-dup pairs (hamming <= ``max_hamming``) over SimHash
    signatures via Manku-style BLOCK bucketing (Manku, Jain & Das
    Sarma, WWW'07): split the ``bits``-wide signature into d+1 equal
    blocks; by pigeonhole any pair within hamming distance d agrees
    exactly on at least one block, so an equi-join on (band, block)
    has full recall, then bit_count(xor) verifies exactly.

    Scale posture: block keys span 2^(bits/(d+1)) values — for the
    32-bit / d=1 default, 2^16 keys, so occupancy is n/65536 and
    falls 256x below a byte-keyed banding. Candidates expand through
    a SHUFFLE JOIN, never a per-bucket collect_list array: pairs
    stream through SortMergeJoin tasks and AQE's skew-join split
    handles residual hot blocks. The block count is the knob that
    grows with log2(n) for wider signatures/thresholds.

    Returns distinct (id_a, id_b, hamming:long) with id_a < id_b."""
    nblocks = max_hamming + 1
    if bits % nblocks != 0:
        raise ValueError(f"bits={bits} not divisible by d+1={nblocks}")
    width = bits // nblocks
    base = 1 << width
    divisors = "array(" + ", ".join(
        f"{1 << (width * i)}L" for i in range(nblocks)
    ) + ")"
    b = sig.select(
        F.col(id_col),
        F.col(sig_col).alias("_sig"),
        F.explode(F.array(*[F.lit(i) for i in range(nblocks)])).alias("band"),
    ).withColumn(
        "block",
        F.expr(f"(_sig div element_at({divisors}, band + 1)) % {base}"),
    )
    # both self-join sides reference b, and Spark re-evaluates shared
    # subplans — without the cut the caller's SIGNATURE pipeline (md5
    # per token for the oracle-replayable variant) runs twice. The
    # cached relation is d+1 rows of 4 longs per doc.
    b = cut(b, eager=False)
    a = b.select(
        F.col(id_col).alias("id_a"), F.col("_sig").alias("sig_a"),
        "band", "block",
    )
    c = b.select(
        F.col(id_col).alias("id_b"), F.col("_sig").alias("sig_b"),
        "band", "block",
    )
    return (
        a.join(c, ["band", "block"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
            .cast("long")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Fingerprints
# ---------------------------------------------------------------------------


def rolling_min_fingerprint(col: Column | str, window: int = 16, stride: int = 4) -> Column:
    """Winnowing-lite document fingerprint: lexicographic min of md5 over
    sliding character windows. md5 (not xxhash64) so external engines
    can replicate it bit-for-bit."""
    c = F.col(col) if isinstance(col, str) else col
    # floor division, NOT a plain int cast: Spark's cast truncates the
    # double quotient while DuckDB's rounds — for lengths where
    # (len - window) % stride >= stride/2 the window counts diverged
    # (caught by the sf0.1 oracle sweep).
    n_win = F.greatest(
        F.floor((F.length(c) - window) / stride).cast("int") + 1, F.lit(1)
    )
    idx = F.sequence(F.lit(0), n_win - 1)
    return F.array_min(
        F.transform(idx, lambda i: F.md5(c.substr(i * stride + 1, F.lit(window))))
    )


# ---------------------------------------------------------------------------
# Exact duplicate-span detection (substring-level dedup)
# ---------------------------------------------------------------------------


def duplicate_kgram_spans(
    docs: DataFrame, k: int = 8, min_span: int = 10
) -> DataFrame:
    """Maximal cross-document duplicate token spans — the exact
    substring-dedup shape of Lee et al., "Deduplicating Training Data
    Makes Language Models Better" (ACL 2022), re-expressed as a k-gram
    join instead of a suffix array.

    Returns ``(id_a, id_b, start_a, start_b, span_len)`` with
    ``id_a < id_b``: one row per MAXIMAL run of ≥ ``min_span`` tokens
    shared verbatim (positions 1-based; a span may repeat at several
    offsets — each alignment is its own row).

    Shape: tokenize → positional k-gram shingles → self-join keyed on
    the k-gram (n-gram-keyed like decontamination — never doc×doc) →
    gaps-and-islands along each alignment diagonal ``ia − ib``
    (``grp = ia − row_number()`` groups consecutive matches) → one
    tiny groupBy per island.  Why runs of consecutive k-gram matches
    ARE the maximal shared spans: if grams at diagonal positions i and
    i+2 both match, every token in [i+1, i+k] matches (covered by the
    two matched windows at the same offset), so gram i+1 must match
    too — islands can never be separated by a gap of one, and each
    island's token union is exactly one maximal shared span of length
    run + k − 1.

    The join key is the PAIR ``(xxhash64(gram), xxhash64(1, gram))``
    — two 64-bit images whose independence comes from hashing the
    gram under DIFFERENT SEEDS. Spark folds multi-column xxhash64
    left-to-right with the running hash as the next column's seed, so
    the discriminator must come FIRST: ``xxhash64(1, g)`` hashes g
    under seed XXH64(1, 42), while the r10 form ``xxhash64(g, 1)``
    hashed the constant 1 under seed xxhash64(g) — a post-hoc mix of
    h whose collisions were exactly h's collisions (the r10 advisor's
    finding, verified numerically). With the seed-varied pair the
    shuffle carries 16 bytes, not k-token strings, and a false
    duplicate span needs a simultaneous collision in two independent
    64-bit functions: ~n²/2¹²⁸, negligible at any corpus size. A
    single 64-bit key was the r9 advisor's finding —
    unlike the hashed exact-Jaccard pipelines there is no downstream
    exact-verify stage here, so production output would carry an
    ~n²/2⁶⁴ false-positive rate directly (the DuckDB oracle joins on
    the gram STRINGS and would catch it, but only in harness runs).
    At 100 TB the one scale knob this
    deliberately omits is a document-frequency cap on hot k-grams (a
    boilerplate gram in m docs yields m² pair rows); production runs
    cap df like the decontamination query and LSH hot-bucket cap —
    here exactness is the point and the oracle must agree.
    """
    t = docs.select("doc_id", tokens("text").alias("toks")).where(
        F.size("toks") >= k
    )
    sh = t.select(
        "doc_id", F.posexplode(word_shingles(F.col("toks"), k)).alias("p", "g")
    )
    e = sh.select(
        "doc_id",
        (F.col("p") + 1).cast("long").alias("i"),
        F.xxhash64("g").alias("h"),
        F.xxhash64(F.lit(1), "g").alias("h2"),
    )
    a, b = e.alias("a"), e.alias("b")
    m = a.join(
        b,
        (F.col("a.h") == F.col("b.h"))
        & (F.col("a.h2") == F.col("b.h2"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.col("a.i").alias("ia"),
        F.col("b.i").alias("ib"),
    )
    diag = (F.col("ia") - F.col("ib")).alias("diag")
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("ia")
    isl = m.select("id_a", "id_b", "ia", "ib", diag).withColumn(
        "grp", F.col("ia") - F.row_number().over(w)
    )
    return (
        isl.groupBy("id_a", "id_b", "diag", "grp")
        .agg(
            F.min("ia").alias("start_a"),
            F.min("ib").alias("start_b"),
            (F.count(F.lit(1)) + F.lit(k - 1)).alias("span_len"),
        )
        .where(F.col("span_len") >= min_span)
        .select("id_a", "id_b", "start_a", "start_b", "span_len")
    )

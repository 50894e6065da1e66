"""Property-based tests (hypothesis): operators vs independent in-Python
models of the reference semantics — a second opinion besides the DuckDB
oracle, over adversarial generated inputs rather than fixed testdata.

Kept to few, small examples per property: each example pays a Spark job.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

# --- generated event streams ------------------------------------------------

_EVENT = st.tuples(
    st.integers(min_value=0, max_value=3),  # user
    st.integers(min_value=0, max_value=2000),  # ts offset seconds
    st.booleans(),  # is_entry
)
_STREAMS = st.lists(_EVENT, min_size=1, max_size=40)

_BASE = datetime.datetime(2024, 1, 1)


def _mk_events(spark, raw):
    rows = [
        (i, _BASE + datetime.timedelta(seconds=off), user, "view" if entry else "click")
        for i, (user, off, entry) in enumerate(raw)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _cep_bounce_model(raw, timeout=600):
    """Direct simulation of UserJumpDetailApp.java:70-120: per user in event
    order, an entry is a bounce iff followed by another entry, or by nothing
    within `timeout` seconds (including end-of-stream)."""
    per_user: dict = {}
    for i, (user, off, entry) in enumerate(raw):
        per_user.setdefault(user, []).append((off, i, entry))
    bounces = set()
    for user, evs in per_user.items():
        evs.sort()
        for j, (off, i, entry) in enumerate(evs):
            if not entry:
                continue
            if j + 1 >= len(evs):
                bounces.add((i, "timeout"))
                continue
            noff, _, nentry = evs[j + 1]
            if noff - off > timeout:
                bounces.add((i, "timeout"))
            elif nentry:
                bounces.add((i, "match"))
    return bounces


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(raw=_STREAMS)
def test_detect_bounce_matches_cep_model(spark, raw):
    from gmall_spark.operators.stateful import detect_bounce

    df = _mk_events(spark, raw)
    got = {
        (r["event_id"], r["bounce_reason"])
        for r in detect_bounce(
            df, "user_id", "ts", "event_id", F.col("event_type") == "view", "600 seconds"
        ).collect()
    }
    assert got == _cep_bounce_model(raw)


def _jaccard_model(texts, k=3, pct=50):
    def sh(t):
        toks = t.strip().split(" ")
        if len(toks) < k:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    out = set()
    sets = {i: sh(t) for i, t in enumerate(texts)}
    for a in sets:
        for b in sets:
            if a < b and sets[a] & sets[b]:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if inter * 100 >= union * pct:
                    out.add((a, b, inter, union))
    return out


_WORDS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]), min_size=1, max_size=12
)
_DOCS = st.lists(_WORDS.map(" ".join), min_size=2, max_size=8)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_DOCS)
def test_ngram_jaccard_matches_set_model(spark, texts):
    from gmall_spark.extras.dedup import ngram_jaccard

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"], r["inter_ct"], r["union_ct"])
        for r in ngram_jaccard(df, "doc_id", "text", k=3, threshold_pct=50).collect()
    }
    assert got == _jaccard_model(texts)


def _uf_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference model: union-find, canonical label = min node id."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_nodes)}


_EDGES = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
    min_size=0,
    max_size=12,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=_EDGES)
def test_connected_components_matches_union_find(spark, edges):
    from gmall_spark.extras.dedup import connected_components

    n = 10
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        edf = edf.filter("src <> dst")  # typed-empty edge list
    got = {
        (r["node"], r["cluster_id"])
        for r in connected_components(nodes, edf, "id", "src", "dst").collect()
    }
    assert got == set(_uf_components(n, edges).items())


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=_EDGES)
def test_connected_components_star_matches_union_find(spark, edges):
    from gmall_spark.extras.dedup import connected_components_star

    n = 10
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        edf = edf.filter("src <> dst")
    got = {
        (r["node"], r["cluster_id"])
        for r in connected_components_star(nodes, edf, "id", "src", "dst").collect()
    }
    assert got == set(_uf_components(n, edges).items())


def test_connected_components_star_long_chain(spark):
    """A path graph of depth 256 — far beyond min-label's default
    max_iter=20 horizon — must fully converge: star contraction halves
    tree heights every alternation (O(log n) rounds), which is exactly
    why it exists next to label propagation."""
    from gmall_spark.extras.dedup import connected_components_star

    n = 257  # path 0-1-...-256, diameter 256 >> 20
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = {
        (r["node"], r["cluster_id"])
        for r in connected_components_star(
            nodes, edges, "id", "src", "dst", max_iter=12
        ).collect()
    }
    assert got == {(i, 0) for i in range(n)}


# --- as-of join vs a direct scan model --------------------------------------

_ASOF_LEFT = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
)
_ASOF_RIGHT = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=25
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(raw_l=_ASOF_LEFT, raw_r=_ASOF_RIGHT)
def test_asof_join_matches_scan_model(spark, raw_l, raw_r):
    """asof_join vs the obvious per-row scan: for each left row, the right
    row with the max rt <= lt on the same key (rows deduped per (k, ts) so
    the match is well-defined)."""
    from gmall_spark.operators.joins import asof_join

    lefts = sorted(set(raw_l))
    rights = sorted(set(raw_r))
    left = spark.createDataFrame(
        [(k, t, f"L{k}:{t}") for k, t in lefts], "k long, lt long, lv string"
    )
    right = spark.createDataFrame(
        [(k, t, f"R{k}:{t}") for k, t in rights], "k long, rt long, rv string"
    ).filter("rt >= 0")

    expect = {}
    for k, lt in lefts:
        cand = [(rt, rv) for (rk, rt), rv in
                (((rk, rt), f"R{rk}:{rt}") for rk, rt in rights)
                if rk == k and rt <= lt]
        expect[(k, lt)] = max(cand)[1] if cand else None

    got = {
        (r["k"], r["lt"]): r["rv"]
        for r in asof_join(left, right, "k", "lt", "rt").collect()
    }
    assert got == expect


# --- range join vs direct predicate ------------------------------------------

_BANDS = st.lists(
    st.tuples(st.integers(0, 40), st.integers(1, 30)), min_size=1, max_size=6
)
_VALUES = st.lists(
    st.floats(min_value=-5, max_value=80, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(raw_bands=_BANDS, values=_VALUES)
def test_range_join_matches_predicate_join(spark, raw_bands, values):
    """Grid-bucketed range join == the direct lo<=v<hi theta join, for
    arbitrary (overlapping, adjacent, disjoint) bands and boundary-hugging
    values — including values outside every band and bands of width 1."""
    from gmall_spark.operators.joins import range_join

    bands = [(f"b{i}", lo, lo + w) for i, (lo, w) in enumerate(raw_bands)]
    bdf = spark.createDataFrame(bands, "band string, lo int, hi int")
    fdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "id int, v double"
    )
    got = sorted(
        (r["id"], r["band"])
        for r in range_join(fdf, bdf, "v", "lo", "hi", grid=7.0).collect()
    )
    want = sorted(
        (i, b)
        for i, v in enumerate(values)
        for b, lo, hi in bands
        if lo <= v < hi
    )
    assert got == want


_TRI_EDGES = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
    max_size=25,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=_TRI_EDGES)
def test_triangle_counts_matches_naive_enumeration(spark, edges):
    """Degree-ordered wedge enumeration vs brute-force triple check — the
    orientation trick must count every triangle exactly once regardless of
    degree ties, hubs, or duplicate input edges."""
    from itertools import combinations

    from gmall_spark.extras.graph import triangle_counts

    es = {(min(a, b), max(a, b)) for a, b in edges}
    nodes = sorted({n for e in es for n in e})
    expect: dict[int, int] = {}
    for x, y, z in combinations(nodes, 3):
        if {(x, y), (x, z), (y, z)} <= es:
            for n in (x, y, z):
                expect[n] = expect.get(n, 0) + 1
    edf = spark.createDataFrame(sorted(es) or [(0, 0)], "a long, b long")
    if not es:
        edf = edf.filter("a <> b")  # typed-empty edge list
    got = {(r["node"], r["tri_ct"]) for r in triangle_counts(edf, "a", "b").collect()}
    assert got == set(expect.items())


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vecs=st.lists(
        st.tuples(
            st.integers(0, 1),  # label
            st.lists(st.integers(-3, 3), min_size=4, max_size=4),
        ),
        min_size=2,
        max_size=12,
    ).filter(lambda vs: all(any(x != 0 for x in v) for _, v in vs))
)
def test_hard_negative_knn_matches_pairwise_model(spark, vecs):
    """Kernel (label mask to -inf, slab select) vs an independent pairwise
    selection model — including anchors with no other-label candidates (emit
    nothing) and fewer negatives than k (emit what exists).

    The model ranks by EXACT rational cosine keys (sign(dot)·dot²/(nᵢ·nⱼ)
    over the original integer vectors — monotone with cosine, no floats),
    and `assume`s away examples where two candidates of one anchor tie
    mathematically: distinct rational cosines of these small integer vectors
    differ by ≥ ~1e-8, far above any fp pipeline's noise, so the kernel's
    float ranking must agree — while exact ties (e.g. two orthogonal
    candidates) land an ulp apart in ANY fixed fp order and are out of
    scope by the registry's own construction (real embeddings tie only on
    identical vectors, where normalized rows are bitwise equal)."""
    from fractions import Fraction

    from gmall_spark.extras.similarity import hard_negative_knn

    rows = [(i, lbl, [float(x) for x in v]) for i, (lbl, v) in enumerate(vecs)]
    ivecs = [v for _, v in vecs]
    norms = [sum(x * x for x in v) for v in ivecs]

    def cos_key(i: int, j: int) -> Fraction:
        d = sum(a * b for a, b in zip(ivecs[i], ivecs[j]))
        return Fraction((1 if d >= 0 else -1) * d * d, norms[i] * norms[j])

    expect = set()
    for i, (la, _) in enumerate(vecs):
        cands = [(-cos_key(i, j), j) for j, (lb, _) in enumerate(vecs) if lb != la]
        # no tie anywhere among this anchor's candidates, so the top-2 cut
        # and the ranks are both uniquely determined
        assume(len({k for k, _ in cands}) == len(cands))
        for rnk, (_, j) in enumerate(sorted(cands)[:2], start=1):
            expect.add((i, j, rnk))

    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    got = {
        (r["vec_id"], r["neighbor_id"], r["rnk"])
        for r in hard_negative_knn(df, "vec_id", "embedding", "label", k=2).collect()
    }
    assert got == expect

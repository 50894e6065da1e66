"""Deduplication operators for training-data pipelines.

All four strategies are pure DataFrame compositions — no UDFs — so they run
inside whole-stage codegen and scale by shuffle width:

- exact:        one shuffle on the content hash.
- ngram_jaccard: inverted-index candidate generation (shuffle on shingle) +
                exact verify. Pair space bounded by shingle co-occurrence;
                at 100 TB, cap hot shingles (stopword-shingle skew) by
                filtering shingles whose doc-frequency exceeds a bound —
                they only generate candidate pairs that other, rarer
                shingles also generate.
- minhash_lsh:  fixed-size signatures (n_hashes rows per doc) + banded
                bucket join — the linear-ish scale path for fuzzy dedup.
- simhash:      fixed 60-bit signature, candidates from signature bands
                (hamming<=3 ⇒ at least one of 4 15-bit bands equal,
                pigeonhole — exact, and each band has 2^15 bucket values so
                the band self-join never degenerates toward n²).

Hashes are md5-based (engine-portable: the DuckDB oracle computes identical
values). A string-min of md5(seed|shingle) is a valid minhash: md5 is a
uniform permutation of shingle space, so the min over a doc's shingle set is
the same order statistic a numeric minhash uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str):
    return F.split(F.trim(F.col(text_col)), " ")


def _shingles(toks, k: int):
    """k-token shingles; for size<k yields clamped prefixes exactly like the
    oracle's list-slice (both engines clamp slices to the array end)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )


def _spread(df: DataFrame) -> DataFrame:
    """See session.spread_to_parallelism — the explode below amplifies each
    doc ~token-count×, so it must not inherit an under-split scan."""
    from gmall_spark.session import spread_to_parallelism

    return spread_to_parallelism(df)


def shingle_set(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, shingle) distinct — the inverted-index input.

    Dedup happens per-row with array_distinct BEFORE the explode, not with
    .distinct() after it: ids are unique in every caller's frame (documents
    PK or a filtered projection of it), so the two are equivalent — but the
    post-explode distinct is a full shuffle of the exploded set (~85M
    (id, string-shingle) rows at sf10, multi-GB of network), while
    array_distinct is a per-row codegen pass that never leaves the scan
    stage. (At sf10 the set is ~26M rows / 5.3M distinct shingles.)
    Measured on dedup_clusters_star at sf10: edge generation 83.9s → 63.3s,
    entry total 87.4s → 66.9s (profile in BENCH_r06_clusters_profile.json).
    Callers feeding frames with REPEATED ids would need the old global
    distinct back — none exists today."""
    return _spread(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(_shingles(_tokens(text_col), k))).alias("shingle"),
    )


def exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup by content hash: groupBy(md5(text)) keeping min id.
    Output: content_hash, keep_id, dup_ct."""
    return df.groupBy(F.md5(F.col(text_col)).alias("content_hash")).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_ct")
    )


def _verify_pairs(
    cand: DataFrame, sh: DataFrame, id_col: str, threshold_pct: int
) -> DataFrame:
    """Exact Jaccard verify over a (doc_a, doc_b) candidate set: join each
    side's COLLECTED shingle array (one bounded-width row per doc) and
    intersect per pair — the re-explode formulation shuffles
    |candidates|·|shingles| rows through a join + groupBy to compute the
    same counts. Arrays are per-doc bounded (shingles ≈ tokens), so row
    width is bounded too; at scale both joins key on doc ids with AQE
    picking broadcast when the set table is small."""
    # Intersect INT64-encoded sets, not string sets: array_intersect on two
    # ~n-string arrays hashes every string per pair — at sf10 that is ~5e9
    # string hashes for 4.6M candidates and dominates the whole PPJoin
    # (45s of 83s). xxhash64 encoding makes each intersection integer-cheap.
    # Exactness is NOT assumed: one aggregate proves the encoding is
    # injective ON THIS CORPUS (distinct shingles == distinct hashes); on a
    # collision (P ≈ |shingles|²/2⁶⁵) it falls back to the string path, so
    # the result is provably identical to string intersection either way.
    enc = sh.withColumn("_sid", F.xxhash64("shingle"))
    chk = enc.agg(
        F.countDistinct("shingle").alias("s"), F.countDistinct("_sid").alias("h")
    ).first()
    key = "_sid" if chk["s"] == chk["h"] else "shingle"
    sets = enc.groupBy(id_col).agg(
        F.collect_list(key).alias("_set"), F.count(F.lit(1)).alias("n")
    )
    sa = sets.select(
        F.col(id_col).alias("doc_a"), F.col("_set").alias("_sa"), F.col("n").alias("na")
    )
    sb = sets.select(
        F.col(id_col).alias("doc_b"), F.col("_set").alias("_sb"), F.col("n").alias("nb")
    )
    inter = F.size(F.array_intersect("_sa", "_sb"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("inter_ct", inter.cast("long"))
        .withColumn("union_ct", (F.col("na") + F.col("nb") - F.col("inter_ct")).cast("long"))
        .filter(F.col("inter_ct") * 100 >= F.col("union_ct") * threshold_pct)
        .select("doc_a", "doc_b", "inter_ct", "union_ct")
    )


def ngram_jaccard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold_pct: int = 50,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by exact Jaccard over k-token shingle sets, candidates
    from shared shingles. Integer-only threshold: inter*100 >= union*pct.
    Output: doc_a, doc_b, inter_ct, union_ct.

    max_shingle_df caps candidate generation at shingles whose document
    frequency is <= the bound — the skew escape hatch for boilerplate
    shingles that would otherwise each contribute ~df² candidate pairs.
    With the cap the result is APPROXIMATE (a qualifying pair is missed only
    if ALL its shared shingles are hotter than the bound — for near-dups at
    meaningful thresholds, shared rare shingles exist in practice, but it is
    not a guarantee); ngram_jaccard_prefix is the cap that stays provably
    exact, and stays the recommended scale path. Verification always uses
    the full shingle sets, so reported inter/union counts are exact for
    every emitted pair."""
    # Reused 3× (both self-join sides + cardinalities): persist instead of
    # recomputing the explode+distinct subtree per reference. At cluster scale
    # this is a checkpoint/exchange-reuse decision, same reasoning.
    sh = shingle_set(df, id_col, text_col, k).persist()
    card = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    if max_shingle_df is not None:
        # candidates from cold shingles only; intersection counts are then
        # recomputed over the FULL shingle sets (capping affects which pairs
        # become candidates, never their scores)
        cold = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("shingle")
        )
        cand_sh = sh.join(cold, "shingle")
        a, b = cand_sh.alias("a"), cand_sh.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
            )
            .distinct()
        )
        return _verify_pairs(cand, sh, id_col, threshold_pct)
    else:
        a, b = sh.alias("a"), sh.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .groupBy(
                F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
            )
            .agg(F.count(F.lit(1)).alias("inter_ct"))
        )
    ca = card.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na"))
    cb = card.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb"))
    return (
        pairs.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn("union_ct", F.col("na") + F.col("nb") - F.col("inter_ct"))
        .filter(F.col("inter_ct") * 100 >= F.col("union_ct") * threshold_pct)
        .select("doc_a", "doc_b", "inter_ct", "union_ct")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int, n_hashes: int
) -> DataFrame:
    """(id, seed, mh): per-seed minhash over the shingle set.

    Hash family: the i-th hash of a shingle is an 8-hex-char slice of
    md5(shingle) / md5('x'|shingle) — one md5 yields four independent 32-bit
    hashes, so n_hashes=8 costs 2 md5 evaluations per shingle instead of 8,
    and ALL per-seed minima reduce in a single groupBy pass over the
    (doc, shingle) set (no ×n_hashes row explosion — at 100 TB that factor
    is the difference between one shuffle of the shingle set and eight).
    Seeds are 's0'..'s{n-1}'; min over 32-bit slices is a valid minhash
    (uniform order statistic, ~300-shingle docs vs 2^32 space ⇒ tie-free).
    """
    assert n_hashes <= 8, "extend the md5-slice family for more hashes"
    sh = shingle_set(df, id_col, text_col, k)
    h1 = F.md5("shingle")
    h2 = F.md5(F.concat(F.lit("x"), F.col("shingle")))
    slices = [
        (h1 if i < 4 else h2).substr(1 + 8 * (i % 4), 8) for i in range(n_hashes)
    ]
    agg = sh.groupBy(id_col).agg(
        *[F.min(slices[i]).alias(f"m{i}") for i in range(n_hashes)]
    )
    stacked = ", ".join(f"'s{i}', m{i}" for i in range(n_hashes))
    return agg.selectExpr(
        id_col, f"stack({n_hashes}, {stacked}) AS (seed, mh)"
    )


def minhash_lsh(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    n_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """MinHash + LSH banding: docs sharing any full band of minhashes become
    candidate pairs; output the per-pair count of matching minhashes
    (match_ct/n_hashes estimates Jaccard). Output: doc_a, doc_b, match_ct."""
    # Reused 3× (banding + both verify sides): persist the fixed-size
    # signature table (n_hashes rows per doc — tiny relative to input).
    sig = minhash_signatures(df, id_col, text_col, k, n_hashes).persist()
    # band id from the seed ordinal; band key = ordered concat of the band's
    # minhashes (sort_array on struct(seed, mh) gives deterministic seed order).
    banded = (
        sig.withColumn("band", (F.substring("seed", 2, 2).cast("int") / band_size).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.concat_ws(
                "|",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("seed", "mh"))), lambda s: s["mh"]
                ),
            ).alias("band_key")
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )
    sa = sig.select(F.col(id_col).alias("doc_a"), F.col("seed").alias("seed"), F.col("mh").alias("mh_a"))
    sb = sig.select(F.col(id_col).alias("doc_b"), F.col("seed").alias("seed"), F.col("mh").alias("mh_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "seed"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.when(F.col("mh_a") == F.col("mh_b"), 1).otherwise(0))
            .cast("long")
            .alias("match_ct")
        )
    )


_HEX_HIGH = ("8", "9", "a", "b", "c", "d", "e", "f")


def simhash_signatures(df: DataFrame, id_col: str, text_col: str, n_bits: int) -> DataFrame:
    """(id, sig): integer simhash. Bit i of a doc = sign of the token-weighted
    sum of ±1 where +1 iff hex digit i of md5(token) (digits 32+ come from
    md5('x'|token)) >= 8; sig = Σ bit_i·2^i. Integer signatures keep the
    verify step at one xor+popcount per pair (a bit-string representation
    costs n_bits substring compares). n_bits is capped at 60: bit 63 of a
    signed BIGINT isn't portable (DuckDB raises on 1<<63), and 60 bits in
    15-bit bands gives the same pigeonhole guarantees."""
    assert n_bits <= 60, "signed-64 top bits aren't engine-portable; use <= 60"
    toks = (
        df.select(F.col(id_col), F.explode(_tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("w"))
        # materialize the two hex strings ONCE per (doc, token) row — aggregate
        # expressions don't share subexpressions, so slicing md5(token) inside
        # each of the n_bits sums would recompute the digest n_bits times
        .select(
            id_col,
            "w",
            F.md5("token").alias("h1"),
            F.md5(F.concat(F.lit("x"), F.col("token"))).alias("h2"),
        )
    )
    # all n_bits weighted sums in ONE aggregation pass over (doc, token, w) —
    # the ×n_bits row explosion would multiply the shuffle for no reason
    contribs = [
        F.sum(
            F.when(
                F.col("h1" if i < 32 else "h2").substr((i % 32) + 1, 1).isin(*_HEX_HIGH),
                F.col("w"),
            ).otherwise(-F.col("w"))
        ).alias(f"s{i}")
        for i in range(n_bits)
    ]
    agg = toks.groupBy(id_col).agg(*contribs)
    sig = None
    for i in range(n_bits):
        bit = F.when(F.col(f"s{i}") > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig + bit
    return agg.select(F.col(id_col), sig.alias("sig"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_bits: int = 60,
    max_hamming: int = 3,
    band_bits: int = 15,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Candidates come from banding (pigeonhole: <=3 differing bits across 4
    bands of 15 ⇒ at least one band identical), so this is EXACT — no recall
    loss — while pruning the n² pair space to same-bucket pairs; verification
    is one bit_count(xor) per candidate. This is the shape that survives
    100 TB: candidate generation is an equi-join on (band, band_value), and
    15-bit bands give 32768 bucket values each — the r1 4-bit bands had 16,
    which made each band's self-join ~n²/16 (quadratic in disguise).
    Output: doc_a, doc_b, hamming.
    """
    assert n_bits % band_bits == 0 and max_hamming < n_bits // band_bits
    sig = simhash_signatures(df, id_col, text_col, n_bits)
    mask = (1 << band_bits) - 1
    bands = sig.select(
        F.col(id_col),
        "sig",
        F.explode(F.sequence(F.lit(0), F.lit(n_bits // band_bits - 1))).alias("band"),
    ).withColumn("bv", F.expr(f"shiftright(sig, band * {band_bits}) & {mask}"))
    a = bands.select(F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a"), "band", "bv")
    b = bands.select(F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b"), "band", "bv")
    # first-matching-band rule: a pair is emitted only from the LOWEST band
    # where its values agree — exactly-once semantics without a multi-million
    # row distinct (both sigs are in hand post-join, so "no earlier band
    # matches" is a cheap bitmask check, not another shuffle)
    no_earlier_match = F.expr(
        f"""CASE WHEN band = 0 THEN true ELSE NOT EXISTS(
              sequence(0, band - 1),
              j -> (shiftright(sig_a, j * {band_bits}) & {mask})
                   = (shiftright(sig_b, j * {band_bits}) & {mask})
            ) END"""
    )
    cand = (
        a.join(b, ["band", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(no_earlier_match)
        .select("doc_a", "doc_b", "sig_a", "sig_b")
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("long")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def ngram_jaccard_prefix(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, threshold_pct: int = 50
) -> DataFrame:
    """ngram_jaccard with PREFIX FILTERING (the PPJoin family): for
    Jaccard >= t, two sets must share at least one element among each set's
    first (n - ceil(t·n) + 1) elements under a global ordering — so only that
    prefix is indexed for candidate generation. Ordering by ascending global
    document-frequency puts the RAREST shingles in the prefix, which is what
    collapses the candidate count: frequent shingles (the quadratic-blowup
    keys of the naive inverted index) mostly sit outside prefixes.

    EXACT — provably no false negatives at the threshold; equivalence with
    ngram_jaccard is asserted in tests. Output: doc_a, doc_b, inter_ct,
    union_ct (same contract).

    Candidate pruning beyond the prefix filter (both provably lossless):

    - length filter: Jaccard >= t forces min(na,nb)*100 >= max(na,nb)*pct.
    - positional filter (PPJoin proper): prefix positions are ranked under
      ONE global (df, shingle) order, so the common subsequence appears in
      the same relative order in both docs. Hence every common shingle NOT
      matched inside both prefixes must sit strictly after the LAST prefix
      match in BOTH docs (were it earlier in the global order than that
      match, it would be inside both prefixes and matched itself), giving
      overlap <= mc + min(na - max(pos_a), nb - max(pos_b)). Candidates
      whose bound can't reach alpha = ceil(pct*(na+nb)/(100+pct)) — the
      overlap a Jaccard-t pair needs — are dropped before the verify join.
      At uniform document lengths this is the filter that bites: a random
      1-shared-shingle collision needs mc + tail >= alpha and fails it.
    """
    from pyspark.sql import Window

    sh = shingle_set(df, id_col, text_col, k).persist()
    card = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        sh.join(freq, "shingle")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.col("df").asc(), F.col("shingle").asc())
            ),
        )
        .join(card, id_col)
        # prefix length for Jaccard t: n - ceil(t*n) + 1
        .filter(F.col("pos") <= F.col("n") - F.ceil(F.col("n") * threshold_pct / 100) + 1)
        .select(id_col, "shingle", "pos", "n")
    )
    a = ranked.alias("a")
    b = ranked.alias("b")
    na, nb = F.first(F.col(f"a.n")).alias("na"), F.first(F.col(f"b.n")).alias("nb")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            # length filter, applied inside the join to shrink the shuffle
            & (F.least(F.col("a.n"), F.col("b.n")) * 100
               >= F.greatest(F.col("a.n"), F.col("b.n")) * threshold_pct),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(
            F.count(F.lit(1)).alias("mc"),
            F.max("a.pos").alias("pa"),
            F.max("b.pos").alias("pb"),
            na,
            nb,
        )
        # positional filter: overlap upper bound vs required overlap alpha,
        # integer-exact ceil (double division could over-ceil and lose a pair)
        .filter(
            F.expr(
                f"mc + least(na - pa, nb - pb) >= "
                f"((na + nb) * {threshold_pct} + {100 + threshold_pct - 1}) "
                f"div {100 + threshold_pct}"
            )
        )
        .select("doc_a", "doc_b")
    )
    return _verify_pairs(cand, sh, id_col, threshold_pct)


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str,
    src: str,
    dst: str,
    max_iter: int = 20,
) -> DataFrame:
    """Connected components by iterative min-label propagation: every node's
    label converges to the minimum node id reachable in its component — the
    transitive closure fuzzy dedup actually needs (pair resolution alone
    drops b of (a,b) but misses a~b~c chains). Output: (node, cluster_id).

    Deterministic: labels only ever decrease toward the component minimum.
    Each iteration is one join + one min-groupBy on the (bounded) edge list —
    no driver-side graph. Convergence needs O(component diameter) rounds;
    near-dup clusters are shallow (stars/cliques, diameter ≤ ~3), so the
    driver-checked fixpoint exits in a handful of rounds. For adversarial
    long-chain graphs use ``connected_components_star`` below — same
    per-round shuffle shape, O(log n) rounds on any topology.
    """
    from gmall_spark.session import iter_checkpoint

    # checkpointed (lineage-truncated), not merely persisted: every round
    # re-references the edge list (without materialization the possibly
    # expensive upstream pair-generation DAG re-executes per iteration),
    # and per-round persist alone leaves the LABEL plan round-N-deep —
    # Catalyst re-analyzes the nested tree on every fixpoint action (see
    # session.iter_checkpoint; same fix as kcore/star-CC).
    sym = iter_checkpoint(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    )
    labels = nodes.select(F.col(node_col).alias("node")).withColumn(
        "label", F.col("node")
    )
    prev_sum = None
    for _ in range(max_iter):
        nbr = (
            sym.join(
                labels.select(F.col("node").alias("b"), F.col("label").alias("bl")), "b"
            )
            .groupBy("a")
            .agg(F.min("bl").alias("nmin"))
        )
        labels = iter_checkpoint(
            labels.join(nbr, labels["node"] == nbr["a"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"),
            )
        )
        # fixpoint via the monotone invariant: a label only ever decreases
        # (least of itself and the neighborhood min), so the label SUM is
        # strictly decreasing until convergence — one scalar agg per round
        # instead of a new-vs-old join
        label_sum = labels.agg(F.sum("label")).collect()[0][0] or 0
        if label_sum == prev_sum:
            break
        prev_sum = label_sum
    return labels.select("node", F.col("label").alias("cluster_id"))


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str,
    src: str,
    dst: str,
    max_iter: int = 50,
) -> DataFrame:
    """Connected components by alternating large-star / small-star pointer
    jumping (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — the scale path min-label propagation's docstring points at:
    label propagation needs O(component diameter) rounds, which is fine for
    shallow near-dup clusters but pathological for long chains
    (boilerplate-bridge corpora); star contraction halves tree heights every
    alternation, converging in O(log n) rounds on ANY topology.

    large-star(u): every neighbor v > u re-points to m = min(N(u) ∪ {u}).
    small-star(u): on min-canonicalized edges, every neighbor (all ≤ u)
    plus u re-points to m. Both are one groupBy-min + one join — the same
    per-round shuffle shape as label propagation, just fewer rounds. At the
    fixpoint the edge set is a star forest: every node points at its
    component's minimum id.

    Output: (node, cluster_id) — identical contract (and oracle) as
    ``connected_components``; isolated nodes label themselves.
    """
    # localCheckpoint (not persist): each round's plan builds on the last,
    # so without lineage TRUNCATION the logical plan grows linearly and
    # Catalyst re-analysis goes quadratic — the classic iterative-algorithm
    # trap (pagerank's docstring makes the same point). Eager checkpoint
    # materializes the edge set once per round and cuts the plan at it;
    # superseded checkpoint RDDs are freed by the ContextCleaner on GC.
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    for _ in range(max_iter):
        # ---- large-star: directions both ways, larger neighbors hook to min
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # ---- small-star: canonical (big, small), everyone hooks to min
        canon = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v"))
        smins = canon.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        joined = canon.join(smins, "u")
        small = (
            joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(joined.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # Fixpoint: the edge multiset is stable. One scalar row per round —
        # count + order-insensitive hash-sum — not an edge-set join.
        sig_row = small.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal(38,0): a bigint sum of 64-bit hashes overflows (ANSI
            # mode raises); the wide decimal stays exact and order-free
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        e = small
        if sig == prev_sig:
            break
        prev_sig = sig
    return (
        nodes.select(F.col(node_col).alias("node"))
        .join(e.select(F.col("u").alias("node"), F.col("v").alias("ctr")), "node", "left")
        .groupBy("node")
        .agg(F.min(F.coalesce("ctr", F.col("node"))).alias("cluster_id"))
    )

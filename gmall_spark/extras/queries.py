"""LLM-data-pipeline extras (BASELINE.json north star): dedup, similarity
search, text analysis — registered into the same query registry.

Implementations live in gmall_spark.extras.{dedup,similarity,text}; this
module binds them to the testdata tables + DuckDB oracles. All hashes are
md5-based so the oracle computes bit-identical values; ratios use integer
arithmetic (no float rounding at engine boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_spark.extras import dedup, similarity, text
from gmall_spark.queries import register
from gmall_spark.session import unpersist_with
from gmall_spark.sources import load_table

#: Deterministic query-sampling modulus shared by the audit-class entries
#: (ann_recall_audit since r8, text_embed_knn since this round): queries
#: with id % MOD == 0 are scored, the index/candidate side stays the full
#: corpus. One constant so the Spark filters and the oracle WHERE clauses
#: can never drift apart.
_AUDIT_SAMPLE_MOD = 8


# ---------------------------------------------------------------------------
# Exact dedup — hash-groupBy. Scale: one shuffle on the 128-bit content hash;
# no skew (hash keys uniform).
# ---------------------------------------------------------------------------
@register(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           CAST(count(*) AS BIGINT) AS dup_ct
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact(load_table(spark, sf_dir, "documents"), "doc_id", "text")


# ---------------------------------------------------------------------------
# N-gram Jaccard near-dup. Candidate generation by shared shingle (inverted
# index) — at 100 TB the pair space is bounded by shingle co-occurrence, not
# n²; verification is exact set overlap with integer-only thresholding.
# ---------------------------------------------------------------------------
_JACCARD_ORACLE = """
WITH sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           array_to_string(t[i:i+2], ' ') AS shingle
    FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
         UNNEST(range(1, greatest(len(t) - 2, 1) + 1)) AS u(i)
  )
),
card AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter_ct
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b,
       CAST(p.inter_ct AS BIGINT) AS inter_ct,
       CAST(ca.n + cb.n - p.inter_ct AS BIGINT) AS union_ct
FROM pairs p
JOIN card ca ON p.doc_a = ca.doc_id
JOIN card cb ON p.doc_b = cb.doc_id
WHERE p.inter_ct * 10 >= (ca.n + cb.n - p.inter_ct) * 5
"""


@register("dedup_ngram_jaccard", _JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard(docs, "doc_id", "text", k=3, threshold_pct=50)


# PPJoin-style prefix-filtered variant — provably identical output (same
# oracle), indexes only the rare-shingle prefix of each set for candidate
# generation; the scale path when the naive inverted index's hot shingles
# dominate the pair space.
@register("dedup_jaccard_prefix", _JACCARD_ORACLE)
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_prefix(docs, "doc_id", "text", k=3, threshold_pct=50)


# ---------------------------------------------------------------------------
# MinHash signatures + LSH banding. Hash = md5(seed|shingle) hex-string min —
# a uniform order statistic, so string-min IS a minhash; engine-portable.
# ---------------------------------------------------------------------------
_MINHASH_ORACLE = """
WITH sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
    FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
         UNNEST(range(1, greatest(len(t) - 2, 1) + 1)) AS u(i)
  )
),
agg AS (
  SELECT doc_id,
         min(substr(md5(shingle), 1, 8)) AS m0,
         min(substr(md5(shingle), 9, 8)) AS m1,
         min(substr(md5(shingle), 17, 8)) AS m2,
         min(substr(md5(shingle), 25, 8)) AS m3,
         min(substr(md5('x' || shingle), 1, 8)) AS m4,
         min(substr(md5('x' || shingle), 9, 8)) AS m5,
         min(substr(md5('x' || shingle), 17, 8)) AS m6,
         min(substr(md5('x' || shingle), 25, 8)) AS m7
  FROM sh GROUP BY doc_id
),
sig AS (
  SELECT doc_id, u.seed, u.mh FROM agg,
  UNNEST([
    {'seed': 's0', 'mh': m0}, {'seed': 's1', 'mh': m1},
    {'seed': 's2', 'mh': m2}, {'seed': 's3', 'mh': m3},
    {'seed': 's4', 'mh': m4}, {'seed': 's5', 'mh': m5},
    {'seed': 's6', 'mh': m6}, {'seed': 's7', 'mh': m7}
  ]) AS u(u)
),
bands AS (
  SELECT doc_id, substr(seed, 2, 1)::INT // 2 AS band,
         string_agg(mh, '|' ORDER BY seed) AS band_key
  FROM sig GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b, CAST(count(*) FILTER (WHERE sa.mh = sb.mh) AS BIGINT) AS match_ct
FROM cand c
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b AND sb.seed = sa.seed
GROUP BY 1, 2
"""


@register("dedup_minhash", _MINHASH_ORACLE)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh(docs, "doc_id", "text", k=3, n_hashes=8, band_size=2)


# ---------------------------------------------------------------------------
# SimHash near-dup: 60-bit signature from md5-hex-digit parity (two md5s
# cover the 60 digits), Hamming distance <= 3. The oracle verifies pairwise
# at sf scale; the Spark path generates candidates from 4×15-bit bands
# (pigeonhole-exact — see extras/dedup.py::simhash_pairs).
# ---------------------------------------------------------------------------
_SIMHASH_ORACLE = """
WITH toks AS (
  SELECT doc_id, token, count(*) AS w
  FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents)
  WHERE token <> '' GROUP BY 1, 2
),
bits AS (
  SELECT doc_id, i,
         CASE WHEN sum(CASE WHEN (CASE WHEN i < 32 THEN substr(md5(token), i + 1, 1)
                                       ELSE substr(md5('x' || token), i - 31, 1) END)
                                 IN ('8','9','a','b','c','d','e','f')
                            THEN w ELSE -w END) > 0 THEN 1 ELSE 0 END AS bit
  FROM toks, UNNEST(range(0, 60)) AS u(i)
  GROUP BY 1, 2
),
sig AS (SELECT doc_id, CAST(sum(CAST(bit AS BIGINT) << i) AS BIGINT) AS sig FROM bits GROUP BY 1)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
"""


@register("dedup_simhash", _SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(docs, "doc_id", "text", n_bits=60, max_hamming=3)


# ---------------------------------------------------------------------------
# Brute-force cosine top-k — the similarity-search baseline. Output is the
# ranking (ids + rank), not raw floats, so fp summation order can't flip the
# hash; sims differ by >> 1e-9 for random embeddings.
# ---------------------------------------------------------------------------
_KNN_ORACLE = """
WITH norm AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
sims AS (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
         list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
  FROM norm a JOIN norm b ON a.vec_id <> b.vec_id
)
SELECT vec_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT vec_id, neighbor_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rnk
  FROM sims
) WHERE rnk <= 5
"""


@register("embed_knn", _KNN_ORACLE)
def embed_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.brute_force_knn(emb, "vec_id", "embedding", k=5)


_NEAR_DUP_ORACLE = """
WITH n AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(CASE WHEN a.label = b.label THEN 1 ELSE 0 END AS BIGINT) AS same_label
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) / (a.nm * b.nm) > 0.4
"""


@register("dedup_embedding_cosine", _NEAR_DUP_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_near_dup(emb, "vec_id", "embedding", "label", threshold=0.4)


# LSH-bucketed ANN — the 100TB scale path (candidates from shared hyperplane
# buckets via an equi-join on (table, sig), never n² pairs). The whole
# algorithm is deterministic — hyperplane signs from md5 parity, candidates
# from bucket equality, fold-order cosine verify — so the oracle replays it
# end-to-end in SQL and the driver hash-checks the actual ANN result.
# Parameterized on the signature width so the auto-density twins (which
# resolve to 4 bits at every gate corpus: auto_lsh_bits yields 4 for any
# n ≤ 4096 vectors, and the driver's oracle scale is 500) replay bit-exactly
# with their own oracle rather than skipping the hash check.
def _lsh_oracle(n_bits: int) -> str:
    return f"""
WITH norm AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
planes AS (
  SELECT t, b,
         list_transform(range(0, 64), d ->
           CASE WHEN substr(md5('h' || t || ':' || b || ',' || d), 1, 1) >= '8'
                THEN 1.0 ELSE -1.0 END) AS w
  FROM (SELECT unnest(range(0, 12)) AS t), (SELECT unnest(range(0, {n_bits})) AS b)
),
sigs AS (
  SELECT n.vec_id, p.t AS tbl,
         CAST(sum(CASE WHEN list_dot_product(n.v, p.w) > 0
                       THEN 1 << ({n_bits - 1} - p.b) ELSE 0 END) AS BIGINT) AS sig
  FROM norm n, planes p
  GROUP BY 1, 2
),"""


_LSH_ANN_TAIL = """
cand AS (
  SELECT DISTINCT a.vec_id, b.vec_id AS neighbor_id
  FROM sigs a JOIN sigs b
    ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id <> b.vec_id
)
SELECT vec_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT c.vec_id, c.neighbor_id,
         row_number() OVER (PARTITION BY c.vec_id
                            ORDER BY list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) DESC,
                                     c.neighbor_id) AS rnk
  FROM cand c
  JOIN norm na ON c.vec_id = na.vec_id
  JOIN norm nb ON c.neighbor_id = nb.vec_id
) WHERE rnk <= 5
"""

_LSH_ORACLE = _lsh_oracle(6) + _LSH_ANN_TAIL


@register("embed_ann_lsh", _LSH_ORACLE)
def embed_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_ann(emb, "vec_id", "embedding", n_bits=6, n_tables=12, k=5)


#: corpus sizes up to this are "gate regime": small enough that a DuckDB
#: oracle could be replaying the run bit-exactly (the driver gate corpus is
#: ~500 vectors; both resolver floors hold through 16 Ki). Above it the run
#: is a scale probe/bench where auto DIVERGING from the pinned density is
#: the entire point (rows-only checks there) — asserting would block the
#: auto twins at exactly the scales they exist for (the r8 sf10 audit
#: caught the unguarded version doing precisely that).
_AUTO_DENSITY_GATE_BAND = 16 * 1024


def _assert_auto_density(df: DataFrame, resolver, expected: int, entry: str) -> None:
    """Fail-loud contract for the auto-density twins (r7 advice): their
    registered oracles are hard-pinned to the density "auto" resolves to at
    every gate corpus (4 LSH bits ≤4096 vectors; 16 IVF cells ≤16 Ki). If a
    GATE-REGIME corpus (≤ _AUTO_DENSITY_GATE_BAND rows) crosses a resolver
    threshold, the entry would silently compute with a wider signature and
    the gate would report an opaque value-hash mismatch — assert the
    assumption HERE so the failure names the cause and the fix. One
    metadata-fast count() on the parquet source; the resolver re-counts
    inside the kernel path, which is fine: both counts are footer reads."""
    n = df.count()
    got = resolver(n)
    if got != expected and n <= _AUTO_DENSITY_GATE_BAND:
        raise AssertionError(
            f"{entry}: auto density resolves to {got} at {n} corpus rows but "
            f"the registered oracle is pinned to {expected} — regenerate the "
            f"oracle at density {got} (or split the gate corpus); see "
            f"{resolver.__name__} thresholds"
        )


@register("embed_ann_lsh_auto", _lsh_oracle(4) + _LSH_ANN_TAIL)
def embed_ann_lsh_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH-ANN scale DEFAULT under the correctness gate: signature width
    follows the corpus (auto_lsh_bits — bucket population held near 256,
    floor 4 bits), so the O(pop²) bucket kernels stay ~constant as the
    corpus grows. At every gate corpus (≤4096 vectors) auto resolves to 4
    bits, so the 4-bit oracle replays this entry bit-exactly — while the
    pinned 6-bit twin's buckets grow linearly with the corpus (sf10: 3125
    rows/bucket × 12 tables, 103 s and 47× for 100× data; auto's 10-bit
    signature holds ~195/bucket). Same pinned-vs-auto contract as
    embed_ann_ivf / embed_ann_ivf_auto."""
    emb = load_table(spark, sf_dir, "embeddings")
    _assert_auto_density(emb, similarity.auto_lsh_bits, 4, "embed_ann_lsh_auto")
    return similarity.lsh_ann(emb, "vec_id", "embedding", n_bits="auto", n_tables=12, k=5)


# IVF variant — k-means cells + nprobe search (the other classic ANN scale
# path; recall vs brute force asserted in tests/test_ann_quality.py).
# The quantizer is deterministic (seed = 16 lowest ids, 2 Lloyd iterations,
# stale centroid kept for empty cells, argmin ties to the lower cell), so the
# oracle replays the full pipeline: 2 k-means rounds → final assignment →
# probe the 4 nearest trained centroids → exact-cosine top-5.
def _ivf_assign(cent_cte: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT vec_id, v, cell FROM (
    SELECT n.vec_id, n.v, c.cell,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY list_sum(list_transform(range(1, 65),
                       i -> (n.v[i] - c.c[i]) * (n.v[i] - c.c[i]))) ASC,
                      c.cell ASC) AS rn
    FROM norm n, {cent_cte} c
  ) WHERE rn = 1
)"""


def _ivf_means(assign_cte: str, prev_cent: str, out: str) -> str:
    return f"""
{out}_m AS (
  SELECT a.cell, u.d, avg(a.v[u.d]) AS m
  FROM {assign_cte} a, (SELECT unnest(range(1, 65)) AS d) u
  GROUP BY 1, 2
),
{out} AS (
  SELECT p.cell, coalesce(l.c, p.c) AS c
  FROM {prev_cent} p
  LEFT JOIN (SELECT cell, list(m ORDER BY d) AS c FROM {out}_m GROUP BY cell) l
    ON p.cell = l.cell
)"""


_IVF_ORACLE = f"""
WITH norm AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
seed AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, v AS c
  FROM (SELECT vec_id, v FROM norm ORDER BY vec_id LIMIT 16)
),
{_ivf_assign("seed", "assign1")},
{_ivf_means("assign1", "seed", "cent1")},
{_ivf_assign("cent1", "assign2")},
{_ivf_means("assign2", "cent1", "cent2")},
{_ivf_assign("cent2", "assign3")},
probes AS (
  SELECT vec_id, cell FROM (
    SELECT n.vec_id, pc.cell,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY list_sum(list_transform(range(1, 65),
                       i -> (n.v[i] - pc.c[i]) * (n.v[i] - pc.c[i]))) ASC,
                      pc.cell ASC) AS rn
    FROM norm n, cent2 pc
  ) WHERE rn <= 4
),
cand AS (
  SELECT p.vec_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign3 a ON a.cell = p.cell AND a.vec_id <> p.vec_id
)
SELECT vec_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT c.vec_id, c.neighbor_id,
         row_number() OVER (PARTITION BY c.vec_id
                            ORDER BY list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) DESC,
                                     c.neighbor_id) AS rnk
  FROM cand c
  JOIN norm na ON c.vec_id = na.vec_id
  JOIN norm nb ON c.neighbor_id = nb.vec_id
) WHERE rnk <= 5
"""


@register("embed_ann_ivf", _IVF_ORACLE)
def embed_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_ann(emb, "vec_id", "embedding", k=5, n_clusters=16, nprobe=4)


@register("embed_ann_ivf_auto", _IVF_ORACLE)
def embed_ann_ivf_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF scale DEFAULT under the correctness gate: n_clusters="auto"
    (auto_ivf_cells — one cell per ~1024 vectors, floor 16). At the oracle
    corpus (≤16 Ki vectors) auto resolves to exactly the pinned entry's 16
    cells, so the SAME bit-exact oracle replays it — while at bench/probe
    scales this entry exercises the density the 100 TB deployment runs
    (sf10: auto ~27 s where the pinned density degenerates past the
    MAX_PINNED_BUCKET_POP guard, see BENCH_r05_sf10_batch.json)."""
    emb = load_table(spark, sf_dir, "embeddings")
    _assert_auto_density(emb, similarity.auto_ivf_cells, 16, "embed_ann_ivf_auto")
    return similarity.ivf_ann(emb, "vec_id", "embedding", k=5, n_clusters="auto", nprobe=4)


# ---------------------------------------------------------------------------
# Text analysis: token/quality metrics, integer-only outputs.
# ---------------------------------------------------------------------------
_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")
_SW_LIST = ", ".join(f"'{w}'" for w in _STOPWORDS)

_QUALITY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, n_chars, token
  FROM (SELECT doc_id, n_chars, unnest(string_split(trim(text), ' ')) AS token FROM documents)
  WHERE token <> ''
)
SELECT doc_id,
       CAST(any_value(n_chars) AS BIGINT) AS n_chars,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT token) AS BIGINT) AS n_unique_tokens,
       CAST(sum(len(token)) AS BIGINT) AS token_chars,
       CAST(sum(CASE WHEN token IN ({_SW_LIST}) THEN 1 ELSE 0 END) AS BIGINT) AS stopword_ct,
       CAST(max(len(token)) AS BIGINT) AS max_token_len
FROM toks GROUP BY doc_id
"""


@register("text_quality", _QUALITY_ORACLE)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.quality_metrics(docs, "doc_id", "text", extra_cols=("n_chars",), stopwords=_STOPWORDS)


# Language-ID n-gram/marker heuristic. The testdata corpus is synthetic (same
# vocabulary for all langs), so this validates the *operator plumbing*:
# deterministic marker scoring + argmax with alphabetical tie-break.
_LANG_MARKERS = {
    "en": ("the", "a", "and", "of", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "y", "es"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("的", "是", "了", "在", "我"),
}


def _lang_score_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])
    return f"CAST(sum(CASE WHEN token IN ({words}) THEN 1 ELSE 0 END) AS BIGINT)"


_LANGID_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, token
  FROM (SELECT doc_id, lang, unnest(string_split(trim(text), ' ')) AS token FROM documents)
  WHERE token <> ''
),
scores AS (
  SELECT doc_id, any_value(lang) AS lang_true,
         {_lang_score_sql("de")} AS score_de,
         {_lang_score_sql("en")} AS score_en,
         {_lang_score_sql("es")} AS score_es,
         {_lang_score_sql("fr")} AS score_fr,
         {_lang_score_sql("zh")} AS score_zh
  FROM toks GROUP BY doc_id
)
SELECT doc_id, lang_true, score_de, score_en, score_es, score_fr, score_zh,
       CASE greatest(score_de, score_en, score_es, score_fr, score_zh)
            WHEN score_de THEN 'de' WHEN score_en THEN 'en' WHEN score_es THEN 'es'
            WHEN score_fr THEN 'fr' ELSE 'zh' END AS lang_pred
FROM scores
"""


@register("lang_id", _LANGID_ORACLE)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.lang_id(docs, "doc_id", "text", markers=_LANG_MARKERS, true_col="lang")


# Document fingerprinting: whole-content md5 + min-shingle (winnowing-style)
# content fingerprint.
_FP_ORACLE = """
WITH sh AS (
  SELECT doc_id, min(md5(array_to_string(t[i:i+4], ' '))) AS min_shingle_fp
  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents),
       UNNEST(range(1, greatest(len(t) - 4, 1) + 1)) AS u(i)
  GROUP BY doc_id
)
SELECT d.doc_id, md5(lower(trim(d.text))) AS content_fp, s.min_shingle_fp
FROM documents d JOIN sh s ON d.doc_id = s.doc_id
"""


@register("doc_fingerprint", _FP_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.fingerprint(docs, "doc_id", "text", k=5)


# Token counting: whitespace tokens + regex word-ish tokens + BPE-ish estimate
# (ceil(chars/4) — the common "1 token ≈ 4 chars" rule), all integers.
_TOKCOUNT_ORACLE = """
SELECT doc_id,
       CAST(len(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS word_tokens,
       CAST(CAST(ceil(len(text) / 4.0) AS INT) AS BIGINT) AS bpe_est_tokens
FROM documents
"""


@register("token_count", _TOKCOUNT_ORACLE)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.token_counts(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# Quality filtering — the C4-style rule cascade that decides which documents
# enter a training corpus. One scan, boolean rule columns kept in the output
# so downstream can audit WHY a doc was dropped (standard practice: filters
# must be explainable, not just applied).
# ---------------------------------------------------------------------------
_FILTER_ORACLE = f"""
WITH m AS (
  SELECT doc_id, n_chars,
         len(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS n_tokens,
         len(list_filter(string_split(trim(text), ' '),
                         x -> x IN ({_SW_LIST}))) AS stopword_ct,
         CAST(list_max([len(x) for x in string_split(trim(text), ' ')]) AS BIGINT) AS max_token_len
  FROM documents
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_tokens >= 20 AS BOOLEAN) AS pass_min_len,
       CAST(n_chars <= 5000 AS BOOLEAN) AS pass_max_chars,
       CAST(stopword_ct * 100 >= n_tokens * 2 AS BOOLEAN) AS pass_stopword,
       CAST(max_token_len <= 30 AS BOOLEAN) AS pass_token_len,
       CAST(n_tokens >= 20 AND n_chars <= 5000
            AND stopword_ct * 100 >= n_tokens * 2
            AND max_token_len <= 30 AS BOOLEAN) AS keep
FROM m
"""


@register("document_filter", _FILTER_ORACLE)
def document_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim("text"), " "), lambda x: x != "")
    n_tokens = F.size(toks)
    stopword_ct = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS)))
    # coalesce: a whitespace-only doc has no tokens → array_max(empty) is
    # NULL here but the oracle's list_max over unfiltered tokens gives 0
    max_token_len = F.coalesce(
        F.array_max(F.transform(toks, lambda x: F.length(x))).cast("long"), F.lit(0)
    )
    rules = {
        "pass_min_len": n_tokens >= 20,
        "pass_max_chars": F.col("n_chars") <= 5000,
        "pass_stopword": stopword_ct * 100 >= n_tokens * 2,
        "pass_token_len": max_token_len <= 30,
    }
    keep = None
    for r in rules.values():
        keep = r if keep is None else keep & r
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        *[v.alias(k) for k, v in rules.items()],
        keep.alias("keep"),
    )


# ---------------------------------------------------------------------------
# Dedup keep-list — the pipeline OUTPUT: which documents survive. Pairs alone
# aren't actionable; the greedy resolution keeps every doc that never appears
# as the higher-id member of a near-dup pair (min-id canonical per cluster
# under transitive closure; one anti-join, no iteration).
# ---------------------------------------------------------------------------
_KEEP_ORACLE = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
    FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
         UNNEST(range(1, greatest(len(t) - 2, 1) + 1)) AS u(i)
  )
),
card AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter_ct
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
dup_pairs AS (
  SELECT p.doc_a, p.doc_b FROM pairs p
  JOIN card ca ON p.doc_a = ca.doc_id
  JOIN card cb ON p.doc_b = cb.doc_id
  WHERE p.inter_ct * 100 >= (ca.n + cb.n - p.inter_ct) * 50
),
exact_drops AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM documents
  ) WHERE rn > 1
)
SELECT d.doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_b FROM dup_pairs)
  AND d.doc_id NOT IN (SELECT doc_id FROM exact_drops)
"""


@register("dedup_keep_list", _KEEP_ORACLE)
def dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fuzzy_pairs = dedup.ngram_jaccard(docs, "doc_id", "text", k=3, threshold_pct=50)
    fuzzy_drops = fuzzy_pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    exact_keep = dedup.exact(docs, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id")
    )
    return (
        docs.select("doc_id")
        .join(exact_keep, "doc_id", "left_semi")  # exact: keep min per hash
        .join(fuzzy_drops, "doc_id", "left_anti")  # fuzzy: drop higher ids
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (binary decode is stubbed, see extras/multimodal.py):
# documents → binary payload + typed metadata → mapInPandas feature
# extraction. The payload is the UTF-8 text (all-ASCII in testdata, so
# byte == codepoint) and the fake featurizer is pure byte arithmetic — both
# fully replayable in SQL, so these get real value-hash oracles. The array
# output is projected to scalar f0..f3 for the registry (the driver's
# canonicalizer can't hash list cells); the array form stays in
# extract_features for pipeline use.
# ---------------------------------------------------------------------------
_MM_FEATURES_ORACLE = """
WITH bytes AS (
  SELECT doc_id, ascii(substr(text, i + 1, 1)) AS b, i % 4 AS lane
  FROM documents, UNNEST(range(0, strlen(text))) AS u(i)
),
agg AS (
  SELECT doc_id, count(*) AS n, sum(b) AS s,
         sum(CASE WHEN lane = 0 THEN b ELSE 0 END) AS s0,
         sum(CASE WHEN lane = 1 THEN b ELSE 0 END) AS s1,
         sum(CASE WHEN lane = 2 THEN b ELSE 0 END) AS s2,
         sum(CASE WHEN lane = 3 THEN b ELSE 0 END) AS s3
  FROM bytes GROUP BY doc_id
)
SELECT d.doc_id AS asset_id, 'image' AS media_type,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n_bytes,
       CASE WHEN coalesce(a.n, 0) = 0 THEN 0.0
            ELSE CAST(a.s AS DOUBLE) / a.n END AS byte_mean,
       CAST(coalesce(a.s0, 0) % 997 AS DOUBLE) AS f0,
       CAST(coalesce(a.s1, 0) % 997 AS DOUBLE) AS f1,
       CAST(coalesce(a.s2, 0) % 997 AS DOUBLE) AS f2,
       CAST(coalesce(a.s3, 0) % 997 AS DOUBLE) AS f3
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


@register("multimodal_features", _MM_FEATURES_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_spark.extras import multimodal

    docs = load_table(spark, sf_dir, "documents")
    assets = multimodal.to_assets(docs, "doc_id", "text")
    feats = multimodal.extract_features(assets)
    return feats.select(
        "asset_id",
        "media_type",
        "n_bytes",
        "byte_mean",
        *[feats["features"][i].alias(f"f{i}") for i in range(4)],
    )


# Frame sampling = every stride-th fixed-size chunk of the payload: output
# cardinality is pure byte arithmetic over the (ASCII) text, hence the
# substr-free length oracle below. Frame bytes stay out of the registry
# output (binary cells aren't hashable driver-side).
_MM_FRAMES_ORACLE = """
WITH f AS (
  SELECT doc_id, strlen(text) AS len,
         CAST(ceil(strlen(text) / 64.0) AS BIGINT) AS nchunks
  FROM documents
)
SELECT doc_id AS asset_id, CAST(i AS INT) AS frame_idx,
       CAST(least(64, len - 2 * i * 64) AS BIGINT) AS n_bytes
FROM f, UNNEST(range(0, (nchunks + 1) // 2)) AS u(i)
"""


@register("multimodal_frames", _MM_FRAMES_ORACLE)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads (row explosion in mapInPandas)."""
    from gmall_spark.extras import multimodal

    docs = load_table(spark, sf_dir, "documents")
    assets = multimodal.to_assets(docs, "doc_id", "text")
    return multimodal.sample_frames(assets).drop("frame")  # bytes out of the hash


# Resize = strided byte-sampling onto a fixed w×h grid (bounded output —
# the property that matters before shuffling media). Registry output is the
# hashable summary (geometry + resized byte sum); the binary payload itself
# stays in the pipeline API.
_MM_RESIZE_ORACLE = """
WITH r AS (
  SELECT doc_id, strlen(text) AS len,
         CASE WHEN strlen(text) = 0 THEN 0
              ELSE (SELECT sum(ascii(substr(text, ((i * len) // 64) + 1, 1)))
                    FROM UNNEST(range(0, 64)) AS u(i)) END AS byte_sum
  FROM documents
)
SELECT doc_id AS asset_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
       CAST(64 AS BIGINT) AS n_bytes, CAST(byte_sum AS BIGINT) AS byte_sum
FROM r
"""


@register("multimodal_resize", _MM_RESIZE_ORACLE)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_spark.extras import multimodal

    docs = load_table(spark, sf_dir, "documents")
    assets = multimodal.to_assets(docs, "doc_id", "text")
    resized = multimodal.resize(assets, width=8, height=8)
    return resized.select(
        "asset_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.expr(
            "aggregate(transform(sequence(1, length(decode(payload, 'UTF-8'))), "
            "i -> bigint(ascii(substring(decode(payload, 'UTF-8'), i, 1)))), "
            "bigint(0), (acc, x) -> acc + x)"
        ).alias("byte_sum"),
    )


_TEXT_KNN_ORACLE = f"""
WITH emb AS (
  SELECT doc_id, list_transform(range(0, 16), d ->
           (strpos('0123456789abcdef', substr(md5(coalesce(text, '')), 2*d + 1, 1)) - 1) * 16.0
           + (strpos('0123456789abcdef', substr(md5(coalesce(text, '')), 2*d + 2, 1)) - 1)
           - 127.5) AS v
  FROM documents
),
norm AS (SELECT doc_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM emb),
sims AS (
  SELECT a.doc_id AS vec_id, b.doc_id AS neighbor_id,
         list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
  FROM norm a JOIN norm b ON a.doc_id <> b.doc_id
  WHERE a.doc_id % {_AUDIT_SAMPLE_MOD} = 0
)
SELECT vec_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT vec_id, neighbor_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rnk
  FROM sims
) WHERE rnk <= 3
"""


@register("text_embed_knn", _TEXT_KNN_ORACLE)
def text_embed_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text → (stub) embedding → exact cosine kNN: the composed pipeline.
    The md5-byte embedder is engine-portable, so the oracle replays the
    whole chain — embedding, cosine, rank — in SQL.

    Queries are the same deterministic 1/8 sample as ann_recall_audit
    (doc_id % 8 = 0); the INDEX stays the full corpus, so each sampled
    query's top-3 is bit-identical to its row in an unsampled run
    (per-query independence — brute_force_knn query_filter docstring).
    This entry demonstrates the embed→kNN COMPOSITION; the unsampled
    full-corpus exact baseline remains embed_knn. Before sampling this
    was the sf10 audit's single biggest row (287s, 11.5% of the wall —
    r7 verdict task 6 named it; ann_recall_audit got the same treatment
    in the same round)."""
    from gmall_spark.extras import multimodal

    docs = load_table(spark, sf_dir, "documents")
    emb = multimodal.fake_text_embedder(docs, "doc_id", "text", dims=16)
    return similarity.brute_force_knn(
        emb,
        "doc_id",
        "embedding",
        k=3,
        query_filter=F.col("doc_id") % _AUDIT_SAMPLE_MOD == 0,
    )


# ---------------------------------------------------------------------------
# Text scrubbing — the PII/boilerplate-redaction shape (regex replace +
# audit count). Patterns kept to the regex subset that behaves identically
# in Java (Spark) and RE2 (DuckDB) engines.
# ---------------------------------------------------------------------------
_SCRUB_ORACLE = """
SELECT doc_id,
       regexp_replace(text, 'spark|table', '<TOK>', 'g') AS scrubbed,
       CAST(len(regexp_extract_all(text, 'spark|table')) AS BIGINT) AS n_scrubbed,
       CAST(length(text) AS BIGINT) AS len_before,
       CAST(length(regexp_replace(text, 'spark|table', '<TOK>', 'g')) AS BIGINT) AS len_after
FROM documents
"""


@register("text_scrub", _SCRUB_ORACLE)
def text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace("text", "spark|table", "<TOK>")
    return docs.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        F.regexp_count("text", F.lit("spark|table")).cast("long").alias("n_scrubbed"),
        F.length("text").cast("long").alias("len_before"),
        F.length(scrubbed).cast("long").alias("len_after"),
    )


# ---------------------------------------------------------------------------
# Intra-document repetition — boilerplate/looping-text signal: how much of a
# doc's shingle stream repeats (1 - distinct/total, kept as two integers).
# ---------------------------------------------------------------------------
_REPETITION_ORACLE = """
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(DISTINCT shingle) AS BIGINT) AS n_distinct_shingles
FROM (
  SELECT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
       UNNEST(range(1, greatest(len(t) - 2, 1) + 1)) AS u(i)
)
GROUP BY doc_id
"""


@register("text_repetition", _REPETITION_ORACLE)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc shingle stats computed row-local (size / array_distinct on the
    shingle array) — no explode, no shuffle: the grouping key is the row
    itself, so the explode + groupBy + countDistinct formulation (which
    forces an Expand for the mixed distinct/plain aggregate) would shuffle
    |docs|·|shingles| rows to recompute what a narrow projection knows."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), " ")
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 2, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 3)),
    )
    return docs.select(
        "doc_id",
        F.size(sh).cast("long").alias("n_shingles"),
        F.size(F.array_distinct(sh)).cast("long").alias("n_distinct_shingles"),
    )


# ---------------------------------------------------------------------------
# Dataset splitting & sampling — the operations every training pipeline runs
# before anything else. Both are hash-deterministic (no RNG state): the split
# is stable under re-runs, insertions, and repartitioning — the property that
# matters at 100 TB, where "sample 1%" must not mean "collect then shuffle".
# ---------------------------------------------------------------------------
_SPLIT_ORACLE = """
SELECT doc_id, bucket,
       CASE WHEN bucket < 204 THEN 'train'
            WHEN bucket < 230 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         CAST((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
              AS BIGINT) AS bucket
  FROM documents
)
"""


@register("split_by_hash", _SPLIT_ORACLE)
def split_by_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment from the id hash (~80/10/10
    via byte thresholds 204/230). One narrow projection, no shuffle, no RNG —
    a row's split never changes when the corpus grows or repartitions."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10).cast(
        "long"
    )
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 204, "train").when(bucket < 230, "val").otherwise("test").alias("split"),
    )


_STRAT_ORACLE = """
SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) WHERE rn <= 20
"""


@register("stratified_sample", _STRAT_ORACLE)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size per-stratum sample: hash-order rank within each stratum,
    keep the first n. Unlike df.sample(), the result is deterministic and
    exactly n per stratum; the hash order makes it uniform-ish without RNG.
    One shuffle on the stratum key."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        docs.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 20)
    )


# ---------------------------------------------------------------------------
# Chunk-level (paragraph-style) exact dedup: token-window chunks hashed and
# deduplicated ACROSS the corpus — the boilerplate killer that document-level
# dedup misses (shared headers/footers/licenses inside otherwise-unique
# docs). Chunking is pure arithmetic, so the oracle replays it exactly.
# ---------------------------------------------------------------------------
_CHUNK_ORACLE = """
WITH chunks AS (
  SELECT doc_id,
         md5(array_to_string(t[(c * 32 + 1):(c * 32 + 32)], ' ')) AS chunk_hash
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
       UNNEST(range(0, CAST(ceil(len(t) / 32.0) AS BIGINT))) AS u(c)
)
SELECT chunk_hash,
       CAST(min(doc_id) AS BIGINT) AS keep_doc,
       CAST(count(*) AS BIGINT) AS occurrence_ct
FROM chunks GROUP BY 1
"""


@register("dedup_chunks", _CHUNK_ORACLE)
def dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-token chunk dedup across the corpus: explode chunks, hash, one
    groupBy on the hash (uniform key — no skew), keep the lowest doc id as
    canonical. At 100 TB this is the same single-shuffle shape as exact
    doc dedup, at chunk granularity."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(32.0)).cast("int")
    chunk = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda c: F.md5(F.concat_ws(" ", F.slice(toks, c * 32 + 1, 32))),
    )
    return (
        docs.select("doc_id", F.explode(chunk).alias("chunk_hash"))
        .groupBy("chunk_hash")
        .agg(
            F.min("doc_id").alias("keep_doc"),
            F.count(F.lit(1)).alias("occurrence_ct"),
        )
    )


# ---------------------------------------------------------------------------
# F2/F3 — user-defined aggregate (the slot the reference never fills): a
# pandas GROUPED_AGG UDAF. Arrow ships each group's column once; the kernel
# is vectorized numpy. Median is the demo because it's order-insensitive
# and engine-exact (np.median == quantile_cont(0.5) == Spark percentile).
# ---------------------------------------------------------------------------
_UDAF_ORACLE = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS median_price,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY 1
"""


@register("udaf_median", _UDAF_ORACLE)
def udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas GROUPED_AGG UDAF (np.median per group). NOTE on scale: a
    grouped-agg UDAF sees the whole group — it cannot partial-aggregate, so
    the shuffle carries raw rows. Use only for genuinely holistic aggregates
    (exact quantiles); anything decomposable belongs in built-ins."""
    import numpy as np
    import pandas as pd  # noqa: F401 — the UDAF input type
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit GROUPED_AGG marker: this module uses `from __future__ import
    # annotations`, which stringifies type hints and defeats signature-based
    # UDF-type inference
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def median_udaf(v):
        return np.median(v)

    # Spark disallows mixing grouped-agg pandas UDFs with JVM aggregates in
    # one agg — the count rides along as a second UDAF
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def count_udaf(v):
        return len(v)

    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        median_udaf("l_extendedprice").alias("median_price"),
        count_udaf("l_extendedprice").alias("n"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination — the n-gram collision check every serious
# training corpus runs against its eval sets (the classic 13-gram rule;
# 5-token shingles here to suit the short synthetic docs). Eval stand-in:
# doc_id % 10 == 0. Same inverted-index shape as ngram dedup: candidates
# from shared shingles, one shuffle on the shingle key.
# ---------------------------------------------------------------------------
_DECON_ORACLE = """
WITH sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
       UNNEST(range(1, greatest(len(t) - 4, 1) + 1)) AS u(i)
),
hits AS (
  SELECT tr.doc_id, count(DISTINCT tr.shingle) AS hit_ct
  FROM sh tr JOIN sh ev ON tr.shingle = ev.shingle
  WHERE tr.doc_id % 10 <> 0 AND ev.doc_id % 10 = 0
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(h.hit_ct, 0) AS BIGINT) AS hit_ct,
       CAST(coalesce(h.hit_ct, 0) > 0 AS BOOLEAN) AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % 10 <> 0
"""


@register("decontaminate", _DECON_ORACLE)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training docs sharing any 5-token shingle with the eval split.
    Inverted-index equi-join on the shingle — never a doc×doc product; the
    count of distinct colliding shingles stays in the output so thresholded
    policies (e.g. 'drop only if >2 collisions') are auditable."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.shingle_set(docs, "doc_id", "text", 5)
    train_sh = sh.filter(F.col("doc_id") % 10 != 0)
    eval_sh = (
        sh.filter(F.col("doc_id") % 10 == 0).select(F.col("shingle")).distinct()
    )
    hits = (
        train_sh.join(eval_sh, "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("hit_ct"))
    )
    return (
        docs.filter(F.col("doc_id") % 10 != 0)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("hit_ct"), F.lit(0)).alias("hit_ct"),
            (F.coalesce(F.col("hit_ct"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing — concatenate documents into fixed-token training
# sequences. Packing is inherently sequential, so the scalable form is
# two-level: hash-bucket the corpus (independent, parallel), then pack each
# bucket's hash-ordered stream by cumulative token count. seq_id encodes
# (bucket, position); a global renumber is one zipWithIndex away if a dense
# id is ever needed.
# ---------------------------------------------------------------------------
_PACK_ORACLE = """
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
         CAST((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
              AS BIGINT) % 8 AS bucket
  FROM documents
),
c AS (
  SELECT doc_id, bucket, n_tokens,
         sum(n_tokens) OVER (PARTITION BY bucket
                             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS off
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(bucket * 1000000 + off // 2048 AS BIGINT) AS seq_id,
       CAST(off % 2048 AS BIGINT) AS seq_offset
FROM c
"""


@register("pack_sequences", _PACK_ORACLE)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each doc a (seq_id, seq_offset) in 2048-token packed training
    sequences: hash-deterministic order, cumulative token offsets, docs
    straddle sequence boundaries exactly as a concatenate-then-chunk
    tokenizer pipeline would. 8 independent buckets ⇒ the window sort never
    sees more than corpus/8 rows in one partition."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.filter(F.split(F.trim("text"), " "), lambda x: x != "")).cast(
        "long"
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10).cast("long")
        % 8
    )
    t = docs.select("doc_id", n_tokens.alias("n_tokens"), bucket.alias("bucket"))
    w = Window.partitionBy("bucket").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    c = t.withColumn("offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return c.select(
        "doc_id",
        "n_tokens",
        (F.col("bucket") * 1000000 + (F.col("offset") / 2048).cast("long")).alias("seq_id"),
        (F.col("offset") % 2048).alias("seq_offset"),
    )


# ---------------------------------------------------------------------------
# Vocabulary building — the global token histogram every tokenizer/BPE
# training run starts from. Scale: one shuffle on (doc, token) for the
# per-doc counts, one on token for the global merge — both with map-side
# partial aggregation; the min-count filter prunes the long tail before any
# driver interaction. No global rank column on purpose: a total order over
# the vocabulary is a single-reducer sort at 100 TB — downstream consumers
# threshold or sort their own (bounded) slice.
# ---------------------------------------------------------------------------
_VOCAB_ORACLE = """
WITH dt AS (
  SELECT doc_id, token, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents)
  WHERE token <> ''
  GROUP BY 1, 2
)
SELECT token,
       CAST(sum(c) AS BIGINT) AS tok_ct,
       CAST(count(*) AS BIGINT) AS doc_ct
FROM dt GROUP BY token HAVING sum(c) >= 5
"""


@register("vocab_build", _VOCAB_ORACLE)
def vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(token, tok_ct, doc_ct) for every token with corpus frequency >= 5."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = (
        docs.select("doc_id", F.explode(F.split(F.trim("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        per_doc.groupBy("token")
        .agg(
            F.sum("c").cast("long").alias("tok_ct"),
            F.count(F.lit(1)).cast("long").alias("doc_ct"),
        )
        .filter(F.col("tok_ct") >= 5)
    )


# ---------------------------------------------------------------------------
# Per-document salient terms — tf over df ranking (monotone in idf for fixed
# tf; integer-ratio ordering so both engines compare the same exactly-rounded
# double tf/df). The shape of "top characteristic terms per doc" feature
# extraction: per-doc tf, global df via one token-keyed shuffle, joined back
# (AQE broadcasts the df table when it is actually small), per-doc window
# top-5.
# ---------------------------------------------------------------------------
_TFDF_ORACLE = """
WITH tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents)
  WHERE token <> ''
  GROUP BY 1, 2
),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1)
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT t.doc_id, t.token, t.tf, d.df,
         row_number() OVER (PARTITION BY t.doc_id
                            ORDER BY CAST(t.tf AS DOUBLE) / d.df DESC, t.token) AS rnk
  FROM tf t JOIN df d ON t.token = d.token
) WHERE rnk <= 5
"""


@register("tf_df_terms", _TFDF_ORACLE)
def tf_df_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 salient terms per document by tf/df ratio."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split(F.trim("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        (F.col("tf").cast("double") / F.col("df")).desc(), F.col("token").asc()
    )
    return (
        # no broadcast hint: a vocabulary can exceed broadcast size at scale —
        # Catalyst/AQE broadcasts when the df table is actually small
        tf.join(dfreq, "token")
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("doc_id", "token", F.col("tf").cast("long"), F.col("df").cast("long"), "rnk")
    )


# ---------------------------------------------------------------------------
# Embedding-space clustering — corpus diversity/composition analysis (the
# "what's in my training mix" op). Same deterministic quantizer as the IVF
# index (seed = lowest ids, 2 fsum-merged Lloyd rounds, stale centroids for
# empty cells), so the oracle replays it; output adds the per-cell size via
# one tiny aggregation joined back on cell.
# ---------------------------------------------------------------------------
_CLUSTER_ORACLE = f"""
WITH norm AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
seed AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, v AS c
  FROM (SELECT vec_id, v FROM norm ORDER BY vec_id LIMIT 16)
),
{_ivf_assign("seed", "assign1")},
{_ivf_means("assign1", "seed", "cent1")},
{_ivf_assign("cent1", "assign2")},
{_ivf_means("assign2", "cent1", "cent2")},
{_ivf_assign("cent2", "assign3")}
SELECT a.vec_id, CAST(a.cell AS INT) AS cell,
       CAST(count(*) OVER (PARTITION BY a.cell) AS BIGINT) AS cell_size
FROM assign3 a
"""


@register("embed_clusters", _CLUSTER_ORACLE)
def embed_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cell, cell_size): deterministic k-means cluster assignment
    over the embedding corpus, with cluster populations. Sizes come from a
    k-row aggregate broadcast-joined back — a count() window partitioned by
    cell would funnel each cell's full membership through one partition."""
    emb = load_table(spark, sf_dir, "embeddings")
    # persisted: referenced by both the size aggregate and the join side
    cells = similarity.ivf_index(emb, "vec_id", "embedding", n_clusters=16).persist()
    sizes = cells.groupBy("cell").agg(F.count(F.lit(1)).cast("long").alias("cell_size"))
    out = cells.join(F.broadcast(sizes), "cell").select("vec_id", "cell", "cell_size")
    return unpersist_with(out, cells)


# ---------------------------------------------------------------------------
# Table profiling — the ANALYZE pass every ingestion runs before anything
# else: per-column null counts, distinct cardinality, numeric min/max. One
# aggregation job for the whole table (every stat is a partial-aggregable
# expression over one scan); exact distincts here because the driver hash
# needs determinism — swap count_distinct for approx_count_distinct (HLL)
# when cardinality itself is the scale problem.
# ---------------------------------------------------------------------------
_PROFILE_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(doc_id) AS BIGINT) AS doc_id_nulls,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_id_distinct,
       CAST(count(*) - count(lang) AS BIGINT) AS lang_nulls,
       CAST(count(DISTINCT lang) AS BIGINT) AS lang_distinct,
       CAST(count(*) - count(text) AS BIGINT) AS text_nulls,
       CAST(count(DISTINCT text) AS BIGINT) AS text_distinct,
       CAST(min(n_chars) AS BIGINT) AS n_chars_min,
       CAST(max(n_chars) AS BIGINT) AS n_chars_max,
       CAST(min(doc_id) AS BIGINT) AS doc_id_min,
       CAST(max(doc_id) AS BIGINT) AS doc_id_max
FROM documents
"""


@register("profile_table", _PROFILE_ORACLE)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = F.count(F.lit(1))
    return docs.agg(
        n.alias("n_rows"),
        (n - F.count("doc_id")).alias("doc_id_nulls"),
        F.countDistinct("doc_id").alias("doc_id_distinct"),
        (n - F.count("lang")).alias("lang_nulls"),
        F.countDistinct("lang").alias("lang_distinct"),
        (n - F.count("text")).alias("text_nulls"),
        F.countDistinct("text").alias("text_distinct"),
        F.min("n_chars").cast("long").alias("n_chars_min"),
        F.max("n_chars").cast("long").alias("n_chars_max"),
        F.min("doc_id").alias("doc_id_min"),
        F.max("doc_id").alias("doc_id_max"),
    )


# ---------------------------------------------------------------------------
# Provenance mixture — per-(source, lang) composition stats, the table a
# mixture-weighting step consumes. One partial-agg shuffle on the pair key.
# ---------------------------------------------------------------------------
_SOURCE_MIX_ORACLE = """
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(len(list_filter(string_split(trim(text), ' '), x -> x <> ''))) AS BIGINT)
         AS total_tokens,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY 1, 2
"""


@register("source_mix", _SOURCE_MIX_ORACLE)
def source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.filter(F.split(F.trim("text"), " "), lambda x: x != ""))
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(n_tokens).cast("long").alias("total_tokens"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# Length-outlier filter — drop docs outside the per-language p05..p95 length
# band (the trim-the-tails step before packing). Exact interpolated
# percentiles per stratum (engine parity proven by percentile_stats); the
# 5-row bounds table broadcast-joins back, so the corpus shuffles zero times.
# ---------------------------------------------------------------------------
_LEN_OUTLIER_ORACLE = """
WITH b AS (
  SELECT lang, quantile_cont(n_chars, 0.05) AS lo, quantile_cont(n_chars, 0.95) AS hi
  FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang, d.n_chars, b.lo, b.hi
FROM documents d JOIN b ON d.lang = b.lang
WHERE d.n_chars >= b.lo AND d.n_chars <= b.hi
"""


@register("length_outlier_filter", _LEN_OUTLIER_ORACLE)
def length_outlier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.05)").alias("lo"),
        F.expr("percentile(n_chars, 0.95)").alias("hi"),
    )
    return (
        docs.join(F.broadcast(bounds), "lang")
        .filter((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .select("doc_id", "lang", "n_chars", "lo", "hi")
    )


# ---------------------------------------------------------------------------
# Salted skew join — value-identical to the plain equi-join (the oracle IS
# the plain join): salting only changes the physical key distribution, so
# the driver hash proves the skew path is semantics-preserving. The shape
# for the pathological hot key that outgrows even AQE's skew split.
# ---------------------------------------------------------------------------
_SALTED_ORACLE = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS line_ct,
       CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DECIMAL(18,4)) AS DOUBLE)
         AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""


@register("skew_salted_join", _SALTED_ORACLE)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_spark.operators.joins import salted_join

    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(lineitem, orders, on="l_orderkey", salt=8)
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("line_ct"),
        F.sum(rev).cast("decimal(18,4)").cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Dedup clustering — transitive closure over the near-dup pair graph.
# Pair resolution (dedup_keep_list) drops b of every (a,b) but misses
# chains: a~b and b~c must put {a,b,c} in ONE cluster even when a~c fails
# the threshold. Spark side: iterative min-label propagation (bounded
# per-round join + min-groupBy, no driver-side graph); oracle side: a
# recursive CTE enumerating reachable labels. Edges = exact-duplicate
# stars ∪ Jaccard>=50% pairs; every document gets a cluster (singletons
# keep their own id).
# ---------------------------------------------------------------------------
_CLUSTERS_ORACLE = """
WITH RECURSIVE sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
    FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
         UNNEST(range(1, greatest(len(t) - 2, 1) + 1)) AS u(i)
  )
),
card AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter_ct
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
fuzzy AS (
  SELECT p.doc_a, p.doc_b FROM pairs p
  JOIN card ca ON p.doc_a = ca.doc_id
  JOIN card cb ON p.doc_b = cb.doc_id
  WHERE p.inter_ct * 100 >= (ca.n + cb.n - p.inter_ct) * 50
),
exact_edges AS (
  SELECT keep_id AS doc_a, doc_id AS doc_b FROM (
    SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
    FROM documents
  ) WHERE doc_id <> keep_id
),
sym AS (
  SELECT doc_a AS a, doc_b AS b FROM fuzzy
  UNION SELECT doc_b, doc_a FROM fuzzy
  UNION SELECT doc_a, doc_b FROM exact_edges
  UNION SELECT doc_b, doc_a FROM exact_edges
),
walk(node, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT s.a, w.lab FROM sym s JOIN walk w ON w.node = s.b
),
cc AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM walk GROUP BY 1)
SELECT cc.doc_id, cc.cluster_id,
       CAST(count(*) OVER (PARTITION BY cc.cluster_id) AS BIGINT) AS cluster_size
FROM cc
"""


@register("dedup_clusters", _CLUSTERS_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    fuzzy = dedup.ngram_jaccard(docs, "doc_id", "text", k=3, threshold_pct=50).select(
        "doc_a", "doc_b"
    )
    keep = F.min("doc_id").over(Window.partitionBy(F.md5("text")))
    exact_edges = (
        docs.select("doc_id", keep.alias("keep_id"))
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select(F.col("keep_id").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    cc = dedup.connected_components(
        docs, fuzzy.unionByName(exact_edges), "doc_id", "doc_a", "doc_b"
    )
    sizes = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return (
        cc.join(sizes, "cluster_id")
        .select(F.col("node").alias("doc_id"), "cluster_id", "cluster_size")
    )


@register("dedup_clusters_star", _CLUSTERS_ORACLE)
def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering contract (and oracle) as dedup_clusters, computed by
    large-star/small-star pointer jumping instead of min-label propagation
    — the O(log n)-round variant a 100 TB corpus with boilerplate-bridge
    chains needs (label propagation is O(component diameter) rounds). The
    two entries sharing one oracle is the algorithm-equivalence proof."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    fuzzy = dedup.ngram_jaccard(docs, "doc_id", "text", k=3, threshold_pct=50).select(
        "doc_a", "doc_b"
    )
    keep = F.min("doc_id").over(Window.partitionBy(F.md5("text")))
    exact_edges = (
        docs.select("doc_id", keep.alias("keep_id"))
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select(F.col("keep_id").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    cc = dedup.connected_components_star(
        docs, fuzzy.unionByName(exact_edges), "doc_id", "doc_a", "doc_b"
    )
    sizes = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return (
        cc.join(sizes, "cluster_id")
        .select(F.col("node").alias("doc_id"), "cluster_id", "cluster_size")
    )


# ---------------------------------------------------------------------------
# Incremental-ingest dedup — the daily-batch shape: dedup a NEW batch
# against the EXISTING corpus without recomparing the corpus to itself.
# New docs (doc_id % 10 = 7 stands in for today's partition) are dropped if
# (a) their content hash already exists in the corpus (anti-join on md5 —
# one shuffle keyed on the hash), or (b) any minhash band collides with a
# corpus doc (the LSH probe — an equi-join against the banded index, which
# a real pipeline keeps materialized). Output: the surviving new doc ids
# with the reason columns the audit log wants.
# ---------------------------------------------------------------------------
_INCR_ORACLE = """
WITH newdocs AS (SELECT * FROM documents WHERE doc_id % 10 = 7),
corpus AS (SELECT * FROM documents WHERE doc_id % 10 <> 7),
exact_hit AS (
  SELECT DISTINCT n.doc_id FROM newdocs n
  JOIN corpus c ON md5(n.text) = md5(c.text)
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
    FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
         UNNEST(range(1, greatest(len(t) - 2, 1) + 1)) AS u(i)
  )
),
agg AS (
  SELECT doc_id,
         min(substr(md5(shingle), 1, 8)) AS m0,
         min(substr(md5(shingle), 9, 8)) AS m1,
         min(substr(md5(shingle), 17, 8)) AS m2,
         min(substr(md5(shingle), 25, 8)) AS m3,
         min(substr(md5('x' || shingle), 1, 8)) AS m4,
         min(substr(md5('x' || shingle), 9, 8)) AS m5,
         min(substr(md5('x' || shingle), 17, 8)) AS m6,
         min(substr(md5('x' || shingle), 25, 8)) AS m7
  FROM sh GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b.band, b.bk FROM agg,
  UNNEST([
    {'band': 0, 'bk': m0 || '|' || m1}, {'band': 1, 'bk': m2 || '|' || m3},
    {'band': 2, 'bk': m4 || '|' || m5}, {'band': 3, 'bk': m6 || '|' || m7}
  ]) AS u(b)
),
lsh_hit AS (
  SELECT DISTINCT nb.doc_id
  FROM bands nb
  JOIN bands cb ON nb.band = cb.band AND nb.bk = cb.bk
  WHERE nb.doc_id % 10 = 7 AND cb.doc_id % 10 <> 7
)
SELECT n.doc_id,
       CAST(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS exact_dup,
       CAST(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS near_dup
FROM newdocs n
LEFT JOIN exact_hit e ON n.doc_id = e.doc_id
LEFT JOIN lsh_hit l ON n.doc_id = l.doc_id
"""


@register("dedup_incremental", _INCR_ORACLE)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 10 == 7
    newdocs = docs.filter(is_new)
    corpus = docs.filter(~is_new)
    exact_hit = (
        newdocs.select("doc_id", F.md5("text").alias("h"))
        .join(corpus.select(F.md5("text").alias("h")).distinct(), "h", "left_semi")
        .select("doc_id")
    )
    # banded minhash index over both sides; probe = new-band ⋈ corpus-band
    sig = dedup.minhash_signatures(docs, "doc_id", "text", k=3, n_hashes=8)
    banded = (
        sig.withColumn("band", (F.substring("seed", 2, 2).cast("int") / 2).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                "|",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("seed", "mh"))), lambda s: s["mh"]
                ),
            ).alias("bk")
        )
    )
    nb = banded.filter(F.col("doc_id") % 10 == 7)
    cb = banded.filter(F.col("doc_id") % 10 != 7).select(
        "band", "bk"
    ).distinct()
    lsh_hit = nb.join(cb, ["band", "bk"], "left_semi").select("doc_id").distinct()
    return (
        newdocs.select("doc_id")
        .join(exact_hit.withColumn("exact_dup", F.lit(1)), "doc_id", "left")
        .join(lsh_hit.withColumn("near_dup", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("exact_dup", F.lit(0)).cast("int").alias("exact_dup"),
            F.coalesce("near_dup", F.lit(0)).cast("int").alias("near_dup"),
        )
    )


# ---------------------------------------------------------------------------
# LSH-bucketed embedding near-dup — the scale path for dedup_embedding_cosine
# (which stays the guarded broadcast baseline): candidates from shared
# hyperplane buckets, cosine verified per bucket, pair-deduped across
# tables. Approximate by construction (recall vs the exact kernel asserted
# in tests); fully deterministic, so the oracle replays it end to end.
# ---------------------------------------------------------------------------
def _near_dup_lsh_oracle(n_bits: int) -> str:
    # norm carries `label` here (the near-dup output labels pairs), so this
    # shares only the planes/sigs SHAPE with _lsh_oracle, not the string
    return f"""
WITH norm AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
planes AS (
  SELECT t, b,
         list_transform(range(0, 64), d ->
           CASE WHEN substr(md5('h' || t || ':' || b || ',' || d), 1, 1) >= '8'
                THEN 1.0 ELSE -1.0 END) AS w
  FROM (SELECT unnest(range(0, 12)) AS t), (SELECT unnest(range(0, {n_bits})) AS b)
),
sigs AS (
  SELECT n.vec_id, p.t AS tbl,
         CAST(sum(CASE WHEN list_dot_product(n.v, p.w) > 0
                       THEN 1 << ({n_bits - 1} - p.b) ELSE 0 END) AS BIGINT) AS sig
  FROM norm n, planes p
  GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM sigs a JOIN sigs b
    ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
       CAST(CASE WHEN na.label = nb.label THEN 1 ELSE 0 END AS BIGINT) AS same_label
FROM cand c
JOIN norm na ON c.vec_a = na.vec_id
JOIN norm nb ON c.vec_b = nb.vec_id
WHERE list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) > 0.4
"""


_NEAR_DUP_LSH_ORACLE = _near_dup_lsh_oracle(6)


@register("dedup_embedding_lsh", _NEAR_DUP_LSH_ORACLE)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_near_dup_lsh(
        emb, "vec_id", "embedding", "label", threshold=0.4, n_bits=6, n_tables=12
    )


@register("dedup_embedding_lsh_auto", _near_dup_lsh_oracle(4))
def dedup_embedding_lsh_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup at the density a 100 TB corpus runs: signature
    width from auto_lsh_bits (4 bits for every corpus ≤4096 vectors —
    including each gate corpus, so the 4-bit oracle replays bit-exactly).
    The pinned 6-bit twin stays as the oracle-stable baseline; its buckets
    grow linearly with the corpus (sf10 audit: 54.5 s / 31× for 100× data)
    where auto holds bucket population ~constant."""
    emb = load_table(spark, sf_dir, "embeddings")
    _assert_auto_density(emb, similarity.auto_lsh_bits, 4, "dedup_embedding_lsh_auto")
    return similarity.cosine_near_dup_lsh(
        emb, "vec_id", "embedding", "label", threshold=0.4, n_bits="auto", n_tables=12
    )


# ---------------------------------------------------------------------------
# Boilerplate removal WITH document reconstruction — the step after
# dedup_chunks: corpus-frequent chunks are dropped and each document is
# rebuilt from its surviving chunks in position order (the CCNet/C4-style
# clean-and-rebuild every training pipeline runs). Shapes: one explode, one
# corpus-wide chunk-frequency groupBy (uniform key), an anti join against
# the boilerplate set, and a per-doc ordered re-assembly (array_sort over
# (pos, chunk) structs — group size bounded by doc length, no unpartitioned
# window).
# ---------------------------------------------------------------------------
_BOILER_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
chunks AS (
  SELECT doc_id, c AS pos, array_to_string(t[(c * 8 + 1):(c * 8 + 8)], ' ') AS chunk
  FROM toks, UNNEST(range(0, CAST(ceil(len(t) / 8.0) AS BIGINT))) AS u(c)
),
boiler AS (SELECT chunk FROM chunks GROUP BY 1 HAVING count(*) > 1),
kept AS (SELECT * FROM chunks WHERE chunk NOT IN (SELECT chunk FROM boiler)),
reb AS (
  SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS clean_text,
         CAST(count(*) AS BIGINT) AS kept_chunks
  FROM kept GROUP BY 1
),
nc AS (
  SELECT doc_id,
         CAST(ceil(len(string_split(trim(text), ' ')) / 8.0) AS BIGINT) AS n_chunks
  FROM documents
)
SELECT nc.doc_id,
       coalesce(reb.clean_text, '') AS clean_text,
       coalesce(reb.kept_chunks, 0) AS kept_chunks,
       nc.n_chunks - coalesce(reb.kept_chunks, 0) AS dropped_chunks
FROM nc LEFT JOIN reb ON nc.doc_id = reb.doc_id
"""


@register("text_boilerplate_rebuild", _BOILER_ORACLE)
def text_boilerplate_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(8.0)).cast("long")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda c: F.concat_ws(" ", F.slice(toks, c * 8 + 1, 8)),
    )
    chunks = docs.select(
        "doc_id", F.posexplode(chunk_arr).alias("pos", "chunk")
    )
    boiler = (
        chunks.groupBy("chunk")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .select("chunk")
    )
    kept = chunks.join(boiler, "chunk", "left_anti")
    reb = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda x: x["chunk"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("kept_chunks"),
    )
    return (
        docs.select("doc_id", n_chunks.alias("n_chunks"))
        .join(reb, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("kept_chunks", F.lit(0)).alias("kept_chunks"),
            (F.col("n_chunks") - F.coalesce("kept_chunks", F.lit(0))).alias(
                "dropped_chunks"
            ),
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog registers — the bounded-memory DISTINCT sketch next to the
# Count-Min frequency sketch: 256 registers keyed by the first md5 byte,
# each holding max(rho) where rho = leading-zero count (+1) of the next
# 32 hash bits. approx_count_distinct would give an opaque engine-specific
# binary; building the registers from md5 arithmetic makes the whole
# sketch — including its estimation error — replayable in SQL. Output is
# integer-only (register, max_rho) per event_type, so no transcendental
# fp (ln/pow differ between libm and the JVM) touches the driver hash;
# the estimate is a trivial driver-side fold over the rows. At 100 TB the
# register table is |groups| x 256 rows — constant per group — versus an
# exact distinct's |groups| x |users| shuffle; registers merge with max()
# so partial aggregation applies.
# floor(log2(v)) is fp-safe cross-engine: the only integer boundaries are
# exact powers of two (log2 exact in ieee754), and the nearest other
# values miss the boundary by ~2^-31 >> 1 ulp at magnitude 31.
# ---------------------------------------------------------------------------
def _hex_val_sql(expr: str, start: int, n: int) -> str:
    digit = "(strpos('0123456789abcdef', substr({m}, {p}, 1)) - 1)"
    return (
        "("
        + " + ".join(
            f"{digit.format(m=expr, p=start + i)} * {16 ** (n - 1 - i)}"
            for i in range(n)
        )
        + ")"
    )


_HLL_ORACLE = f"""
WITH h AS (
  SELECT event_type,
         {_hex_val_sql("md5('hll:' || CAST(user_id AS VARCHAR))", 1, 2)} AS reg,
         {_hex_val_sql("md5('hll:' || CAST(user_id AS VARCHAR))", 3, 8)} AS v
  FROM events
)
SELECT event_type, CAST(reg AS INT) AS register,
       CAST(max(CASE WHEN v = 0 THEN 33
                     ELSE 32 - CAST(floor(log2(v)) AS INT) END) AS INT) AS max_rho
FROM h GROUP BY 1, 2
"""


@register("hll_registers", _HLL_ORACLE)
def hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.md5(F.concat(F.lit("hll:"), F.col("user_id").cast("string")))
    reg = F.conv(F.substring(m, 1, 2), 16, 10).cast("int")
    v = F.conv(F.substring(m, 3, 8), 16, 10).cast("long")
    rho = F.when(v == 0, F.lit(33)).otherwise(
        F.lit(32) - F.floor(F.log2(v)).cast("int")
    )
    return (
        ev.select("event_type", reg.alias("register"), rho.alias("rho"))
        .groupBy("event_type", "register")
        .agg(F.max("rho").cast("int").alias("max_rho"))
    )


# ---------------------------------------------------------------------------
# Count-Min sketch — the bounded-memory frequency sketch (heavy hitters at
# stream scale): depth 4 salted hash rows x width 4096 cells; an item's
# estimate is the MIN over its 4 cells, always >= the true count. Hashes are
# the first 3 hex digits of salted md5 (0..4095) so DuckDB reproduces the
# sketch bit-for-bit — estimation error included. The sketch is built from
# the per-user rollup (CMS is additive, so summing per-user counts into
# cells equals per-event increments at |users|x4 rows instead of
# |events|x4). Output: exact vs estimated counts for the deterministic
# top-20 (rank by count desc, user_id) — the driver hash checks the whole
# estimation surface.
# ---------------------------------------------------------------------------
def _cms_hash_sql(salt: int) -> str:
    s = f"md5('cms{salt}:' || CAST(user_id AS VARCHAR))"
    digit = "(strpos('0123456789abcdef', substr({m}, {p}, 1)) - 1)"
    return (
        f"({digit.format(m=s, p=1)} * 256 + {digit.format(m=s, p=2)} * 16 + "
        f"{digit.format(m=s, p=3)})"
    )


_CMS_ORACLE = f"""
WITH uc AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_ct FROM events GROUP BY 1
),
cells AS (
  {' UNION ALL '.join(
      f"SELECT {i} AS d, {_cms_hash_sql(i)} AS h, exact_ct, user_id FROM uc"
      for i in range(4)
  )}
),
sketch AS (
  SELECT d, h, CAST(sum(exact_ct) AS BIGINT) AS cell_ct FROM cells GROUP BY 1, 2
),
est AS (
  SELECT c.user_id, min(s.cell_ct) AS cms_est
  FROM cells c JOIN sketch s ON c.d = s.d AND c.h = s.h
  GROUP BY 1
),
top AS (
  SELECT user_id, exact_ct,
         row_number() OVER (ORDER BY exact_ct DESC, user_id) AS rn
  FROM uc
)
SELECT t.user_id, t.exact_ct, CAST(e.cms_est AS BIGINT) AS cms_est
FROM top t JOIN est e ON t.user_id = e.user_id
WHERE t.rn <= 20
"""


@register("cms_heavy_hitters", _CMS_ORACLE)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    uc = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_ct"))

    def h(salt: int):
        m = F.md5(F.concat(F.lit(f"cms{salt}:"), F.col("user_id").cast("string")))
        return F.conv(F.substring(m, 1, 3), 16, 10).cast("long")

    cells = None
    for i in range(4):
        lvl = uc.select(
            F.lit(i).alias("d"), h(i).alias("h"), "exact_ct", "user_id"
        )
        cells = lvl if cells is None else cells.unionByName(lvl)
    cells = cells.persist()  # sketch build + estimate probe reuse the cells
    sketch = cells.groupBy("d", "h").agg(F.sum("exact_ct").alias("cell_ct"))
    est = (
        cells.join(sketch, ["d", "h"])
        .groupBy("user_id")
        .agg(F.min("cell_ct").alias("cms_est"))
    )
    top = uc.withColumn(
        "rn",
        F.row_number().over(
            Window.orderBy(F.col("exact_ct").desc(), F.col("user_id"))
        ),
    ).filter(F.col("rn") <= 20)
    out = top.join(est, "user_id").select("user_id", "exact_ct", "cms_est")
    return unpersist_with(out, cells)


# ---------------------------------------------------------------------------
# int8 vector quantization — the storage-compression pass an embedding
# corpus gets before ANN serving (4x smaller, cache-resident codebooks).
# Min-max scalar quantization per vector; codes via floor (not round —
# floor of identical doubles is identical on every engine, round's
# half-way rule is not). Entirely array expressions inside codegen: no
# UDF, no shuffle — a pure projection that scales embarrassingly.
# Output: per-vector code statistics (the driver canonicalizer rejects
# array columns, and the stats pin every code: sum/min/max over 64 codes
# plus the exact scale).
# ---------------------------------------------------------------------------
_QUANT_ORACLE = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
m AS (
  SELECT vec_id, e, list_min(e) AS mn, list_max(e) AS mx FROM v
),
q AS (
  SELECT vec_id,
         CAST(len(e) AS BIGINT) AS n_dims,
         (mx - mn) / 255 AS scale,
         list_transform(e, x -> CAST(least(floor((x - mn) * 255 / (mx - mn)), 255) AS BIGINT)) AS codes
  FROM m
)
SELECT vec_id, n_dims, scale,
       CAST(list_sum(codes) AS BIGINT) AS q_sum,
       CAST(list_min(codes) AS BIGINT) AS q_min,
       CAST(list_max(codes) AS BIGINT) AS q_max
FROM q
"""


@register("embed_quantize", _QUANT_ORACLE)
def embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    d = emb.select("vec_id", v.alias("e"))
    mn, mx = F.array_min("e"), F.array_max("e")
    codes = F.transform(
        F.col("e"),
        lambda x: F.least(
            F.floor((x - mn) * 255 / (mx - mn)).cast("double"), F.lit(255.0)
        ).cast("long"),
    )
    return d.select(
        "vec_id",
        F.size("e").cast("long").alias("n_dims"),
        ((mx - mn) / 255).alias("scale"),
        F.aggregate(
            codes, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("q_sum"),
        F.array_min(codes).alias("q_min"),
        F.array_max(codes).alias("q_max"),
    )


# ---------------------------------------------------------------------------
# RAG-style document chunker — the ingestion op every retrieval corpus runs:
# fixed-size token windows (50) with stride 40 (10-token overlap), emitted
# per document. Pure array expressions (split → sequence → slice →
# concat_ws) inside whole-stage codegen: a projection + explode, NO
# shuffle — it scales embarrassingly and the chunk count per row is
# bounded by doc length / stride. Output carries the chunk fingerprint
# (md5) rather than the text so the driver hash stays compact; both
# engines clamp the final short window identically.
# ---------------------------------------------------------------------------
_CHUNK_W, _CHUNK_S = 50, 40

_CHUNKS_ORACLE = f"""
SELECT doc_id,
       CAST(s // {_CHUNK_S} AS INT) AS chunk_idx,
       md5(array_to_string(t[s + 1 : s + {_CHUNK_W}], ' ')) AS chunk_fp,
       CAST(least({_CHUNK_W}, len(t) - s) AS BIGINT) AS n_tokens
FROM (SELECT doc_id, string_split(trim(text), ' ') AS t
      FROM documents WHERE trim(text) <> ''),
     UNNEST(range(0, len(t), {_CHUNK_S})) AS u(s)
"""


@register("doc_chunks", _CHUNKS_ORACLE)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.trim("text") != "")
    t = F.split(F.trim(F.col("text")), " ")
    exploded = (
        docs.select("doc_id", t.alias("t"))
        .withColumn("n", F.size("t"))
        .select(
            "doc_id",
            "t",
            "n",
            F.explode(
                F.sequence(F.lit(0), F.col("n") - 1, F.lit(_CHUNK_S))
            ).alias("s"),
        )
    )
    return exploded.select(
        "doc_id",
        F.expr(f"CAST(s DIV {_CHUNK_S} AS INT)").alias("chunk_idx"),
        F.md5(F.concat_ws(" ", F.slice("t", F.col("s") + 1, _CHUNK_W))).alias("chunk_fp"),
        F.least(F.lit(_CHUNK_W), F.col("n") - F.col("s")).cast("long").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# N-gram collision decontamination — the GPT-3/Pile-style variant of the
# hash decontaminate entry: a corpus document is contaminated if it shares
# ANY 13-token shingle with the benchmark set (doc_id % 7 == 0 stands in
# for the eval suite — wide enough that real collisions exist in the
# synthetic corpus, so the oracle checks actual hits, not an empty set). One shuffle keyed on the shingle (semi-join against
# the benchmark's distinct shingles — the inverted-index shape again, so
# hot-shingle df-capping applies unchanged at 100 TB). Output: the
# contaminated doc ids with their distinct colliding-shingle counts — the
# audit trail a removal pass logs.
# ---------------------------------------------------------------------------
_DECON_NG_ORACLE = """
WITH sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, array_to_string(t[i:i+12], ' ') AS shingle
    FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
         UNNEST(range(1, greatest(len(t) - 12, 1) + 1)) AS u(i)
  )
)
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS hit_ct
FROM sh s
JOIN (SELECT DISTINCT shingle FROM sh WHERE doc_id % 7 = 0) b
  ON s.shingle = b.shingle
WHERE s.doc_id % 7 <> 0
GROUP BY 1
"""


@register("decontaminate_ngrams", _DECON_NG_ORACLE)
def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.shingle_set(docs, "doc_id", "text", k=13)
    bench = (
        sh.filter(F.col("doc_id") % 7 == 0).select("shingle").distinct()
    )
    return (
        sh.filter(F.col("doc_id") % 7 != 0)
        .join(bench, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("hit_ct"))
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training + application (extras/bpe.py — design + the
# cross-engine merge-semantics proof live there). Training cost is
# vocab-sized, not corpus-sized: pair stats over distinct words weighted by
# frequency, one 1-row argmax collect per merge (loop control). The corpus
# is touched once to count words and once to encode — the standard
# Sennrich-style scalable shape.
# ---------------------------------------------------------------------------
from gmall_spark.extras import bpe as _bpe

_BPE_MERGES = 8


@register("bpe_train", _bpe.train_oracle(_BPE_MERGES))
def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return _bpe.train_table(spark, docs, "text", _BPE_MERGES)


@register("bpe_encode", _bpe.encode_oracle(_BPE_MERGES))
def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return _bpe.encode_counts(docs, "doc_id", "text", _BPE_MERGES)


# ---------------------------------------------------------------------------
# Bigram-LM quality filtering (CCNet-style perplexity-filter shape) — the
# one float-ratio extras entry; safe because every step is IEEE-exact or
# order-pinned (see extras/text.py:bigram_lm_scores for the full argument:
# probabilities are single divisions of exact integers, the per-doc sum
# folds left-to-right in position order in BOTH engines).
# ---------------------------------------------------------------------------
_LM_SCORE_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS t
  FROM documents
),
pos AS (
  SELECT doc_id, i AS pos, t[i-1] AS prev, t[i] AS cur
  FROM toks, UNNEST(range(2, len(t) + 1)) AS u(i)
),
bct AS (SELECT prev, cur, count(*) AS bct FROM pos GROUP BY 1, 2),
uct AS (SELECT prev, count(*) AS uct FROM pos GROUP BY 1),
v AS (SELECT count(DISTINCT w) AS vocab FROM (SELECT unnest(t) AS w FROM toks)),
p AS (
  SELECT pos.doc_id, pos.pos,
         (b.bct + 1) / CAST(u.uct + v.vocab AS DOUBLE) AS p
  FROM pos JOIN bct b ON pos.prev = b.prev AND pos.cur = b.cur
  JOIN uct u ON pos.prev = u.prev
  CROSS JOIN v
),
agg AS (
  SELECT doc_id, count(*) AS n_bigrams,
         list_reduce(list_prepend(0.0, list(p ORDER BY pos)), (acc, x) -> acc + x) AS s
  FROM p GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       coalesce(a.s / a.n_bigrams, 0.0) AS lm_score,
       coalesce(a.s / a.n_bigrams, 0.0) >= 0.034 AS keep
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


@register("lm_score", _LM_SCORE_ORACLE)
def lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.bigram_lm_scores(docs, "doc_id", "text", keep_threshold=0.034)


# ---------------------------------------------------------------------------
# Naive-Bayes classifier filter — the MODEL-based quality gate (CCNet/GPT-3
# shape) next to lm_score's perplexity gate. A 20% split (doc_id % 5 = 0)
# trains multinomial token counts against a length-proxy label
# (n_chars >= 300 — stands in for "wiki-like" reference pages); the held-out
# 80% is scored by mean per-token posterior under equal priors. Laplace
# likelihoods are IEEE divisions of exact integer counts and the per-doc sum
# is an order-pinned fold, so the double output replays bit-identically in
# DuckDB (same discipline as _LM_SCORE_ORACLE, see nb_posterior_scores).
# ---------------------------------------------------------------------------
_NB_FILTER_ORACLE = """
WITH toks AS (
  SELECT doc_id, n_chars, list_filter(string_split(trim(text), ' '), x -> x <> '') AS t
  FROM documents
),
tok AS (
  SELECT doc_id, n_chars, i AS pos, t[i] AS w
  FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)
),
train AS (
  SELECT w,
         sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS ct_hi,
         sum(CASE WHEN n_chars >= 300 THEN 0 ELSE 1 END) AS ct_lo
  FROM tok WHERE doc_id % 5 = 0 GROUP BY 1
),
tot AS (
  SELECT sum(ct_hi) AS tok_hi, sum(ct_lo) AS tok_lo, count(*) AS vocab FROM train
),
ab AS (
  SELECT t.doc_id, t.pos,
         (coalesce(tr.ct_hi, 0) + 1) / CAST(tot.tok_hi + tot.vocab AS DOUBLE) AS a,
         (coalesce(tr.ct_lo, 0) + 1) / CAST(tot.tok_lo + tot.vocab AS DOUBLE) AS b
  FROM tok t LEFT JOIN train tr ON t.w = tr.w CROSS JOIN tot
  WHERE t.doc_id % 5 <> 0
),
p AS (SELECT doc_id, pos, a / (a + b) AS p FROM ab),
agg AS (
  SELECT doc_id, count(*) AS n_toks,
         list_reduce(list_prepend(0.0, list(p ORDER BY pos)), (acc, x) -> acc + x) AS s
  FROM p GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(a.n_toks, 0) AS BIGINT) AS n_toks,
       coalesce(a.s / a.n_toks, 0.0) AS nb_score,
       coalesce(a.s / a.n_toks, 0.0) >= 0.5 AS keep
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
WHERE d.doc_id % 5 <> 0
"""


@register("nb_quality_filter", _NB_FILTER_ORACLE)
def nb_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        (F.col("n_chars") >= 300).alias("hi"),
        (F.col("doc_id") % 5 == 0).alias("is_train"),
    )
    return text.nb_posterior_scores(
        docs, "doc_id", "text", label_col="hi", train_col="is_train"
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered n-gram decontamination — the scale path for the
# decontaminate_ngrams shape. The benchmark's 13-gram set is folded into a
# 65536-bit Bloom bitmap (k=3 md5-derived hashes); the build aggregates
# per-shingle bit positions with bit_or into AT MOST m/64 = 1024 rows —
# the only driver-side collect, bounded by the BITMAP size, never by data
# (at 100 TB you'd size m to a few GB and it still broadcasts). The corpus
# probe is then SHUFFLE-FREE: a broadcast 1-row mask + three codegen'd
# bit tests per shingle — no join against the benchmark set at all; only
# the tiny bloom-positive residue reaches the exact-verify join, which
# exists precisely to scrub the documented ~0.3% false-positive rate
# ((1-e^{-kn/m})^k). Output keeps both counts so the FP elimination is
# visible (bloom_hit_ct >= exact_hit_ct, equality iff no FP).
# Semantics note: a shingle is bloom-positive iff ALL THREE salted
# positions are set — expressed as count(DISTINCT salt) = 3 in the oracle
# so hash-collisions between salts count once, exactly like the boolean
# AND of the three mask tests on the Spark side.
# ---------------------------------------------------------------------------
_BLOOM_M = 65536  # bits; 1024 64-bit words


def _bloom_pos_sql(salt: int, m: str = "m") -> str:
    # 16-bit position = hex digits [4·salt+1 .. 4·salt+4] of ONE shared md5 —
    # k positions from one digest instead of k digests per shingle; the
    # slices are disjoint 16-bit views of the 128-bit digest, independent
    # enough for a Bloom membership test.
    digit = "(strpos('0123456789abcdef', substr({m}, {p}, 1)) - 1)"
    p0 = 4 * salt
    return (
        f"({digit.format(m=m, p=p0 + 1)} * 4096 + {digit.format(m=m, p=p0 + 2)} * 256 + "
        f"{digit.format(m=m, p=p0 + 3)} * 16 + {digit.format(m=m, p=p0 + 4)})"
    )


_DECON_BLOOM_ORACLE = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, array_to_string(t[i:i+12], ' ') AS shingle
    FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
         UNNEST(range(1, greatest(len(t) - 12, 1) + 1)) AS u(i)
  )
),
bench AS (
  SELECT shingle, md5('bloom:' || shingle) AS m
  FROM (SELECT DISTINCT shingle FROM sh WHERE doc_id % 7 = 0)
),
bbits AS (
  SELECT DISTINCT pos FROM (
    {' UNION ALL '.join(f"SELECT {_bloom_pos_sql(i)} AS pos FROM bench" for i in range(3))}
  )
),
pm AS (
  SELECT doc_id, shingle, md5('bloom:' || shingle) AS m
  FROM sh WHERE doc_id % 7 <> 0
),
probe AS (
  {' UNION ALL '.join(
    f"SELECT doc_id, shingle, {i} AS salt, {_bloom_pos_sql(i)} AS pos FROM pm"
    for i in range(3)
  )}
),
bloom_pos AS (
  SELECT doc_id, shingle FROM probe JOIN bbits USING (pos)
  GROUP BY 1, 2 HAVING count(DISTINCT salt) = 3
),
bloom_ct AS (SELECT doc_id, count(*) AS bloom_hit_ct FROM bloom_pos GROUP BY 1),
exact_ct AS (
  SELECT b.doc_id, count(*) AS exact_hit_ct
  FROM bloom_pos b JOIN bench USING (shingle) GROUP BY 1
)
SELECT b.doc_id,
       CAST(b.bloom_hit_ct AS BIGINT) AS bloom_hit_ct,
       CAST(coalesce(e.exact_hit_ct, 0) AS BIGINT) AS exact_hit_ct
FROM bloom_ct b LEFT JOIN exact_ct e ON b.doc_id = e.doc_id
"""


def _bloom_pos_col(salt: int, m="m"):
    # slice [4·salt+1, 4) of the shared digest — one md5 per shingle total,
    # not one per (shingle, salt); mirrors _bloom_pos_sql exactly.
    return F.conv(F.substring(F.col(m), 4 * salt + 1, 4), 16, 10).cast("long")


@register("decontaminate_bloom", _DECON_BLOOM_ORACLE)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_spark.session import unpersist_with

    docs = load_table(spark, sf_dir, "documents")
    # The shingle set feeds three consumers (bloom build, probe, exact
    # verify); persisted so the tokenize→explode→distinct pass runs once.
    sh = dedup.shingle_set(docs, "doc_id", "text", k=13).persist()
    bench = (
        sh.filter(F.col("doc_id") % 7 == 0)
        .select("shingle")
        .distinct()
        .withColumn("m", F.md5(F.concat(F.lit("bloom:"), F.col("shingle"))))
    )

    # build: benchmark shingles -> bit positions -> bit_or per 64-bit word.
    # The groupBy output is <= m/64 rows regardless of benchmark size; the
    # collect is bitmap-bounded loop control, not data movement.
    bits = None
    for i in range(3):
        b = bench.select(_bloom_pos_col(i).alias("pos"))
        bits = b if bits is None else bits.unionByName(b)
    words = (
        bits.withColumn("w", (F.col("pos") / 64).cast("int"))
        .withColumn("b", F.expr("shiftleft(bigint(1), int(pos % 64))"))
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("v"))
        .collect()
    )
    mask = [0] * (_BLOOM_M // 64)
    for r in words:
        mask[r["w"]] = r["v"]
    mask_df = spark.createDataFrame([(mask,)], "mask array<long>")

    # probe: broadcast the 1-row mask (allowlisted scalar pattern); three
    # codegen'd bit tests — no shuffle, no join on the probe path
    corpus = (
        sh.filter(F.col("doc_id") % 7 != 0)
        .withColumn("m", F.md5(F.concat(F.lit("bloom:"), F.col("shingle"))))
        .crossJoin(F.broadcast(mask_df))
    )
    for i in range(3):
        corpus = corpus.withColumn(f"pos{i}", _bloom_pos_col(i))

    def hit(salt: int):
        return F.expr(
            f"(shiftrightunsigned(element_at(mask, int(pos{salt} div 64) + 1), "
            f"int(pos{salt} % 64)) & 1) = 1"
        )

    bloom_pos = corpus.filter(hit(0) & hit(1) & hit(2)).select("doc_id", "shingle")
    bloom_ct = bloom_pos.groupBy("doc_id").agg(F.count(F.lit(1)).alias("bloom_hit_ct"))
    exact = (
        bloom_pos.join(bench.select("shingle"), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("exact_hit_ct"))
    )
    out = bloom_ct.join(exact, "doc_id", "left").select(
        "doc_id",
        F.col("bloom_hit_ct").cast("long"),
        F.coalesce("exact_hit_ct", F.lit(0)).cast("long").alias("exact_hit_ct"),
    )
    return unpersist_with(out, sh)


# ---------------------------------------------------------------------------
# Mixture sampling — the data-mixing step that reweights provenance before
# training: per-source sampling rates (temperature-style downsampling,
# rates 100/50/25% by source index mod 3 here), targets computed with
# integer arithmetic (floor(n_i * rate / 100)), membership decided by
# md5-rank within the source so the draw is uniform, reproducible, and
# engine-replayable. One window shuffle partitioned by source. Scale note:
# at 100 TB exact per-source counts need this rank; if ±0.1% wobble is
# acceptable, the shuffle-free variant thresholds the hash value itself
# (keep iff md5 < rate × 2^128 — a Bernoulli draw, pure filter), the same
# trade split_by_hash already demonstrates.
# ---------------------------------------------------------------------------
_SAMPLE_MIXTURE_ORACLE = """
WITH r AS (
  SELECT doc_id, source,
         CASE CAST(substr(source, 4) AS INT) % 3
           WHEN 0 THEN 100 WHEN 1 THEN 50 ELSE 25 END AS rate_pct,
         count(*) OVER (PARTITION BY source) AS n_src,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rnk
  FROM documents
)
SELECT doc_id, source, CAST(rnk AS BIGINT) AS rnk,
       CAST(n_src * rate_pct // 100 AS BIGINT) AS target_ct
FROM r
WHERE rnk <= n_src * rate_pct // 100
"""


@register("sample_mixture", _SAMPLE_MIXTURE_ORACLE)
def sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.substring("source", 4, 10).cast("int") % 3 == 0, 100)
        .when(F.substring("source", 4, 10).cast("int") % 3 == 1, 50)
        .otherwise(25)
    )
    w = Window.partitionBy("source")
    wr = w.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    r = docs.select(
        "doc_id",
        "source",
        rate.alias("rate_pct"),
        F.count(F.lit(1)).over(w).alias("n_src"),
        F.row_number().over(wr).alias("rnk"),
    )
    target = F.floor(F.col("n_src") * F.col("rate_pct") / 100).cast("long")
    return (
        r.filter(F.col("rnk") <= target)
        .select("doc_id", "source", F.col("rnk").cast("long"), target.alias("target_ct"))
    )


# ---------------------------------------------------------------------------
# Mergeable histogram quantiles — the sketch path for percentiles at scale.
# percentile_stats computes exact interpolated percentiles (a full sort per
# group); this entry builds a fixed-64-bin histogram instead: bin counts
# are plain integer partial aggregates (map-side combinable, one shuffle,
# mergeable across any partitioning — the property exact percentiles lack),
# and the quantile estimate interpolates within the covering bin. Bounds
# come from a first min/max pass (1-row broadcast scalar). All arithmetic
# is IEEE-exact (+,-,*,/ only), so the oracle hash-matches the estimates.
# Output keeps the exact percentile beside the estimate: the error the
# sketch trades for mergeability is auditable per group.
# ---------------------------------------------------------------------------
_HIST_QUANTILE_ORACLE = """
WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
binned AS (
  SELECT e.event_type,
         CAST(least(floor((e.value - b.lo) / (b.hi - b.lo) * 64), 63) AS INT) AS bin
  FROM events e CROSS JOIN b
),
hist AS (SELECT event_type, bin, count(*) AS ct FROM binned GROUP BY 1, 2),
cum AS (
  SELECT event_type, bin, ct,
         sum(ct) OVER (PARTITION BY event_type ORDER BY bin) AS cum_ct,
         sum(ct) OVER (PARTITION BY event_type) AS n
  FROM hist
),
est AS (
  SELECT event_type, n,
         min(CASE WHEN cum_ct * 2 >= n THEN bin END) AS bin50,
         min(CASE WHEN cum_ct * 20 >= n * 19 THEN bin END) AS bin95
  FROM cum GROUP BY 1, 2
)
SELECT e.event_type, CAST(e.n AS BIGINT) AS n,
       b.lo + (e.bin50 + 0.5) * (b.hi - b.lo) / 64 AS est_p50,
       b.lo + (e.bin95 + 0.5) * (b.hi - b.lo) / 64 AS est_p95,
       q.exact_p50, q.exact_p95
FROM est e CROSS JOIN b
JOIN (
  SELECT event_type, quantile_cont(value, 0.5) AS exact_p50,
         quantile_cont(value, 0.95) AS exact_p95
  FROM events GROUP BY 1
) q ON e.event_type = q.event_type
"""


@register("histogram_quantiles", _HIST_QUANTILE_ORACLE)
def histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        "lo",
        "hi",
        F.least(
            F.floor((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 64),
            F.lit(63),
        )
        .cast("int")
        .alias("bin"),
    )
    hist = binned.groupBy("event_type", "bin").agg(F.count(F.lit(1)).alias("ct"))
    from pyspark.sql import Window

    wcum = Window.partitionBy("event_type").orderBy("bin")
    wall = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "bin",
        F.sum("ct").over(wcum).alias("cum_ct"),
        F.sum("ct").over(wall).alias("n"),
    )
    est = cum.groupBy("event_type", "n").agg(
        F.min(F.when(F.col("cum_ct") * 2 >= F.col("n"), F.col("bin"))).alias("bin50"),
        F.min(F.when(F.col("cum_ct") * 20 >= F.col("n") * 19, F.col("bin"))).alias(
            "bin95"
        ),
    )
    exact = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
        F.expr("percentile(value, 0.95)").alias("exact_p95"),
    )
    return (
        est.crossJoin(F.broadcast(b))
        .join(exact, "event_type")
        .select(
            "event_type",
            F.col("n").cast("long"),
            (F.col("lo") + (F.col("bin50") + 0.5) * (F.col("hi") - F.col("lo")) / 64).alias("est_p50"),
            (F.col("lo") + (F.col("bin95") + 0.5) * (F.col("hi") - F.col("lo")) / 64).alias("est_p95"),
            "exact_p50",
            "exact_p95",
        )
    )


# ---------------------------------------------------------------------------
# Embedding pooling — chunk/token embeddings → one pooled vector per label
# (the doc-level-embedding step between chunk encoding and ANN indexing).
# Float parity by order-pinning: vectors fold left-to-right in vec_id order
# (F.aggregate + zip_with here, list_reduce over list(... ORDER BY vec_id)
# in the oracle), then per-dim means and the L1 report fold in dimension
# order — double addition never sees two different orders. The pinned fold
# forfeits map-side combining (same documented trade as lm_score); the
# tolerance-checked production variant would tree-aggregate. Output is the
# hashable summary (driver canonicalizer rejects array cells): n, first/
# last dim means, L1 mass of the pooled vector.
# ---------------------------------------------------------------------------
_EMBED_POOL_ORACLE = """
WITH v AS (
  SELECT label, vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
pooled AS (
  SELECT label, count(*) AS n_vecs,
         list_reduce(
           list_prepend(list_transform(range(0, 64), x -> CAST(0.0 AS DOUBLE)),
                        list(e ORDER BY vec_id)),
           (acc, x) -> list_transform(range(1, 65), i -> acc[i] + x[i])
         ) AS s
  FROM v GROUP BY 1
)
SELECT CAST(label AS INT) AS label, CAST(n_vecs AS BIGINT) AS n_vecs,
       s[1] / n_vecs AS mean_d0,
       s[64] / n_vecs AS mean_d63,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(s, x -> x / n_vecs)),
                   (acc, x) -> acc + CASE WHEN x < 0 THEN -x ELSE x END) AS l1_mass
FROM pooled
"""


@register("embed_pool", _EMBED_POOL_ORACLE)
def embed_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "label",
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    zero = F.expr("transform(sequence(0, 63), x -> double(0.0))")
    pooled = v.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("vec_id", "e"))), lambda x: x["e"]
            ),
            zero,
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        ).alias("s"),
    )
    mean = F.transform("s", lambda x: x / F.col("n_vecs"))
    return pooled.select(
        F.col("label").cast("int"),
        F.col("n_vecs").cast("long"),
        (F.element_at("s", 1) / F.col("n_vecs")).alias("mean_d0"),
        (F.element_at("s", 64) / F.col("n_vecs")).alias("mean_d63"),
        F.aggregate(
            mean,
            F.lit(0.0),
            lambda acc, x: acc + F.when(x < 0, -x).otherwise(x),
        ).alias("l1_mass"),
    )


# ---------------------------------------------------------------------------
# ANN recall audit — the retrieval-quality scorecard as a first-class
# entry: join the LSH path's top-5 against exact kNN's top-5 per query and
# output the recall histogram (hit count -> how many queries). The audit
# the tests run (test_ann_quality) made queryable, and fully oracle-
# replayable because BOTH pipelines already replay in SQL — their oracle
# texts compose as CTEs.
#
# Audited over a DETERMINISTIC 1/8 QUERY SAMPLE (vec_id % 8 = 0) — the
# 100 TB posture stated since r3 ("at 100 TB you audit a SAMPLE"), now
# actually implemented: the exact side's |Q|·|I| matmul and the LSH bucket
# kernels' query rows shrink 8×, the INDEX/candidate sides stay the full
# corpus, so every sampled query's top-5 is bit-identical to its row in a
# full audit (per-query independence; similarity.brute_force_knn/lsh_ann
# query_filter docstrings). The recall STATEMENT is unchanged in
# expectation — same estimator over 1/8 of i.i.d. queries. The oracle
# computes both full pipelines and filters the same ids, so the gate
# replays the sample exactly. Before sampling this entry + text_embed_knn
# + hard_negatives were ~26% of the sf10 audit wall (r7 verdict task 6).
# _AUDIT_SAMPLE_MOD is defined at module top (shared with text_embed_knn).
# ---------------------------------------------------------------------------

_ANN_RECALL_ORACLE = f"""
WITH ann AS ({_LSH_ORACLE}),
ex AS ({_KNN_ORACLE}),
hits AS (
  SELECT e.vec_id, count(a.neighbor_id) AS hit_ct
  FROM ex e LEFT JOIN ann a
    ON e.vec_id = a.vec_id AND e.neighbor_id = a.neighbor_id
  WHERE e.vec_id % {_AUDIT_SAMPLE_MOD} = 0
  GROUP BY 1
)
SELECT CAST(hit_ct AS BIGINT) AS recall_at_5, CAST(count(*) AS BIGINT) AS n_queries
FROM hits GROUP BY 1
"""


@register("ann_recall_audit", _ANN_RECALL_ORACLE)
def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    sample = F.col("vec_id") % _AUDIT_SAMPLE_MOD == 0
    ex = similarity.brute_force_knn(
        emb, "vec_id", "embedding", k=5, query_filter=sample
    ).select("vec_id", "neighbor_id")
    ann = similarity.lsh_ann(
        emb, "vec_id", "embedding", n_bits=6, n_tables=12, k=5, query_filter=sample
    ).select("vec_id", F.col("neighbor_id").alias("ann_neighbor"))
    hits = (
        ex.join(
            ann,
            (ex.vec_id == ann.vec_id) & (ex.neighbor_id == ann.ann_neighbor),
            "left",
        )
        .groupBy(ex.vec_id)
        .agg(F.count("ann_neighbor").alias("hit_ct"))
    )
    return hits.groupBy(F.col("hit_ct").cast("long").alias("recall_at_5")).agg(
        F.count(F.lit(1)).alias("n_queries")
    )


# ---------------------------------------------------------------------------
# BM25 top-k retrieval — the IR scoring every retrieval-augmented pipeline
# runs over its corpus. Query terms are data-derived (top-8 df tokens outside
# the stopword list), so the entry is self-contained and deterministic.
#
# Engine parity without float folds: within a single query term, BM25
# ordering is monotone in tf/(tf + k1·(1 − b + b·dl/avgdl)) (the idf factor is
# constant per term), and with k1=1.2, b=0.75, avgdl=L/N that ratio ordered
# as num/den with num = 10·tf·L and den = 10·tf·L + 3·L + 9·dl·N — all exact
# int64 (≈5e15 at 100 TB corpus sizes, within range). One IEEE double
# division of identical integers is correctly rounded in both engines, so
# the rank key is bit-identical; output carries ids/integers only.
#
# Scale: tf/dl/df are partial-agg shuffles on token/doc; the 8-term query
# table and the 1-row corpus scalars broadcast; ranking windows over
# per-term posting slices (|docs containing term|, not the corpus).
# ---------------------------------------------------------------------------
_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, token
  FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents)
  WHERE token <> ''
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
scal AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_len FROM dl),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
terms AS (
  SELECT token, df FROM dfreq
  WHERE token NOT IN ({_SW_LIST})
  ORDER BY df DESC, token LIMIT 8
),
scored AS (
  SELECT t.token AS term, f.doc_id, f.tf, t.df,
         CAST(10 * f.tf * s.total_len AS DOUBLE)
           / (10 * f.tf * s.total_len + 3 * s.total_len + 9 * d.dl * s.n_docs) AS key
  FROM terms t
  JOIN tf f ON f.token = t.token
  JOIN dl d ON f.doc_id = d.doc_id, scal s
)
SELECT term, doc_id, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY term ORDER BY key DESC, doc_id) AS rnk
  FROM scored
) WHERE rnk <= 10
"""


@register("bm25_topk", _BM25_ORACLE)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents per query term under BM25 (k1=1.2, b=0.75)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.explode(F.split(F.trim("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        # tf, dl and df all re-read the exploded tokens — one materialization
        .persist()
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    scal = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    terms = (
        dfreq.filter(~F.col("token").isin(*_STOPWORDS))
        .orderBy(F.col("df").desc(), F.col("token"))
        .limit(8)
    )
    num = 10 * F.col("tf") * F.col("total_len")
    den = num + 3 * F.col("total_len") + 9 * F.col("dl") * F.col("n_docs")
    scored = (
        tf.join(F.broadcast(terms), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scal))
        .select(
            F.col("token").alias("term"),
            "doc_id",
            "tf",
            "df",
            (num.cast("double") / den).alias("key"),
        )
    )
    w = Window.partitionBy("term").orderBy(F.col("key").desc(), F.col("doc_id"))
    out = (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 10)
        .select("term", "doc_id", F.col("tf").cast("long"), F.col("df").cast("long"), "rnk")
    )
    return unpersist_with(out, toks)


# ---------------------------------------------------------------------------
# Edit-distance near-dup — the entity-resolution / fuzzy-dedup shape for
# short text (titles, product names; reference dim tables dedup on exact
# keys, this is the fuzzy generalization). Levenshtein is O(|a|·|b|) per
# pair, so the scale story is entirely in candidate pruning. Blocking key:
# (first token, second token, floor(n_chars/17) length bucket) as the
# EQUI-join key — the probe side emits its own bucket ±1 so every pair
# within the ±16-char residual lands in exactly one equi-partition, never
# a residual-only filter over a coarse block. Rationale, measured on this
# corpus at sf10 (500k docs):
#   - first-token-only blocking degenerates: the token vocabulary is fixed,
#     so block populations grow linearly and the pair space quadratically —
#     1.11e9 raw pairs at sf10 (the round-6 audit's 430×-for-100× row);
#   - a sorted-token prefix (the textbook alternative) is WORSE here: the
#     lexicographically-smallest tokens are heavily skewed (numerals),
#     1.5e9 pairs — sorted prefixes only help when small tokens are rare;
#   - (tok1, tok2, len-bucket) yields ~4e5 candidate pairs at sf10 while
#     keeping 256/256 of the true near-dup pairs (dist ≤ 24 implies the
#     leading tokens survive unless the edits target them — the standard
#     blocking-key recall tradeoff, declared in the operator contract).
# The verify uses Spark's threshold-bounded levenshtein (banded DP, early
# exit) rather than the full matrix. Output is integer distances — exact in
# both engines; the oracle replays the identical blocking.
# ---------------------------------------------------------------------------
_LEV_ORACLE = """
WITH d AS (
  SELECT doc_id, text, n_chars, n_chars // 17 AS bkt,
         string_split(trim(text), ' ') AS t
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
FROM d a JOIN d b
  ON a.t[1] = b.t[1] AND a.t[2] = b.t[2] AND a.doc_id < b.doc_id
 AND b.bkt BETWEEN a.bkt - 1 AND a.bkt + 1
WHERE abs(a.n_chars - b.n_chars) <= 16
  AND levenshtein(a.text, b.text) <= 24
"""


@register("dedup_levenshtein", _LEV_ORACLE)
def dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs (doc_a < doc_b, edit distance ≤ 24), candidates
    blocked on (first token, second token, length bucket ±1)."""
    from gmall_spark.session import spread_to_parallelism

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), " ")
    # F.get (not []): ANSI mode throws INVALID_ARRAY_INDEX on a single-token
    # doc; get() yields NULL, and a NULL equi-key matches nothing — the same
    # out-of-bounds-is-NULL semantics DuckDB's list indexing gives the oracle
    d = docs.select(
        "doc_id",
        "text",
        "n_chars",
        F.get(toks, 0).alias("blk"),
        F.get(toks, 1).alias("blk2"),
        F.floor(F.col("n_chars") / 17).cast("int").alias("bkt"),
    )
    # the per-pair DP is the expensive part and runs at the JOIN's
    # parallelism — rebalance the probe side so a 2-row-group scan doesn't
    # funnel every levenshtein through two tasks. The build side triples
    # into (bkt-1, bkt, bkt+1) probe rows so the length bucket sits in the
    # equi key (one shuffle partition per (blk, blk2, bkt) cell) instead of
    # being a post-join residual over a coarser block.
    a = spread_to_parallelism(d).withColumn("probe_bkt", F.col("bkt")).alias("a")
    b = d.withColumn(
        "probe_bkt", F.explode(F.array(F.col("bkt") - 1, F.col("bkt"), F.col("bkt") + 1))
    ).alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.blk2") == F.col("b.blk2"))
        & (F.col("a.probe_bkt") == F.col("b.probe_bkt"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= 16),
    )
    # threshold form = banded DP with early exit; -1 marks "beyond threshold"
    dist = F.levenshtein(F.col("a.text"), F.col("b.text"), 24)
    return (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.cast("long").alias("dist"),
        )
        .filter(F.col("dist") >= 0)
    )


# ---------------------------------------------------------------------------
# Semantic dedup (the SemDeDup shape, Abbas et al. 2023): k-means-partition
# the embedding space, then prune within cells only — a point is a duplicate
# iff some lower-id point in ITS OWN cell has cosine > τ. This is the
# practical 100 TB semantic-dedup recipe: the quantizer bounds the pair
# space to Σ|cell|² (cells are capacity-bounded in practice), all-pairs
# cosine never materializes globally, and each cell verifies with one BLAS
# matmul inside an Arrow kernel. Same deterministic quantizer as the IVF
# index (seed = lowest ids, 2 fsum-merged Lloyd rounds) so the oracle
# replays the full pipeline; threshold membership is fp-robust (sims of
# distinct random embeddings sit far from τ relative to summation noise).
# ---------------------------------------------------------------------------
_SEMANTIC_ORACLE = f"""
WITH norm AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
seed AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, v AS c
  FROM (SELECT vec_id, v FROM norm ORDER BY vec_id LIMIT 16)
),
{_ivf_assign("seed", "assign1")},
{_ivf_means("assign1", "seed", "cent1")},
{_ivf_assign("cent1", "assign2")},
{_ivf_means("assign2", "cent1", "cent2")},
{_ivf_assign("cent2", "assign3")},
wn AS (
  SELECT a.vec_id, a.cell, a.v, n.nrm
  FROM assign3 a JOIN norm n ON a.vec_id = n.vec_id
)
SELECT a.vec_id, CAST(a.cell AS INT) AS cell,
       CAST(max(CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS is_dup
FROM wn a LEFT JOIN wn b
  ON b.cell = a.cell AND b.vec_id < a.vec_id
 AND list_dot_product(a.v, b.v) / (a.nrm * b.nrm) > 0.4
GROUP BY 1, 2
"""


@register("semantic_dedup", _SEMANTIC_ORACLE)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cell, is_dup): within-k-means-cell cosine pruning at τ=0.4,
    keeping the lowest-id representative of every semantic neighborhood."""
    return _semantic_dedup_impl(spark, sf_dir, n_clusters=16)


def _semantic_dedup_impl(spark: SparkSession, sf_dir: str, n_clusters) -> DataFrame:
    import numpy as np
    import pandas as pd

    # the pinned small-corpus density carries the same degenerate-bucket
    # guard as ivf_ann: a |cell|² float64 similarity matrix past ~8k rows is
    # a ≥0.5 GB slab per kernel and quadratic work — fail loud toward the
    # auto-density twin instead of grinding (or OOMing) silently
    cap, cap_msg = similarity._pinned_pop_cap(
        n_clusters, "semantic_dedup", 'n_clusters="auto" (semantic_dedup_auto)'
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cells = similarity.ivf_index(emb, "vec_id", "embedding", n_clusters=n_clusters)
    # one shuffle co-locates each cell; the kernel is a |cell|² BLAS matmul —
    # bounded by the quantizer's cell granularity, never corpus²
    joined = emb.select("vec_id", "embedding").join(cells, "vec_id")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if cap is not None and len(pdf) > cap:
            raise ValueError(cap_msg)
        X = np.stack(pdf["embedding"].to_numpy()).astype("float64")
        ids = pdf["vec_id"].to_numpy()
        nrm = np.sqrt((X * X).sum(axis=1))
        S = (X @ X.T) / (nrm[:, None] * nrm[None, :])
        dup = ((S > 0.4) & (ids[None, :] < ids[:, None])).any(axis=1)
        return pd.DataFrame(
            {"vec_id": ids, "cell": pdf["cell"].to_numpy(), "is_dup": dup.astype("int64")}
        )

    return joined.groupBy("cell").applyInPandas(kernel, "vec_id long, cell int, is_dup long")


@register("semantic_dedup_auto", _SEMANTIC_ORACLE)
def semantic_dedup_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SemDeDup scale DEFAULT under the correctness gate: quantizer
    density follows the corpus (auto_ivf_cells — one cell per ~1024
    vectors, floor 16), so cell populations — and with them the |cell|²
    verify kernels — stay ~constant as the corpus grows. At the oracle
    corpus (≤16 Ki vectors) auto resolves to exactly the pinned entry's 16
    cells, so the SAME bit-exact oracle replays it; at probe scales the
    pinned twin's cells grow linearly (31k rows/cell at sf10 ⇒ 7.7 GB
    similarity slabs, quadratic work — r7 audit measured it 34× for 100×
    data and it now fails loud past MAX_PINNED_BUCKET_POP) while this
    entry holds per-cell work flat. Note the SemDeDup contract: cell
    granularity is PART of the dedup definition (coarser cells admit more
    within-cell pairs), so auto density is a declared semantics level,
    not a lossless rewrite — same as embed_ann_ivf_auto."""
    _assert_auto_density(
        load_table(spark, sf_dir, "embeddings"),
        similarity.auto_ivf_cells,
        16,
        "semantic_dedup_auto",
    )
    return _semantic_dedup_impl(spark, sf_dir, n_clusters="auto")


# ---------------------------------------------------------------------------
# Cluster-quality scorecard — per-cell label composition of the k-means
# partition (the "is my clustering meaningful / is my corpus mix balanced"
# audit next to ann_recall_audit's recall scorecard). Pure integer outputs:
# cell size, majority-label count, distinct labels. Two tiny shuffles beyond
# the assignment pass — (cell,label) partial counts, then a k-row rollup.
# ---------------------------------------------------------------------------
_PURITY_ORACLE = f"""
WITH norm AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
seed AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, v AS c
  FROM (SELECT vec_id, v FROM norm ORDER BY vec_id LIMIT 16)
),
{_ivf_assign("seed", "assign1")},
{_ivf_means("assign1", "seed", "cent1")},
{_ivf_assign("cent1", "assign2")},
{_ivf_means("assign2", "cent1", "cent2")},
{_ivf_assign("cent2", "assign3")},
cl AS (
  SELECT a.cell, e.label, count(*) AS ct
  FROM assign3 a JOIN embeddings e ON a.vec_id = e.vec_id
  GROUP BY 1, 2
)
SELECT CAST(cell AS INT) AS cell,
       CAST(sum(ct) AS BIGINT) AS cell_size,
       CAST(max(ct) AS BIGINT) AS majority_ct,
       CAST(count(*) AS BIGINT) AS n_labels
FROM cl GROUP BY 1
"""


@register("cluster_purity", _PURITY_ORACLE)
def cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cells = similarity.ivf_index(emb, "vec_id", "embedding", n_clusters=16)
    cl = (
        cells.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("cell", "label")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    return cl.groupBy("cell").agg(
        F.sum("ct").cast("long").alias("cell_size"),
        F.max("ct").cast("long").alias("majority_ct"),
        F.count(F.lit(1)).cast("long").alias("n_labels"),
    )


# ---------------------------------------------------------------------------
# Hard-negative mining — the contrastive-training data op: each anchor's
# top-3 highest-cosine OTHER-label vectors. Same guarded broadcast+BLAS
# kernel family as embed_knn, label exclusion as a per-row -inf mask (the
# pair space still never materializes). The n² oracle is the spec; the
# kernel is the scale shape.
# ---------------------------------------------------------------------------
_HARDNEG_ORACLE = """
WITH n AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
)
SELECT vec_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY list_dot_product(a.v, b.v) / (a.nrm * b.nrm) DESC,
                                     b.vec_id) AS rnk
  FROM n a JOIN n b ON a.label <> b.label
) WHERE rnk <= 3
"""


@register("hard_negatives", _HARDNEG_ORACLE)
def hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.hard_negative_knn(emb, "vec_id", "embedding", "label", k=3)


# ---------------------------------------------------------------------------
# Per-source characteristic terms — domain-signature analysis of the corpus
# mix: for each provenance source, the top-5 tokens most overrepresented vs
# the whole corpus by lift = (tf_src / src_total) / (tf_all / corpus_total).
# Within a source the ordering reduces to tf_src/tf_all (the totals are
# per-source/global constants), so the rank key is one IEEE division of
# exact integers — engine-identical, same trick as bm25_topk/copurchase.
# Token floor (tf_all ≥ 10) keeps one-off typos from topping every list.
# ---------------------------------------------------------------------------
_SOURCE_LIFT_ORACLE = """
WITH toks AS (
  SELECT source, token
  FROM (SELECT source, unnest(string_split(trim(text), ' ')) AS token FROM documents)
  WHERE token <> ''
),
tf_src AS (SELECT source, token, count(*) AS tf FROM toks GROUP BY 1, 2),
tf_all AS (SELECT token, count(*) AS tf_all FROM toks GROUP BY 1)
SELECT source, token, CAST(tf AS BIGINT) AS tf, CAST(tf_all AS BIGINT) AS tf_all,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT s.source, s.token, s.tf, a.tf_all,
         row_number() OVER (PARTITION BY s.source
                            ORDER BY CAST(s.tf AS DOUBLE) / a.tf_all DESC, s.token) AS rnk
  FROM tf_src s JOIN tf_all a ON s.token = a.token
  WHERE a.tf_all >= 10
) WHERE rnk <= 5
"""


@register("source_term_lift", _SOURCE_LIFT_ORACLE)
def source_term_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("source", F.explode(F.split(F.trim("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .persist()
    )
    tf_src = toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("tf"))
    tf_all = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tf_all"))
    w = Window.partitionBy("source").orderBy(
        (F.col("tf").cast("double") / F.col("tf_all")).desc(), F.col("token")
    )
    out = (
        tf_src.join(tf_all.filter(F.col("tf_all") >= 10), "token")
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("source", "token", F.col("tf").cast("long"), F.col("tf_all").cast("long"), "rnk")
    )
    return unpersist_with(out, toks)


# ---------------------------------------------------------------------------
# Deterministic global training shuffle + sharding — the "shuffle the corpus
# once before tokenizing" step every pre-training pipeline runs. Shard
# assignment is pure hash (embarrassingly parallel, no global sort); the
# within-shard order is a rank over the hash key, one window task per shard.
# Scale: shard count IS the output-file count, so sizing shards to ~file
# size (thousands of shards at 100 TB) keeps each rank window executor-sized;
# a row's (shard, position) never depends on partitioning or RNG state, so
# the layout is reproducible and resumable.
# ---------------------------------------------------------------------------
_SHUF_SEED = "shuf42:"
_SHUF_SHARDS = 8

_TRAIN_SHUFFLE_ORACLE = f"""
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id) AS BIGINT)
         AS pos_in_shard
FROM (
  SELECT doc_id, md5(concat('{_SHUF_SEED}', CAST(doc_id AS VARCHAR))) AS k,
         CAST((strpos('0123456789abcdef', substr(md5(concat('{_SHUF_SEED}', CAST(doc_id AS VARCHAR))), 1, 1)) - 1)
              % {_SHUF_SHARDS} AS BIGINT) AS shard
  FROM documents
)
"""


@register("training_shuffle", _TRAIN_SHUFFLE_ORACLE)
def training_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    k = F.md5(F.concat(F.lit(_SHUF_SEED), F.col("doc_id").cast("string")))
    shard = (F.conv(F.substring(k, 1, 1), 16, 10).cast("long") % _SHUF_SHARDS).alias(
        "shard"
    )
    w = Window.partitionBy("shard").orderBy("k", "doc_id")
    return (
        docs.select("doc_id", k.alias("k"), shard)
        .withColumn("pos_in_shard", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos_in_shard")
    )


# ---------------------------------------------------------------------------
# PII risk audit — per-source counts of documents and matches for the three
# canonical detector regexes (email, IPv4-shaped, phone-shaped). Pure column
# expressions (regexp_count) — no UDF, no shuffle beyond the final
# per-source rollup; the patterns avoid every construct RE2 and java.util
# .regex disagree on (no backrefs, no lookaround), so the oracle is exact.
# At 100 TB this is a single scan + partial agg; the same projection feeds
# the scrubber (text_scrub) when redaction rather than measurement is wanted.
# ---------------------------------------------------------------------------
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IPV4 = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
_PII_PHONE = "\\+?[0-9][0-9 -]{7,}[0-9]"

_PII_ORACLE = f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN e > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
       CAST(sum(e) AS BIGINT) AS email_hits,
       CAST(sum(CASE WHEN i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_ip,
       CAST(sum(i) AS BIGINT) AS ip_hits,
       CAST(sum(CASE WHEN p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone,
       CAST(sum(p) AS BIGINT) AS phone_hits
FROM (
  SELECT source,
         len(regexp_extract_all(text, '{_PII_EMAIL}')) AS e,
         len(regexp_extract_all(text, '{_PII_IPV4}')) AS i,
         len(regexp_extract_all(text, '{_PII_PHONE}')) AS p
  FROM documents
)
GROUP BY 1
"""


@register("pii_audit", _PII_ORACLE)
def pii_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    e = F.regexp_count("text", F.lit(_PII_EMAIL))
    i = F.regexp_count("text", F.lit(_PII_IPV4))
    p = F.regexp_count("text", F.lit(_PII_PHONE))
    hits = docs.select("source", e.alias("e"), i.alias("i"), p.alias("p"))
    return hits.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("e") > 0).cast("int")).cast("long").alias("docs_with_email"),
        F.sum("e").cast("long").alias("email_hits"),
        F.sum((F.col("i") > 0).cast("int")).cast("long").alias("docs_with_ip"),
        F.sum("i").cast("long").alias("ip_hits"),
        F.sum((F.col("p") > 0).cast("int")).cast("long").alias("docs_with_phone"),
        F.sum("p").cast("long").alias("phone_hits"),
    )


# ---------------------------------------------------------------------------
# Inter-document duplicate-n-gram fraction — the RefinedWeb/Gopher-style
# corpus health metric: what share of each document's distinct 13-grams
# also appears in at least one OTHER document, rolled up per source as an
# integer rational (sum_dup, sum_total). Same inverted-index shape as the
# n-gram decontaminator: one shuffle on the shingle, document frequencies
# joined back, per-doc then per-source partial aggs. Hot boilerplate
# shingles are bounded by the same df-cap argument as dedup_ngram_jaccard.
# ---------------------------------------------------------------------------
_DUP_NGRAM_ORACLE = """
WITH sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, array_to_string(t[i:i+12], ' ') AS shingle
    FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
         UNNEST(range(1, greatest(len(t) - 12, 1) + 1)) AS u(i)
  )
),
df AS (SELECT shingle, count(*) AS doc_ct FROM sh GROUP BY 1),
per_doc AS (
  SELECT s.doc_id,
         count(*) AS total_ngrams,
         sum(CASE WHEN df.doc_ct > 1 THEN 1 ELSE 0 END) AS dup_ngrams
  FROM sh s JOIN df ON s.shingle = df.shingle
  GROUP BY 1
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(p.dup_ngrams) AS BIGINT) AS dup_ngrams,
       CAST(sum(p.total_ngrams) AS BIGINT) AS total_ngrams
FROM per_doc p JOIN documents d ON p.doc_id = d.doc_id
GROUP BY 1
"""


@register("dup_ngram_fraction", _DUP_NGRAM_ORACLE)
def dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.shingle_set(docs, "doc_id", "text", k=13)
    df_ct = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("doc_ct"))
    per_doc = (
        sh.join(df_ct, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("total_ngrams"),
            F.sum((F.col("doc_ct") > 1).cast("int")).alias("dup_ngrams"),
        )
    )
    return (
        per_doc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("dup_ngrams").cast("long").alias("dup_ngrams"),
            F.sum("total_ngrams").cast("long").alias("total_ngrams"),
        )
    )


# ---------------------------------------------------------------------------
# Tokenizer-vocab coverage / OOV rate — after building a top-N vocabulary,
# what fraction of each source's token stream falls outside it. The vocab
# is count-desc/token-asc top-500 (deterministic at the boundary) and is
# BROADCAST into the coverage join — at 100 TB the token stream never
# shuffles for the lookup; only the two count rollups shuffle.
# ---------------------------------------------------------------------------
_VOCAB_COVERAGE_ORACLE = """
WITH toks AS (
  SELECT source, unnest(list_filter(string_split(trim(text), ' '), x -> x <> ''))
           AS token
  FROM documents
),
vocab AS (
  SELECT token FROM (
    SELECT token, row_number() OVER (ORDER BY count(*) DESC, token) AS rnk
    FROM toks GROUP BY token
  ) WHERE rnk <= 500
)
SELECT t.source,
       CAST(count(*) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens
FROM toks t LEFT JOIN vocab v ON t.token = v.token
GROUP BY 1
"""


@register("vocab_coverage", _VOCAB_COVERAGE_ORACLE)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("source", F.explode(F.split(F.trim("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .persist()
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), "token")
        .limit(500)
        .select("token", F.lit(True).alias("in_vocab"))
    )
    out = (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_tokens"),
            F.sum(F.col("in_vocab").isNull().cast("int")).cast("long").alias("oov_tokens"),
        )
    )
    return unpersist_with(out, toks)


# ---------------------------------------------------------------------------
# Embedding norm audit — the sanity gate before any ANN/clustering run:
# per label, how many vectors, the min/max squared L2 norm, and how many
# fall below unit norm. The squared norm is an order-pinned left fold over
# the vector (Spark F.aggregate == DuckDB list_reduce, identical fp ops →
# bit-identical doubles); min/max across rows are selections, never sums,
# so no cross-row float accumulation leaks into the output. One narrow
# projection + one partial-agg shuffle on label.
# ---------------------------------------------------------------------------
_NORM_AUDIT_ORACLE = """
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       min(n2) AS min_norm2,
       max(n2) AS max_norm2,
       CAST(sum(CASE WHEN n2 < 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_below_unit
FROM (
  SELECT label,
         list_reduce(list_prepend(0.0, list_transform(embedding, x -> CAST(x AS DOUBLE))),
                     (acc, x) -> acc + x * x) AS n2
  FROM embeddings
)
GROUP BY 1
"""


@register("embed_norm_audit", _NORM_AUDIT_ORACLE)
def embed_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    n2 = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    return (
        emb.select("label", n2.alias("n2"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.min("n2").alias("min_norm2"),
            F.max("n2").alias("max_norm2"),
            F.sum((F.col("n2") < 1.0).cast("int")).cast("long").alias("n_below_unit"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-document duplicate-PASSAGE removal — the corpus REWRITE step of
# exact substring dedup (the token-level shape of suffix-array substring
# dedup): any 13-token window already seen in an earlier document is
# removed from later documents (keep-first), and the surviving tokens are
# reassembled into the deduplicated text. Complements dup_ngram_fraction
# (which only measures) and dedup_* (which drop whole docs).
#
# Scale shape: shingle OCCURRENCES ≈ corpus token count — one shuffle on
# the shingle for the min-doc owner, one join back, one per-doc rollup of
# duplicate window starts, then a co-partitioned join onto the corpus; the
# interval-union and token rebuild are row-local array expressions (no
# second token explode). Hot boilerplate shingles fan out occurrence rows
# linearly, never pairs — no quadratic key, unlike similarity joins.
# ---------------------------------------------------------------------------
_SUBSTR_REWRITE_ORACLE = """
WITH base AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
occ AS (
  SELECT doc_id, i AS pos, array_to_string(t[i:i+12], ' ') AS sh
  FROM base, UNNEST(range(1, greatest(len(t) - 11, 1))) AS u(i)
  WHERE len(t) >= 13
),
firsts AS (SELECT sh, min(doc_id) AS min_doc FROM occ GROUP BY 1),
dups AS (
  SELECT o.doc_id, list(DISTINCT o.pos) AS starts
  FROM occ o JOIN firsts f ON o.sh = f.sh
  WHERE o.doc_id > f.min_doc GROUP BY 1
),
r AS (
  SELECT b.doc_id, b.t,
         list_distinct(flatten(list_transform(coalesce(d.starts, CAST([] AS BIGINT[])),
                                              p -> range(p, p + 13)))) AS removed
  FROM base b LEFT JOIN dups d USING (doc_id)
),
k AS (
  SELECT doc_id, t,
         list_filter(range(1, len(t) + 1), i -> NOT list_contains(removed, i)) AS kept
  FROM r
)
SELECT doc_id,
       -- a FULLY-removed doc has kept = [] and array_to_string([]) is NULL
       -- in DuckDB while Spark's concat_ws of an empty array is '' — pin ''
       coalesce(array_to_string(list_transform(kept, i -> t[i]), ' '), '') AS text_dedup,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(t) - len(kept) AS BIGINT) AS n_removed
FROM k
"""


@register("dedup_substring_rewrite", _SUBSTR_REWRITE_ORACLE)
def dedup_substring_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.split(F.trim("text"), " ").alias("t"))
    shingles = F.transform(
        F.sequence(F.lit(1), F.size("t") - 12),
        lambda i: F.concat_ws(" ", F.slice("t", i, 13)),
    )
    occ = (
        base.filter(F.size("t") >= 13)
        .select("doc_id", F.posexplode(shingles).alias("pos0", "sh"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "sh")
    )
    firsts = occ.groupBy("sh").agg(F.min("doc_id").alias("min_doc"))
    dups = (
        occ.join(firsts, "sh")
        .filter(F.col("doc_id") > F.col("min_doc"))
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("starts"))
    )
    r = base.join(dups, "doc_id", "left").withColumn(
        "removed",
        F.array_distinct(
            F.flatten(
                F.transform(
                    F.coalesce("starts", F.array().cast("array<int>")),
                    lambda p: F.sequence(p, p + 12),
                )
            )
        ),
    )
    kept = F.filter(
        F.sequence(F.lit(1), F.size("t")),
        lambda i: ~F.array_contains(F.col("removed"), i),
    )
    return r.select(
        "doc_id",
        F.concat_ws(" ", F.transform(kept, lambda i: F.element_at("t", i))).alias(
            "text_dedup"
        ),
        F.size("t").cast("long").alias("n_tokens"),
        (F.size("t") - F.size(kept)).cast("long").alias("n_removed"),
    )


# ---------------------------------------------------------------------------
# End-to-end training-data pipeline — the composition story: quality filter
# → exact dedup (keep-min content hash) → 13-gram decontamination against
# the held-out benchmark slice → deterministic shuffle/shard, all as ONE
# lazy DataFrame chain. Nothing materializes between stages: Catalyst fuses
# the filters into the scans and the whole pipeline is a single job whose
# shuffle count tests/test_plans.py pins — the property that makes a
# 100 TB run one pass over the corpus instead of four.
#
# Stage semantics reuse the standalone entries' exact definitions
# (document_filter-lite, dedup_exact, decontaminate_ngrams' benchmark
# convention doc_id % 7 = 0, training_shuffle's hash layout), so each stage
# stays individually auditable against its own registry twin.
# ---------------------------------------------------------------------------
_PIPELINE_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text,
         len(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS n_tokens
  FROM documents
  WHERE doc_id % 7 <> 0
),
quality AS (SELECT * FROM corpus WHERE n_tokens >= 5),
kept AS (
  SELECT * FROM quality
  WHERE doc_id IN (SELECT min(doc_id) FROM quality GROUP BY md5(text))
),
bench_sh AS (
  SELECT DISTINCT shingle FROM (
    SELECT array_to_string(t[i:i+12], ' ') AS shingle
    FROM (SELECT string_split(trim(text), ' ') AS t FROM documents WHERE doc_id % 7 = 0),
         UNNEST(range(1, greatest(len(t) - 12, 1) + 1)) AS u(i)
  )
),
contaminated AS (
  SELECT DISTINCT doc_id FROM (
    SELECT k.doc_id, array_to_string(t[i:i+12], ' ') AS shingle
    FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM kept) k,
         UNNEST(range(1, greatest(len(t) - 12, 1) + 1)) AS u(i)
  ) s JOIN bench_sh b ON s.shingle = b.shingle
),
clean AS (SELECT * FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM contaminated))
SELECT doc_id,
       CAST((strpos('0123456789abcdef', substr(md5(concat('{_SHUF_SEED}', CAST(doc_id AS VARCHAR))), 1, 1)) - 1)
            % {_SHUF_SHARDS} AS BIGINT) AS shard,
       CAST(row_number() OVER (
              PARTITION BY (strpos('0123456789abcdef', substr(md5(concat('{_SHUF_SEED}', CAST(doc_id AS VARCHAR))), 1, 1)) - 1) % {_SHUF_SHARDS}
              ORDER BY md5(concat('{_SHUF_SEED}', CAST(doc_id AS VARCHAR))), doc_id)
            AS BIGINT) AS pos_in_shard,
       CAST(n_tokens AS BIGINT) AS n_tokens
FROM clean
"""


@register("pipeline_end_to_end", _PIPELINE_ORACLE)
def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim("text"), " "), lambda x: x != "")
    corpus = docs.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id", "text", F.size(toks).alias("n_tokens")
    )
    quality = corpus.filter(F.col("n_tokens") >= 5)
    keep_ids = quality.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    kept = quality.join(keep_ids.select("doc_id"), "doc_id")
    bench_sh = (
        dedup.shingle_set(docs.filter(F.col("doc_id") % 7 == 0), "doc_id", "text", k=13)
        .select("shingle")
        .distinct()
    )
    corpus_sh = dedup.shingle_set(kept, "doc_id", "text", k=13)
    contaminated = corpus_sh.join(bench_sh, "shingle").select("doc_id").distinct()
    clean = kept.join(contaminated, "doc_id", "left_anti")
    k = F.md5(F.concat(F.lit(_SHUF_SEED), F.col("doc_id").cast("string")))
    shard = (F.conv(F.substring(k, 1, 1), 16, 10).cast("long") % _SHUF_SHARDS).alias(
        "shard"
    )
    w = Window.partitionBy("shard").orderBy("k", "doc_id")
    return (
        clean.select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"), k.alias("k"), shard)
        .withColumn("pos_in_shard", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos_in_shard", "n_tokens")
    )


# ---------------------------------------------------------------------------
# Product quantization — 64 float32 dims → 4 codes from per-subspace
# 4-centroid codebooks (extras/similarity.py:pq_encode). The oracle replays
# ALL FOUR independent k-means trainings (same deterministic recipe the IVF
# oracle proved: lowest-id seeds, 2 rounds, argmin ties to the lower cell,
# empty cells keep their stale centroid) and the final per-subspace
# assignment, joined back into one code row per vector.
# ---------------------------------------------------------------------------
def _pq_sub(s: int, k: int = 4) -> str:
    """Oracle CTE chain for subspace ``s`` (dims 16s+1 .. 16s+16)."""
    lo = 16 * s + 1

    def assign(cent: str, out: str) -> str:
        return f"""
{out}_{s} AS (
  SELECT vec_id, sv, cell FROM (
    SELECT n.vec_id, n.sv, c.cell,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY list_sum(list_transform(range(1, 17),
                       i -> (n.sv[i] - c.c[i]) * (n.sv[i] - c.c[i]))) ASC,
                      c.cell ASC) AS rn
    FROM sub_{s} n, {cent}_{s} c
  ) WHERE rn = 1
)"""

    def means(assign_cte: str, prev: str, out: str) -> str:
        return f"""
{out}_m_{s} AS (
  SELECT a.cell, u.d, avg(a.sv[u.d]) AS m
  FROM {assign_cte}_{s} a, (SELECT unnest(range(1, 17)) AS d) u
  GROUP BY 1, 2
),
{out}_{s} AS (
  SELECT p.cell, coalesce(l.c, p.c) AS c
  FROM {prev}_{s} p
  LEFT JOIN (SELECT cell, list(m ORDER BY d) AS c FROM {out}_m_{s} GROUP BY cell) l
    ON p.cell = l.cell
)"""

    return f"""
sub_{s} AS (
  SELECT vec_id, (embedding::DOUBLE[])[{lo}:{lo + 15}] AS sv FROM embeddings
),
seed_{s} AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, sv AS c
  FROM (SELECT vec_id, sv FROM sub_{s} ORDER BY vec_id LIMIT {k})
),
{assign("seed", "asg1")},
{means("asg1", "seed", "cent1")},
{assign("cent1", "asg2")},
{means("asg2", "cent1", "cent2")},
{assign("cent2", "asg3")}"""


_PQ_ORACLE = f"""
WITH {", ".join(_pq_sub(s) for s in range(4))}
SELECT a0.vec_id,
       CAST(a0.cell AS INT) AS code_0, CAST(a1.cell AS INT) AS code_1,
       CAST(a2.cell AS INT) AS code_2, CAST(a3.cell AS INT) AS code_3
FROM asg3_0 a0
JOIN asg3_1 a1 ON a0.vec_id = a1.vec_id
JOIN asg3_2 a2 ON a0.vec_id = a2.vec_id
JOIN asg3_3 a3 ON a0.vec_id = a3.vec_id
"""


@register("embed_pq_encode", _PQ_ORACLE)
def embed_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.pq_encode(emb, "vec_id", "embedding", m=4, k=4, iters=2)


# ---------------------------------------------------------------------------
# PQ-ADC approximate nearest neighbors — the compressed-domain scan the PQ
# codes exist for (extras/similarity.py:pq_ann): the index side is 4 codes
# per vector (broadcast under the same row guard as the float baseline but
# 64x smaller), each query builds exact per-subspace lookup tables against
# the trained codebooks, and every candidate costs 4 gathers + 4 adds. The
# oracle replays the codebook training (the PQ chains), the code
# assignment, the LUTs, and the s-ordered ADC sum; rank ties (frequent —
# only 256 distinct code tuples exist) break to the lower neighbor id in
# both engines.
# ---------------------------------------------------------------------------
_PQ_ANN_ORACLE = f"""
WITH {", ".join(_pq_sub(s) for s in range(4))},
codes AS (
  SELECT a0.vec_id, a0.cell AS c0, a1.cell AS c1, a2.cell AS c2, a3.cell AS c3
  FROM asg3_0 a0
  JOIN asg3_1 a1 ON a0.vec_id = a1.vec_id
  JOIN asg3_2 a2 ON a0.vec_id = a2.vec_id
  JOIN asg3_3 a3 ON a0.vec_id = a3.vec_id
),
{", ".join(f'''lut_{s} AS (
  SELECT n.vec_id, c.cell,
         list_sum(list_transform(range(1, 17),
                  i -> (n.sv[i] - c.c[i]) * (n.sv[i] - c.c[i]))) AS d
  FROM sub_{s} n, cent2_{s} c
)''' for s in range(4))}
SELECT vec_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT q.vec_id, t.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY l0.d + l1.d + l2.d + l3.d ASC, t.vec_id ASC) AS rnk
  FROM (SELECT vec_id FROM embeddings) q
  JOIN codes t ON t.vec_id <> q.vec_id
  JOIN lut_0 l0 ON l0.vec_id = q.vec_id AND l0.cell = t.c0
  JOIN lut_1 l1 ON l1.vec_id = q.vec_id AND l1.cell = t.c1
  JOIN lut_2 l2 ON l2.vec_id = q.vec_id AND l2.cell = t.c2
  JOIN lut_3 l3 ON l3.vec_id = q.vec_id AND l3.cell = t.c3
) WHERE rnk <= 5
"""


@register("embed_ann_pq", _PQ_ANN_ORACLE)
def embed_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.pq_ann(emb, "vec_id", "embedding", k=5)


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k theta) distinct sketch — the OTHER classic
# mergeable cardinality sketch next to hll_registers: keep the k smallest
# distinct hash values; the k-th smallest estimates density. Two properties
# make it the 100 TB tool: the sketch is exactly k rows per group no matter
# the input (a bounded-state partial agg), and union across groups is just
# "k smallest of the concatenated sketches" — shown here by merging the five
# per-type sketches into the __ALL__ row WITHOUT touching raw data again.
# Engine parity: the 60-bit hash is integer-exact; the estimator
# (k-1)·2^60/h_k is (exact double)·(exact double)/(int64→double, an
# IEEE-defined conversion) — one multiply + one divide in fixed order, so
# both engines produce the identical double, and floor() of it the
# identical BIGINT. Sketches smaller than k are exact by definition
# (est = member count). exact_ct is the audit column (same role as
# cms_heavy_hitters'): at 100 TB you'd drop it — it is the cost the sketch
# avoids.
# ---------------------------------------------------------------------------
_KMV_K = 64

_KMV_ORACLE = f"""
WITH uh AS (
  SELECT DISTINCT event_type,
         {_hex_val_sql("md5('kmv:' || CAST(user_id AS VARCHAR))", 1, 15)} AS h
  FROM events
),
kept AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM uh
  ) WHERE rn <= {_KMV_K}
),
merged AS (
  SELECT '__ALL__' AS event_type, h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn
    FROM (SELECT DISTINCT h FROM kept)
  ) WHERE rn <= {_KMV_K}
),
sk AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS sk_ct, max(h) AS kth_hash
  FROM (SELECT * FROM kept UNION ALL SELECT * FROM merged)
  GROUP BY 1
),
ex AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_ct FROM events GROUP BY 1
  UNION ALL
  SELECT '__ALL__', count(DISTINCT user_id) FROM events
)
SELECT s.event_type AS scope,
       CAST(s.kth_hash AS BIGINT) AS kth_hash,
       CAST(CASE WHEN s.sk_ct < {_KMV_K} THEN s.sk_ct
                 ELSE floor((CAST({_KMV_K - 1} AS DOUBLE) * 1152921504606846976)
                            / s.kth_hash)
            END AS BIGINT) AS kmv_est,
       CAST(e.exact_ct AS BIGINT) AS exact_ct
FROM sk s JOIN ex e ON s.event_type = e.event_type
"""


@register("kmv_distinct", _KMV_ORACLE)
def kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    uh = ev.select("event_type", h.alias("h")).distinct()
    # Two-level bottom-k so no task ever sorts a whole group: level 1 takes
    # each (type, h mod 32) salt-slice's k smallest (parallel, bounded k
    # rows out per slice — every global bottom-k member is necessarily in
    # its slice's bottom-k), level 2 ranks only the <=32k survivors per
    # type. A single per-type window would funnel ALL distinct hashes of a
    # type through one sort task — the skew that kills per-key top-k at
    # 10^9 users.
    w1 = Window.partitionBy("event_type", "salt").orderBy("h")
    pre = (
        uh.withColumn("salt", F.pmod(F.col("h"), F.lit(32)))
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= _KMV_K)
        .drop("rn", "salt")
    )
    kept = (
        pre.withColumn(
            "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("h"))
        )
        .filter(F.col("rn") <= _KMV_K)
        .drop("rn")
    )
    merged = (
        kept.select("h")
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rn") <= _KMV_K)
        .select(F.lit("__ALL__").alias("event_type"), "h")
    )
    sk = (
        kept.unionByName(merged)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("sk_ct"), F.max("h").alias("kth_hash"))
    )
    ex = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_ct"))
        .unionByName(
            ev.agg(F.countDistinct("user_id").alias("exact_ct")).select(
                F.lit("__ALL__").alias("event_type"), "exact_ct"
            )
        )
    )
    est = F.when(F.col("sk_ct") < _KMV_K, F.col("sk_ct")).otherwise(
        F.floor(
            (F.lit(float(_KMV_K - 1)) * F.lit(1152921504606846976.0))
            / F.col("kth_hash")
        )
    )
    return (
        sk.join(ex, "event_type")
        .select(
            F.col("event_type").alias("scope"),
            F.col("kth_hash").cast("long"),
            est.cast("long").alias("kmv_est"),
            F.col("exact_ct").cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# HLL union + estimate — completes hll_registers (which stops at the register
# table) with the actual cardinality estimate AND the union step, all in
# INTEGER arithmetic: the harmonic denominator Σ 2^(-rho) is scaled by 2^33
# (every term 2^(33-rho) is then an exact BIGINT — registers never seen
# contribute rho=0, i.e. 2^33 each), and alpha_m·m²·2^33 is the precomputed
# integer constant A, so est = A DIV S never touches a float. The __ALL__
# row max-merges the per-type registers — the mergeability that makes HLL
# the distributed-distinct workhorse (partial agg on max, constant state).
# No small-range linear-counting correction: it needs ln(); consumers that
# want it have zero_regs in the output to apply their own.
# ---------------------------------------------------------------------------
_HLL_M = 256
_HLL_A = 404351522913637  # round(0.7213/(1+1.079/256) * 256^2 * 2^33)

_HLL_EST_ORACLE = f"""
WITH h AS (
  SELECT event_type,
         {_hex_val_sql("md5('hll:' || CAST(user_id AS VARCHAR))", 1, 2)} AS reg,
         {_hex_val_sql("md5('hll:' || CAST(user_id AS VARCHAR))", 3, 8)} AS v
  FROM events
),
regs AS (
  SELECT event_type, reg,
         max(CASE WHEN v = 0 THEN 33 ELSE 32 - CAST(floor(log2(v)) AS INT) END) AS rho
  FROM h GROUP BY 1, 2
),
allregs AS (
  SELECT event_type, reg, rho FROM regs
  UNION ALL
  SELECT '__ALL__', reg, max(rho) FROM regs GROUP BY 2
),
s AS (
  SELECT event_type,
         CAST(sum(CAST(1 AS BIGINT) << (33 - rho)) AS BIGINT)
           + ({_HLL_M} - count(*)) * (CAST(1 AS BIGINT) << 33) AS harm,
         {_HLL_M} - count(*) AS zero_regs
  FROM allregs GROUP BY 1
)
SELECT event_type AS scope,
       CAST(harm AS BIGINT) AS harmonic_scaled,
       CAST(zero_regs AS BIGINT) AS zero_regs,
       CAST({_HLL_A} // harm AS BIGINT) AS hll_est
FROM s
"""


@register("hll_union_estimate", _HLL_EST_ORACLE)
def hll_union_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.md5(F.concat(F.lit("hll:"), F.col("user_id").cast("string")))
    reg = F.conv(F.substring(m, 1, 2), 16, 10).cast("int")
    v = F.conv(F.substring(m, 3, 8), 16, 10).cast("long")
    rho = F.when(v == 0, F.lit(33)).otherwise(F.lit(32) - F.floor(F.log2(v)).cast("int"))
    regs = (
        ev.select("event_type", reg.alias("reg"), rho.alias("rho"))
        .groupBy("event_type", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    allregs = regs.unionByName(
        regs.groupBy("reg")
        .agg(F.max("rho").alias("rho"))
        .select(F.lit("__ALL__").alias("event_type"), "reg", "rho")
    )
    s = allregs.groupBy("event_type").agg(
        (
            F.sum(F.expr("shiftleft(bigint(1), 33 - rho)"))
            + (F.lit(_HLL_M) - F.count(F.lit(1))) * F.lit(1 << 33)
        ).alias("harm"),
        (F.lit(_HLL_M) - F.count(F.lit(1))).cast("long").alias("zero_regs"),
    )
    return s.select(
        F.col("event_type").alias("scope"),
        F.col("harm").cast("long").alias("harmonic_scaled"),
        "zero_regs",
        F.expr(f"{_HLL_A} div harm").cast("long").alias("hll_est"),
    )


# ---------------------------------------------------------------------------
# Hashed n-gram importance resampling — the DSIR-style data-selection step
# (Xie et al. 2023, "Data Selection for Language Models via Importance
# Resampling"): score every raw-pool document by how much its hashed-unigram
# profile looks like the TARGET domain vs the raw pool, keep the top slice.
# Target domain here = sources whose index ≡ 0 (mod 5); features = tokens
# hashed into 4096 buckets (md5, 3 hex digits — the fixed-width trick that
# makes vocabulary size irrelevant at 100 TB).
#
# Engine parity: DSIR's log-likelihood-ratio sum would put a transcendental
# per token at the engine boundary, so the score is the sum-form likelihood
# ratio — num = Σ_tok (ct_target(bucket)+1), den = Σ_tok (ct_raw(bucket)+1)
# (add-one smoothing) — exact BIGINTs; the rank key is the single IEEE
# division num/den (bm25_topk's trick). Same monotone "more target-typical
# per token" ordering, zero float folds.
#
# Scale shape: two token passes (one to build the 4096-row bucket table, one
# to score), the bucket table is CONSTANT-size so it hard-broadcasts at any
# SF, and scoring is a partial-agg groupBy on doc_id. Top-100 via one
# window over the scored docs (at 100 TB: total-order rank → range-partition
# the score or threshold on a quantile instead).
# ---------------------------------------------------------------------------
_DSIR_BUCKETS = 4096
_DSIR_TOP = 100

_DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(substr(source, 4) AS INT) % 5 = 0 AS is_target,
         {_hex_val_sql("md5('dsir:' || token)", 1, 3)} AS bucket
  FROM (
    SELECT doc_id, source, unnest(string_split(trim(text), ' ')) AS token
    FROM documents
  )
  WHERE token <> ''
),
buckets AS (
  SELECT bucket,
         sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct_t,
         sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS ct_r
  FROM toks GROUP BY 1
),
scored AS (
  SELECT t.doc_id,
         CAST(sum(b.ct_t + 1) AS BIGINT) AS num,
         CAST(sum(b.ct_r + 1) AS BIGINT) AS den
  FROM toks t JOIN buckets b ON t.bucket = b.bucket
  WHERE NOT t.is_target
  GROUP BY 1
)
SELECT doc_id, num, den, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT doc_id, num, den,
         row_number() OVER (ORDER BY CAST(num AS DOUBLE) / den DESC, doc_id) AS rnk
  FROM scored
) WHERE rnk <= {_DSIR_TOP}
"""


@register("importance_resample", _DSIR_ORACLE)
def importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            (F.substring("source", 4, 10).cast("int") % 5 == 0).alias("is_target"),
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .withColumn(
            "bucket",
            F.conv(F.substring(F.md5(F.concat(F.lit("dsir:"), F.col("token"))), 1, 3), 16, 10)
            .cast("int"),
        )
    )
    buckets = toks.groupBy("bucket").agg(
        F.sum(F.col("is_target").cast("long")).alias("ct_t"),
        F.sum((~F.col("is_target")).cast("long")).alias("ct_r"),
    )
    # ≤4096 rows at ANY corpus size — the one broadcast in this file that is
    # genuinely scale-invariant, so the hint is unconditional.
    scored = (
        toks.filter(~F.col("is_target"))
        .join(F.broadcast(buckets), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("ct_t") + 1).alias("num"),
            F.sum(F.col("ct_r") + 1).alias("den"),
        )
    )
    # Two-level global top-N (same discipline as kmv_distinct's bottom-k):
    # per-salt top-N first — every global top-N doc is in its salt slice's
    # top-N — so the final single-partition rank only sees 32·N survivors,
    # never the whole scored corpus.
    key = F.col("num").cast("double") / F.col("den")
    w1 = Window.partitionBy("salt").orderBy(key.desc(), F.col("doc_id"))
    pre = (
        scored.withColumn("salt", F.pmod(F.col("doc_id"), F.lit(32)))
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= _DSIR_TOP)
        .drop("rn", "salt")
    )
    w2 = Window.orderBy(key.desc(), F.col("doc_id"))
    return (
        pre.withColumn("rnk", F.row_number().over(w2).cast("long"))
        .filter(F.col("rnk") <= _DSIR_TOP)
        .select("doc_id", F.col("num").cast("long"), F.col("den").cast("long"), "rnk")
    )


# ---------------------------------------------------------------------------
# Winsorized robust statistics — the outlier-clipping pass run before any
# mean/σ-based quality gate on raw telemetry: per event_type, find the exact
# discrete p01/p99 elements and sum values clipped into [p01, p99].
# Percentile ELEMENTS, not interpolations: the cut index is pure integer
# arithmetic ((n+99)//100-th and ((99n+99)//100)-th rows of the (value,
# event_id)-sorted order), so both engines pick the same physical row and no
# arithmetic ever touches the percentile values. The clipped sum accumulates
# DECIMAL(18,2) (exact, order-independent) and casts to DOUBLE once at the
# edge. One sort-shuffle per group for the rank, one partial-agg pass for
# the sums — n·log(n/p) per partition at scale, no driver involvement.
# ---------------------------------------------------------------------------
_WINSOR_ORACLE = """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
cuts AS (
  SELECT event_type,
         max(CASE WHEN rn = (n + 99) // 100 THEN value END) AS p01,
         max(CASE WHEN rn = (99 * n + 99) // 100 THEN value END) AS p99
  FROM ranked GROUP BY 1
)
SELECT e.event_type,
       c.p01, c.p99,
       CAST(sum(CAST(least(greatest(e.value, c.p01), c.p99) AS DECIMAL(18,2)))
            AS DOUBLE) AS winsorized_sum,
       CAST(sum(CASE WHEN e.value < c.p01 OR e.value > c.p99 THEN 1 ELSE 0 END)
            AS BIGINT) AS clipped_ct
FROM events e JOIN cuts c ON e.event_type = c.event_type
GROUP BY 1, 2, 3
"""


@register("winsorize_stats", _WINSOR_ORACLE)
def winsorize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    # cut indexes via expr-level integer DIV — no fractional drift
    cuts = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == F.expr("(n + 99) div 100"), F.col("value"))).alias("p01"),
        F.max(F.when(F.col("rn") == F.expr("(99 * n + 99) div 100"), F.col("value"))).alias("p99"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    return (
        ev.join(cuts, "event_type")
        .groupBy("event_type", "p01", "p99")
        .agg(
            F.sum(clipped.cast("decimal(18,2)")).cast("double").alias("winsorized_sum"),
            F.sum(
                ((F.col("value") < F.col("p01")) | (F.col("value") > F.col("p99"))).cast("long")
            ).alias("clipped_ct"),
        )
        .select("event_type", "p01", "p99", "winsorized_sum", "clipped_ct")
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility audit — the per-(source, lang) tokens-per-byte table a
# data-budgeting pass runs before mixing corpora: a tokenizer that spends 3×
# the tokens per byte on one language silently shrinks that language's
# effective share of the training budget. Reuses token_count's tokenizers
# (whitespace + word-regex + the chars/4 BPE estimate) aggregated per
# (source, lang); integer sums only, fertility ratios left to one exact
# IEEE division at the edge (chars per word-token ×1000, floored — integer
# output, deterministic cross-engine). One scan, pure partial aggregation —
# the cheapest audit in the file at any scale.
# ---------------------------------------------------------------------------
_FERTILITY_ORACLE = """
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(text)) AS BIGINT) AS chars_total,
       CAST(sum(len(list_filter(string_split(trim(text), ' '), x -> x <> ''))) AS BIGINT) AS ws_tokens,
       CAST(sum(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT) AS word_tokens,
       CAST(floor(CAST(sum(len(text)) * 1000 AS DOUBLE)
                  / nullif(sum(len(regexp_extract_all(text, '[a-z]+'))), 0)) AS BIGINT)
         AS chars_per_word_token_x1000
FROM documents
GROUP BY 1, 2
"""


@register("token_fertility", _FERTILITY_ORACLE)
def token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.filter(F.split(F.trim(F.col("text")), " "), lambda x: x != ""))
    words = F.size(F.expr("regexp_extract_all(text, '[a-z]+', 0)"))
    agg = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("chars_total"),
        F.sum(ws).cast("long").alias("ws_tokens"),
        F.sum(words).cast("long").alias("word_tokens"),
    )
    return agg.select(
        "source",
        "lang",
        "n_docs",
        "chars_total",
        "ws_tokens",
        "word_tokens",
        F.floor(
            (F.col("chars_total") * 1000).cast("double")
            / F.nullif(F.col("word_tokens"), F.lit(0))
        )
        .cast("long")
        .alias("chars_per_word_token_x1000"),
    )


# ---------------------------------------------------------------------------
# Cross-source duplication audit — "where do my duplicates come from": for
# every duplicate-fingerprint group (25-token-prefix md5 — the chunk-level
# fingerprint that catches template/boilerplate reuse, not just byte-equal
# copies), count the duplicate PAIRS within each
# source and across each source pair. The provenance question that decides
# whether to drop a whole feed (mirrors of another crawl) vs merely dedup
# inside it. Pair counts are combinatorial over the per-(hash, source)
# membership counts — n_a·n_b across sources, C(n,2) within — so nothing
# ever explodes to the pair level: one shuffle to (hash, source) counts
# (bounded by |corpus|), a per-hash self-join bounded by sources-per-hash
# (≤ |sources|, a constant), and a final rollup keyed on the source pair.
# ---------------------------------------------------------------------------
_CROSS_SOURCE_ORACLE = """
WITH hs AS (
  SELECT md5(array_to_string(string_split(trim(text), ' ')[1:25], ' ')) AS h,
         source, count(*) AS n
  FROM documents GROUP BY 1, 2
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, a.n * b.n AS pair_ct
  FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
  UNION ALL
  SELECT source, source, n * (n - 1) // 2 FROM hs WHERE n > 1
)
SELECT source_a, source_b, CAST(sum(pair_ct) AS BIGINT) AS dup_pair_ct
FROM pairs GROUP BY 1, 2
"""


@register("dedup_cross_source", _CROSS_SOURCE_ORACLE)
def dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    prefix_fp = F.md5(
        F.concat_ws(" ", F.slice(F.split(F.trim(F.col("text")), " "), 1, 25))
    )
    hs = docs.groupBy(prefix_fp.alias("h"), "source").agg(F.count(F.lit(1)).alias("n"))
    a, b = hs.alias("a"), hs.alias("b")
    cross = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.source") < F.col("b.source")))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            (F.col("a.n") * F.col("b.n")).alias("pair_ct"),
        )
    )
    within = hs.filter(F.col("n") > 1).select(
        F.col("source").alias("source_a"),
        F.col("source").alias("source_b"),
        F.expr("n * (n - 1) div 2").alias("pair_ct"),
    )
    return (
        cross.unionByName(within)
        .groupBy("source_a", "source_b")
        .agg(F.sum("pair_ct").cast("long").alias("dup_pair_ct"))
    )


# ---------------------------------------------------------------------------
# Theta-sketch set algebra — audience overlap / join-size estimation from
# SKETCHES ONLY. kmv_distinct stops at per-group cardinality; the theta
# extension is why the Datasketches family runs every planning layer: two
# bottom-k sketches built on DIFFERENT scans (here: customers active before
# 1996 vs active after mid-2000) compose into intersection / union / per-set
# estimates under ONE shared threshold theta = min of the two sketch
# thresholds, each estimate = floor(|{h < theta}| * 2^60 / theta). At 100 TB
# this is THE join-cardinality estimator: each side's sketch is a bounded
# partial agg (k rows out per scan, built independently, mergeable), and the
# overlap estimate costs a k-row join — no raw-data rejoin ever happens. A
# set smaller than k keeps theta = 2^60 and is exact by construction.
# Engine parity: 60-bit md5 hashes; the only float op is the single
# multiply-then-divide of exact doubles (same shape kmv_distinct proved);
# exact_* audit columns are the cost the sketches avoid — drop them at scale.
# ---------------------------------------------------------------------------
_THETA_K = 64
_THETA_MAX = 1152921504606846976  # 2^60, exclusive hash-space bound

_OVERLAP_ORACLE = f"""
WITH ah AS (
  SELECT DISTINCT {_hex_val_sql("md5('ovl:' || CAST(o_custkey AS VARCHAR))", 1, 15)} AS h
  FROM orders WHERE o_orderdate < DATE '1996-01-01'
),
bh AS (
  SELECT DISTINCT {_hex_val_sql("md5('ovl:' || CAST(o_custkey AS VARCHAR))", 1, 15)} AS h
  FROM orders WHERE o_orderdate >= DATE '2000-06-01'
),
ska AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM ah) WHERE rn <= {_THETA_K}),
skb AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM bh) WHERE rn <= {_THETA_K}),
th AS (
  SELECT least(
    CASE WHEN (SELECT count(*) FROM ska) < {_THETA_K} THEN {_THETA_MAX}
         ELSE (SELECT max(h) FROM ska) END,
    CASE WHEN (SELECT count(*) FROM skb) < {_THETA_K} THEN {_THETA_MAX}
         ELSE (SELECT max(h) FROM skb) END) AS theta
),
raw AS (
  SELECT (SELECT count(*) FROM ska, th WHERE h < theta) AS a_raw,
         (SELECT count(*) FROM skb, th WHERE h < theta) AS b_raw,
         (SELECT count(*) FROM ska JOIN skb USING (h), th WHERE h < theta) AS i_raw,
         (SELECT count(DISTINCT h) FROM (SELECT h FROM ska UNION ALL SELECT h FROM skb) u, th
          WHERE h < theta) AS u_raw
),
ex AS (
  SELECT (SELECT count(*) FROM ah) AS exact_a,
         (SELECT count(*) FROM bh) AS exact_b,
         (SELECT count(*) FROM ah JOIN bh USING (h)) AS exact_inter
)
SELECT CAST(theta AS BIGINT) AS theta,
       CAST(floor(CAST(a_raw AS DOUBLE) * {_THETA_MAX} / CAST(theta AS DOUBLE)) AS BIGINT) AS a_est,
       CAST(floor(CAST(b_raw AS DOUBLE) * {_THETA_MAX} / CAST(theta AS DOUBLE)) AS BIGINT) AS b_est,
       CAST(floor(CAST(i_raw AS DOUBLE) * {_THETA_MAX} / CAST(theta AS DOUBLE)) AS BIGINT) AS inter_est,
       CAST(floor(CAST(u_raw AS DOUBLE) * {_THETA_MAX} / CAST(theta AS DOUBLE)) AS BIGINT) AS union_est,
       CAST(exact_a AS BIGINT) AS exact_a,
       CAST(exact_b AS BIGINT) AS exact_b,
       CAST(exact_inter AS BIGINT) AS exact_inter
FROM th, raw, ex
"""


@register("sketch_overlap", _OVERLAP_ORACLE)
def sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("ovl:"), F.col("o_custkey").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")

    def era_hashes(pred):
        return orders.filter(pred).select(h.alias("h")).distinct()

    ah = era_hashes(F.col("o_orderdate") < "1996-01-01")
    bh = era_hashes(F.col("o_orderdate") >= "2000-06-01")

    def bottom_k(df):
        # Two-level salted bottom-k (kmv_distinct's shape): no task ever
        # sorts the whole distinct-key set; level 1 is parallel and bounds
        # the level-2 sort to <=32k rows.
        w1 = Window.partitionBy("salt").orderBy("h")
        pre = (
            df.withColumn("salt", F.pmod(F.col("h"), F.lit(32)))
            .withColumn("rn", F.row_number().over(w1))
            .filter(F.col("rn") <= _THETA_K)
            .drop("rn", "salt")
        )
        return (
            pre.withColumn("rn", F.row_number().over(Window.orderBy("h")))
            .filter(F.col("rn") <= _THETA_K)
            .drop("rn")
        )

    ska, skb = bottom_k(ah), bottom_k(bh)

    def theta_side(sk):
        return sk.agg(
            F.when(F.count(F.lit(1)) < _THETA_K, F.lit(_THETA_MAX))
            .otherwise(F.max("h"))
            .alias("th")
        )

    theta = (
        theta_side(ska)
        .withColumnRenamed("th", "tha")
        .crossJoin(F.broadcast(theta_side(skb).withColumnRenamed("th", "thb")))
        .select(F.least("tha", "thb").alias("theta"))
    )

    def below(sk, name):
        return sk.crossJoin(F.broadcast(theta)).filter(F.col("h") < F.col("theta")).agg(
            F.count(F.lit(1)).alias(name)
        )

    inter_sk = ska.join(skb, "h")
    union_sk = ska.unionByName(skb).distinct()
    est = lambda raw: F.floor(  # noqa: E731 — one shared exact-double formula
        (F.col(raw).cast("double") * F.lit(float(_THETA_MAX)))
        / F.col("theta").cast("double")
    ).cast("long")
    exact = (
        ah.agg(F.count(F.lit(1)).alias("exact_a"))
        .crossJoin(F.broadcast(bh.agg(F.count(F.lit(1)).alias("exact_b"))))
        .crossJoin(F.broadcast(ah.join(bh, "h").agg(F.count(F.lit(1)).alias("exact_inter"))))
    )
    return (
        theta.crossJoin(F.broadcast(below(ska, "a_raw")))
        .crossJoin(F.broadcast(below(skb, "b_raw")))
        .crossJoin(F.broadcast(below(inter_sk, "i_raw")))
        .crossJoin(F.broadcast(below(union_sk, "u_raw")))
        .crossJoin(F.broadcast(exact))
        .select(
            F.col("theta").cast("long"),
            est("a_raw").alias("a_est"),
            est("b_raw").alias("b_est"),
            est("i_raw").alias("inter_est"),
            est("u_raw").alias("union_est"),
            F.col("exact_a").cast("long"),
            F.col("exact_b").cast("long"),
            F.col("exact_inter").cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss sign projection — dimensionality reduction for the
# embedding column (64 → 16 dims) with a paired DISTORTION AUDIT, the step
# between "store full vectors" and "ANN over cheap codes" (LSH keeps only
# the sign bit per plane; JL keeps the full projected value, so downstream
# cosine/dot math still works in the small space at 1/4 the bytes).
# Everything is INTEGER-exact: vectors are quantized to 1e-4 units FIRST,
# the ±1 signs come from md5 parity, so projections and dot products are
# exact BIGINT sums (order-free — no float fold to pin). The audit reports,
# per consecutive-id pair, the original-space dot vs the projected-space dot
# against the JL identity E[<Pa,Pb>] = d'·<a,b> (err16 = the deviation).
# Scale shape: one posexplode + a 1024-row broadcast sign table + two
# key-partitioned partial aggs — no vector ever leaves the executor, the
# driver holds only the constant sign matrix.
# ---------------------------------------------------------------------------
_JL_ORACLE = """
WITH vq AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 10000) AS BIGINT)) AS q
  FROM embeddings
),
signs AS (
  SELECT j, i,
         CASE WHEN substr(md5('jl' || j || ':' || i), 1, 1) >= '8'
              THEN 1 ELSE -1 END AS s
  FROM (SELECT unnest(range(0, 16)) AS j), (SELECT unnest(range(1, 65)) AS i)
),
proj AS (
  SELECT v.vec_id, sg.j, CAST(sum(v.q[sg.i] * sg.s) AS BIGINT) AS p
  FROM vq v, signs sg
  GROUP BY 1, 2
),
od AS (
  SELECT a.vec_id,
         CAST(list_dot_product(a.q, b.q) AS BIGINT) AS orig_dot
  FROM vq a JOIN vq b ON b.vec_id = a.vec_id + 1
),
pd AS (
  SELECT a.vec_id, CAST(sum(a.p * b.p) AS BIGINT) AS proj_dot
  FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1 AND a.j = b.j
  GROUP BY 1
)
SELECT od.vec_id, od.orig_dot, pd.proj_dot,
       CAST(pd.proj_dot - 16 * od.orig_dot AS BIGINT) AS err16
FROM od JOIN pd ON od.vec_id = pd.vec_id
"""


@register("embed_jl_project", _JL_ORACLE)
def embed_jl_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    emb = load_table(spark, sf_dir, "embeddings")
    # All array math stays INSIDE whole-stage codegen: quantize, project
    # against 16 literal sign vectors (zip_with + aggregate — no posexplode,
    # no sign-table join, zero shuffles until the pair join), then pair-dot
    # via one equi-join on vec_id+1. An earlier version exploded 64 dims and
    # joined a sign table (512M intermediate rows at sf10, 11.1s); this form
    # runs the same arithmetic in 3.7s — the explode was pure data motion.
    vq = F.transform("embedding", lambda x: F.floor(x.cast("double") * 10000).cast("long"))

    def sign_vec(j: int):
        return F.array(
            *[
                F.lit(1 if hashlib.md5(f"jl{j}:{i}".encode()).hexdigest()[0] >= "8" else -1).cast(
                    "long"
                )
                for i in range(1, 65)
            ]
        )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
        )

    base = emb.select(
        "vec_id",
        vq.alias("q"),
    ).select(
        "vec_id",
        "q",
        F.array(*[dot(F.col("q"), sign_vec(j)) for j in range(16)]).alias("p"),
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1)
        .select(
            F.col("a.vec_id").alias("vec_id"),
            dot(F.col("a.q"), F.col("b.q")).cast("long").alias("orig_dot"),
            dot(F.col("a.p"), F.col("b.p")).cast("long").alias("proj_dot"),
        )
        .withColumn("err16", (F.col("proj_dot") - F.lit(16) * F.col("orig_dot")).cast("long"))
    )


# ---------------------------------------------------------------------------
# Weighted sampling WITH replacement — the training-mixture draw: pick K
# documents with probability proportional to a weight column (n_chars here —
# the "sample by token count" mixture rule). The naive global
# `sum() OVER (ORDER BY ...)` cumulative-weight table is a single-partition
# window — the 100 TB killer — so the CDF comes from the two-level
# distributed prefix sum (operators/prefix.py): bucketed partials, broadcast
# offsets, parallel within-bucket scans.
#
# Draw targets are md5-derived integers mod total-weight (deterministic,
# oracle-reproducible — no RNG at the engine boundary); each draw lands on
# the unique document whose [cum_lo, cum_lo + w) interval contains it. The
# interval probe is a 64-row broadcast against the CDF — O(K·n) comparisons
# streamed through the scan, never a materialized cross product (allowlisted
# with the other constant-small nested loops in tests/test_plans.py).
#
# All arithmetic BIGINT-exact; the only join keys are integers.
# ---------------------------------------------------------------------------
_WS_DRAWS = 64

_WS_ORACLE = f"""
WITH cdf AS (
  SELECT doc_id, n_chars,
         COALESCE(sum(n_chars) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_lo
  FROM documents
),
tot AS (SELECT sum(n_chars) AS w FROM documents),
draws AS (
  SELECT j AS draw_id,
         {_hex_val_sql("md5('ws:' || CAST(j AS VARCHAR))", 1, 15)} % (SELECT w FROM tot) AS target
  FROM (SELECT unnest(generate_series(0, {_WS_DRAWS - 1})) AS j)
)
SELECT CAST(d.draw_id AS BIGINT) AS draw_id,
       CAST(d.target AS BIGINT) AS target,
       CAST(c.doc_id AS BIGINT) AS doc_id,
       CAST(c.n_chars AS BIGINT) AS weight
FROM draws d JOIN cdf c
  ON d.target >= c.cum_lo AND d.target < c.cum_lo + c.n_chars
"""


@register("weighted_sample", _WS_ORACLE)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_spark.operators.prefix import prefix_sum

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    # exclusive scan over doc_id order; bucket = doc_id >> 8 keeps the
    # bucket table ~n/256 rows (order-aligned because doc_id is the order)
    cdf = prefix_sum(
        docs,
        ["doc_id"],
        "n_chars",
        (F.col("doc_id") / 256).cast("long"),
        out_col="cum_lo",
        inclusive=False,
    )
    total = docs.agg(F.sum("n_chars").cast("long").alias("w"))
    draws = (
        spark.range(_WS_DRAWS)
        .select(F.col("id").alias("draw_id"))
        .join(F.broadcast(total))  # 1-row scalar cross (allowlisted)
        .select(
            "draw_id",
            # 15 hex digits = 60 draw bits (the kmv/theta convention): 12
            # digits (48 bits) would stop reaching documents past a total
            # weight of 2^48 chars (~2.8e14 — plausible at 100 TB), silently
            # biasing every draw into a prefix of the corpus.
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.concat(F.lit("ws:"), F.col("draw_id").cast("string"))), 1, 15),
                    16,
                    10,
                ).cast("long"),
                F.col("w"),
            ).alias("target"),
        )
    )
    return (
        cdf.join(
            F.broadcast(draws),
            (F.col("target") >= F.col("cum_lo"))
            & (F.col("target") < F.col("cum_lo") + F.col("n_chars")),
        )
        .select(
            F.col("draw_id").cast("long"),
            F.col("target").cast("long"),
            F.col("doc_id").cast("long"),
            F.col("n_chars").cast("long").alias("weight"),
        )
    )


# ---------------------------------------------------------------------------
# AUC — the rank-statistic (Mann-Whitney) form of ROC area, the model-quality
# gate an LLM quality-filter pipeline runs over its classifier scores: score
# = events.value predicting label = (event_type == 'purchase').
#
# AUC = P(score_pos > score_neg) + P(tie)/2. One groupBy collapses the data
# to per-distinct-score (pos_ct, neg_ct); the exclusive cumulative negative
# count over score order comes from the distributed prefix sum (never a
# single-partition window); then
#   num2 = Σ_scores pos_ct · (2·cum_neg_below + neg_ct)   (ties count half)
#   AUC  = num2 / (2 · n_pos · n_neg)
# — all BIGINT-exact until the single final IEEE division, so the value
# hash-matches the oracle bit-for-bit. Beyond ~1e9 positives×negatives the
# BIGINT products need DECIMAL(38,0); noted, not needed at any test SF.
# ---------------------------------------------------------------------------
_AUC_ORACLE = """
WITH per AS (
  SELECT value AS score,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos_ct,
         sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END) AS neg_ct
  FROM events GROUP BY 1
),
scanned AS (
  SELECT pos_ct, neg_ct,
         COALESCE(sum(neg_ct) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_neg
  FROM per
)
SELECT CAST(sum(pos_ct) AS BIGINT) AS n_pos,
       CAST(sum(neg_ct) AS BIGINT) AS n_neg,
       CAST(sum(pos_ct * (2 * cum_neg + neg_ct)) AS BIGINT) AS num2,
       CAST(sum(pos_ct * (2 * cum_neg + neg_ct)) AS DOUBLE)
         / CAST(2 * sum(pos_ct) * sum(neg_ct) AS DOUBLE) AS auc
FROM scanned
"""


@register("auc_score", _AUC_ORACLE)
def auc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_spark.operators.prefix import prefix_sum

    ev = load_table(spark, sf_dir, "events")
    # persisted: approxQuantile below is an ACTION over this frame, and the
    # prefix scan reads it again lazily — without the persist the full
    # events groupBy runs twice (measured 1.12s→2.69s when the equi-depth
    # cutpoint fix added the quantile pass). unpersist_with bounds lifetime.
    per = (
        ev.groupBy(F.col("value").alias("score"))
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("pos_ct"),
            F.sum(F.when(F.col("event_type") != "purchase", 1).otherwise(0)).alias("neg_ct"),
        )
        .persist()
    )
    # Equi-depth bucketing for the distributed scan: floor(score) made the
    # bucket count data-DEPENDENT — a score distribution concentrated in a
    # narrow numeric range collapsed every distinct score into one bucket
    # and the within-bucket window degenerated back to the single-partition
    # scan this operator exists to avoid. Instead take ~255 approximate
    # quantile cutpoints of the DISTINCT-score frame (driver-side: 255
    # doubles, scalar plan control like the fixpoint signatures) and bucket
    # by how many cutpoints lie at/below the score — monotone in score (a
    # prefix_sum requirement) with occupancy ~n_distinct/256 REGARDLESS of
    # the numeric distribution. Bucket ids only route the scan; the scanned
    # values are exact, so the oracle is unaffected by the bucket rule.
    probs = [i / 256 for i in range(1, 256)]
    cuts = sorted(set(per.approxQuantile("score", probs, 0.001)))
    if cuts:
        cut_arr = F.array(*[F.lit(float(c)) for c in cuts])
        bucket = F.size(F.filter(cut_arr, lambda c: c <= F.col("score"))).cast("long")
    else:  # empty input: any constant bucket is vacuously fine
        bucket = F.lit(0).cast("long")
    scanned = prefix_sum(
        per,
        ["score"],
        "neg_ct",
        bucket,
        out_col="cum_neg",
        inclusive=False,
    )
    row = scanned.agg(
        F.sum("pos_ct").cast("long").alias("n_pos"),
        F.sum("neg_ct").cast("long").alias("n_neg"),
        F.sum(F.col("pos_ct") * (2 * F.col("cum_neg") + F.col("neg_ct")))
        .cast("long")
        .alias("num2"),
    )
    return unpersist_with(
        row.select(
            "n_pos",
            "n_neg",
            "num2",
            (
                F.col("num2").cast("double")
                / (F.lit(2) * F.col("n_pos") * F.col("n_neg")).cast("double")
            ).alias("auc"),
        ),
        per,
    )


# ---------------------------------------------------------------------------
# Dedup recall/precision audit — the quality gate a production near-dup
# pipeline runs before swapping its exact O(pairs) verifier for the sketch
# path: MinHash-LSH candidates (match_ct >= n_hashes/2 ≈ Jaccard >= 50%)
# scored against the exact-Jaccard ground truth, pairwise TP/FP/FN plus the
# derived precision/recall. Composes the two registered pipelines verbatim
# (same parameters), so the audit measures exactly what the registry ships.
# One full-outer join of two pair sets; integer counts, two final IEEE
# divisions. At 100 TB you run this on a sampled shard — the audit's cost
# is the exact side, which is the thing it exists to retire.
# ---------------------------------------------------------------------------
_DEDUP_RECALL_ORACLE = f"""
SELECT CAST(count(*) FILTER (WHERE t.doc_a IS NOT NULL AND a.doc_a IS NOT NULL) AS BIGINT) AS tp,
       CAST(count(*) FILTER (WHERE t.doc_a IS NULL) AS BIGINT) AS fp,
       CAST(count(*) FILTER (WHERE a.doc_a IS NULL) AS BIGINT) AS fn,
       CAST(count(*) FILTER (WHERE t.doc_a IS NOT NULL AND a.doc_a IS NOT NULL) AS DOUBLE)
         / nullif(count(*) FILTER (WHERE a.doc_a IS NOT NULL), 0) AS precision,
       CAST(count(*) FILTER (WHERE t.doc_a IS NOT NULL AND a.doc_a IS NOT NULL) AS DOUBLE)
         / nullif(count(*) FILTER (WHERE t.doc_a IS NOT NULL), 0) AS recall
FROM ({_JACCARD_ORACLE}) t
FULL JOIN (SELECT doc_a, doc_b FROM ({_MINHASH_ORACLE}) WHERE match_ct >= 4) a
  ON t.doc_a = a.doc_a AND t.doc_b = a.doc_b
"""


@register("dedup_recall_audit", _DEDUP_RECALL_ORACLE)
def dedup_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    truth = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    approx = (
        dedup_minhash(spark, sf_dir)
        .filter(F.col("match_ct") >= 4)
        .select(F.col("doc_a").alias("pa"), F.col("doc_b").alias("pb"))
    )
    j = truth.join(
        approx, (truth["doc_a"] == approx["pa"]) & (truth["doc_b"] == approx["pb"]), "full"
    )
    tp = F.sum(
        F.when(F.col("doc_a").isNotNull() & F.col("pa").isNotNull(), 1).otherwise(0)
    ).cast("long")
    fp = F.sum(F.when(F.col("doc_a").isNull(), 1).otherwise(0)).cast("long")
    fn = F.sum(F.when(F.col("pa").isNull(), 1).otherwise(0)).cast("long")
    return j.agg(tp.alias("tp"), fp.alias("fp"), fn.alias("fn")).select(
        "tp",
        "fp",
        "fn",
        (F.col("tp").cast("double") / F.nullif((F.col("tp") + F.col("fp")).cast("double"), F.lit(0.0))).alias("precision"),
        (F.col("tp").cast("double") / F.nullif((F.col("tp") + F.col("fn")).cast("double"), F.lit(0.0))).alias("recall"),
    )


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-chop) — how LLM pretraining actually batches a
# corpus: documents are concatenated in a fixed order and chopped into
# fixed-capacity context windows ("bins" of PACK_CAP tokens), so every
# window is exactly full and a document can straddle a boundary. The
# deterministic rule (doc_id order, capacity C) makes the layout a pure
# function of the corpus: doc d with exclusive token offset `off` and token
# count `tok` occupies bins floor(off/C) .. floor((off+tok-1)/C), with
# min(off+tok, (b+1)C) − max(off, bC) tokens in bin b.
#
# Scale shape: token counts are one narrow projection; the global exclusive
# offset comes from the distributed prefix scan (operators/prefix.py — never
# a single-partition window); the bin explode is ≤ tok/C + 1 rows per doc.
# One shuffle for the scan, everything else codegen — at 100 TB this is the
# same plan, just wider. Tokens = non-empty whitespace splits (the same
# deterministic count token_fertility uses); zero-token docs pack nowhere.
# ---------------------------------------------------------------------------
PACK_CAP = 256

_PACK_CHOP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split(trim(text), ' '), w -> w <> '')) AS tok
  FROM documents
),
cum AS (
  SELECT doc_id, tok,
         CAST(COALESCE(sum(tok) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM toks WHERE tok > 0
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(b AS BIGINT) AS bin,
       CAST(least(off + tok, (b + 1) * {PACK_CAP})
            - greatest(off, b * {PACK_CAP}) AS BIGINT) AS n_tok
FROM cum, UNNEST(generate_series(off // {PACK_CAP}, (off + tok - 1) // {PACK_CAP})) AS u(b)
"""


@register("pack_concat_chop", _PACK_CHOP_ORACLE)
def pack_concat_chop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmall_spark.operators.prefix import prefix_sum

    C = PACK_CAP
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(F.filter(F.split(F.trim("text"), " "), lambda w: w != ""))
            .cast("long")
            .alias("tok"),
        )
        .filter(F.col("tok") > 0)
    )
    cum = prefix_sum(
        toks,
        ["doc_id"],
        "tok",
        (F.col("doc_id") / 256).cast("long"),
        out_col="off",
        inclusive=False,
    )
    spans = cum.select(
        "doc_id",
        "tok",
        "off",
        F.explode(
            F.sequence(F.expr(f"off DIV {C}"), F.expr(f"(off + tok - 1) DIV {C}"))
        ).alias("bin"),
    )
    return spans.select(
        F.col("doc_id").cast("long"),
        F.col("bin").cast("long"),
        (
            F.least(F.col("off") + F.col("tok"), (F.col("bin") + 1) * C)
            - F.greatest(F.col("off"), F.col("bin") * C)
        )
        .cast("long")
        .alias("n_tok"),
    )

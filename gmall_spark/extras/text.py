"""Text analysis operators: quality metrics, language-ID heuristic, token
counting, document fingerprinting.

All integer/string outputs (no float ratios) so the DuckDB oracle matches
exactly; all built-in expressions (codegen'd) — the tokenizer is the only
pluggable piece (whitespace by default; a jieba-style segmenter would slot in
as an Arrow-batched pandas_udf returning array<string>, mirroring the
reference's IK UDTF at gmall-realtime/.../func/SplitFunction.java:9-18).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str):
    return F.split(F.trim(F.col(text_col)), " ")


def quality_metrics(
    df: DataFrame,
    id_col: str,
    text_col: str,
    extra_cols: Sequence[str] = (),
    stopwords: Sequence[str] = (),
) -> DataFrame:
    """Per-doc token statistics: counts, distinct, char sums, stopword hits."""
    toks = df.select(
        F.col(id_col), *extra_cols, F.explode(_tokens(text_col)).alias("token")
    ).filter(F.col("token") != "")
    return toks.groupBy(id_col).agg(
        *[F.first(c).alias(c) for c in extra_cols],
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("token").alias("n_unique_tokens"),
        F.sum(F.length("token")).alias("token_chars"),
        F.sum(F.when(F.col("token").isin(*stopwords), 1).otherwise(0))
        .cast("long")
        .alias("stopword_ct"),
        F.max(F.length("token")).cast("long").alias("max_token_len"),
    )


def lang_id(
    df: DataFrame,
    id_col: str,
    text_col: str,
    markers: Mapping[str, Sequence[str]],
    true_col: str | None = None,
) -> DataFrame:
    """Marker-word language ID: score per language = count of tokens in that
    language's marker set; prediction = argmax, alphabetical tie-break (the
    CASE..greatest chain evaluates languages in sorted order)."""
    langs = sorted(markers)
    extra = (true_col,) if true_col else ()
    toks = df.select(
        F.col(id_col), *extra, F.explode(_tokens(text_col)).alias("token")
    ).filter(F.col("token") != "")
    aggs = [
        F.sum(F.when(F.col("token").isin(*markers[lang]), 1).otherwise(0))
        .cast("long")
        .alias(f"score_{lang}")
        for lang in langs
    ]
    if true_col:
        aggs.insert(0, F.first(true_col).alias("lang_true"))
    scored = toks.groupBy(id_col).agg(*aggs)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    expr = None
    for lang in langs[:-1]:
        cond = best == F.col(f"score_{lang}")
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    expr = expr.otherwise(F.lit(langs[-1]))
    return scored.withColumn("lang_pred", expr)


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace tokens, regex word tokens, and the 4-chars-per-token BPE
    estimate — all integers."""
    return df.select(
        F.col(id_col),
        F.size(F.filter(_tokens(text_col), lambda x: x != "")).cast("long").alias("ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit("[a-z]+")).cast("long").alias("word_tokens"),
        F.ceil(F.length(text_col) / 4.0).cast("long").alias("bpe_est_tokens"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str, k: int = 5) -> DataFrame:
    """Whole-content md5 + min-k-gram fingerprint (rolling-hash family: the
    min over the shingle-hash stream identifies near-identical content even
    when whole-content hashes differ)."""
    norm = F.lower(F.trim(F.col(text_col)))
    toks = F.split(norm, " ")
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("content_fp"),
        F.array_min(F.transform(sh, lambda s: F.md5(s))).alias("min_shingle_fp"),
    )


def tokenize_udf(text_col: str):
    """F1 — the pluggable tokenizer UDF (the reference's IK Chinese analyzer,
    utils/KeywordUtil.java:16-35, as an Arrow-batched pandas UDF). Uses jieba
    when importable (the public IK analogue), whitespace otherwise — the
    fallback keeps the operator runnable in codec-less environments and the
    oracle exact. Returns array<string>; compose with F.explode for the
    LATERAL TABLE shape (SplitFunction.java:9-18)."""
    import pandas as pd
    from pyspark.sql import functions as F  # local: keep module import-light
    from pyspark.sql import types as T

    try:
        import jieba  # noqa: F401

        def _cut(s):
            import jieba

            return s.fillna("").map(lambda t: [w for w in jieba.cut(t) if w.strip()])

    except ImportError:

        def _cut(s):
            return s.fillna("").map(lambda t: [w for w in t.strip().split(" ") if w])

    fn = F.pandas_udf(_cut, T.ArrayType(T.StringType()))
    return fn(text_col)

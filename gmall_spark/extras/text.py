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


# Small built-in lexicon of common zh e-commerce terms (the reference's
# keyword domain: product search phrases — KeywordStatsApp.java segments
# exactly this kind of text with IK smart mode). Pass a full public lexicon
# (e.g. jieba's dict.txt contents) via `dictionary` for production use.
DEFAULT_ZH_LEXICON = frozenset(
    {
        "小米", "手机", "苹果", "华为", "电视", "冰箱", "洗衣机", "空调",
        "电脑", "笔记本", "平板", "耳机", "充电器", "数据线", "保护壳",
        "双卡", "双待", "全面屏", "智能", "家电", "官方", "旗舰店", "正品",
        "包邮", "高清", "无线", "蓝牙", "游戏", "相机", "口红", "图书",
    }
)


def _is_cjk(ch: str) -> bool:
    return "一" <= ch <= "鿿"


def _fmm_segment(text: str, lexicon: frozenset, max_len: int) -> list[str]:
    """Forward-maximum-matching over CJK runs (the classic dictionary
    segmenter IK's smart mode descends from): at each position take the
    longest lexicon word; unmatched CJK chars pass through as singletons.
    Non-CJK spans fall back to whitespace tokens."""
    out: list[str] = []
    buf: list[str] = []  # pending non-CJK span

    def flush():
        if buf:
            out.extend(w for w in "".join(buf).split() if w)
            buf.clear()

    i, n = 0, len(text)
    while i < n:
        if _is_cjk(text[i]):
            flush()
            for ln in range(min(max_len, n - i), 1, -1):
                if text[i : i + ln] in lexicon:
                    out.append(text[i : i + ln])
                    i += ln
                    break
            else:
                out.append(text[i])
                i += 1
        else:
            buf.append(text[i])
            i += 1
    flush()
    return out


def tokenize_udf(text_col: str, dictionary: frozenset | None = None):
    """F1 — the pluggable tokenizer UDF (the reference's IK Chinese analyzer,
    utils/KeywordUtil.java:16-35, as an Arrow-batched pandas UDF). Chain:
    jieba when importable (the public IK analogue) → dictionary-based
    forward-maximum-matching over CJK runs (DEFAULT_ZH_LEXICON or the caller's
    `dictionary`) with whitespace for non-CJK spans. Pure-ASCII text always
    degrades to whitespace tokens, keeping the SQL oracle exact on the
    synthetic corpus. Returns array<string>; compose with F.explode for the
    LATERAL TABLE shape (SplitFunction.java:9-18)."""
    from pyspark.sql import functions as F  # local: keep module import-light
    from pyspark.sql import types as T

    lex = dictionary if dictionary is not None else DEFAULT_ZH_LEXICON
    max_len = max((len(w) for w in lex), default=1)

    try:
        import jieba  # noqa: F401

        def _cut(s):
            import jieba

            return s.fillna("").map(lambda t: [w for w in jieba.cut(t) if w.strip()])

    except ImportError:

        def _cut(s):
            return s.fillna("").map(lambda t: _fmm_segment(t, lex, max_len))

    fn = F.pandas_udf(_cut, T.ArrayType(T.StringType()))
    return fn(text_col)


def bigram_lm_scores(
    df: DataFrame, id_col: str, text_col: str, keep_threshold: float
) -> DataFrame:
    """CCNet-style LM quality filtering: score each document by the mean
    Laplace-smoothed bigram probability of its own corpus's bigram model
    (low score = text unlike the corpus — the perplexity-filter shape).

    Float parity, deliberately: this is the one extras op that outputs a
    float ratio, and it is safe because every arithmetic step is IEEE-exact
    or order-pinned. Probabilities are single divisions of exact integers
    (< 2^53); the per-doc sum folds LEFT-TO-RIGHT IN POSITION ORDER via
    ``F.aggregate`` over a position-sorted array (DuckDB replays with
    ``list_reduce(list(p ORDER BY pos))``), so the non-associativity of
    double addition never sees two different orders. A production variant
    would sum log-probs — same shape, but ``ln`` is not bit-portable across
    engines, and at this corpus scale the mean probability ranks documents
    identically for filtering purposes (documented deviation).

    Scale: two shuffles to build the model (bigram + unigram counts over the
    corpus, both partial-agg), one broadcastable vocab scalar, one join of
    corpus positions against the model keyed on the bigram, one groupBy on
    the doc id. The model tables are vocab²-bounded, not corpus-sized.
    """
    pos = (
        df.select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(size(filter(split(trim({text_col}), ' '), "
                    f"x -> x <> '')) - 1, 0)), "
                    f"i -> struct(i AS pos, "
                    f"filter(split(trim({text_col}), ' '), x -> x <> '')[i-1] AS prev, "
                    f"filter(split(trim({text_col}), ' '), x -> x <> '')[i] AS cur))"
                )
            ).alias("b"),
        )
        .select(id_col, "b.pos", "b.prev", "b.cur")
    )
    bct = pos.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("bct"))
    uct = pos.groupBy("prev").agg(F.count(F.lit(1)).alias("uct"))
    vocab = (
        df.select(F.explode(F.filter(_tokens(text_col), lambda x: x != "")).alias("w"))
        .agg(F.countDistinct("w").alias("vocab"))
    )
    p = (
        pos.join(bct, ["prev", "cur"])
        .join(uct, ["prev"])
        .crossJoin(F.broadcast(vocab))  # 1-row scalar — the allowlisted pattern
        .select(
            id_col,
            "pos",
            (
                (F.col("bct") + F.lit(1)).cast("double")
                / (F.col("uct") + F.col("vocab")).cast("double")
            ).alias("p"),
        )
    )
    agg = (
        p.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.aggregate(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "p"))), lambda x: x["p"]
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("s"),
        )
    )
    score = F.coalesce(F.col("s") / F.col("n_bigrams"), F.lit(0.0))
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            score.alias("lm_score"),
            (score >= F.lit(keep_threshold)).alias("keep"),
        )
    )


def nb_posterior_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    train_col: str,
    keep_threshold: float = 0.5,
) -> DataFrame:
    """Model-based quality filtering (the CCNet/GPT-3 classifier-filter
    shape): train a multinomial-Naive-Bayes token model on the labeled split
    (``train_col`` true; boolean ``label_col`` = high quality) and score
    every held-out document by its mean per-token class posterior
    p(hi|w) = P(w|hi) / (P(w|hi) + P(w|lo)) under equal priors, keeping
    docs whose mean posterior clears ``keep_threshold``.

    Float parity, same discipline as bigram_lm_scores: Laplace-smoothed
    likelihoods are single IEEE divisions of exact integer counts, the
    posterior is one add + one divide of those, and the per-doc sum folds
    left-to-right in position order via ``F.aggregate`` over a
    position-sorted array (DuckDB replays with ``list_reduce(list(p ORDER
    BY pos))``). A production variant would sum log-likelihoods; ``ln`` is
    not bit-portable across engines, and the mean posterior ranks documents
    identically for a thresholded filter (documented deviation).

    Scale: the model is VOCAB-bounded, never corpus-bounded — one
    partial-agg shuffle builds per-token class counts from the training
    split, totals reduce to a 1-row broadcast scalar, the held-out token
    stream left-joins the model keyed on token (broadcastable whenever the
    training vocab fits, AQE's call), and one groupBy on the doc id folds
    the scores. Unseen tokens take the smoothing-only posterior from the
    same formula via coalesce-to-0, so no second code path exists.
    """
    tok = df.select(
        id_col,
        F.col(label_col).alias("_lab"),
        F.col(train_col).alias("_train"),
        F.posexplode(F.filter(_tokens(text_col), lambda x: x != "")).alias("pos", "w"),
    )
    model = (
        tok.filter("_train")
        .groupBy("w")
        .agg(
            F.sum(F.when(F.col("_lab"), 1).otherwise(0)).alias("ct_hi"),
            F.sum(F.when(F.col("_lab"), 0).otherwise(1)).alias("ct_lo"),
        )
    )
    totals = model.agg(
        F.sum("ct_hi").alias("tok_hi"),
        F.sum("ct_lo").alias("tok_lo"),
        F.count(F.lit(1)).alias("vocab"),
    )
    scored = (
        tok.filter(~F.col("_train"))
        .join(model, "w", "left")
        .crossJoin(F.broadcast(totals))  # 1-row scalar — the allowlisted pattern
        .select(
            id_col,
            "pos",
            (
                (F.coalesce("ct_hi", F.lit(0)) + F.lit(1)).cast("double")
                / (F.col("tok_hi") + F.col("vocab")).cast("double")
            ).alias("a"),
            (
                (F.coalesce("ct_lo", F.lit(0)) + F.lit(1)).cast("double")
                / (F.col("tok_lo") + F.col("vocab")).cast("double")
            ).alias("b"),
        )
        .select(id_col, "pos", (F.col("a") / (F.col("a") + F.col("b"))).alias("p"))
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_toks"),
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "p"))), lambda x: x["p"]
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("s"),
    )
    score = F.coalesce(F.col("s") / F.col("n_toks"), F.lit(0.0))
    return (
        df.filter(~F.col(train_col))
        .select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_toks", F.lit(0)).cast("long").alias("n_toks"),
            score.alias("nb_score"),
            (score >= F.lit(keep_threshold)).alias("keep"),
        )
    )

"""Distributed BPE (byte-pair-encoding) tokenizer training + application.

The LLM-pipeline step the reference has no analog for (its tokenizer surface
is the CJK keyword UDTF, `KeywordUtil.java` — see extras/text.py); this is
the subword side a training-data engine needs. The design is the scalable
one every production tokenizer trainer uses (word-frequency-based, as in the
original Sennrich et al. 2016 reference implementation and HuggingFace
`tokenizers`): pair statistics are computed over the DISTINCT-WORD vocabulary
weighted by corpus frequency, never over the raw corpus. At 100 TB the corpus
is billions of documents but the vocab is ~10M rows — the per-merge work is a
groupBy on a table that is orders of magnitude smaller than the data, and the
corpus itself is touched exactly twice (once to count words, once to encode).

Merge-application semantics — pinned for engine parity: one merge rewrites a
word's space-separated symbol string by ``replace(replace(rep, ' l r ', ' lr '),
' l r ', ' lr ')`` — two passes of plain leftmost-restart string replacement.
Both Spark SQL's ``replace`` and DuckDB's ``replace`` scan left-to-right,
substitute non-overlapping occurrences, and continue AFTER the replacement
(verified empirically on runs of repeated symbols: ' a a a a ' -> ' aa aa '
in both engines), so the oracle replays the rewrite bit-for-bit. The second
pass catches the pair straddling a consumed separator (first pass eats the
space between occurrences, ' a a a a ' -> ' aa a a '). For odd runs of ≥5
identical symbols this differs from canonical BPE's strictly-sequential scan
(' a a a a a ' -> ' aa a aa ' here vs ' aa aa a ' canonically) — same token
count, different split point; documented deviation, deterministic in both
engines.

Symbols are the word's characters plus the classic ``</w>`` end-of-word
marker (no regex involved anywhere, so no metacharacter escaping: patterns
are literal strings).

Per-merge loop control collects exactly ONE row (the argmax pair) — k rows
driver-side for k merges, never data. Ties break deterministically on
(count DESC, left, right).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

END_MARK = "</w>"


def word_freqs(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the whitespace-tokenized corpus — the only full-corpus
    pass in training; one shuffle on the word."""
    return (
        docs.select(F.explode(F.split(F.trim(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def char_rep(words: DataFrame) -> DataFrame:
    """Initial symbol string per word: ' h e l l o </w> ' (space-bounded so a
    literal ' l r ' pattern matches at word edges too)."""
    return words.withColumn(
        "rep",
        F.concat(
            F.lit(" "),
            F.concat_ws(" ", F.split("word", "")),
            F.lit(f" {END_MARK} "),
        ),
    )


def _pair_counts(rep: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency. The explode is
    over vocab rows × symbols-per-word — vocab-sized, not corpus-sized."""
    # The size>=2 filter guards fully-merged words (rep collapsed to ONE
    # symbol, e.g. 'a</w>' once (a,</w>) merges): sequence(0, -1) is a
    # DESCENDING sequence [0,-1] in Spark, and the transform then indexed
    # out of bounds — found by the learn_sampled equality property test on
    # a corpus small enough for a whole word to merge within the round
    # budget. A one-symbol word contributes no pairs by definition.
    pairs = F.expr(
        "transform(sequence(0, size(split(trim(rep), ' ')) - 2), "
        "i -> struct(split(trim(rep), ' ')[i] AS lt, split(trim(rep), ' ')[i+1] AS rt))"
    )
    return (
        rep.filter(F.size(F.split(F.trim("rep"), " ")) >= 2)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.lt").alias("lt"), F.col("p.rt").alias("rt"))
        .agg(F.sum("freq").alias("ct"))
    )


def learn(docs: DataFrame, text_col: str, n_merges: int) -> tuple[list[tuple], DataFrame]:
    """Run `n_merges` BPE rounds; returns ([(rank, left, right, count)], final
    per-word symbol table). Each round: one vocab-sized groupBy + one 1-row
    collect (the argmax — loop control, not data movement) + one broadcast
    literal rewrite of the vocab. At 10M-word scale each round is a shuffle of
    ~10M narrow rows; lineage stays shallow because the rewrite is a single
    projected column per round.

    SCALE BOUND — this loop is one Spark job per merge. Fine at the registry's
    merge counts (tens); fatal at production vocab sizes (a 30k-merge run is
    30k scheduler round-trips). The production recipe is `learn_sampled`:
    ONE corpus pass builds the word-frequency table, its top `max_vocab` rows
    (the frequency mass that decides every merge) collect driver-side —
    ~60 MB at 1M words — and the merge loop runs in-process with incremental
    pair counts, zero Spark jobs per merge; the learned table is then applied
    distributed (encode_counts / apply_merges). Same semantics: the property
    test pins merges(learn_sampled) == merges(learn) whenever max_vocab
    covers the vocab, which is how every production word-frequency trainer
    (Sennrich reference impl, HF tokenizers) structures the computation."""
    # the ONLY corpus-sized pass — persist it: every merge round re-derives
    # its pair counts from this frame, and without the persist round k would
    # replay the corpus word-count shuffle k times (at 100 TB, fatal; the
    # replace chain itself is narrow vocab-sized recomputation, fine)
    base = char_rep(word_freqs(docs, text_col)).persist()
    rep = base
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(rep)
            .orderBy(F.col("ct").desc(), "lt", "rt")
            .limit(1)
            .first()
        )
        if top is None:  # corpus exhausted (smaller than n_merges pairs)
            break
        merges.append((rank, top["lt"], top["rt"], int(top["ct"])))
        pat = F.lit(f" {top['lt']} {top['rt']} ")
        sub = F.lit(f" {top['lt']}{top['rt']} ")
        # two-pass leftmost-restart rewrite — see module docstring for the
        # cross-engine parity argument
        rep = rep.withColumn("rep", F.replace(F.replace("rep", pat, sub), pat, sub))
    from gmall_spark.session import unpersist_with

    return merges, unpersist_with(rep, base)


def learn_sampled(
    docs: DataFrame, text_col: str, n_merges: int, max_vocab: int = 1_000_000
) -> list[tuple]:
    """Driver-side BPE training over the top-`max_vocab` word-frequency rows —
    the production path for large merge counts (see the scale bound on
    `learn`). One corpus-sized Spark pass (word_freqs), one bounded collect,
    then a pure in-process merge loop with an incremental pair index (only
    words containing the merged pair are rewritten per round) — the classic
    Sennrich structure. Rewrite semantics are IDENTICAL to the distributed
    path: the same two-pass leftmost-restart string replace (python
    str.replace shares Spark replace's non-overlapping continue-after
    behavior), and the same (count DESC, left, right) tie-break (UTF-8 byte
    order equals code-point order, so the comparisons agree cross-engine).
    Returns [(rank, left, right, count)]; equality with `learn` whenever
    max_vocab covers the vocab is pinned by a property test.

    Truncating to max_vocab drops only the frequency tail; merges whose
    counts rest on mass above the cutoff are unaffected — the standard
    trade every sampled tokenizer run makes."""
    from collections import defaultdict

    rows = (
        word_freqs(docs, text_col)
        .orderBy(F.col("freq").desc(), "word")
        .limit(max_vocab)
        .collect()
    )
    freqs = {r["word"]: r["freq"] for r in rows}
    reps = {w: " " + " ".join(list(w)) + f" {END_MARK} " for w in freqs}

    def pairs_of(rep: str) -> list[tuple[str, str]]:
        syms = rep.split()
        return [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]

    pair_ct: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set] = defaultdict(set)
    for w, rep in reps.items():
        for p in pairs_of(rep):
            pair_ct[p] += freqs[w]
            pair_words[p].add(w)

    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        if not pair_ct:
            break
        (lt, rt), ct = min(
            pair_ct.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, lt, rt, int(ct)))
        pat, sub = f" {lt} {rt} ", f" {lt}{rt} "
        for w in list(pair_words[(lt, rt)]):
            old = reps[w]
            new = old.replace(pat, sub).replace(pat, sub)
            if new == old:
                continue
            for p in pairs_of(old):
                pair_ct[p] -= freqs[w]
                if pair_ct[p] <= 0:
                    del pair_ct[p]
                pair_words[p].discard(w)
            reps[w] = new
            for p in pairs_of(new):
                pair_ct[p] += freqs[w]
                pair_words[p].add(w)
    return merges


def train_table(spark: SparkSession, docs: DataFrame, text_col: str, n_merges: int) -> DataFrame:
    """The learned merge table as a DataFrame: (rank, left_tok, right_tok,
    pair_ct) — the tokenizer artifact a downstream encode step consumes."""
    merges, _ = learn(docs, text_col, n_merges)
    return spark.createDataFrame(
        merges, "rank int, left_tok string, right_tok string, pair_ct bigint"
    )


def encode_counts(docs: DataFrame, id_col: str, text_col: str, n_merges: int) -> DataFrame:
    """Apply the learned merges to the corpus; per-doc token accounting:
    (doc_id, n_words, n_tokens_char, n_tokens_bpe). The corpus-sized work is
    one explode + one join against the (broadcastable) encoded vocab + one
    groupBy on the doc id; documents with no words survive with zero counts."""
    _, rep = learn(docs, text_col, n_merges)
    enc = rep.select(
        "word",
        F.size(F.split(F.trim("rep"), " ")).cast("long").alias("n_tok"),
        (F.size(F.split("word", "")) + F.lit(1)).cast("long").alias("n_char_tok"),
    )
    doc_words = (
        docs.select(id_col, F.explode(F.split(F.trim(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    per_doc = (
        doc_words.join(F.broadcast(enc), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_char_tok").alias("n_tokens_char"),
            F.sum("n_tok").alias("n_tokens_bpe"),
        )
    )
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
        F.coalesce("n_tokens_char", F.lit(0)).cast("long").alias("n_tokens_char"),
        F.coalesce("n_tokens_bpe", F.lit(0)).cast("long").alias("n_tokens_bpe"),
    )


def oracle_cte(n_merges: int) -> str:
    """DuckDB CTE chain replaying training exactly: wordsfreq → char rep →
    n× (pair count, argmax, two-pass rewrite). Generated, not hand-unrolled,
    so entries can pick their merge depth."""
    parts = [
        "words AS (SELECT w AS word, count(*) AS freq FROM "
        "(SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents) "
        "WHERE w <> '' GROUP BY 1)",
        "rep0 AS (SELECT word, freq, "
        f"' ' || array_to_string(string_split(word, ''), ' ') || ' {END_MARK} ' AS rep "
        "FROM words)",
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f"pairs{i} AS (SELECT t[j] AS lt, t[j+1] AS rt, sum(freq) AS ct "
            f"FROM (SELECT freq, string_split(trim(rep), ' ') AS t FROM rep{i-1}), "
            "UNNEST(range(1, len(t))) AS u(j) GROUP BY 1, 2)"
        )
        parts.append(
            f"top{i} AS (SELECT lt, rt, ct FROM pairs{i} ORDER BY ct DESC, lt, rt LIMIT 1)"
        )
        parts.append(
            f"rep{i} AS (SELECT w.word, w.freq, "
            "replace(replace(w.rep, s.pat, s.sub), s.pat, s.sub) AS rep "
            f"FROM rep{i-1} w CROSS JOIN "
            "(SELECT ' ' || lt || ' ' || rt || ' ' AS pat, "
            f"' ' || lt || rt || ' ' AS sub FROM top{i}) s)"
        )
    return "WITH " + ",\n".join(parts)


def train_oracle(n_merges: int) -> str:
    unions = [
        f"SELECT CAST({i} AS INT) AS rank, lt AS left_tok, rt AS right_tok, "
        f"CAST(ct AS BIGINT) AS pair_ct FROM top{i}"
        for i in range(1, n_merges + 1)
    ]
    return oracle_cte(n_merges) + "\n" + "\nUNION ALL ".join(unions)


def encode_oracle(n_merges: int) -> str:
    n = n_merges
    return (
        oracle_cte(n)
        + f""",
doc_words AS (
  SELECT doc_id, w AS word FROM
    (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w FROM documents)
  WHERE w <> ''
),
enc AS (
  SELECT word, len(string_split(trim(rep), ' ')) AS n_tok,
         len(string_split(word, '')) + 1 AS n_char_tok
  FROM rep{n}
),
per_doc AS (
  SELECT dw.doc_id, count(*) AS n_words, sum(e.n_char_tok) AS n_tokens_char,
         sum(e.n_tok) AS n_tokens_bpe
  FROM doc_words dw JOIN enc e USING (word) GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
       CAST(coalesce(p.n_tokens_char, 0) AS BIGINT) AS n_tokens_char,
       CAST(coalesce(p.n_tokens_bpe, 0) AS BIGINT) AS n_tokens_bpe
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id"""
    )

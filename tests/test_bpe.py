"""BPE trainer unit semantics — hand-computed merges on a tiny corpus, the
two-pass rewrite on repeated-symbol runs, and the encode count invariant.
(Cross-engine parity for the registry entries is covered by
tests/test_oracle_parity.py like every other entry.)"""

from __future__ import annotations

from gmall_spark.extras import bpe


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_learn_matches_hand_computed_merges(spark):
    # words: low×3, lower×2, newest×1 — classic Sennrich toy corpus
    docs = _docs(spark, ["low low low", "lower lower", "newest"])
    merges, _ = bpe.learn(docs, "text", 3)
    # round 1: (l,o) and (o,w) tie at 5; lex tie-break picks (l,o)
    # round 2: (lo,w) at 5; round 3: (low,</w>) at 3
    assert merges == [(1, "l", "o", 5), (2, "lo", "w", 5), (3, "low", "</w>", 3)]


def test_repeated_run_uses_two_pass_semantics(spark):
    # ' a a a a </w> ' --(a,a)--> pass1 ' aa a a </w> ', pass2 ' aa aa </w> ':
    # the documented leftmost-restart × 2 semantics (see extras/bpe.py)
    docs = _docs(spark, ["aaaa aaaa b"])
    merges, rep = bpe.learn(docs, "text", 1)
    assert merges[0][1] == "a" and merges[0][2] == "a"
    reps = {r["word"]: r["rep"] for r in rep.collect()}
    assert reps["aaaa"] == " aa aa </w> "


def test_encode_counts_invariants(spark):
    docs = _docs(spark, ["low low low", "lower lower", "newest", "   "])
    out = {r["doc_id"]: r for r in bpe.encode_counts(docs, "doc_id", "text", 3).collect()}
    # doc 0: 'low'×3 — char side 3 chars + </w> = 4/word = 12; the three
    # merges fold ' l o w </w> ' all the way to the single token ' low</w> '
    assert out[0]["n_words"] == 3
    assert out[0]["n_tokens_char"] == 12 and out[0]["n_tokens_bpe"] == 3
    # doc 2 'newest': merges touch only (l,o)/(lo,w)/(low,</w>) → unchanged
    assert out[2]["n_tokens_char"] == 7 and out[2]["n_tokens_bpe"] == 7
    # whitespace-only doc survives with zero counts (left join contract)
    assert out[3]["n_words"] == 0 and out[3]["n_tokens_bpe"] == 0
    for r in out.values():
        assert r["n_tokens_bpe"] <= r["n_tokens_char"]


def test_learn_sampled_equals_full_train(spark):
    """The production sample-then-train path (learn_sampled: driver-side
    incremental merge loop over the collected word-frequency table) must
    produce EXACTLY the merges of the distributed per-round loop whenever
    max_vocab covers the vocabulary — same argmax, same tie-break, same
    two-pass rewrite semantics. Run at registry scale (sf0.001 documents,
    registry merge count) plus the toy corpora with adversarial runs."""
    from gmall_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    full, _ = bpe.learn(docs, "text", 8)
    sampled = bpe.learn_sampled(docs, "text", 8, max_vocab=10**6)
    assert sampled == full

    toy = _docs(spark, ["aaaaa aaaa aaa", "low low lower", "a b a b a"])
    full_t, _ = bpe.learn(toy, "text", 6)
    assert bpe.learn_sampled(toy, "text", 6, max_vocab=10**6) == full_t


def test_learn_sampled_truncation_keeps_head_merges(spark):
    """Truncating to max_vocab drops only tail mass: on a corpus where one
    word dominates, the first merges are decided by the head and survive
    truncation."""
    docs = _docs(spark, ["zzz zzz zzz zzz zzz zzz zzz zzz", "qx"])
    head = bpe.learn_sampled(docs, "text", 2, max_vocab=1)
    full = bpe.learn_sampled(docs, "text", 2, max_vocab=10)
    assert head[0][1:3] == full[0][1:3] == ("z", "z")

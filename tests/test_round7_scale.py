"""Round-7 scale-task semantics (driver round 7 — VERDICT r6 task list):
the dedup_levenshtein blocking rewrite, the semantic-dedup auto-density
twin and its pinned-density guard, and the audit tool's failure-reason
capture. The oracle suite hash-verifies the same entries against DuckDB;
these pin the properties a hash match alone would not explain — that the
new blocking is a pure refinement on the corpus (no lost near-dups vs a
brute-force reference), and that the pinned semantic density fails loud
toward the auto twin instead of degenerating."""

from __future__ import annotations

import duckdb

import gmall_spark.extras.queries  # noqa: F401  (registers extras entries)
from gmall_spark.extras import similarity
from gmall_spark.queries import QUERIES
from gmall_spark.sources import load_table

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_levenshtein_blocking_matches_bruteforce_reference(spark):
    """The registry entry's candidate blocking (tok1, tok2, length-bucket
    ±1 + ±16-char residual) must return EXACTLY the pairs a brute-force
    all-pairs scan finds under the declared pair predicate (same first two
    tokens, |Δlen| ≤ 16, dist ≤ 24) — i.e. the length bucket is a lossless
    physical refinement, and no (tok1, tok2) pair is dropped by the
    equi-key plumbing (explode off-by-one, null token handling, ...)."""
    got = sorted(
        map(tuple, QUERIES["dedup_levenshtein"](spark, SF01).collect())
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF01}/documents.parquet')"
    )
    # brute force: NO blocking key at all, only the declared pair predicate
    want = sorted(
        map(
            tuple,
            con.execute(
                """
                WITH d AS (
                  SELECT doc_id, text, n_chars,
                         string_split(trim(text), ' ') AS t
                  FROM documents
                )
                SELECT a.doc_id, b.doc_id,
                       CAST(levenshtein(a.text, b.text) AS BIGINT)
                FROM d a JOIN d b ON a.doc_id < b.doc_id
                WHERE a.t[1] = b.t[1] AND a.t[2] = b.t[2]
                  AND abs(a.n_chars - b.n_chars) <= 16
                  AND levenshtein(a.text, b.text) <= 24
                """
            ).fetchall(),
        )
    )
    assert got == want
    assert len(got) > 0  # the corpus does contain near-dups at this sf


def test_levenshtein_single_token_docs_never_pair(spark):
    """Docs with no second token carry a null blocking key; null equi-keys
    match nothing in BOTH engines (Spark join semantics = SQL), so such a
    doc can never appear in the output even against an identical copy of
    itself — pin that corner so neither engine silently diverges."""
    import os
    import tempfile

    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": pd.array([1, 2, 3, 4], dtype="int64"),
            "text": ["solo", "solo", "two tokens here", "two tokens there"],
            "lang": ["en"] * 4,
            "source": ["t"] * 4,
            "n_chars": pd.array([4, 4, 15, 16], dtype="int64"),
        }
    )
    with tempfile.TemporaryDirectory() as td:
        # single parquet FILE, the testdata layout load_table expects
        pdf.to_parquet(os.path.join(td, "documents.parquet"), index=False)
        out = QUERIES["dedup_levenshtein"](spark, td).collect()
    pairs = {(r.doc_a, r.doc_b) for r in out}
    assert (1, 2) not in pairs  # identical single-token docs: null key
    assert (3, 4) in pairs  # two-token docs pair normally


def test_semantic_dedup_auto_equals_pinned_at_small_corpus(spark):
    """At ≤16 Ki vectors auto_ivf_cells resolves to the pinned 16, so the
    auto twin must be BIT-IDENTICAL to the pinned entry — the property
    that lets one oracle replay both registry entries."""
    a = sorted(map(tuple, QUERIES["semantic_dedup"](spark, SF001).collect()))
    b = sorted(map(tuple, QUERIES["semantic_dedup_auto"](spark, SF001).collect()))
    assert a == b and len(a) > 0


def test_semantic_dedup_pinned_guard_trips_and_auto_bypasses(spark, monkeypatch):
    """Same contract as ivf_ann's pinned-density guard: a pinned cell count
    whose ACTUAL population exceeds MAX_PINNED_BUCKET_POP fails loud with a
    pointer at the auto twin (sf10 measured: 16 cells over 200k vectors =
    31k-row cells, 7.7 GB |cell|² slabs); auto holds population ~constant
    by construction and must never trip."""
    import pytest

    monkeypatch.setattr(similarity, "MAX_PINNED_BUCKET_POP", 4)
    with pytest.raises(Exception, match="semantic_dedup_auto"):
        QUERIES["semantic_dedup"](spark, SF001).count()
    assert QUERIES["semantic_dedup_auto"](spark, SF001).count() > 0


def test_audit_failure_reason_surfaces_worker_cause():
    """The audit artifact must record a legible reason: Py4J headlines that
    open with a newline must not record "" (the r6 embed_ann_ivf gap), and
    a designed refusal raised INSIDE a Python worker must surface its
    `SomethingError:` cause line, not just the Py4J boilerplate."""
    import sys

    sys.path.insert(0, "tools")
    from audit_sf10 import _failure_reason

    wrapped = Exception(
        "\nAn error occurred while calling o1.count.\n"
        ": org.apache.spark.SparkException: Job aborted\n"
        "ValueError: semantic_dedup: a bucket holds more than 8192 rows\n"
        "  at stack frames"
    )
    reason = _failure_reason(wrapped)
    assert reason.startswith("An error occurred")
    assert "ValueError: semantic_dedup" in reason
    assert _failure_reason(Exception("plain")) == "plain"
    assert _failure_reason(Exception("")) != ""


def test_audit_merge_mode_roundtrip(tmp_path):
    """Merge mode must (a) seed from a prior artifact losslessly — ok rows
    AND failed rows — and (b) let a re-run overwrite its seeded row, so a
    cascade-bogus failure re-recorded by a healthy retry disappears from
    `failed`. The r7 sweep's resume path depends on exactly this."""
    import json
    import sys

    sys.path.insert(0, "tools")
    from audit_sf10 import assemble_artifact, load_prior

    prior = assemble_artifact(
        {
            "good": {"sec": 1.5, "rows": 10},
            "bad": {"sec": -1.0, "error": "host OOM cascade"},
        }
    )
    p = tmp_path / "AUDIT.json"
    p.write_text(json.dumps(prior) + "\n")

    seeded = load_prior(str(p))
    assert seeded["good"] == {"sec": 1.5, "rows": 10}
    assert seeded["bad"]["sec"] == -1.0 and "OOM" in seeded["bad"]["error"]

    # the retry overwrites the failure; the artifact reflects the re-run
    seeded["bad"] = {"sec": 2.25, "rows": 7}
    art = assemble_artifact(seeded)
    assert art["n_ok"] == 2 and art["failed"] == {}
    assert art["value"] == 3.8 and art["rows"]["bad"] == 7
    # a second merge round-trips bit-identically
    p.write_text(json.dumps(art) + "\n")
    assert assemble_artifact(load_prior(str(p))) == art
    assert load_prior(str(tmp_path / "missing.json")) == {}

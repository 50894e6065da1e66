"""Round-4 entry semantics: gap-fill/LOCF edge cases, EWMA fold exactness,
and engine parity of the PII detector regexes on adversarial strings.

The oracle-parity suite already value-hash-compares these entries on the
real testdata; these tests pin the behaviors the testdata may never
exercise (leading gaps, all-gap keys, regex boundary shapes)."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from gmall_spark.queries import QUERIES


def _write_events(tmp_path, rows):
    """Minimal events.parquet a (spark, sf_dir) entry can read."""
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    return str(tmp_path)


def test_gapfill_locf_fills_leading_and_interior_gaps(spark, tmp_path):
    """Interior gaps carry the last observed count; buckets BEFORE a key's
    first observation are zero-filled (no value to carry); every synthetic
    bucket is flagged is_gap."""
    t0 = datetime.datetime(2024, 1, 1, 0, 30)

    def at(h, m=30):
        return t0.replace(hour=h, minute=m)

    sf = _write_events(
        tmp_path,
        [
            # type A: two events in hour 0, one in hour 3 → hours 1,2 locf=2
            (1, at(0, 10), 1, "A", 1.0, "{}"),
            (2, at(0, 40), 1, "A", 1.0, "{}"),
            (3, at(3), 1, "A", 1.0, "{}"),
            # type B: only hour 2 → hours 0,1 are LEADING gaps (zero), hour 3 locf=1
            (4, at(2), 2, "B", 1.0, "{}"),
        ],
    )
    out = QUERIES["gapfill_locf"](spark, sf)
    got = {
        (r["event_type"], r["bucket_hour"][11:13]): (r["filled_ct"], r["is_gap"])
        for r in out.collect()
    }
    assert got == {
        ("A", "00"): (2, False),
        ("A", "01"): (2, True),
        ("A", "02"): (2, True),
        ("A", "03"): (1, False),
        ("B", "00"): (0, True),
        ("B", "01"): (0, True),
        ("B", "02"): (1, False),
        ("B", "03"): (1, True),
    }


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=64),
        min_size=1,
        max_size=20,
    )
)
def test_ewma_fold_matches_python_exactly(spark, vals):
    """F.aggregate's left fold must equal the identical Python fold
    bit-for-bit: every step is acc*0.5 + x*0.5 over IEEE doubles in the
    same order (the exactness claim the ewma entries rest on)."""
    rows = [
        (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=i), 1, v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    ordered = F.transform(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s["value"],
    )
    got = (
        df.groupBy("user_id")
        .agg(
            F.aggregate(
                ordered, F.lit(0.0), lambda acc, x: acc * F.lit(0.5) + x * F.lit(0.5)
            ).alias("ewma")
        )
        .collect()[0]["ewma"]
    )
    acc = 0.0
    for v in vals:
        acc = acc * 0.5 + v * 0.5
    assert got == acc  # exact float equality, not approx


_PII_ALPHABET = list("ab.@+-_%19 ") + ["example.com", "@mail", "192.168", "555 "]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.lists(st.sampled_from(_PII_ALPHABET), min_size=0, max_size=12).map("".join),
        min_size=1,
        max_size=8,
    )
)
def test_pii_regex_engine_parity(spark, texts):
    """java.util.regex (Spark) and RE2 (DuckDB) must count the same matches
    for the three PII patterns on adversarial boundary strings — the engine
    difference is exactly what the patterns were chosen to avoid."""
    import duckdb

    from gmall_spark.extras.queries import _PII_EMAIL, _PII_IPV4, _PII_PHONE

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.select(
        F.sum(F.regexp_count("text", F.lit(_PII_EMAIL))).cast("long").alias("e"),
        F.sum(F.regexp_count("text", F.lit(_PII_IPV4))).cast("long").alias("i"),
        F.sum(F.regexp_count("text", F.lit(_PII_PHONE))).cast("long").alias("p"),
    ).collect()[0]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"text": texts}))
    want = con.execute(
        f"""SELECT CAST(sum(len(regexp_extract_all(text, '{_PII_EMAIL}'))) AS BIGINT),
                   CAST(sum(len(regexp_extract_all(text, '{_PII_IPV4}'))) AS BIGINT),
                   CAST(sum(len(regexp_extract_all(text, '{_PII_PHONE}'))) AS BIGINT)
            FROM t"""
    ).fetchone()
    assert (got["e"], got["i"], got["p"]) == want


def test_training_shuffle_is_permutation_and_stable(spark, sf_dir):
    """Positions are a permutation within each shard, and a rerun reproduces
    the exact layout (hash-derived, no RNG, no partitioning dependence)."""
    out1 = QUERIES["training_shuffle"](spark, sf_dir).collect()
    by_shard: dict[int, list[int]] = {}
    for r in out1:
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    out2 = QUERIES["training_shuffle"](spark, sf_dir).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=30).map(
            " ".join
        ),
        min_size=1,
        max_size=6,
    )
)
def test_substring_rewrite_matches_naive_model(spark, tmp_path_factory, docs):
    """Keep-first duplicate-passage removal vs a direct Python enumeration:
    every 13-token window owned by an earlier doc removes its covered tokens
    in later docs; first owners and sub-13-token docs are untouched. The
    3-letter vocab forces heavy window collisions."""
    import gmall_spark.extras.queries  # noqa: F401 — registers extras entries

    from gmall_spark.queries import QUERIES as Q

    tmp = tmp_path_factory.mktemp("docs_sr")
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": docs,
            "lang": "en",
            "source": "t",
            "n_chars": [len(d) for d in docs],
        }
    )
    pdf.to_parquet(tmp / "documents.parquet", index=False)

    first_owner: dict[tuple, int] = {}
    toks = [d.strip().split(" ") for d in docs]
    for d, t in enumerate(toks):
        for p in range(len(t) - 12):
            first_owner.setdefault(tuple(t[p : p + 13]), d)
    expect = {}
    for d, t in enumerate(toks):
        removed = set()
        for p in range(len(t) - 12):
            if first_owner[tuple(t[p : p + 13])] < d:
                removed.update(range(p, p + 13))
        kept = [tok for q, tok in enumerate(t) if q not in removed]
        expect[d] = (" ".join(kept), len(t), len(removed))

    out = Q["dedup_substring_rewrite"](spark, str(tmp))
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_tokens"], r["n_removed"])
        for r in out.collect()
    }
    assert got == expect


def test_pipeline_end_to_end_shuffle_budget(spark, sf_dir):
    """The composed pipeline must stay ONE fused lazy plan with a bounded
    shuffle budget: small sides broadcast (dedup keep-list, benchmark
    shingles, contamination ids), and at most 8 hash-partitioning exchanges
    (dedup groupBy, shingle dedups, contamination join, shard window) — an
    accidental materialization or a lost broadcast shows up as extra
    exchanges here before it shows up as a 100 TB regression."""
    import gmall_spark.extras.queries  # noqa: F401 — registers extras entries

    from gmall_spark.queries import QUERIES as Q

    df = Q["pipeline_end_to_end"](spark, sf_dir)
    tree = df._jdf.queryExecution().executedPlan().toString()
    assert tree.count("Exchange hashpartitioning") <= 8, tree
    assert tree.count("Exchange RoundRobinPartitioning") <= 2, tree
    assert tree.count("BroadcastHashJoin") >= 2, tree
    assert "CartesianProduct" not in tree

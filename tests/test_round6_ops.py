"""Round-6 entry semantics, pinned against independent models (the
oracle-parity suite value-hash-compares the same entries against DuckDB;
these assert the INVARIANTS the hash match alone would not explain):
theta-sketch set-algebra inequalities, funnel monotonicity, delta-join IVM
algebra, GDPR cascade audits, checksum-diff fault localization, UNPIVOT
conservation, and the late-drop schedule."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

import gmall_spark.extras.queries  # noqa: F401  (registers extras entries)
import gmall_spark.streaming.queries  # noqa: F401  (registers streaming entries)
from gmall_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_sketch_overlap_set_algebra_invariants(spark):
    """Estimates must respect set algebra up to the floor(): inter <= each
    side <= union (+1 floor slack), exact columns nest exactly, and a
    full-sketch theta is a real 60-bit hash (not the 2^60 sentinel)."""
    r = QUERIES["sketch_overlap"](spark, SF01).first()
    assert r["exact_inter"] <= min(r["exact_a"], r["exact_b"])
    assert r["inter_est"] <= min(r["a_est"], r["b_est"]) + 1
    assert r["union_est"] >= max(r["a_est"], r["b_est"]) - 1
    # both eras exceed k=64 at sf0.01, so theta comes from a real k-th hash
    assert 0 < r["theta"] < 1152921504606846976
    # sketch error at k=64 is ~12.5% (1/sqrt(k)); allow 5 sigma
    for est, exact in [
        (r["a_est"], r["exact_a"]),
        (r["b_est"], r["exact_b"]),
        (r["inter_est"], r["exact_inter"]),
    ]:
        assert abs(est - exact) <= 0.625 * exact + 5, (est, exact)


def test_funnel_stages_are_monotone(spark):
    r = QUERIES["funnel_conversion"](spark, SF01).first()
    assert (
        r["users_total"]
        >= r["users_viewed"]
        >= r["users_clicked"]
        >= r["users_purchased"]
        > 0
    )
    assert r["conv_lag_sum_us"] > 0


def test_delta_join_ivm_audit_is_exactly_zero(spark):
    rows = {r["term"]: r for r in QUERIES["delta_join_ivm"](spark, SF01).collect()}
    assert rows["__AUDIT__"]["rows_ct"] == 0
    assert rows["__AUDIT__"]["revenue"] == 0.0
    # every quadrant must be non-degenerate at sf0.01 (else the IVM claim
    # is vacuous — nothing would test the cross term)
    for term in ("delta_orders", "delta_lines", "delta_both", "old_view"):
        assert rows[term]["rows_ct"] > 0, term


def test_gdpr_erasure_cascade_audits(spark):
    rows = {r["tbl"]: r for r in QUERIES["gdpr_erasure"](spark, SF01).collect()}
    assert set(rows) == {"customer", "orders", "lineitem", "events"}
    for r in rows.values():
        assert r["violations"] == 0
        assert r["rows_before"] == r["rows_erased"] + r["rows_after"]
        assert r["rows_erased"] > 0  # the tombstone predicate must bite
    # the cascade must erase a PLAUSIBLE share: orders of ~1/13 of customers
    frac = rows["orders"]["rows_erased"] / rows["orders"]["rows_before"]
    assert 0.02 < frac < 0.2, frac


def test_table_checksum_diff_localizes_the_injected_faults(spark):
    out = {r["bucket"]: r for r in QUERIES["table_checksum_diff"](spark, SF01).collect()}
    # independent model: affected buckets straight from the parquet
    hurt = {
        int(b)
        for (b,) in duckdb.sql(
            f"""SELECT DISTINCT event_id % 64 FROM '{SF01}/events.parquet'
                WHERE event_id % 997 = 0 OR event_id % 1009 = 0"""
        ).fetchall()
    }
    flagged = {b for b, r in out.items() if r["diverged"] == 1}
    assert flagged == hurt
    # count drift only where deletions landed; pure corruption keeps counts
    del_buckets = {
        int(b)
        for (b,) in duckdb.sql(
            f"""SELECT DISTINCT event_id % 64 FROM '{SF01}/events.parquet'
                WHERE event_id % 997 = 0"""
        ).fetchall()
    }
    for b, r in out.items():
        assert (r["a_ct"] != r["b_ct"]) == (b in del_buckets), b


def test_unpivot_conserves_rows_and_sums(spark):
    from gmall_spark.sources import load_table

    out = QUERIES["unpivot_measures"](spark, SF01)
    n_line = load_table(spark, SF01, "lineitem").count()
    agg = out.agg(F.sum("n").alias("n")).first()
    assert agg["n"] == 4 * n_line  # 4 measures, nothing dropped or doubled
    measures = {r["measure"] for r in out.select("measure").distinct().collect()}
    assert measures == {"quantity", "extendedprice", "discount", "tax"}


def test_late_drop_audit_schedule(spark):
    rows = {r["batch_id"]: r for r in QUERIES["streaming_late_drop_audit"](spark, SF01).collect()}
    assert set(rows) == {0, 1, 2, 3}
    # drops happen ONLY when the relocated rows arrive (batch 2)
    assert rows[0]["dropped"] == 0 and rows[1]["dropped"] == 0
    assert rows[2]["dropped"] > 0
    assert rows[3]["input_rows"] == 0  # final flush batch carries no input
    total_in = sum(r["input_rows"] for r in rows.values())
    from gmall_spark.sources import load_table

    assert total_in == load_table(spark, SF01, "events").count()


def test_jl_projection_distortion_is_jl_bounded(spark):
    """err16 = <Pa,Pb> - 16<a,b> has E=0 and std ~ sqrt(d')*|a||b|; with
    unit-ish vectors quantized at 1e4, |a||b| ~ 1e8, so 5 sigma ~ 2e9.
    A broken sign matrix (or a fold that drops terms) blows this bound."""
    rows = QUERIES["embed_jl_project"](spark, SF).collect()
    assert rows, "needs at least one consecutive pair"
    n_big = sum(1 for r in rows if abs(r["err16"]) > 2_000_000_000)
    assert n_big == 0, n_big
    # and the audit is not vacuous: projections genuinely differ from 16x
    assert any(r["err16"] != 0 for r in rows)

"""Every oracle-backed registry query must hash-match DuckDB — the same check
the driver runs at sf0.01 (tests default to sf0.001 for speed; set
GMALL_PARITY_SF=/root/testdata/sf0.01 to run the full gate locally)."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod

SF = os.environ.get("GMALL_PARITY_SF", "/root/testdata/sf0.001")

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    from tests.oracle import duck_connection

    con = duck_connection(SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    from tests.oracle import compare

    df = QUERIES[name](spark, SF)
    ok, msg = compare(df, duck, ORACLES[name])
    assert ok, f"{name}: {msg}"


def test_every_query_has_an_oracle():
    """The registry carries zero rows-only entries: every queries() name has
    an oracle_sql() twin, so the driver's value-hash gate covers 100% of the
    surface. (This replaced a parametrized rows-only runner that reported an
    'empty parameter set' skip once the last oracle-less entry got one.)"""
    assert set(QUERIES) == set(ORACLES)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0

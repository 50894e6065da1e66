"""Schema evolution: widening unification across schema epochs, loud failure
on contract breaks (narrowing, type conflicts, silent column drops)."""

import pytest
from pyspark.sql import types as T

from gmall_spark.sources import evolve_to, unified_schema, unify_frames, widen


def test_widen_numeric_tower():
    assert widen(T.IntegerType(), T.LongType()) == T.LongType()
    assert widen(T.LongType(), T.IntegerType()) == T.LongType()
    assert widen(T.LongType(), T.DoubleType()) == T.DoubleType()
    assert widen(T.DateType(), T.TimestampType()) == T.TimestampType()
    assert widen(T.StringType(), T.StringType()) == T.StringType()
    with pytest.raises(TypeError):
        widen(T.StringType(), T.LongType())
    with pytest.raises(TypeError):
        widen(T.TimestampType(), T.LongType())


def test_unified_schema_order_and_types():
    v1 = T.StructType(
        [T.StructField("id", T.IntegerType()), T.StructField("name", T.StringType())]
    )
    v2 = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    u = unified_schema(v1, v2)
    assert [f.name for f in u.fields] == ["id", "name", "score"]
    assert dict((f.name, f.dataType) for f in u.fields)["id"] == T.LongType()


def test_unify_frames_reads_mixed_epochs(spark, tmp_path):
    """The real lake shape: two parquet epochs whose schemas mergeSchema
    would REFUSE (int vs long id), unified by explicit widening."""
    p1, p2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string").write.parquet(p1)
    spark.createDataFrame(
        [(3, "c", 0.5)], "id long, name string, score double"
    ).write.parquet(p2)
    out = unify_frames(spark.read.parquet(p1), spark.read.parquet(p2))
    assert dict(out.dtypes) == {"id": "bigint", "name": "string", "score": "double"}
    rows = {(r["id"], r["name"], r["score"]) for r in out.collect()}
    assert rows == {(1, "a", None), (2, "b", None), (3, "c", 0.5)}


def test_evolve_to_is_plan_side(spark):
    """No UDF, no extra shuffle: evolution is projections only."""
    df = spark.createDataFrame([(1, "a")], "id int, name string")
    target = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    out = evolve_to(df, target)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "PythonUDF" not in plan, plan


def test_evolve_to_refuses_silent_drop_and_narrowing(spark):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    with pytest.raises(ValueError):
        evolve_to(df, T.StructType([T.StructField("id", T.LongType())]))
    with pytest.raises(TypeError):
        evolve_to(
            df,
            T.StructType(
                [T.StructField("id", T.IntegerType()), T.StructField("name", T.StringType())]
            ),
        )


def test_evolve_sink_ddl_is_additive_only():
    from gmall_spark.operators.routing import evolve_sink_ddl

    # rule gained `email`, lost `legacy` — emit one ADD, never a DROP
    stmts = evolve_sink_ddl("dim_user", ["id", "name", "legacy"], "id,name,email")
    assert stmts == ["ALTER TABLE `dim_user` ADD COLUMNS (`email` STRING)"]
    assert evolve_sink_ddl("dim_user", ["id", "name"], "id,name") == []


def test_evolve_sink_ddl_applies(spark, tmp_path):
    """The emitted DDL must actually run: create via sink_ddl, drift the
    rule, apply the ALTER, and see the new column in the catalog."""
    from gmall_spark.operators.routing import evolve_sink_ddl, sink_ddl

    spark.sql("DROP TABLE IF EXISTS sink_evolve_t")
    ddl = sink_ddl("sink_evolve_t", "id,name", "id", None)
    spark.sql(ddl.replace("USING parquet", f"USING parquet LOCATION '{tmp_path}/t'"))
    cols = [f.name for f in spark.table("sink_evolve_t").schema.fields]
    for stmt in evolve_sink_ddl("sink_evolve_t", cols, "id,name,email"):
        spark.sql(stmt)
    assert [f.name for f in spark.table("sink_evolve_t").schema.fields] == [
        "id",
        "name",
        "email",
    ]
    spark.sql("DROP TABLE IF EXISTS sink_evolve_t")


# --- lattice properties (hypothesis) ---------------------------------------
try:
    from hypothesis import given, strategies as st

    _TOWER = [
        T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
        T.FloatType(), T.DoubleType(),
    ]
    _OTHER = [T.StringType(), T.BooleanType(), T.DateType(), T.TimestampType()]
    _types = st.sampled_from(_TOWER + _OTHER)

    def _try_widen(a, b):
        try:
            return widen(a, b)
        except TypeError:
            return None

    @given(_types, _types)
    def test_widen_commutative(a, b):
        assert _try_widen(a, b) == _try_widen(b, a)

    @given(_types)
    def test_widen_idempotent(a):
        assert widen(a, a) == a

    @given(_types, _types, _types)
    def test_widen_associative_when_defined(a, b, c):
        ab, bc = _try_widen(a, b), _try_widen(b, c)
        left = _try_widen(ab, c) if ab is not None else None
        right = _try_widen(a, bc) if bc is not None else None
        if left is not None and right is not None:
            assert left == right

    @given(st.sampled_from(_TOWER), st.sampled_from(_TOWER))
    def test_widen_is_upper_bound_on_tower(a, b):
        w = widen(a, b)
        assert _TOWER.index(w) == max(_TOWER.index(a), _TOWER.index(b))
except ImportError:  # pragma: no cover
    pass

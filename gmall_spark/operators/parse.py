"""Parse / per-record transform operators (SURVEY §2.3).

T1 — JSON parse with dirty-data side output (BaseLogApp.java:45-58: try-parse,
failures to a side stream). Spark: ``from_json`` yields null on malformed
input; the "side output" is a second filtered projection of the same scan —
Catalyst shares the scan, no double read.

T8 — CDC envelope decode (MyStringDeserializationSchema.java:26-92): Debezium
op → {insert,update,delete}, with `create`→`insert` rename.

T3 — drop CDC deletes (BaseDbApp.java:49-54).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmall_spark.schemas import CDC_ENVELOPE_SCHEMA


def parse_json_with_dirty(
    df: DataFrame, json_col: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Returns (clean, dirty). clean = parsed struct exploded to columns;
    dirty = original rows whose JSON failed to parse (reference side-output).

    Parse count is kept at 2/row (filter + inline-generator) — naive
    ``select("__parsed.*")`` re-parses once per referenced field.

    Malformed detection: PERMISSIVE from_json returns an all-null *struct*
    (not null) for bad JSON, so a bare isNull() check misroutes garbage into
    the clean stream; a corrupt-record column in the parse schema is the
    reliable signal (null input is dirty too).
    """
    corrupt = "_corrupt_record"
    # fresh StructType — StructType.add mutates the receiver in place
    probe_schema = T.StructType(list(schema.fields) + [T.StructField(corrupt, T.StringType())])
    parse = F.from_json(F.col(json_col), probe_schema, {"columnNameOfCorruptRecord": corrupt})
    # blank input parses to a null row with no corrupt record — still dirty
    # (the reference's JSON.parseObject("") throws, BaseLogApp.java:47-53)
    is_clean = (
        F.col(json_col).isNotNull()
        & (F.trim(F.col(json_col)) != "")
        & parse.getField(corrupt).isNull()
    )
    other = [c for c in df.columns if c != json_col]
    clean = df.filter(is_clean).select(*other, F.inline(F.array(parse))).drop(corrupt)
    dirty = df.filter(~is_clean | F.col(json_col).isNull())
    return clean, dirty


def decode_cdc(df: DataFrame, json_col: str = "value") -> DataFrame:
    """Debezium-style envelope JSON → typed columns with op normalization
    (`create`/`read` → insert, like MyStringDeserializationSchema.java:77-81).

    Parsed via ``inline(array(from_json(...)))``: the Generate node evaluates
    from_json exactly ONCE per row. A plain ``select("__e.*")`` lets
    CollapseProject inline one from_json copy per referenced field — measured
    6 parses/row on this envelope, a 7× slowdown at scale.
    """
    out = df.select(F.inline(F.array(F.from_json(F.col(json_col), CDC_ENVELOPE_SCHEMA))))
    return out.withColumn(
        "type",
        F.when(F.col("type").isin("create", "read", "r", "c"), F.lit("insert")).otherwise(
            F.col("type")
        ),
    )


def drop_cdc_deletes(df: DataFrame, type_col: str = "type") -> DataFrame:
    """T3 — BaseDbApp.java:49-54: deletes carry no after-image; drop them."""
    return df.filter(F.col(type_col) != "delete")


def split_log(df: DataFrame) -> dict[str, DataFrame]:
    """T6 — multi-way split of the behavior log (BaseLogApp.java:96-144):
    one pass → start / display (exploded, page_id injected) / page streams.

    Three filtered projections of one DataFrame; in streaming each feeds its
    own sink (or one foreachBatch multi-write) — Spark's analog of Flink side
    outputs. The shared scan is planned once per sink in batch; a cached
    parent or foreachBatch avoids re-reads in streaming.
    """
    start = df.filter(F.col("start").isNotNull()).select("common", "start", "ts")
    page = df.filter(F.col("start").isNull()).select("common", "page", "ts")
    display = (
        df.filter(F.col("start").isNull() & F.col("displays").isNotNull())
        .select("common", F.col("page.page_id").alias("page_id"), F.explode("displays").alias("display"), "ts")
    )
    return {"start": start, "page": page, "display": display}


def good_comment_flag(appraise: Column) -> Column:
    """ProductStatsApp.java:208-212 — appraise code '1201' = good comment
    (codes at common/GmallConstant.java:21-24)."""
    return F.when(appraise == "1201", F.lit(1)).otherwise(F.lit(0))

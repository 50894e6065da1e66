"""Unit tests for the shared column helpers (SURVEY §2.8 expressions)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from gmall_spark.functions import age_from_birthday, date_hour, epoch_millis, shingles, tokens


def test_date_hour_split(spark):
    df = spark.createDataFrame([("2024-03-05 14:22:33",)], "create_time string")
    d, h = date_hour(F.col("create_time"))
    row = df.select(d.alias("d"), h.alias("h")).collect()[0]
    assert row["d"] == "2024-03-05"
    assert row["h"] == "14"


def test_epoch_millis_roundtrip(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 0, 0, 1, 500000),)], "ts timestamp"
    )
    ms = df.select(epoch_millis(F.col("ts")).alias("ms")).collect()[0]["ms"]
    assert ms == 1704067201500


def test_age_from_birthday(spark):
    df = spark.createDataFrame([("1990-01-01",)], "birthday string")
    age = df.select(age_from_birthday(F.to_date("birthday")).alias("a")).collect()[0]["a"]
    assert 30 <= age <= 45  # sane regardless of current date


def test_shingles_short_input(spark):
    df = spark.createDataFrame([("a b",), ("a b c d",)], "t string")
    out = df.select(shingles(tokens("t"), 3).alias("s")).collect()
    assert out[0]["s"] == ["a b"]  # clamped prefix for size < k
    assert out[1]["s"] == ["a b c", "b c d"]


# --- F1: CJK segmentation (the reference's IK smart mode,
# gmall-realtime/.../utils/KeywordUtil.java:16-35) ---------------------------


def test_fmm_segments_cjk_where_whitespace_cannot():
    from gmall_spark.extras.text import DEFAULT_ZH_LEXICON, _fmm_segment

    max_len = max(len(w) for w in DEFAULT_ZH_LEXICON)
    got = _fmm_segment("小米手机 双卡双待", DEFAULT_ZH_LEXICON, max_len)
    # IK-style longest-match: compound phrases split into lexicon words —
    # whitespace tokenization would yield ['小米手机', '双卡双待']
    assert got == ["小米", "手机", "双卡", "双待"]
    assert got != "小米手机 双卡双待".split(" ")


def test_fmm_mixed_script_and_oov():
    from gmall_spark.extras.text import DEFAULT_ZH_LEXICON, _fmm_segment

    max_len = max(len(w) for w in DEFAULT_ZH_LEXICON)
    # latin spans stay whitespace tokens; out-of-vocabulary CJK chars pass
    # through as singletons (IK smart mode does the same for unknown chars)
    assert _fmm_segment("iPhone 15 苹果旗舰店", DEFAULT_ZH_LEXICON, max_len) == [
        "iPhone", "15", "苹果", "旗舰店",
    ]
    assert _fmm_segment("卂手机", DEFAULT_ZH_LEXICON, max_len) == ["卂", "手机"]
    assert _fmm_segment("", DEFAULT_ZH_LEXICON, max_len) == []


def test_tokenize_udf_segments_cjk(spark):
    from gmall_spark.extras.text import tokenize_udf

    df = spark.createDataFrame(
        [(1, "小米手机 双卡双待"), (2, "plain ascii text")], "id long, t string"
    )
    rows = {r.id: r.toks for r in df.select("id", tokenize_udf("t").alias("toks")).collect()}
    assert rows[1] == ["小米", "手机", "双卡", "双待"]
    assert rows[2] == ["plain", "ascii", "text"]  # ASCII degrades to whitespace


def test_keyword_stats_app_cjk_segmentation(spark):
    import datetime

    from gmall_spark.apps.warehouse import keyword_stats_app

    page = spark.createDataFrame(
        [
            (
                {"item_type": "keyword", "item": "小米手机", "last_page_id": None,
                 "page_id": "search", "during_time": 100},
                1704067200000,
            )
        ],
        "page struct<item_type:string,item:string,last_page_id:string,page_id:string,during_time:long>, ts long",
    )
    plain = {r.keyword for r in keyword_stats_app(page).collect()}
    seg = {r.keyword for r in keyword_stats_app(page, segment_cjk=True).collect()}
    assert plain == {"小米手机"}
    assert seg == {"小米", "手机"}

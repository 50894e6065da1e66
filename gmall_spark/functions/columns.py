"""Column-expression helpers (SURVEY §2.8).

Everything here stays JVM-side (built-in ``pyspark.sql.functions`` — codegen'd,
vectorized); no Python UDFs. Each helper cites the reference behavior it
re-expresses.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money(c: Column | str) -> Column:
    """BigDecimal money semantics (bean/OrderInfo.java:12-16): exact decimal,
    not float. Cast *before* aggregation so sums are exact and engine-portable."""
    return F.col(c).cast("decimal(18,2)") if isinstance(c, str) else c.cast("decimal(18,2)")


def date_hour(ts_string: Column) -> tuple[Column, Column]:
    """create_time 'yyyy-MM-dd HH:mm:ss' → (create_date, create_hour) —
    OrderWideApp.java:58-60 splits on ' ' and ':' by hand."""
    return (
        F.substring_index(ts_string, " ", 1),
        F.substring_index(F.substring_index(ts_string, " ", -1), ":", 1),
    )


def epoch_millis(ts: Column) -> Column:
    """DateTimeUtil.toTs (utils/DateTimeUtil.java:24-28) — timestamp → epoch ms."""
    return (ts.cast("double") * 1000).cast("long")


def window_bounds(win: Column, fmt: str = "yyyy-MM-dd HH:mm:ss") -> tuple[Column, Column]:
    """stt/edt strings from a window struct — the reference stamps window
    start/end in the WindowFunction finalize (VisitorStatsApp.java:155-160)."""
    return (F.date_format(win["start"], fmt), F.date_format(win["end"], fmt))


def age_from_birthday(birthday: Column) -> Column:
    """User age derivation (OrderWideApp.java:129-137: ms-diff / 365 days)."""
    return F.floor(F.datediff(F.current_date(), birthday) / 365).cast("int")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization. The reference's IK analyzer
    (utils/KeywordUtil.java:16-35) is Chinese-specific; the engine treats the
    tokenizer as pluggable and defaults to whitespace (exactly reproducible in
    the SQL oracle)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def shingles(toks: Column, k: int = 3) -> Column:
    """k-token shingles: ['a b c', 'b c d', ...]. Built-in higher-order
    functions only — no UDF, so it runs inside codegen at any scale.
    Inputs shorter than k yield one clamped-prefix shingle (slice clamps;
    the floor of 1 avoids sequence(1,0) producing a DESCENDING range)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )


def stable_hash_hex(c: Column, seed: str = "") -> Column:
    """Deterministic, engine-portable hash (md5 hex). Used by dedup/minhash so
    the DuckDB oracle computes bit-identical values. For pure-Spark hot paths
    prefer F.xxhash64 (cheaper, JVM-native, not oracle-portable)."""
    return F.md5(F.concat(F.lit(seed), c)) if seed else F.md5(c)

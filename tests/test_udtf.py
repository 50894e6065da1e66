"""Python UDTF surface (§2.9): the reference's one UDTF is the keyword
tokenizer (KeywordUtil split via Flink TableFunction); the engine's primary
implementations are pure column expressions (split+explode — the fast path).
This test pins the Spark 4 @udtf API as a supported alternative: an
arrow-optimized UDTF chunker must produce EXACTLY the rows of the
expression-based doc_chunks entry, and must plan as ArrowEvalPythonUDTF
(Arrow batches), not row-at-a-time BatchEvalPythonUDTF — the same Arrow-only
discipline the scale lint enforces for scalar UDFs."""

import os

from pyspark.sql import functions as F
from pyspark.sql.functions import lit, udtf

from gmall_spark.sources import load_table

SF = os.environ.get("GMALL_PARITY_SF", "/root/testdata/sf0.01")
W, S = 50, 40


@udtf(returnType="chunk_idx int, chunk_fp string, n_tokens bigint", useArrow=True)
class ChunkUDTF:
    def eval(self, doc_id: int, text: str):
        import hashlib

        toks = text.strip().split(" ")
        if not text.strip():
            return
        for i, s in enumerate(range(0, len(toks), S)):
            window = toks[s : s + W]
            fp = hashlib.md5(" ".join(window).encode()).hexdigest()
            yield i, fp, min(W, len(toks) - s)


def test_udtf_chunker_matches_expression_path(spark):
    docs = load_table(spark, SF, "documents").filter(F.trim("text") != "").limit(200)
    via_udtf = docs.lateralJoin(
        ChunkUDTF(F.col("doc_id").outer(), F.col("text").outer())
    ).select("doc_id", "chunk_idx", "chunk_fp", "n_tokens")

    from gmall_spark.extras.queries import doc_chunks

    expected = (
        doc_chunks(spark, SF)
        .join(docs.select("doc_id"), "doc_id")
        .select("doc_id", "chunk_idx", "chunk_fp", "n_tokens")
    )
    got = {tuple(r) for r in via_udtf.collect()}
    want = {tuple(r) for r in expected.collect()}
    assert got == want and got

    plan = via_udtf._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPythonUDTF" in plan, plan

"""gmall_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference Flink warehouse
(Aron1015/0225-gmall-flink, surveyed in SURVEY.md).

Everything here is idiomatic Spark: DataFrame/SQL logical plans optimized
by Catalyst, Structured Streaming for unbounded inputs, Pandas UDFs only
where built-ins genuinely cannot express the semantics.

Layout
------
- ``session``    — tuned SparkSession factory (local test + cluster-scale confs)
- ``schemas``    — every StructType of the reference data model (SURVEY §1.3)
- ``sources``    — batch + streaming readers (SURVEY §2.1 S1–S6)
- ``sinks``      — batch + streaming writers (SURVEY §2.2 K1–K6)
- ``operators``  — the operator library (SURVEY §2.3–§2.9), each a
                   composable ``DataFrame -> DataFrame`` function
- ``functions``  — scalar/column helpers shared across operators
- ``plans``      — physical-plan inspection helpers (pushdown/broadcast asserts)
- ``streaming``  — Structured Streaming assemblies of the pipelines
- ``apps``       — the reference's 10 pipelines reassembled from operators
- ``extras``     — LLM-data-pipeline operators (dedup, similarity search,
                   multimodal columns, text analysis) built on the same API
"""

__version__ = "0.1.0"

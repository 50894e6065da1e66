from gmall_spark.sources.batch import load_table, load_tables, register_views
from gmall_spark.sources.evolve import evolve_to, unified_schema, unify_frames, widen

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "evolve_to",
    "unified_schema",
    "unify_frames",
    "widen",
]

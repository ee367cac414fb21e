"""heapdumpstardiver_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities
of the reference system ZacAttack/HeapDumpStarDiver (a JVM heap-dump →
Parquet converter + DuckDB analytics layer; see SURVEY.md for the
structural analysis). Everything here is idiomatic Spark: declarative
DataFrame/SQL plans optimized by Catalyst, Parquet scan/sink with
pushdown, broadcast/shuffle joins chosen by AQE, and Arrow-batched
Pandas UDFs only where built-ins cannot express the semantics.

Layout:
- ``session``    — SparkSession factory tuned for the target scale
- ``catalog``    — table resolution over a directory-of-Parquet warehouse
- ``exprs``      — engine-portable expression helpers (deterministic
                   rounding, cosine similarity, bitmask decode, ...)
- ``queries``    — the relational / window / LLM-pipeline operator
                   library (SURVEY.md §2B + extensions), each paired
                   with a DuckDB oracle SQL twin
- ``analytics``  — the 13 heap "waste check" analyses + profiling
                   queries re-expressed as DataFrame pipelines
- ``ingest``     — HPROF binary → Parquet warehouse ingestion as a
                   Spark batch job
- ``streaming``  — Structured Streaming variants of the event-time
                   operators
"""

from .registry import ORACLE_SQL, QUERIES  # noqa: F401

# Importing the query modules populates the registry.
from .queries import (  # noqa: E402,F401
    cdc,
    diagnostics,
    llm,
    media,
    pipeline,
    relational,
    windows,
)

__all__ = ["QUERIES", "ORACLE_SQL"]

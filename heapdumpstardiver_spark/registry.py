"""Query registry: name → (spark, sf_dir) -> DataFrame, plus the
DuckDB oracle SQL twin for the driver's correctness gate.

Mirrors the reference's query-library shape (`run_waste_analysis`
dispatch table, /root/reference/scripts/analyze_heap_parquet.py:1104-1119)
but each entry is a PySpark DataFrame pipeline with an ANSI-SQL oracle.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation and (optionally) its oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible operators).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = textwrap.dedent(oracle).strip()
        return fn

    return deco

"""JSONL corpus ingestion — the line-delimited JSON reader every
LLM-data pipeline starts from (crawl dumps, dataset releases, and
inter-stage handoffs all ship as ``.jsonl`` / ``.jsonl.gz``).

Thin, deliberate wrapper over Spark's native JSON source so Catalyst
keeps everything (schema pinned up front — NO inference pass over a
100 TB corpus; gzip splits handled by the source; predicate/column
pruning intact downstream):

- schema is the documents contract (doc_id, text, lang, source,
  n_chars) unless caller-supplied — schema-on-read inference is
  banned at scale because it costs a full extra pass and drifts
  under corrupt lines;
- PERMISSIVE mode routes malformed lines into ``_corrupt_record``
  instead of failing the job (strict mode = FAILFAST for pipelines
  that prefer the loud-failure policy);
- ``corrupt_stats`` accounts rejects per file so data-loss is
  measured, never silent (the `curation_funnel_accounting`
  discipline applied at the ingest boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)
_CORRUPT = "_corrupt_record"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_SCHEMA,
    strict: bool = False,
) -> DataFrame:
    """Read a JSONL corpus with a PINNED schema.

    Returns clean typed rows; malformed lines carry NULL data columns
    and the raw line in ``_corrupt_record`` (PERMISSIVE), or fail the
    read (strict=True → FAILFAST). Filter with
    ``df.where(F.col('_corrupt_record').isNull())`` or account first
    via :func:`corrupt_stats`."""
    reader = (
        spark.read.schema(f"{schema}, {_CORRUPT} STRING")
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
    )
    return reader.json(path)


def corrupt_stats(df: DataFrame) -> DataFrame:
    """(file, n_rows, n_corrupt) accounting over a permissive read —
    one aggregate, rejects measured per input file before anyone
    silently drops them."""
    first_data_col = next(c for c in df.columns if c != _CORRUPT)
    return (
        # n_parsed keeps a DATA column load-bearing through column
        # pruning: Spark refuses a query whose pruned schema is ONLY
        # the corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and a
        # merely-projected column gets pruned right back out
        df.select(
            F.input_file_name().alias("file"),
            F.col(first_data_col).alias("probe"),
            F.col(_CORRUPT).isNotNull().cast("int").alias("bad"),
        )
        .groupBy("file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("probe").cast("long").alias("n_parsed"),
            F.sum("bad").cast("long").alias("n_corrupt"),
        )
        .orderBy("file")
    )


def clean_documents(df: DataFrame) -> DataFrame:
    """Drop corrupt rows and the bookkeeping column — the handoff
    into the query layer (same column set as the parquet fixtures).

    The filter also enforces the id contract (first data column
    non-null): a clean document must carry its key, and keeping a
    data column in the filter's referenced set is what lets
    count()-style consumers run at all (Spark refuses queries whose
    pruned schema is only `_corrupt_record`)."""
    first_data_col = next(c for c in df.columns if c != _CORRUPT)
    return df.where(
        F.col(_CORRUPT).isNull() & F.col(first_data_col).isNotNull()
    ).drop(_CORRUPT)

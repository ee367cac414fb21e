"""Table resolution over a directory-of-Parquet warehouse.

Equivalent of the reference's ``ParquetResolver``
(/root/reference/scripts/analyze_heap_parquet.py:92-127): map a logical
table name to the parquet file(s) backing it, lazily, with glob support
for multi-part layouts (the reference's robo-mode ``_chunk{0..15}``
files are exactly Spark's natural many-part-files-per-table output).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver's synthetic relational fixture tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def table_rows(sf_dir: str, name: str) -> int:
    """Exact row count from parquet FOOTERS only (driver-side pyarrow
    metadata read, cached) — for scale-adaptive knobs like LSH plane
    counts that need |corpus| before building the plan. Avoids
    spending a whole Spark job on a number the footers already hold;
    at cluster scale the same footer read is how AQE/statistics get
    it. Cache key includes the file set and mtimes, so a rewritten
    table re-probes."""
    import pyarrow.parquet as pq

    path = table_path(sf_dir, name)
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    else:
        files = [path]
    key = (tuple(files), tuple(int(os.path.getmtime(f)) for f in files))
    hit = _ROW_CACHE.get((sf_dir, name))
    if hit and hit[0] == key:
        return hit[1]
    n = sum(pq.read_metadata(f).num_rows for f in files)
    _ROW_CACHE[(sf_dir, name)] = (key, n)
    return n


_ROW_CACHE: dict[tuple[str, str], tuple[tuple, int]] = {}


def _fs_key(path: str) -> tuple:
    """Identity of the files backing a table: names + mtimes + sizes.
    A rewritten table yields a different key, so caches keyed on it
    re-probe (same invalidation contract as ``_ROW_CACHE``)."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    else:
        files = [path]
    return tuple(
        (f, os.path.getmtime(f), os.path.getsize(f)) for f in files
    )


#: Per-session DataFrame cache for ``load_table`` (r14, guide §1.2):
#: every ``spark.read.parquet`` pays a schema-inference job plus file
#: listing PER CALL, so a query constructed N times (bench reps,
#: multi-table queries) re-paid ~10-40 ms of driver/scheduler fixed
#: cost per table each time. The cached object is the UNEXECUTED
#: DataFrame (a plan + resolved file index) — never data, never
#: results; each new process/session starts empty, and the fs key
#: invalidates on any rewrite. Keyed weakly on the session so stopped
#: sessions' plans are collectable.
import weakref

_DF_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    ignore_corrupt: bool = False,
    merge_schema: bool = False,
) -> DataFrame:
    """Read one logical table. Spark globs directories natively, so a
    single-file layout and a chunked layout resolve identically.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark
    refuses to read natively; it is read as raw nanos (nanosAsLong) and
    converted losslessly to a microsecond timestamp with integral
    arithmetic (``DIV`` — a double division would lose precision above
    2^53 ns).

    ``ignore_corrupt=True`` turns on the per-read ``ignoreCorruptFiles``
    option: a shard with a damaged footer or truncated pages is skipped
    (logged by Spark) instead of failing the whole scan. At 100-TB
    scale a multi-hour job must survive the occasional bad object-store
    shard; default is strict (fail loudly) because silently dropping
    data is the wrong default for correctness-gated work — turn it on
    deliberately, then reconcile counts against the manifest
    (`verify_manifest`).

    ``merge_schema=True`` turns on per-read ``mergeSchema``: a table
    whose later shards gained columns (schema evolution across append
    epochs) reads as the union schema, older rows null-filled. Default
    off — schema merging reads every file footer (expensive at large
    file counts) and Spark's default first-footer schema is right for
    the homogeneous tables ingest writes."""
    path = table_path(sf_dir, name)
    try:
        key = (path, ignore_corrupt, merge_schema, _fs_key(path))
    except OSError:
        # missing/unreadable path: skip the cache so the reader below
        # raises Spark's own error (PATH_NOT_FOUND), not an OSError
        key = None
    per_session = _DF_CACHE.setdefault(spark, {})
    hit = per_session.get(key[:3]) if key is not None else None
    if hit is not None and hit[0] == key:
        return hit[1]
    if name == "events":
        df = _load_events(spark, path, ignore_corrupt)
    else:
        reader = spark.read
        if ignore_corrupt:
            reader = reader.option("ignoreCorruptFiles", "true")
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(path)
    if key is not None:
        per_session[key[:3]] = (key, df)
    return df


def _load_events(
    spark: SparkSession, path: str, ignore_corrupt: bool = False
) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf locked down; the read below will surface the issue
    # Every timestamp query in this engine (date_trunc, window(),
    # unix_micros, watermarks) is defined against UTC wall-clock to
    # agree value-for-value with the tz-naive DuckDB oracle. Our own
    # session factory pins this (session.py), but an externally created
    # session (the driver harness) may carry a local timezone, under
    # which both the NTZ→TIMESTAMP cast below and all downstream
    # date functions would silently shift — so pin it here too.
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    reader = spark.read
    if ignore_corrupt:
        reader = reader.option("ignoreCorruptFiles", "true")
    df = reader.parquet(path)
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        # Plain parquet timestamp[us] with no tz annotation reads as
        # TIMESTAMP_NTZ under Spark 4's inferTimestampNTZ, but the
        # event-time queries (unix_micros, window(), watermarks) require
        # TIMESTAMP. With the session timezone pinned to UTC (above),
        # the cast is value-exact: every NTZ wall-clock instant maps to
        # the same UTC instant the oracle computes with.
        df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register temp views so ``spark.sql`` passthrough works — the
    equivalent of the reference's `query_heap` arbitrary-SQL surface
    (/root/reference/mcp_server/server.py:479-534)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


class Warehouse:
    """A directory-of-Parquet warehouse with lazy per-table resolution.

    Generalizes the fixture layout to any directory of ``<name>.parquet``
    files or ``<name>/`` parquet datasets (as produced by
    ``DataFrame.write.parquet``), e.g. the heap warehouse written by
    ``heapdumpstardiver_spark.ingest``.
    """

    def __init__(self, spark: SparkSession, root: str,
                 require_manifest: bool = False):
        self.spark = spark
        self.root = root
        self._cache: dict[str, DataFrame] = {}
        if require_manifest:
            self.verify()

    def verify(self) -> dict:
        """Check the ingest job-level commit marker: `_SUCCESS` +
        `_MANIFEST.json` written atomically by ``ingest_hprof`` after
        every task's part file has been renamed into place. A warehouse
        whose driver died mid-job lacks the marker and is refused here
        rather than serving a silently incomplete table set. Returns the
        parsed manifest. Fixture/externally-produced dirs have no
        manifest — construct with ``require_manifest=False`` (default)
        for those."""
        import json

        spath = os.path.join(self.root, "_SUCCESS")
        mpath = os.path.join(self.root, "_MANIFEST.json")
        if not os.path.exists(spath) or not os.path.exists(mpath):
            raise RuntimeError(
                f"warehouse {self.root!r} has no _SUCCESS/_MANIFEST.json commit "
                "marker — the ingest job did not complete (or this is not an "
                "ingest-produced warehouse; use require_manifest=False)"
            )
        with open(mpath) as f:
            manifest = json.load(f)
        missing = [
            t
            for summary in manifest.get("partitions", {}).values()
            for t in summary.get("tables", {})
            if not os.path.exists(
                os.path.join(self.root, t[:1].replace("_", "sys_") + t[1:] if t.startswith("_") else t)
            )
        ]
        if missing:
            raise RuntimeError(
                f"warehouse {self.root!r} manifest lists tables with no backing "
                f"files: {sorted(set(missing))[:5]}"
            )
        return manifest

    def invalidate(self, name: str | None = None) -> None:
        """Drop cached DataFrame(s) whose file listings may be stale —
        call after an external rewrite such as ``compact_table``."""
        if name is None:
            self._cache.clear()
        else:
            self._cache.pop(name, None)

    # Spark's file index silently drops paths starting with "_" or "."
    # (reserved for metadata like _SUCCESS), so the reference's
    # underscore-prefixed system tables (`_gc_roots`, `_object_index`,
    # SURVEY §1.3) are stored physically as ``sys_<name>.parquet`` while
    # keeping their logical underscore names — a documented deviation
    # forced by Spark's layout rules.

    @staticmethod
    def _logical(entry: str) -> str:
        name = entry[: -len(".parquet")] if entry.endswith(".parquet") else entry
        if name.startswith("sys_"):
            return "_" + name[len("sys_"):]
        return name

    def table_names(self) -> list[str]:
        names = []
        for entry in sorted(os.listdir(self.root)):
            full = os.path.join(self.root, entry)
            if entry.endswith(".parquet") and os.path.isfile(full):
                names.append(self._logical(entry))
            elif os.path.isdir(full) and not entry.startswith((".", "_")):
                names.append(self._logical(entry))
        return names

    def _resolve(self, name: str) -> str:
        candidates = [f"{name}.parquet", name]
        if name.startswith("_"):
            candidates = [f"sys{name}.parquet", f"sys{name}"] + candidates
        for cand in candidates:
            full = os.path.join(self.root, cand)
            if os.path.exists(full):
                return full
        raise KeyError(f"table {name!r} not found under {self.root}")

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = self.spark.read.parquet(self._resolve(name))
        return self._cache[name]

    def register_all(self) -> None:
        for name in self.table_names():
            # Dots in class-table names (java.lang.String) need backticks;
            # views use a sanitized name.
            view = name.replace(".", "_").replace("[", "_").replace("]", "_")
            self.table(name).createOrReplaceTempView(view)


def compact_table(
    spark: SparkSession,
    root: str,
    name: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
    warehouse: "Warehouse | None" = None,
) -> dict:
    """Coalesce a many-small-part table into ~*target_bytes* files.

    Per-class × per-split ingest sharding is write-optimal (no shuffle,
    no coordination) but a dump with thousands of classes over many
    splits leaves thousands of tiny part files — the classic
    small-file problem that murders scan throughput and file-listing
    time at warehouse scale. Compaction is the standard second step
    (what Delta/Iceberg call OPTIMIZE): rewrite the table at
    ``target_bytes`` granularity, atomically swap directories. Tables
    with fewer than *min_files* parts are left untouched.

    Concurrency contract: single writer, no concurrent readers. The
    swap is two renames + an rmtree — another session (or another
    Warehouse instance) holding a DataFrame resolved before compaction
    will hit FileNotFoundException on its next action. Pass the live
    *warehouse* so its DataFrame cache is invalidated after the swap;
    any other instances must re-resolve the table themselves.

    Returns {"files_before", "files_after", "bytes"}.
    """
    import shutil

    wh = warehouse if warehouse is not None else Warehouse(spark, root)
    path = wh._resolve(name)
    if not os.path.isdir(path):  # single-file layout — nothing to do
        return {"files_before": 1, "files_after": 1, "bytes": os.path.getsize(path)}
    parts = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    total = sum(os.path.getsize(p) for p in parts)
    if len(parts) < min_files:
        return {"files_before": len(parts), "files_after": len(parts), "bytes": total}
    n_out = max(1, -(-total // target_bytes))  # ceil
    # Hive-partitioned layout (snapshot=<id> dirs) must be re-emitted
    # with the same directory structure, not flattened into a column.
    part_keys = sorted(
        {e.split("=", 1)[0] for e in os.listdir(path) if "=" in e and os.path.isdir(os.path.join(path, e))}
    )
    tmp = path + ".compact-tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    writer = (
        spark.read.parquet(path)
        .coalesce(n_out)
        .write.mode("overwrite")
        .option("compression", "snappy")
    )
    if part_keys:
        writer = writer.partitionBy(*part_keys)
    writer.parquet(tmp)
    old = path + ".compact-old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    wh.invalidate(name)
    after = sum(
        1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    return {"files_before": len(parts), "files_after": after, "bytes": total}


def write_table(df, root: str, name: str, mode: str = "overwrite",
                partition_by=None, sort_by=None,
                compression: str = "snappy", options: dict | None = None) -> str:
    """Parquet sink (B5): SNAPPY parquet dataset under the warehouse
    root, with the `sys_` mapping for underscore-prefixed logical names
    and optional hash partitioning — the engine's counterpart of the
    reference's sharded writer pool (dump_to_parquet.rs:653-745); Spark
    tasks write part files in parallel natively.

    *sort_by* sorts rows within each output task before writing, which
    tightens parquet per-row-group min/max statistics on those columns
    — point/range predicates then skip whole row groups at the scan
    (data skipping without any index structure). No shuffle: the sort
    is task-local."""
    physical = f"sys{name}" if name.startswith("_") else name
    path = os.path.join(root, physical)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.mode(mode).option("compression", compression)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path


def upsert_table(
    spark: SparkSession,
    root: str,
    name: str,
    updates: DataFrame,
    keys: list[str],
    warehouse: "Warehouse | None" = None,
) -> dict:
    """MERGE-style upsert: rows in *updates* replace target rows with
    the same *keys* tuple; unmatched update rows insert; unmatched
    target rows are kept. The missing mutation primitive between
    `write_table` (overwrite/append) and `ingest/snapshots.py`
    (append-only history).

    Two physical strategies, chosen by layout:

    - **Partition-scoped** (Hive-partitioned table AND the partition
      columns present in *updates*): only the partitions the updates
      touch are read (partition-pruned scan), merged (left_anti on
      keys + unionByName), and swapped in via Spark's dynamic
      partition overwrite — untouched partitions are never read or
      rewritten. This is the Delta/Iceberg MERGE cost model: work
      scales with the touched slice, not the table; at 100 TB an
      upsert of one day's corrections reads and writes one day.
    - **Full-rewrite** (unpartitioned table): merge everything to a
      temp directory, then the same atomic two-rename swap
      `compact_table` uses. Correct at any size, but O(table); the
      docstring-level advice at scale is: partition (or bucket by
      key — `bucketing.py` — to make the anti-join shuffle-free) any
      table that expects upserts.

    Single-writer contract, like `compact_table`. Returns
    {"strategy", "rows_updated", "rows_inserted", "partitions_touched"}.
    """
    import shutil

    wh = warehouse if warehouse is not None else Warehouse(spark, root)
    path = wh._resolve(name)

    def _partition_keys(p: str) -> list[str]:
        """Walk the Hive directory levels IN ORDER (day=/hour=/...) —
        a single-level scan would rewrite a multi-level table with a
        flattened layout, corrupting it against untouched partitions."""
        keys: list[str] = []
        while os.path.isdir(p):
            level = sorted(
                e for e in os.listdir(p)
                if "=" in e and os.path.isdir(os.path.join(p, e))
            )
            if not level:
                break
            keys.append(level[0].split("=", 1)[0])
            p = os.path.join(p, level[0])
        return keys

    part_keys = _partition_keys(path)
    target = spark.read.parquet(path)
    from pyspark.sql import functions as F

    if part_keys and set(part_keys) <= set(updates.columns):
        touched = updates.select(*part_keys).distinct()
        pruned = target.join(F.broadcast(touched), part_keys, "left_semi")
        survivors = pruned.join(updates, keys, "left_anti")
        merged = survivors.unionByName(updates.select(*pruned.columns))
        # Count BEFORE the overwrite: if the caller derived *updates*
        # from this very table, a post-write count would re-read the
        # already-merged data. (Caveat shared with every partitioned
        # MERGE: a key must not move between partition values, or its
        # old row survives in the untouched partition — make partition
        # columns functionally dependent on the keys.)
        n_touched = touched.count()
        n_updates = updates.count()
        n_matched = pruned.join(updates, keys, "left_semi").count()
        old_mode = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").option("compression", "snappy") \
                .partitionBy(*part_keys).parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
        wh.invalidate(name)
        return {
            "strategy": "partition-scoped",
            "rows_updated": n_matched,
            "rows_inserted": n_updates - n_matched,
            "partitions_touched": n_touched,
        }

    n_updates = updates.count()
    n_matched = target.join(updates, keys, "left_semi").count()
    merged = target.join(updates, keys, "left_anti").unionByName(
        updates.select(*target.columns)
    )
    tmp = path + ".upsert-tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").option("compression", "snappy").parquet(tmp)
    old = path + ".upsert-old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    wh.invalidate(name)
    return {
        "strategy": "full-rewrite",
        "rows_updated": n_matched,
        "rows_inserted": n_updates - n_matched,
        "partitions_touched": 0,
    }


def zorder_key(a, b, bits: int = 16):
    """Z-order (Morton) interleaving of two non-negative int columns,
    as a pure Catalyst expression: the top *bits* of each value's
    *bits*-bit range are bit-interleaved into one long. Rows sorted by
    this key cluster locality in BOTH dimensions, so parquet row-group
    min/max stats can skip on either column — the layout trick behind
    Delta/Iceberg ``OPTIMIZE ZORDER BY`` — where a plain sort_by only
    tightens stats for its leading column.

    Columns must already be scaled to [0, 2^bits); callers with
    arbitrary ranges pre-bucket (e.g. ``F.floor(col / width)``). The
    expression is a fixed chain of shift/and/or ops — whole-stage
    codegen, no UDF."""
    from pyspark.sql import functions as F

    a = a if not isinstance(a, str) else F.col(a)
    b = b if not isinstance(b, str) else F.col(b)
    key = F.lit(0).cast("long")
    for i in range(bits - 1, -1, -1):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        key = F.shiftleft(key, 2).bitwiseOR(F.shiftleft(abit, 1)).bitwiseOR(bbit)
    return key


def write_table_zordered(df, root: str, name: str, zorder_by: tuple,
                         bits: int = 16, files: int | None = None,
                         **kwargs) -> str:
    """`write_table` with rows range-partitioned AND sorted by the
    z-order key of two columns (``zorder_by=(colA, colB)``), then the
    key dropped. One shuffle (the range partitioning that makes file
    boundaries align with key ranges); every downstream point/range
    predicate on either column skips row groups via parquet stats.
    *files* caps the output file count (defaults to the session's
    shuffle parallelism)."""
    a, b = zorder_by
    keyed = df.withColumn("__zkey", zorder_key(a, b, bits=bits))
    n = files or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    keyed = keyed.repartitionByRange(n, "__zkey").sortWithinPartitions("__zkey")
    return write_table(keyed.drop("__zkey"), root, name, **kwargs)


def export_jsonl(df, path: str, shards: int | None = None,
                 compression: str = "gzip", mode: str = "overwrite") -> str:
    """Training-shard export: write a DataFrame as sharded
    ``part-*.json.gz`` files — the JSONL format every tokenizer /
    trainer ingests. *shards* controls file count (defaults to the
    DataFrame's current partitioning, i.e. no extra shuffle); binary
    columns must be dropped or encoded by the caller (JSON has no raw
    bytes). Spark tasks write shards in parallel through the committer
    (temp + rename), so a failed export never leaves a half-readable
    directory — the same guarantee the parquet sinks give."""
    out = df.repartition(shards) if shards else df
    out.write.mode(mode).option("compression", compression).json(path)
    return path

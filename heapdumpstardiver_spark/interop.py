"""Interop with warehouses produced by the reference binary.

The reference's converter writes a FLAT directory of parquet files
(/root/reference/src/commands/dump_to_parquet.rs:404, 669-694):

- class tables:  ``{ClassName}_{classObjId}.parquet``            (default)
                 ``{ClassName}_{classObjId}_chunk{N}.parquet``   (robo)
- system tables: ``_{name}.parquet`` / ``_{name}_chunk{N}.parquet``

resolved by glob at query time (scripts/analyze_heap_parquet.py:92-127):
every class id sharing a class name is one logical relation, robo mode is
detected by ``_object_index_chunk*.parquet``. Ids are unsigned 64-bit;
default (non-robo) mode resolves reference fields to ``Struct{id, type}``
(src/util.rs:139-142).

Spark's file index silently drops "_"-prefixed paths (reserved for
metadata), so the reference's system tables cannot be read in place.
Attaching therefore builds a VIEW DIRECTORY of symlinks in the engine's
native layout (``<table-dir>/part-{i}.parquet``, ``sys_`` prefix for
system tables) — zero data copy, and scans / predicate pushdown / column
pruning work exactly as on a native warehouse. The view directory is
derived metadata: cheap to rebuild, safe to delete.

Type normalization on read (:meth:`ReferenceWarehouse.table`):

- parquet UInt64 surfaces in Spark as ``decimal(20,0)``; every such
  column — including array elements and struct fields — is reinterpreted
  into the engine's signed-int64 id convention (two's-complement, the
  same rule as ingest's ``_s64``), so reference-produced and
  native-ingested warehouses expose identical schemas.
- with ``flatten_refs=True`` (default), default-mode ``Struct{id,type}``
  reference columns are projected down to the bare id, presenting the
  robo view the analytics layer expects; ``flatten_refs=False`` keeps
  the struct (id normalized) for dual-mode access (B6).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .catalog import Warehouse

_CHUNK_RE = re.compile(r"_chunk(\d+)$")
_CLASS_ID_RE = re.compile(r"_(\d+)$")


def scan_reference_dir(ref_dir: str) -> dict[str, list[str]]:
    """Map each logical table in a reference-layout directory to its
    backing files. Mirrors the reference resolver's globs: the chunk
    suffix and the class-obj-id suffix are stripped (rightmost match —
    the same disambiguation the reference's ``{base}_*`` glob applies),
    and class ids sharing a name merge into one relation."""
    tables: dict[str, list[str]] = {}
    for entry in sorted(os.listdir(ref_dir)):
        if not entry.endswith(".parquet"):
            continue
        full = os.path.join(ref_dir, entry)
        if not os.path.isfile(full):
            continue
        stem = entry[: -len(".parquet")]
        stem = _CHUNK_RE.sub("", stem)
        if not stem.startswith("_"):
            stem = _CLASS_ID_RE.sub("", stem)
        tables.setdefault(stem, []).append(full)
    return tables


def is_robo_layout(ref_dir: str) -> bool:
    """The reference's own mode probe (analyze_heap_parquet.py:96)."""
    import glob as globmod

    return bool(globmod.glob(os.path.join(ref_dir, "_object_index_chunk*.parquet")))


def attach_reference_warehouse(
    spark: SparkSession,
    ref_dir: str,
    view_dir: str,
    flatten_refs: bool = True,
) -> "ReferenceWarehouse":
    """Attach a warehouse written by the reference binary: build the
    symlink view directory (rebuilt from scratch each call) and return a
    :class:`ReferenceWarehouse` over it."""
    tables = scan_reference_dir(ref_dir)
    if not tables:
        raise FileNotFoundError(f"no reference-layout parquet files under {ref_dir!r}")
    if os.path.isdir(view_dir):
        shutil.rmtree(view_dir)
    os.makedirs(view_dir)
    for logical, files in tables.items():
        physical = f"sys{logical}" if logical.startswith("_") else logical
        d = os.path.join(view_dir, physical)
        os.makedirs(d)
        for i, src in enumerate(files):
            os.symlink(os.path.abspath(src), os.path.join(d, f"part-{i}.parquet"))
    return ReferenceWarehouse(spark, view_dir, flatten_refs=flatten_refs)


# 2^63 / 2^64 as decimal literals (too wide for a Spark long literal).
_D63 = "CAST('9223372036854775808' AS DECIMAL(20,0))"
_D64 = "CAST('18446744073709551616' AS DECIMAL(21,0))"


def _is_u64(dt: T.DataType) -> bool:
    return isinstance(dt, T.DecimalType) and dt.precision == 20 and dt.scale == 0


def _s64_col(c):
    """decimal(20,0) unsigned id → two's-complement signed int64."""
    return F.when(c >= F.expr(_D63), (c - F.expr(_D64)).cast("long")).otherwise(
        c.cast("long")
    )


def normalize_u64(df: DataFrame, flatten_refs: bool = True) -> DataFrame:
    """Reinterpret every u64-derived decimal(20,0) column as signed
    int64, recursing into arrays and (one level of) structs. Struct
    columns with an ``id`` field are the reference's default-mode
    resolved refs: flattened to the bare id, or kept with a normalized
    id. A single projection — stays inside whole-stage codegen."""
    cols = []
    changed = False
    for f in df.schema.fields:
        c = F.col(f"`{f.name}`")
        dt = f.dataType
        if _is_u64(dt):
            cols.append(_s64_col(c).alias(f.name))
            changed = True
        elif isinstance(dt, T.ArrayType) and _is_u64(dt.elementType):
            cols.append(F.transform(c, _s64_col).alias(f.name))
            changed = True
        elif isinstance(dt, T.StructType) and "id" in dt.fieldNames():
            id_dt = dt["id"].dataType
            id_col = _s64_col(c["id"]) if _is_u64(id_dt) else c["id"].cast("long")
            if flatten_refs:
                cols.append(id_col.alias(f.name))
            else:
                rebuilt = [id_col.alias("id")] + [
                    c[n].alias(n) for n in dt.fieldNames() if n != "id"
                ]
                cols.append(F.struct(*rebuilt).alias(f.name))
            changed = True
        else:
            cols.append(c)
    return df.select(*cols) if changed else df


def looks_like_reference_layout(path: str) -> bool:
    """Heuristic mode probe: the reference writes a flat directory where
    system files start with a literal "_" and class files end with the
    class-obj-id digits (optionally + _chunk{N}); the native layout uses
    table directories / ``sys_``-prefixed files, which match neither."""
    try:
        entries = os.listdir(path)
    except OSError:
        return False
    for e in entries:
        if not e.endswith(".parquet") or not os.path.isfile(os.path.join(path, e)):
            continue
        stem = e[: -len(".parquet")]
        if stem.startswith("_"):
            return True
        if _CLASS_ID_RE.search(_CHUNK_RE.sub("", stem)):
            return True
    return False


def open_warehouse(
    spark: SparkSession,
    path: str,
    view_dir: str | None = None,
    flatten_refs: bool = True,
) -> Warehouse:
    """Open a warehouse in either on-disk dialect, auto-detected:
    the engine's native table-per-directory layout, or the flat layout
    written by the reference binary (attached via a symlink view dir —
    a temp dir unless *view_dir* is given). The analytics / query /
    service layers accept the returned object either way."""
    if looks_like_reference_layout(path):
        if view_dir is None:
            import tempfile

            view_dir = tempfile.mkdtemp(prefix="hdsd-ref-view-")
        return attach_reference_warehouse(
            spark, path, view_dir, flatten_refs=flatten_refs
        )
    return Warehouse(spark, path)


class ReferenceWarehouse(Warehouse):
    """A :class:`Warehouse` over an attached reference-layout view dir.

    Reads merge schemas across part files (distinct class ids sharing a
    name may have drifted layouts across dump versions) and normalize
    u64 ids / struct refs, so the analytics layer and every query run
    unchanged on a dump converted by the reference binary."""

    def __init__(self, spark: SparkSession, root: str, flatten_refs: bool = True):
        super().__init__(spark, root)
        self.flatten_refs = flatten_refs

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            df = self.spark.read.option("mergeSchema", "true").parquet(
                self._resolve(name)
            )
            self._cache[name] = normalize_u64(df, flatten_refs=self.flatten_refs)
        return self._cache[name]

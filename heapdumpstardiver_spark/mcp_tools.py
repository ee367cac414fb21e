"""MCP tool surface over the session service.

Reproduces the reference MCP server's tool set
(/root/reference/mcp_server/server.py:238-601) — convert_heap_dump,
open_session, list_sessions, close_session, cleanup_session
(confirm-gated), list_parquet_files, query_heap, analyze_heap — backed
by the Spark engine: ingest instead of the native binary, Spark SQL
views instead of DuckDB ``read_parquet`` globs, and the DataFrame
waste/profile pipelines for analyze.

Every tool returns a JSON string (the reference's convention: tools
speak JSON so LLM clients can parse reliably).

Transport: when the official ``mcp`` SDK is importable, ``build_server``
registers the tools on a FastMCP instance and ``main()`` serves stdio.
The SDK is optional — the tool functions themselves are plain callables
closed over a :class:`~heapdumpstardiver_spark.service.SessionManager`,
registered in a dict, so the full surface is testable (and usable
in-process) without it.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable

from .service import DEFAULT_PAGE_SIZE, SessionManager
from .service import explain_query as _svc_explain_query
from .service import list_tables as _svc_list_tables
from .service import profile_table as _svc_profile_table
from .service import query_heap as _svc_query_heap


def _json(obj: Any) -> str:
    return json.dumps(obj, indent=2, default=str)


def _fmt_bytes(n: int) -> str:
    if n >= 1024**3:
        return f"{n / 1024**3:.1f} GB"
    if n >= 1024**2:
        return f"{n / 1024**2:.1f} MB"
    if n >= 1024:
        return f"{n / 1024:.1f} KB"
    return f"{n} B"


def build_tools(manager: SessionManager) -> dict[str, Callable[..., str]]:
    """The tool registry: name → callable returning a JSON string."""

    def convert_heap_dump(
        hprof_path: str, session_id: str = "", split_mb: int = 64
    ) -> str:
        """Convert an HPROF heap dump to a Parquet warehouse and open an
        analysis session (robo mode). Output goes to
        <hprof_parent>/<session_id>/parquet/ — the reference's layout."""
        from .ingest import ingest_hprof

        hprof = Path(hprof_path).resolve()
        if not hprof.is_file():
            return _json({"error": f"File not found: {hprof}"})
        sid = session_id or hprof.stem
        parquet_dir = hprof.parent / sid / "parquet"
        try:
            summary = ingest_hprof(
                manager.spark,
                str(hprof),
                str(parquet_dir),
                target_split_bytes=split_mb * 1024 * 1024,
                overwrite=True,
            )
        except Exception as e:
            return _json({"error": f"Conversion failed: {e}"})
        sess = manager.create_session(parquet_dir, session_id=sid)
        files = sorted(parquet_dir.rglob("*.parquet"))
        return _json(
            {
                "status": "ok",
                "session_id": sess.session_id,
                "parquet_dir": str(parquet_dir),
                "files_created": len(files),
                "total_size": _fmt_bytes(sum(f.stat().st_size for f in files)),
                "tables": summary["tables"],
            }
        )

    def open_session(parquet_dir: str, session_id: str = "") -> str:
        """Open a session on an existing warehouse — native layout or a
        directory written by the reference binary (auto-detected)."""
        pdir = Path(parquet_dir).resolve()
        if not pdir.is_dir():
            return _json({"error": f"Directory not found: {pdir}"})
        if not any(pdir.rglob("*.parquet")):
            return _json({"error": f"No .parquet files found in {pdir}"})
        sess = manager.create_session(pdir, session_id=session_id or None)
        return _json(
            {
                "status": "ok",
                "session_id": sess.session_id,
                "tables": len(sess.warehouse.table_names()),
            }
        )

    def list_sessions() -> str:
        return _json(
            {
                "sessions": [
                    {
                        "session_id": s.session_id,
                        "parquet_dir": str(s.warehouse_dir),
                        "active": s.is_active,
                    }
                    for s in manager.sessions.values()
                ]
            }
        )

    def close_session(session_id: str) -> str:
        try:
            manager.close_session(session_id)
        except KeyError as e:
            return _json({"error": str(e)})
        return _json({"status": "ok", "closed": session_id})

    def cleanup_session(session_id: str, confirm: bool = False) -> str:
        """Close a session AND delete its warehouse directory.
        Destructive — requires confirm=True (the reference's gate)."""
        if not confirm:
            return _json(
                {
                    "error": "cleanup_session deletes the Parquet directory. "
                    "Call again with confirm=true to proceed.",
                    "session_id": session_id,
                }
            )
        try:
            n_files, path = manager.cleanup_session(session_id)
        except KeyError as e:
            return _json({"error": str(e)})
        return _json({"status": "ok", "deleted_files": n_files, "path": path})

    def list_parquet_files(session_id: str = "") -> str:
        """Tables with schemas, split into system vs class tables and
        sorted by row count — the reference's DESCRIBE surface."""
        out = _svc_list_tables(manager, session_id or None)
        if "error" in out:
            return _json(out)
        sess = manager.get(out["session_id"])
        system, classes = [], []
        for name, info in out["tables"].items():
            entry = {
                "table": name,
                "view": info["view"],
                "row_count": sess.warehouse.table(name).count(),
                "columns": [{"name": c, "type": t} for c, t in info["columns"]],
            }
            (system if name.startswith("_") else classes).append(entry)
        classes.sort(key=lambda e: e["row_count"], reverse=True)
        return _json(
            {
                "session_id": out["session_id"],
                "system_tables": system,
                "class_tables": classes,
            }
        )

    def query_heap(
        sql: str,
        session_id: str = "",
        limit: int = DEFAULT_PAGE_SIZE,
        offset: int = 0,
    ) -> str:
        """Arbitrary SQL over the session's views (paginated with the
        n+1 has_more probe). Reference tables by view name — see
        list_parquet_files."""
        return _json(
            _svc_query_heap(manager, sql, session_id or None, limit=limit, offset=offset)
        )

    def explain_query(sql: str, session_id: str = "", mode: str = "formatted") -> str:
        """Show the physical plan for a SQL query WITHOUT running it:
        scan pushdowns, join strategies, exchanges. Modes: formatted,
        extended, cost, codegen."""
        return _json(_svc_explain_query(manager, sql, session_id or None, mode=mode))

    def profile_table(session_id: str = "", table: str = "") -> str:
        """Per-column profile of one session table (rows, nulls,
        distinct counts, min/max) computed in a single scan."""
        return _json(_svc_profile_table(manager, table, session_id or None))

    def analyze_heap(
        session_id: str = "",
        waste: bool = True,
        waste_tier: int = 2,
        top_n: int = 30,
    ) -> str:
        """Automated heap analysis: summary, top types, categories,
        byte-array distribution + the tiered waste checks."""
        from .analytics import profile, run_waste_analysis

        try:
            sess = manager.get(session_id or None)
        except (KeyError, ValueError) as e:
            return _json({"error": str(e)})
        wh = sess.warehouse
        try:
            result: dict[str, Any] = {"session_id": sess.session_id}
            result["summary"] = [r.asDict() for r in profile.run_summary(wh).collect()][0]
            result["top_types"] = [
                r.asDict() for r in profile.run_top_types(wh, limit=top_n).collect()
            ]
            result["categories"] = [
                r.asDict() for r in profile.run_category_breakdown(wh).collect()
            ]
            result["byte_array_distribution"] = [
                r.asDict() for r in profile.run_byte_array_distribution(wh).collect()
            ]
            result["large_byte_arrays"] = [
                r.asDict() for r in profile.run_large_byte_arrays(wh).collect()
            ]
            if waste:
                findings = run_waste_analysis(wh, max_tier=waste_tier)
                total = sum(f.estimated_waste_bytes for f in findings)
                result["waste_findings"] = [
                    {
                        "check_name": f.check_name,
                        "tier": f.tier,
                        "severity": f.severity,
                        "affected_count": f.affected_count,
                        "estimated_waste_bytes": f.estimated_waste_bytes,
                        "estimated_waste_human": _fmt_bytes(f.estimated_waste_bytes),
                        "details": f.details,
                        "recommendation": f.recommendation,
                        "sub_findings": f.sub_findings,
                    }
                    for f in findings
                ]
                result["total_estimated_waste"] = _fmt_bytes(total)
                result["total_estimated_waste_bytes"] = total
            return _json(result)
        except Exception as e:
            return _json({"error": str(e)})

    def analyze_liveness(session_id: str = "", top_n: int = 20) -> str:
        """GC-root reachability analysis (beyond the reference's tool
        surface): totals of reachable vs floating-garbage objects plus
        the top unreachable types — the "how much of this heap is
        actually live" question a fixed-JOIN SQL surface cannot
        answer. Runs the iterative-join BFS of
        analytics/reachability.py on the session warehouse."""
        from .analytics import liveness_summary, unreachable_by_type

        try:
            sess = manager.get(session_id or None)
        except (KeyError, ValueError) as e:
            return _json({"error": str(e)})
        try:
            summary = liveness_summary(sess.warehouse).collect()[0].asDict()
            top_dead = [
                r.asDict()
                for r in unreachable_by_type(sess.warehouse, k=top_n).collect()
            ]
            return _json(
                {
                    "session_id": sess.session_id,
                    "summary": summary,
                    "top_unreachable_types": top_dead,
                }
            )
        except Exception as e:
            return _json({"error": str(e)})

    def retained_by_single_referrer(session_id: str = "", top_n: int = 20) -> str:
        """Memory attribution by sole retainer: for objects with
        exactly one incoming reference, which (retainer type →
        retained type) pairs hold the most bytes — the who-is-holding
        -this-memory triage view (exact without a dominator tree).
        In-degrees from the full heap edge list; shallow sizes from
        the declared field layout and array lengths."""
        from .analytics.reachability import heap_edges

        try:
            sess = manager.get(session_id or None)
        except (KeyError, ValueError) as e:
            return _json({"error": str(e)})
        wh = sess.warehouse
        try:
            from pyspark.sql import functions as F

            edges = heap_edges(wh).distinct()
            single = (
                edges.groupBy("dst")
                .agg(F.count(F.lit(1)).alias("n"), F.min("src").alias("retainer"))
                .filter(F.col("n") == 1)
            )
            oi = wh.table("_object_index")
            pairs = (
                single.join(
                    oi.select(
                        F.col("obj_id").alias("dst"),
                        F.col("type_name").alias("retained_type"),
                    ),
                    "dst",
                )
                .join(
                    oi.select(
                        F.col("obj_id").alias("retainer"),
                        F.col("type_name").alias("retainer_type"),
                    ),
                    "retainer",
                )
                .groupBy("retainer_type", "retained_type")
                .agg(F.count(F.lit(1)).alias("n_objects"))
                .orderBy(F.desc("n_objects"), "retainer_type", "retained_type")
                .limit(top_n)
            )
            return _json(
                {
                    "session_id": sess.session_id,
                    "pairs": [r.asDict() for r in pairs.collect()],
                }
            )
        except Exception as e:
            return _json({"error": str(e)})

    def retained_sizes_dominator(
        session_id: str = "", top_n: int = 20, by_class: bool = False
    ) -> str:
        """MAT-style retained heap via a true dominator tree: per
        object (or per class with by_class), the bytes that become
        collectible if it dies — Σ shallow over its dominated set.
        Dominators from the BFS-seeded greatest-fixpoint dataflow of
        analytics/dominators.py; idom 0 means "held directly by a GC
        root". Strictly stronger than retained_by_single_referrer
        (which only attributes in-degree-1 objects)."""
        from .analytics.dominators import retained_by_class, retained_sizes

        try:
            sess = manager.get(session_id or None)
        except (KeyError, ValueError) as e:
            return _json({"error": str(e)})
        try:
            if by_class:
                rows = retained_by_class(sess.warehouse, k=top_n).collect()
            else:
                rows = retained_sizes(sess.warehouse).limit(top_n).collect()
            return _json(
                {
                    "session_id": sess.session_id,
                    "by_class": by_class,
                    "top_retainers": [r.asDict() for r in rows],
                }
            )
        except Exception as e:
            return _json({"error": str(e)})

    return {
        "convert_heap_dump": convert_heap_dump,
        "open_session": open_session,
        "list_sessions": list_sessions,
        "close_session": close_session,
        "cleanup_session": cleanup_session,
        "list_parquet_files": list_parquet_files,
        "query_heap": query_heap,
        "explain_query": explain_query,
        "profile_table": profile_table,
        "analyze_heap": analyze_heap,
        "analyze_liveness": analyze_liveness,
        "retained_by_single_referrer": retained_by_single_referrer,
        "retained_sizes_dominator": retained_sizes_dominator,
    }


#: uri -> (name, description, markdown body). The reference server
#: publishes three onboarding guides as ``@mcp.resource`` markdown
#: (mcp_server/server.py:70-236); these are their Spark-engine
#: adaptations, kept SDK-optional like the tools so the content is
#: testable (and servable in-process) without the ``mcp`` package.
GUIDE_RESOURCES: dict[str, tuple[str, str, str]] = {
    "heapdump://guides/setup": (
        "Setup Guide",
        "How to set up the Spark engine and connect the MCP server",
        """\
# Setup Guide

## Requirements

The engine is pure PySpark — no native binary to build. You need:

- Python with `pyspark` (4.x), `pyarrow`, and `pandas` installed
- Java 17+ on the PATH or `JAVA_HOME`
- the optional `mcp` package only for the stdio transport
  (`python -m heapdumpstardiver_spark.mcp_tools`); every tool is a
  plain callable without it

## Start the MCP server

```bash
python -m heapdumpstardiver_spark.mcp_tools
```

This creates one shared SparkSession (local mode by default; set
`SPARK_GRAFT_CPUS` to size `local[N]`) and serves the tools over
stdio.

## Typical flow

1. `convert_heap_dump` — ingest an HPROF heap dump; writes a Parquet
   warehouse to `<hprof_parent>/<session_id>/parquet/` and opens a
   session over it.
2. or `open_session` — attach to an existing Parquet warehouse
   (this engine's layout or the reference converter's layout; both
   column modes are auto-detected).
3. `list_parquet_files` / `profile_table` — inspect what's there.
4. `query_heap` — Spark SQL over the session's temp views.
5. `analyze_heap` — the 13-check waste analysis (tiers 1-3).
6. `list_sessions` shows everything open; `close_session` when done;
   `cleanup_session(confirm=true)` also deletes the session's files.

See `heapdump://guides/sql-examples` for query patterns and
`heapdump://guides/waste-checks` for what each check detects.
""",
    ),
    "heapdump://guides/sql-examples": (
        "SQL Examples",
        "Example Spark SQL for common heap-dump analysis over session views",
        """\
# SQL Examples for query_heap

Queries use Spark SQL. Each session registers every warehouse table
as a temp view named `<session_id>_<table>`, with dots/brackets
sanitized to underscores (`java.lang.String` →
`<sid>_java_lang_String`). `list_parquet_files` shows the exact view
names. Results paginate with the `limit`/`offset` tool parameters —
add an ORDER BY when paging, Spark result order is otherwise
non-deterministic.

## Top types by object count
```sql
SELECT type_name, COUNT(*) AS cnt
FROM mysess__object_index
GROUP BY type_name ORDER BY cnt DESC LIMIT 20
```

## Look up what type an object ID belongs to
```sql
SELECT * FROM mysess__object_index WHERE obj_id = 12345678
```

## Thread stack hot frames
```sql
SELECT sf.class_name, sf.method_name, COUNT(*) AS appearances
FROM mysess__stack_traces st
LATERAL VIEW explode(st.frame_ids) t AS fid
JOIN mysess__stack_frames sf ON sf.frame_id = t.fid
GROUP BY sf.class_name, sf.method_name
ORDER BY appearances DESC LIMIT 10
```

## Duplicate strings with waste estimate
```sql
WITH str_bytes AS (
    SELECT s.obj_id, md5(CAST(b.values AS STRING)) AS hash,
           size(b.values) AS len
    FROM mysess_java_lang_String s
    JOIN mysess__primitive_arrays_byte b ON s.value = b.obj_id
)
SELECT hash, COUNT(*) AS dups, MIN(len) AS str_len
FROM str_bytes GROUP BY hash HAVING COUNT(*) > 1
ORDER BY dups * str_len DESC LIMIT 20
```

## GC roots by type
```sql
SELECT root_type, COUNT(*) AS cnt
FROM mysess__gc_roots GROUP BY root_type ORDER BY cnt DESC
```

## Class hierarchy (find subclasses)
```sql
SELECT * FROM mysess__class_hierarchy
WHERE super_class_name = 'java.util.AbstractMap'
```

## Join instance fields to the object index for type resolution
```sql
SELECT i.*, idx.type_name AS ref_type
FROM mysess_com_example_MyClass i
JOIN mysess__object_index idx ON i.some_ref_field = idx.obj_id
LIMIT 20
```

Prefer `explain_query` before heavy ad-hoc SQL: it returns the
Catalyst plan so you can confirm filters pushed down to the Parquet
scan.
""",
    ),
    "heapdump://guides/waste-checks": (
        "Waste Checks Reference",
        "What each waste-analysis tier checks and what it detects",
        """\
# Waste Analysis Checks

The `analyze_heap` tool runs waste checks controlled by the
`waste_tier` parameter. Higher tiers include all lower-tier checks
plus additional ones. Each check is an independent Spark DataFrame
pipeline with per-check fault isolation (one failing check reports
its error without aborting the rest).

| Tier | Check | What It Detects |
|------|-------|-----------------|
| 1 | Duplicate Strings | Strings with identical byte[] content |
| 1 | Bad Collections (empty/single-element) | Empty/single-element HashMap, ArrayList, LinkedList, TreeMap, ConcurrentHashMap |
| 1 | Bad Object Arrays | Zero-length, all-null, single-element, sparse (>70% null) |
| 1 | Bad Primitive Arrays | Zero-length, all-zero, single-element across all 8 primitive types |
| 1 | Boxed Primitives | Integer, Long, Double, etc. wrapper overhead |
| 2 | Collection Sizing Issues | Sparse HashMaps (<33% utilized), oversized ArrayList backing arrays |
| 2 | Duplicate byte[] Arrays | Identical byte arrays (MD5 hash, arrays <=10KB) |
| 2 | Class Count / Leak Detection | >20K classes suggests a classloader leak |
| 2 | GC Roots Breakdown | Root type breakdown (thread bloat, JNI leaks) |
| 2 | DirectByteBuffer Off-Heap | Off-heap capacity, empty buffers |
| 2 | Thread Stacks | Thread count and stack depth analysis |
| 3 | Duplicate Object Arrays | Same elements in same order |
| 3 | Estimated Shallow Size (top 50 types) | Approximate heap usage by type |

## Severity levels

Severity is based on estimated waste bytes:
- **CRITICAL**: >100 MB
- **HIGH**: >10 MB
- **MEDIUM**: >1 MB
- **LOW**: >100 KB
- **INFO**: <=100 KB

## Recommendations

- Start with `waste_tier=1` for a fast scan (5 checks)
- Use `waste_tier=2` (default) for a thorough analysis (11 checks)
- Use `waste_tier=3` only when you need the expensive checks
  (13 checks, slower on large heaps)
- On very large warehouses the checks auto-engage Bernoulli sampling
  with scale-up for the duplicate scans; findings report the sampled
  fraction

Deeper follow-ups when a check fires: `analyze_liveness`
(reachability census), `retained_by_single_referrer`, and
`retained_sizes_dominator` (dominator-tree retained sizes).
""",
    ),
}


def build_resources() -> dict[str, tuple[str, str, str]]:
    """The resource registry: uri → (name, description, markdown)."""
    return dict(GUIDE_RESOURCES)


def build_server(manager: SessionManager):
    """Register the tools and guide resources on a FastMCP server
    (requires the ``mcp`` SDK; raises ImportError with a clear message
    when absent)."""
    try:
        from mcp.server.fastmcp import FastMCP
    except ImportError as e:  # pragma: no cover - SDK not in this container
        raise ImportError(
            "the 'mcp' package is required for the MCP transport; the tool "
            "functions in build_tools() work without it"
        ) from e
    server = FastMCP("heapdumpstardiver-spark")
    for name, fn in build_tools(manager).items():
        server.tool(name=name)(fn)
    for uri, (name, description, body) in build_resources().items():
        server.resource(
            uri, name=name, description=description, mime_type="text/markdown"
        )(lambda _body=body: _body)
    return server


def main() -> int:  # pragma: no cover - needs the SDK + a stdio client
    from .session import get_spark

    manager = SessionManager(get_spark(app_name="hdsd-mcp"))
    build_server(manager).run()
    return 0


if __name__ == "__main__":  # pragma: no cover
    import sys

    sys.exit(main())

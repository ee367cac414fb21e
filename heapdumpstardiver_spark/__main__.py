"""CLI — the reference's command surface, Spark-backed.

    python -m heapdumpstardiver_spark count-records -f app.hprof
    python -m heapdumpstardiver_spark dump-objects-to-parquet -f app.hprof -o warehouse/
    python -m heapdumpstardiver_spark analyze -w warehouse/ [--max-tier 3]
    python -m heapdumpstardiver_spark query -w warehouse/ --sql "SELECT ..." [--limit N]

Mirrors /root/reference/src/main.rs's clap commands (`-f` file flag,
`count-records`, `dump-objects-to-parquet`) and the MCP server's
`analyze_heap` / `query_heap` tools, so a reference user keeps their
workflow: convert once, then analyze/query the parquet warehouse.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="heapdumpstardiver_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_count = sub.add_parser("count-records", help="tally top-level HPROF record tags")
    p_count.add_argument("-f", "--file", required=True)

    p_do = sub.add_parser(
        "dump-objects", help="print heap sub-records with resolved names to stdout"
    )
    p_do.add_argument("-f", "--file", required=True)
    p_do.add_argument("--limit", type=int, default=None)
    p_do.add_argument("--max-elems", type=int, default=8)

    p_dump = sub.add_parser(
        "dump-objects-to-parquet", help="convert an HPROF dump to a parquet warehouse"
    )
    p_dump.add_argument("-f", "--file", required=True)
    p_dump.add_argument("-o", "--out-dir", required=True)
    p_dump.add_argument("--split-mb", type=int, default=64)
    p_dump.add_argument("--overwrite", action="store_true")
    p_dump.add_argument(
        "--tolerate-truncation",
        action="store_true",
        help="ingest the complete-record prefix of a cut-short dump",
    )

    p_snap = sub.add_parser(
        "append-snapshot", help="ingest a dump as snapshot <id> of a warehouse"
    )
    p_snap.add_argument("-f", "--file", required=True)
    p_snap.add_argument("-w", "--warehouse", required=True)
    p_snap.add_argument("--id", type=int, required=True)
    p_snap.add_argument("--split-mb", type=int, default=64)
    p_snap.add_argument("--overwrite", action="store_true")

    p_sd = sub.add_parser(
        "snapshot-diff", help="heap growth between two snapshots of a warehouse"
    )
    p_sd.add_argument("-w", "--warehouse", required=True)
    p_sd.add_argument("--before", type=int, required=True)
    p_sd.add_argument("--after", type=int, required=True)
    p_sd.add_argument("--top", type=int, default=50, help="max type rows to print")

    p_c = sub.add_parser(
        "compact", help="coalesce small part files per table (OPTIMIZE)"
    )
    p_c.add_argument("-w", "--warehouse", required=True)
    p_c.add_argument("--table", default=None, help="one table (default: all)")
    p_c.add_argument("--target-mb", type=int, default=128)

    p_x = sub.add_parser(
        "export-reference-layout",
        help="write a warehouse in the reference binary's flat layout",
    )
    p_x.add_argument("-w", "--warehouse", required=True)
    p_x.add_argument("-o", "--out-dir", required=True)
    p_x.add_argument("--default-mode", action="store_true",
                     help="single file per table (no robo chunks)")
    p_x.add_argument("--chunks", type=int, default=16)

    p_an = sub.add_parser("analyze", help="run the waste checks + profile summary")
    p_an.add_argument("-w", "--warehouse", required=True)
    p_an.add_argument("--max-tier", type=int, default=3)

    p_pr = sub.add_parser(
        "profile", help="per-column stats of one warehouse table (single scan)"
    )
    p_pr.add_argument("-w", "--warehouse", required=True)
    p_pr.add_argument("-t", "--table", required=True)

    p_q = sub.add_parser("query", help="SQL over warehouse views (paginated)")
    p_q.add_argument("-w", "--warehouse", required=True)
    p_q.add_argument("--sql", required=True)
    p_q.add_argument("--limit", type=int, default=1000)
    p_q.add_argument("--offset", type=int, default=0)

    args = ap.parse_args(argv)

    if args.cmd == "count-records":
        from .ingest import count_records

        for tag, n in count_records(args.file):
            print(f"{n:>12}  {tag}")
        return 0

    if args.cmd == "dump-objects":
        from .ingest.debug_dump import dump_objects

        dump_objects(args.file, limit=args.limit, max_elems=args.max_elems)
        return 0

    from .session import get_spark

    spark = get_spark(app_name=f"hdsd-{args.cmd}")
    try:
        if args.cmd == "dump-objects-to-parquet":
            from .ingest import ingest_hprof

            manifest = ingest_hprof(
                spark,
                args.file,
                args.out_dir,
                target_split_bytes=args.split_mb * 1024 * 1024,
                overwrite=args.overwrite,
                strict=not args.tolerate_truncation,
            )
            print(json.dumps(manifest, indent=2))
        elif args.cmd == "append-snapshot":
            from .ingest import append_snapshot, list_snapshots

            manifest = append_snapshot(
                spark,
                args.file,
                args.warehouse,
                args.id,
                overwrite=args.overwrite,
                target_split_bytes=args.split_mb * 1024 * 1024,
            )
            manifest["snapshots"] = list_snapshots(args.warehouse)
            print(json.dumps(manifest, indent=2))
        elif args.cmd == "snapshot-diff":
            from pyspark.sql import functions as F

            from .catalog import Warehouse
            from .ingest import object_diff, type_histogram_delta

            wh = Warehouse(spark, args.warehouse)
            deltas = [
                r.asDict()
                for r in type_histogram_delta(wh, args.before, args.after)
                .filter(F.col("delta") != 0)
                .limit(args.top)
                .collect()
            ]
            status_counts = {
                r["status"]: r["n"]
                for r in object_diff(wh, args.before, args.after)
                .groupBy("status")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            print(
                json.dumps(
                    {
                        "before": args.before,
                        "after": args.after,
                        "n_new": status_counts.get("new", 0),
                        "n_freed": status_counts.get("freed", 0),
                        "type_deltas": deltas,
                    },
                    indent=2,
                )
            )
        elif args.cmd == "compact":
            from .catalog import Warehouse, compact_table

            wh = Warehouse(spark, args.warehouse)
            names = [args.table] if args.table else wh.table_names()
            out = {
                n: compact_table(
                    spark, args.warehouse, n,
                    target_bytes=args.target_mb * 1024 * 1024,
                )
                for n in names
            }
            print(json.dumps(out, indent=2))
        elif args.cmd == "export-reference-layout":
            from .interop import export_reference_layout

            summary = export_reference_layout(
                spark,
                args.warehouse,
                args.out_dir,
                robo=not args.default_mode,
                chunks=args.chunks,
            )
            print(json.dumps(summary, indent=2))
        elif args.cmd == "profile":
            from .service import SessionManager, profile_table

            mgr = SessionManager(spark)
            mgr.create_session(args.warehouse, session_id="cli")
            print(
                json.dumps(
                    profile_table(mgr, args.table, "cli"),
                    indent=2,
                    default=str,
                )
            )
        elif args.cmd == "analyze":
            from .analytics import run_waste_analysis
            from .interop import open_warehouse

            # accepts the native layout OR a directory written by the
            # reference binary (flat {Class}_{cid}[_chunk{N}].parquet)
            wh = open_warehouse(spark, args.warehouse)
            findings = run_waste_analysis(wh, max_tier=args.max_tier)
            print(
                json.dumps(
                    [
                        {
                            "check": f.check_name,
                            "severity": f.severity,
                            "waste_bytes": f.estimated_waste_bytes,
                            "affected": f.affected_count,
                            "details": f.details,
                            "recommendation": f.recommendation,
                        }
                        for f in findings
                    ],
                    indent=2,
                    default=str,
                )
            )
        elif args.cmd == "query":
            from .service import SessionManager, query_heap

            mgr = SessionManager(spark)
            # fixed session id so view names are predictable:
            # `cli__<table>` with dots/brackets → underscores
            # (e.g. cli__java_lang_String, cli___gc_roots)
            sess = mgr.create_session(args.warehouse, session_id="cli")
            out = query_heap(mgr, args.sql, limit=args.limit, offset=args.offset)
            if "error" in out:
                out["available_views"] = sorted(
                    sess.view_name(t) for t in sess.warehouse.table_names()
                )
            print(json.dumps(out, indent=2, default=str))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Drive the driver contract: plain SparkSession, entry() smoke at
sf0.001, then every queries() entry vs its oracle_sql() twin on DuckDB
at sf0.01 — sort columns by name, sort rows, exact equality (the
driver's value-hash check, reproduced locally).

Usage: python scripts/verify_contract.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import math
import sys

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return repr(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", help="query names to check (default: all)")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as em

    spark = SparkSession.builder.master("local[8]").getOrCreate()

    n = len(em.entry(spark).collect())
    print(f"entry: {n} rows OK")

    qs, osql = em.queries(), em.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    names = args.only or list(qs)
    failed, rows_only = [], []
    for name in names:
        try:
            sdf = qs[name](spark, args.sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
            if name not in osql:
                rows_only.append((name, len(srows)))
                continue
            dres = con.execute(osql[name])
            dcols = [d[0] for d in dres.description]
            drows = dres.fetchall()
            if sorted(scols) != sorted(dcols):
                failed.append((name, f"schema {sorted(scols)} != {sorted(dcols)}"))
                continue
            sset, dset = rowset(scols, srows), rowset(dcols, drows)
            if sset != dset:
                diff = next(
                    (i, a, b) for i, (a, b) in enumerate(zip(sset + ["<end>"], dset + ["<end>"])) if a != b
                )
                failed.append((name, f"{len(sset)}/{len(dset)} rows; first diff @{diff[0]}:\n  spark={diff[1][:200]}\n  duck ={diff[2][:200]}"))
            else:
                print(f"  OK {name}: {len(sset)} rows exact")
        except Exception as e:  # noqa: BLE001
            failed.append((name, f"EXCEPTION {type(e).__name__}: {e}"))

    for name, cnt in rows_only:
        print(f"  rows-only {name}: {cnt} rows (no oracle)")
    if failed:
        print(f"\nFAILED ({len(failed)}):")
        for name, why in failed:
            print(f"  {name}: {why}")
        sys.exit(1)
    print(f"\nall {len(names)} queries OK ({len(rows_only)} rows-only)")


if __name__ == "__main__":
    main()

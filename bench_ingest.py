"""HPROF-ingestion throughput benchmark.

Generates a deterministic synthetic heap dump (cached under
``.bench/``), runs the full two-pass ingest (driver metadata index +
distributed convert) and prints ONE JSON line with MB/s and rows/s —
the engine-side counterpart of the reference converter's wall-clock
claims (/root/reference/src/commands/dump_to_parquet.rs:938-941).

Env knobs: SPARK_GRAFT_CPUS (default 32),
SPARK_GRAFT_INGEST_SCALE (default 1.0 ≈ 240 MB dump).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from heapdumpstardiver_spark.ingest import ingest_hprof
from heapdumpstardiver_spark.ingest.hprof_writer import build_scale_dump
from heapdumpstardiver_spark.session import get_spark


def main() -> None:
    scale = float(os.environ.get("SPARK_GRAFT_INGEST_SCALE", "1.0"))
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench")
    os.makedirs(bench_dir, exist_ok=True)
    dump = os.path.join(bench_dir, f"ingest_scale_{scale}.hprof")
    if not os.path.exists(dump):
        build_scale_dump(
            dump,
            n_instances=int(3_000_000 * scale),
            n_prim_arrays=int(800_000 * scale),
            n_obj_arrays=int(400_000 * scale),
        )
    out_dir = os.path.join(bench_dir, "ingest_wh")

    spark = get_spark(app_name="heapdumpstardiver-bench-ingest")
    # Steady-state methodology (same as bench.py): warm the scheduler /
    # executor threads with a throwaway job so the measurement is the
    # ingest pipeline, not first-job JVM+scheduler spin-up.
    spark.sparkContext.parallelize(range(64), 64).count()
    t0 = time.perf_counter()
    manifest = ingest_hprof(spark, dump, out_dir, overwrite=True)
    wall = time.perf_counter() - t0

    size_mb = os.path.getsize(dump) / 1e6
    print(
        json.dumps(
            {
                "metric": "hprof_ingest_throughput",
                "value": round(size_mb / wall, 2),
                "unit": "MB/s",
                "wall_s": round(wall, 2),
                "dump_mb": round(size_mb, 1),
                "rows": manifest["total_rows"],
                "rows_per_s": round(manifest["total_rows"] / wall),
                "n_splits": manifest["n_splits"],
                "scale": scale,
            }
        )
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())

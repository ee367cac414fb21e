"""Optimization-round measurement probe: for each named query, write
`.explain("formatted")` to plans/r13/<name>_<tag>.txt and print an
isolated min-of-N noop wall at the given SF dir.

Run: python scripts/opt_probe.py --tag before --sf-dir /root/testdata/sf0.1 \
         --reps 3 jaccard_pairs winnowing_fingerprints
A fresh session per invocation keeps inherited JIT/GC state out of the
comparison (the same discipline as the bench's isolated probes).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import heapdumpstardiver_spark as hds
from bench import ITERATIVE, _gc_settle, _noop
from heapdumpstardiver_spark.session import get_spark

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--round", default="r14")
    ap.add_argument(
        "--full",
        action="store_true",
        help="time construct+execute for every query (honest wall for "
        "queries that run jobs at construction), not just ITERATIVE",
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    plans_dir = os.path.join(_REPO, "plans", args.round)
    os.makedirs(plans_dir, exist_ok=True)
    spark = get_spark(app_name="opt-probe")
    # One small untimed action so JVM startup isn't charged to query 1.
    spark.range(1000).selectExpr("sum(id)").collect()

    results = {}
    for name in args.queries:
        fn = hds.QUERIES[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        df = fn(spark, args.sf_dir)
        if not args.no_plan:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            out = os.path.join(plans_dir, f"{name}_{args.tag}.txt")
            with open(out, "w") as f:
                f.write(buf.getvalue())
        walls = []
        for _ in range(args.reps):
            _gc_settle(spark)
            t0 = time.perf_counter()
            if args.full or name in ITERATIVE:
                _noop(fn(spark, args.sf_dir))
            else:
                _noop(df)
            walls.append(time.perf_counter() - t0)
        results[name] = round(min(walls), 3)
        print(f"PROBE {name} {args.tag} min-of-{args.reps}: "
              f"{results[name]} s  (all: {[round(w, 3) for w in walls]})",
              flush=True)
        spark.sparkContext.setJobDescription(None)
    print("PROBE_SUMMARY", results)


if __name__ == "__main__":
    main()

"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
one JSON line with per-query wall seconds.

Execution is forced with the noop sink (full pipeline runs, nothing is
collected to the driver), so timings measure the engine, not result
transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

import heapdumpstardiver_spark as hds
from heapdumpstardiver_spark.session import get_spark

# Headline set: one per operator family — scan-heavy agg, fact-fact
# join, two-level agg, top-k, explode, window, sessionize, event-time
# window, hash dedup, shingle self-join, ANN. CORE is the stable
# round-over-round comparison set (BENCH_r01 baseline); LLM_OPS extends
# regression tracking to the MinHash/Jaccard/embedding dedup family and
# TF-IDF without disturbing the core total ("core13_total" below).
CORE = [
    "pricing_summary",
    "join_fact_fact",
    "two_level_agg",
    "weighted_topk",
    "having_dup_groups",
    "global_topk",
    "explode_tokens",
    "window_rank_topk",
    "sessionize_lag",
    "window_tumbling_hour",
    "dedup_exact",
    "ngram_shingle_overlap",
    "similarity_topk",
]
LLM_OPS = [
    "minhash_lsh_candidates",
    "jaccard_pairs",
    "embedding_near_dup_pairs",
    "tfidf_top_terms",
    "dedup_connected_components",
    "kmeans_embedding_clusters",
]
HEADLINE = CORE + LLM_OPS

# Queries that execute jobs during DataFrame *construction* (iterative
# label propagation's convergence rounds, k-means' centroid updates).
# For these the honest wall time is construct+execute per run —
# re-saving the returned DataFrame alone would replay only the final
# plan over checkpointed intermediates.
ITERATIVE = {"dedup_connected_components", "kmeans_embedding_clusters"}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="heapdumpstardiver-bench")

    # Untimed warmup: run one small action so JVM/codegen/Arrow startup
    # cost is paid before the first timed query, not attributed to it.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(
        1000
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = hds.QUERIES[name]
        # Steady-state methodology: one untimed execution first (JIT/
        # codegen compile + file-listing warmup), then best-of-two
        # timed runs. Cold-start compile is a per-process constant, not
        # a property of the plan; the min of warm runs is the
        # scheduler-noise-resistant statistic round-over-round
        # comparisons should track.
        if name in ITERATIVE:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
        else:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "core13_total": round(sum(timings[q] for q in CORE), 3),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())

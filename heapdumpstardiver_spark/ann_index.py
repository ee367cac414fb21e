"""Persisted IVF vector index: build / probe / append lifecycle.

The ANN-index twin of the persisted dedup indexes
(``streaming/lsh_dedup.py`` for text bands, ``streaming/phash_dedup.py``
for image hashes): the expensive corpus pass happens ONCE at build
time, and every later operation touches only what it must.

- ``build_ivf_index`` trains k centroids (exact Lloyd rounds with the
  deterministic init and 6-dp portably-rounded updates of
  ``kmeans_embedding_clusters``) and writes two parquet artifacts:
  ``centroids`` (k rows — index METADATA) and ``assignments``
  partitioned by ``cid`` — so a probe's cluster selection becomes
  Hive partition pruning, the physical realization of "IVF visits
  nprobe inverted lists".
- ``probe_ivf_index`` ranks the k centroid rows DRIVER-side (k·d
  floats — metadata, not data), then scans ONLY the nprobe chosen
  partitions for the exact cosine top-k. At 100 TB the unchosen
  partitions are never read; the plan shows ``PartitionFilters``
  (pinned in ``tests/test_ann_index.py``).
- ``append_to_ivf_index`` assigns new vectors against the FROZEN
  centroids and appends their partitions — the standard IVF append
  (centroids drift only at the next rebuild). N appends followed by a
  probe are row-identical to a one-shot build of the union under the
  same centroids (parity-pinned), so a crawl loop can grow the store
  daily without rescanning it.

Per-vector norms are materialized at write time, so probes never
recompute corpus-side norms.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .exprs import dot, round_col

IVF_K = 4
IVF_ROUNDS = 2


def _lit_vec(xs: list[float]):
    return F.array(*[F.lit(float(x)) for x in xs])


def _self_dot(xs: list[float]) -> float:
    # Left-to-right fold == DuckDB list_dot_product over the same
    # rounded doubles (the kmeans-oracle convention).
    acc = 0.0
    for x in xs:
        acc = acc + x * x
    return acc


def _assign(vecs: DataFrame, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """Argmin-centroid assignment via one greatest() projection —
    ties break toward the smaller cid (negated-cid struct field)."""
    scored = [
        F.struct(
            (
                -(
                    dot(F.col("v"), F.col("v"))
                    - 2 * dot(F.col("v"), _lit_vec(cv))
                    + F.lit(_self_dot(cv))
                )
            ).alias("negd"),
            F.lit(-cid).alias("ncid"),
            F.lit(int(cid)).alias("cid"),
        )
        for cid, cv in centroids
    ]
    best = F.greatest(*scored)
    return vecs.withColumn("cid", best.getField("cid"))


def train_centroids(
    emb: DataFrame, k: int = IVF_K, rounds: int = IVF_ROUNDS
) -> list[tuple[int, list[float]]]:
    """Exact Lloyd training with deterministic init (the k smallest
    vec_ids) and 6-dp portably-rounded mean updates. Returns k·d
    driver metadata. ``emb`` must have (vec_id, embedding)."""
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).localCheckpoint()
    init_ids = [
        r["vec_id"]
        for r in v.select("vec_id").orderBy("vec_id").limit(k).collect()
    ]
    cents = sorted(
        (int(r["vec_id"]), list(r["v"]))
        for r in v.filter(F.col("vec_id").isin(init_ids)).collect()
    )
    cents = [(i, cv) for i, (_vid, cv) in enumerate(cents)]
    for _ in range(rounds):
        rows = (
            _assign(v, cents)
            .select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(round_col(F.avg("val"), 6).alias("val"))
            .collect()
        )
        by: dict[int, dict[int, float]] = {}
        for r in rows:
            by.setdefault(r["cid"], {})[r["pos"]] = r["val"]
        # a cluster that empties during a round is absent from the
        # aggregate: carry its previous centroid forward so k is
        # invariant across rounds (the index always has exactly k
        # inverted lists, matching probe_ivf_index's nprobe contract)
        prev = dict(cents)
        cents = sorted(
            (cid, [dims[p] for p in range(len(dims))] if dims else prev[cid])
            for cid, dims in ((cid, by.get(cid, {})) for cid, _ in cents)
        )
    return cents


def build_ivf_index(
    spark: SparkSession,
    emb: DataFrame,
    index_dir: str,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> list[tuple[int, list[float]]]:
    """Train (unless given frozen centroids) and persist the index."""
    if centroids is None:
        centroids = train_centroids(emb)
    spark.createDataFrame(
        [(cid, cv) for cid, cv in centroids], "cid int, cv array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(index_dir, "centroids")
    )
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    asg = _assign(vecs, centroids).withColumn(
        "nrm", F.sqrt(dot(F.col("v"), F.col("v")))
    )
    asg.write.mode("overwrite").partitionBy("cid").parquet(
        os.path.join(index_dir, "assignments")
    )
    return centroids


def read_centroids(spark: SparkSession, index_dir: str) -> list[tuple[int, list[float]]]:
    rows = spark.read.parquet(os.path.join(index_dir, "centroids")).collect()
    return sorted((int(r["cid"]), list(r["cv"])) for r in rows)


def append_to_ivf_index(
    spark: SparkSession, new_emb: DataFrame, index_dir: str
) -> None:
    """Assign new vectors against the frozen centroids and append
    their partitions — O(batch), the store is never rescanned."""
    centroids = read_centroids(spark, index_dir)
    vecs = new_emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    asg = _assign(vecs, centroids).withColumn(
        "nrm", F.sqrt(dot(F.col("v"), F.col("v")))
    )
    asg.write.mode("append").partitionBy("cid").parquet(
        os.path.join(index_dir, "assignments")
    )


def probe_ivf_index(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    nprobe: int = 2,
    topk: int = 10,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Exact cosine top-k over the nprobe nearest inverted lists.

    Centroid ranking is pure driver arithmetic on k metadata rows
    (squared euclidean, ties to smaller cid); the scan carries a
    ``cid IN (...)`` predicate that Spark turns into partition
    pruning. Returned cosines are 4-dp portably rounded with vec_id
    tie-breaks, so rankings are engine-stable."""
    centroids = read_centroids(spark, index_dir)
    qd = {
        cid: _self_dot(cv)
        - 2.0 * sum(a * b for a, b in zip(query_vec, cv))
        + _self_dot(query_vec)
        for cid, cv in centroids
    }
    chosen = [cid for cid, _d in sorted(qd.items(), key=lambda kv: (kv[1], kv[0]))][
        :nprobe
    ]
    asg = spark.read.parquet(os.path.join(index_dir, "assignments")).filter(
        F.col("cid").isin(chosen)
    )
    if exclude_vec_id is not None:
        asg = asg.filter(F.col("vec_id") != exclude_vec_id)
    qv = _lit_vec(query_vec)
    qn = float(_self_dot(query_vec)) ** 0.5
    cos = round_col(dot(F.col("v"), qv) / (F.col("nrm") * F.lit(qn)), 4)
    return (
        asg.select(
            "vec_id", F.col("cid").cast("int").alias("cid"), cos.alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(topk)
    )

"""Composed IVF+PQ index: build / ADC probe / exact re-rank.

Pins the claims `ann_index.build_ivfpq_index` / `probe_ivfpq_index`
make beyond their two parents (tests/test_ann_index.py pins the IVF
half): the probe's scan is partition-pruned to the chosen lists AND
touches no second corpus relation (the codes, raw vector and norm all
come from the pruned rows), ADC ordering agrees with exact distances
on reconstructed vectors, and the re-rank output is exact cosine over
the shortlist.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from heapdumpstardiver_spark.ann_index import (
    IVF_K,
    PQ_DSUB,
    PQ_M,
    build_ivfpq_index,
    probe_ivfpq_index,
    read_pq_codebooks,
)
from heapdumpstardiver_spark.exprs import cosine, round_col
from tests.conftest import SF_DIR


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _query_vec(spark):
    (row,) = (
        _emb(spark)
        .filter(F.col("vec_id") == 0)
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    return list(row["v"])


def test_probe_is_partition_pruned_and_single_scan(spark, tmp_path):
    """The 100 TB contract: ONE FileScan in the whole probe plan
    (codes + raw vectors + norms all come from the pruned inverted
    lists — no corpus re-scan for the re-rank), and that scan carries
    a cid PartitionFilter."""
    idx = str(tmp_path / "ivfpq_prune")
    build_ivfpq_index(spark, _emb(spark), idx)
    df = probe_ivfpq_index(spark, idx, _query_vec(spark), nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert len(scans) == 1, plan
    assert "PartitionFilters" in scans[0]
    assert "cid" in scans[0].split("PartitionFilters")[1][:80]


def test_adc_shortlist_matches_reconstructed_distances(spark, tmp_path):
    """ADC is exact w.r.t. the RECONSTRUCTED vectors (that is the
    quantity it looks up): re-deriving each candidate's distance from
    its codebook entries in Python must reproduce the probe's adist
    to the emitted 4-dp rounding."""
    idx = str(tmp_path / "ivfpq_adc")
    emb = _emb(spark)
    build_ivfpq_index(spark, emb, idx)
    qv = _query_vec(spark)
    books = read_pq_codebooks(spark, idx)
    asg = spark.read.parquet(f"{idx}/assignments")
    codes = {
        r["vec_id"]: [r[f"c{s}"] for s in range(PQ_M)]
        for r in asg.collect()
    }

    def fold(xs, ys):
        acc = 0.0
        for x, y in zip(xs, ys):
            acc = acc + x * y
        return acc

    def adist_py(vid):
        ds = []
        for s in range(PQ_M):
            qsub = qv[PQ_DSUB * s : PQ_DSUB * (s + 1)]
            cv = dict(books[s])[codes[vid][s]]
            ds.append(fold(qsub, qsub) - 2 * fold(qsub, cv) + fold(cv, cv))
        return ((ds[0] + ds[1]) + ds[2]) + ds[3]

    out = probe_ivfpq_index(
        spark, idx, qv, nprobe=IVF_K, shortlist=50, topk=50, exclude_vec_id=0
    ).collect()
    assert out, "probe returned nothing"
    for r in out:
        assert abs(r["adist"] - adist_py(r["vec_id"])) < 5e-5, r


def test_rerank_is_exact_cosine_and_probe_stays_in_lists(spark, tmp_path):
    """Re-ranked cosines are the exact corpus cosines (not ADC
    approximations), and every returned row belongs to a chosen
    list."""
    idx = str(tmp_path / "ivfpq_rerank")
    emb = _emb(spark)
    build_ivfpq_index(spark, emb, idx)
    qv = _query_vec(spark)
    lit_q = F.array(*[F.lit(float(x)) for x in qv])
    exact = {
        r["vec_id"]: r["cos_sim"]
        for r in emb.select(
            "vec_id",
            round_col(
                cosine(F.col("embedding").cast("array<double>"), lit_q), 4
            ).alias("cos_sim"),
        ).collect()
    }
    out = probe_ivfpq_index(
        spark, idx, qv, nprobe=2, shortlist=20, topk=10, exclude_vec_id=0
    ).collect()
    assert len(out) == 10
    cids = {r["cid"] for r in out}
    assert len(cids) <= 2
    for r in out:
        assert r["cos_sim"] == exact[r["vec_id"]], r


def test_full_probe_recall_floor(spark, tmp_path):
    """nprobe=all + a generous shortlist must recover at least half of
    the brute-force top-10 (PQ at 4x16 codes is coarse; the floor
    guards encode/LUT regressions, not ANN quality)."""
    idx = str(tmp_path / "ivfpq_recall")
    emb = _emb(spark)
    build_ivfpq_index(spark, emb, idx)
    qv = _query_vec(spark)
    lit_q = F.array(*[F.lit(float(x)) for x in qv])
    truth = {
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            round_col(
                cosine(F.col("embedding").cast("array<double>"), lit_q), 4
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
        .collect()
    }
    got = {
        r["vec_id"]
        for r in probe_ivfpq_index(
            spark,
            idx,
            qv,
            nprobe=IVF_K,
            shortlist=60,
            topk=10,
            exclude_vec_id=0,
        ).collect()
    }
    assert len(got & truth) >= 5, (got, truth)

"""Round-12 invariants: the ADVICE-flagged hardening fixes.

- `_wp_fold_sql` must survive corpus-derived vocabulary pieces that
  contain single quotes (apostrophes are common in crawl text).
- `train_centroids` must keep k invariant when a cluster empties
  during a Lloyd round (carry the previous centroid forward) so the
  persisted IVF index always has exactly IVF_K inverted lists.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from heapdumpstardiver_spark.ann_index import IVF_K, train_centroids
from heapdumpstardiver_spark.queries.pipeline import _wp_fold_sql


def test_wp_fold_sql_escapes_quoted_vocab_pieces(spark):
    vocab = {"i", "t", "s", "'", "it's", "##'s", "don"}
    fold = F.expr(_wp_fold_sql(vocab))
    got = (
        spark.range(1)
        .select(F.lit("it's").alias("word"))
        .select(fold.alias("f"))
        .select(F.col("f.g").alias("pieces"), F.col("f.unk").alias("unk"))
        .collect()
    )
    # longest-match-first consumes the whole apostrophized word
    assert got[0]["pieces"] == "it's"
    assert got[0]["unk"] == 0


def test_wp_fold_sql_unk_fallback_with_quoted_vocab(spark):
    vocab = {"a", "##'", "##b"}
    fold = F.expr(_wp_fold_sql(vocab))
    got = (
        spark.range(1)
        .select(F.lit("a'bz").alias("word"))
        .select(fold.alias("f"))
        .select(F.col("f.g").alias("pieces"), F.col("f.unk").alias("unk"))
        .collect()
    )
    assert got[0]["pieces"] == "a ##' ##b [UNK]"
    assert got[0]["unk"] == 1


def test_train_centroids_k_invariant_on_empty_cluster(spark):
    # vec 0 and vec 1 are identical: the argmin assignment ties toward
    # the smaller cid, so cluster 1 receives zero points in round 1
    # and its per-round aggregate has no cid=1 rows. Before the fix the
    # centroid silently vanished (len < k); now it carries forward.
    dup = [1.0, 0.0]
    rows = [
        (0, dup),
        (1, dup),
        (2, [0.0, 1.0]),
        (3, [-1.0, 0.0]),
        (4, [0.9, 0.1]),
        (5, [0.1, 0.9]),
        (6, [-0.9, -0.1]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = train_centroids(emb, k=IVF_K, rounds=2)
    assert len(cents) == IVF_K
    assert [cid for cid, _ in cents] == list(range(IVF_K))
    # the emptied cluster keeps its init centroid verbatim
    assert cents[1][1] == dup


def test_quality_classifier_recovers_teacher_boundary(spark):
    """The trained student must RECOVER the teacher's decision
    boundary from labels alone: >= 90% agreement on the training
    corpus, with the trajectory actually moving (non-zero weights)
    and deterministic across runs (the 6-dp rounded loop)."""
    import heapdumpstardiver_spark as hds

    sf = "/root/testdata/sf0.01"
    hist = hds.QUERIES["quality_classifier_train"](spark, sf).collect()
    assert [r["round"] for r in hist] == list(range(len(hist)))
    assert all(v == 0.0 for v in hist[0][1:]), "round 0 must be the zero init"
    final = hist[-1]
    assert any(abs(final[j]) > 0.1 for j in range(1, 5)), final
    # the teacher's informative dims (token count, stopword ratio)
    # must carry positive learned weight
    assert final["w1"] > 0 and final["w3"] > 0, final

    rows = hds.QUERIES["quality_classifier_apply_trained"](spark, sf).collect()
    tot = sum(r["n_docs"] for r in rows)
    corr = sum(r["n_correct"] for r in rows)
    n_pass = sum(r["n_pass"] for r in rows)
    assert corr / tot >= 0.9, f"boundary agreement {corr / tot:.3f}"
    # the student must discriminate, not rubber-stamp: both classes
    # non-trivially populated
    assert 0.2 < n_pass / tot < 0.8, f"pass rate {n_pass / tot:.3f}"

    again = hds.QUERIES["quality_classifier_train"](spark, sf).collect()
    assert [tuple(r) for r in hist] == [tuple(r) for r in again]


def test_matryoshka_full_dim_row_is_exact_and_recall_degrades(spark):
    """The d=64 truncation row is ground truth vs itself (recall 1.0
    by construction), every level keeps a full query panel, and the
    coarsest truncation must actually lose something on this fixture
    (otherwise the audit measures nothing)."""
    import heapdumpstardiver_spark as hds

    rows = {
        r["m"]: r
        for r in hds.QUERIES["matryoshka_truncation_recall"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    assert sorted(rows) == [4, 8, 16, 32, 64]
    assert rows[64]["avg_recall_at_10"] == 1.0
    assert rows[64]["min_recall_at_10"] == 1.0
    assert all(r["n_queries"] == 10 for r in rows.values())
    assert rows[4]["avg_recall_at_10"] < 1.0
    assert all(
        0.0 <= r["min_recall_at_10"] <= r["avg_recall_at_10"] <= 1.0
        for r in rows.values()
    )


def test_loo_source_ablation_reconstructs_full_mean(spark):
    """Closed-form consistency: every source's leave-one-out mean must
    recombine with its own per-source statistics to the SAME full-
    corpus mean quality (within the 6-dp rounding), token shares must
    sum to 1, and unique-vocab ownership is non-negative with at
    least one source owning vocabulary on this fixture."""
    import heapdumpstardiver_spark as hds
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    rows = hds.QUERIES["loo_source_ablation"](spark, sf).collect()
    assert len(rows) >= 2
    shares = sum(r["token_share"] for r in rows)
    assert abs(shares - 1.0) < 1e-3, shares
    # the synthetic fixture's small vocabulary is shared by all 20
    # sources, so ownership is typically 0 here — the invariant is
    # non-negativity plus the recombination identity below
    assert all(r["vocab_unique_owned"] >= 0 for r in rows)
    # recombine: full_mean = loo*(N-n) + mean_s*n over N, per source
    d = hds.catalog.load_table(spark, sf, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    nt = F.size(toks)
    sw = F.size(F.filter(toks, lambda t: (t == "the") | (t == "a")))
    z = (
        F.lit(-1.0)
        + F.lit(0.02) * (nt / F.lit(10.0))
        + F.lit(0.1) * (F.col("n_chars").cast("double") / nt)
        + F.lit(2.0) * (sw.cast("double") / nt)
    )
    stats = {
        r["source"]: (r["n"], r["sz"])
        for r in d.select("source", z.alias("z"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("z").alias("sz"))
        .collect()
    }
    big_n = sum(n for n, _ in stats.values())
    full_mean = sum(sz for _, sz in stats.values()) / big_n
    for r in rows:
        n_s, sz_s = stats[r["source"]]
        recombined = (r["loo_mean_quality"] * (big_n - n_s) + sz_s) / big_n
        assert abs(recombined - full_mean) < 1e-5, r["source"]
        assert abs(
            r["quality_delta"] - (r["loo_mean_quality"] - full_mean)
        ) < 2e-6, r["source"]

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

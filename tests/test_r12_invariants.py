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

"""Semantic invariants for the round-11 operator families — properties
the oracle value-hash can't express (the hash pins WHAT came out,
these pin WHY it is trustworthy)."""

from __future__ import annotations

import heapdumpstardiver_spark as hds
from tests.conftest import SF_DIR


def _rows(spark, name):
    return hds.QUERIES[name](spark, SF_DIR).collect()


def test_phash_near_dup_finds_all_variants_and_nothing_else(spark):
    """The fixture has 8 source images x 3 perturbed variants: the
    detector must surface EXACTLY the 8 x C(3,2) = 24 same-source
    pairs (banding is pigeonhole-exact at Hamming <= 7, so a missed
    variant pair would be a codec/DCT defect, and a cross-source pair
    would mean the hash does not discriminate)."""
    rows = _rows(spark, "image_phash_near_dup")
    assert len(rows) == 24
    for r in rows:
        assert r["same_source_image"] == 1
        assert 0 <= r["hamming"] <= 7
        assert r["media_id_a"] // 3 == r["media_id_b"] // 3


def test_phash_hash_is_63_bit_balanced(spark):
    """Each pHash uses exactly the 63 AC coefficient bits with a
    rank-32 threshold: strictly-greater-than-median bits can never
    exceed 31 of 63, and a hash of 0 or with bit 63 set would mean
    the threshold or bit indexing drifted."""
    from heapdumpstardiver_spark.queries.media import (
        _PHASH_COS,
        _phash_pixel,
    )

    for b in range(8):
        for j in range(3):
            coefs = {}
            for u in range(8):
                for w in range(8):
                    coefs[(u, w)] = sum(
                        _phash_pixel(b, j, x, y)
                        * _PHASH_COS[u][x]
                        * _PHASH_COS[w][y]
                        for x in range(32)
                        for y in range(32)
                    )
            vals = sorted(
                (f, u * 8 + w)
                for (u, w), f in coefs.items()
                if (u, w) != (0, 0)
            )
            thr = vals[31][0]
            h = 0
            for f, idx in vals:
                if f > thr:
                    h |= 1 << (idx - 1)
            assert 0 < h < (1 << 63)
            assert bin(h).count("1") <= 31


def test_unigram_segmentation_reconstructs_every_word(spark):
    """Viterbi output must be a true segmentation: concatenating the
    chosen pieces reproduces the (truncated) word type exactly, and
    every piece is within the max piece length."""
    from heapdumpstardiver_spark.queries.pipeline import (
        UNI_MAXP,
        _unigram_trained,
    )

    seg, _, _ = _unigram_trained(spark, SF_DIR)
    for r in seg.collect():
        pieces = r["seg"].split(" ")
        assert "".join(pieces) == r["word"]
        assert all(1 <= len(p) <= UNI_MAXP for p in pieces)
        assert r["n_seg"] == len(pieces)


def test_unigram_prune_schedule_and_stats_consistency(spark):
    """The prune schedule must bite (seed 24 multis, then at most the
    16/12 budgets — fewer if fewer pieces saw Viterbi usage — and
    never growing), corpus word mass is invariant across rounds, and
    pieces_per_word is internally consistent with the integer
    counts."""
    rows = _rows(spark, "unigram_train_stats")
    assert [r["round"] for r in rows] == [1, 2, 3]
    multis = [r["vocab_multi"] for r in rows]
    assert multis[0] == 24
    assert multis[1] <= 16 and multis[2] <= 12
    assert multis[0] >= multis[1] >= multis[2] > 0
    assert len({r["corpus_words"] for r in rows}) == 1
    for r in rows:
        assert r["vocab_total"] > r["vocab_multi"]  # chars never pruned
        assert r["corpus_pieces"] >= r["corpus_words"]
        assert abs(
            r["pieces_per_word"] - r["corpus_pieces"] / r["corpus_words"]
        ) < 1e-6


def test_unigram_apply_totals_match_final_training_round(spark):
    """Applying the trained model to the same corpus must price every
    occurrence with the round-3 segmentation: per-source totals sum
    to the training round-3 corpus words/pieces."""
    train = {r["round"]: r for r in _rows(spark, "unigram_train_stats")}
    apply_rows = _rows(spark, "tokenizer_apply_unigram")
    assert sum(r["n_words"] for r in apply_rows) == train[3]["corpus_words"]
    assert sum(r["n_pieces"] for r in apply_rows) == train[3]["corpus_pieces"]


def test_video_phash_vote_finds_all_variants_and_nothing_else(spark):
    """6 source videos x 2 variants: the aligned-frame vote must
    surface exactly the 6 variant pairs — including fixtures where
    SOME frames are perturbed past the single-frame threshold (the
    vote's whole point) — and no cross-video pair."""
    rows = _rows(spark, "video_phash_near_dup")
    assert len(rows) == 6
    for r in rows:
        assert r["same_source_video"] == 1
        assert 3 <= r["n_frames_matched"] <= 4
        assert r["video_id_a"] // 2 == r["video_id_b"] // 2
    # the fixture deliberately includes a frame past the threshold
    assert any(r["n_frames_matched"] == 3 for r in rows)


def test_audio_fingerprint_finds_all_variants_and_nothing_else(spark):
    """6 source clips x 2 variants: Haitsma-Kalker verification must
    keep exactly the 6 variant pairs, each well under the 12-of-105
    bit budget, with most frame codes exactly shared (the candidate
    lookup requires at least one)."""
    rows = _rows(spark, "audio_fingerprint_near_dup")
    assert len(rows) == 6
    for r in rows:
        assert r["same_source_clip"] == 1
        assert 0 <= r["diff_bits"] <= 12
        assert r["n_frames_exact"] >= 12


def test_fertility_compare_consistent_with_individual_tokenizers(spark):
    """The bakeoff table must reproduce each tokenizer's own apply
    numbers: per source, BPE fertility == tokenizer_apply_bpe's
    tokens_per_word and unigram fertility == tokenizer_apply_unigram's
    pieces_per_word, and the ratio column is their quotient."""
    cmp_rows = {r["source"]: r for r in _rows(spark, "tokenizer_fertility_compare")}
    bpe = {r["source"]: r for r in _rows(spark, "tokenizer_apply_bpe")}
    uni = {r["source"]: r for r in _rows(spark, "tokenizer_apply_unigram")}
    assert cmp_rows.keys() == bpe.keys() == uni.keys()
    for s, r in cmp_rows.items():
        assert abs(r["bpe_tokens_per_word"] - bpe[s]["tokens_per_word"]) < 1e-6
        assert (
            abs(r["unigram_pieces_per_word"] - uni[s]["pieces_per_word"]) < 1e-6
        )
        assert r["bpe_tokens_per_word"] >= 1.0
        assert r["unigram_pieces_per_word"] >= 1.0


def test_cross_modal_audit_pairs_are_verified_text_dups(spark):
    """Every audited pair must be a true text near-dup (Jaccard >= 0.5
    by the integer rule the verify stage uses) with a cosine in
    [-1, 1], and the agree flag must match the 0.8 rule on the
    rendered cosine."""
    rows = _rows(spark, "cross_modal_consistency_audit")
    assert rows
    for r in rows:
        assert r["jaccard"] >= 0.5 - 1e-9
        c = float(r["cos_sim"])
        assert -1.0 - 1e-9 <= c <= 1.0 + 1e-9
        assert r["embedding_agrees"] == (1 if c > 0.8 else 0)


# ---------------------------------------------------------------------------
# r11 batch 2/3: retrieval, layout, coreset, tokenizer families
# ---------------------------------------------------------------------------


def test_rrf_scores_consistent_with_leg_ranks(spark):
    """Every fused row must cite at least one leg rank, and the
    rendered rrf score must equal the 1/(60+rank) recomputation from
    the reported ranks (rank 0 = absent from that leg's top-50)."""
    rows = _rows(spark, "hybrid_search_rrf")
    assert len(rows) == 20
    prev = None
    for r in rows:
        assert r["lex_rk"] > 0 or r["dense_rk"] > 0
        expect = 0.0
        if r["lex_rk"] > 0:
            expect += 1.0 / (60 + r["lex_rk"])
        if r["dense_rk"] > 0:
            expect += 1.0 / (60 + r["dense_rk"])
        got = float(r["rrf_score"])
        assert abs(got - expect) < 5e-7
        if prev is not None:
            assert got <= prev + 1e-12
        prev = got


def test_mutual_knn_pairs_are_canonical_and_bounded(spark):
    """Pairs come out canonicalized (a < b), in descending-cos order,
    and reciprocity caps the pair count at n*k/2."""
    rows = _rows(spark, "mutual_knn_near_dup")
    assert rows, "fixture embeddings must produce mutual pairs"
    prev = None
    seen = set()
    for r in rows:
        assert r["vec_a"] < r["vec_b"]
        assert (r["vec_a"], r["vec_b"]) not in seen
        seen.add((r["vec_a"], r["vec_b"]))
        if prev is not None:
            assert r["cos_sim"] <= prev + 1e-12
        prev = r["cos_sim"]
    assert len(rows) <= 500 * 5 // 2


def test_zorder_beats_linear_on_2d_rectangle(spark):
    """The point of the advisor: under a 2-D predicate the Z-order
    layout must prune at least as many files as the sort-by-x layout,
    both layouts must agree on the true matching rows, and scanned
    rows can never undercount matches."""
    rows = {r["layout"]: r for r in _rows(spark, "zorder_clustering_audit")}
    lin, zo = rows["linear"], rows["zorder"]
    assert lin["matching_rows"] == zo["matching_rows"]
    assert zo["files_scanned"] <= lin["files_scanned"]
    for r in (lin, zo):
        assert r["n_files"] <= 64
        assert r["rows_scanned"] >= r["matching_rows"]


def test_funnel_counts_strict_subset_of_loose(spark):
    """Every strict funnel (view->clicks->purchase) is also a loose
    funnel, and each funnel consumes at least two events."""
    rows = _rows(spark, "event_sequence_pattern")
    assert len(rows) == 20
    assert rows[0]["strict_funnels"] > 0
    for r in rows:
        assert r["strict_funnels"] <= r["loose_funnels"]
        assert r["n_events"] >= 2 * r["strict_funnels"]


def test_ccnet_buckets_partition_the_corpus(spark):
    """head/middle/tail must partition all 500 docs, and bucket mean
    NLLs must be ordered head < middle < tail within the global cut
    structure (heads are the lowest-perplexity docs by construction)."""
    rows = _rows(spark, "ccnet_perplexity_buckets")
    assert sum(r["n_docs"] for r in rows) == 500
    assert {r["bucket"] for r in rows} == {"head", "middle", "tail"}
    overall = {"head": [], "middle": [], "tail": []}
    for r in rows:
        overall[r["bucket"]].append((float(r["avg_nll"]), r["n_docs"]))
    mean = {
        b: sum(v * n for v, n in xs) / sum(n for _, n in xs)
        for b, xs in overall.items()
    }
    assert mean["head"] < mean["middle"] < mean["tail"]


def test_wordpiece_segmentation_reconstructs_every_word(spark):
    """Stripping '##' and joining the pieces must reproduce the word
    whenever no [UNK] fired; the vocabulary contains every corpus
    character, so unk_count must be zero everywhere."""
    rows = _rows(spark, "tokenizer_apply_wordpiece")
    assert len(rows) == 20
    for r in rows:
        assert r["unk_count"] == 0
        pieces = r["pieces"].split(" ")
        assert r["n_pieces"] == len(pieces)
        rebuilt = pieces[0] + "".join(p.removeprefix("##") for p in pieces[1:])
        assert rebuilt == r["word"]
        assert all(p.startswith("##") for p in pieces[1:])
        assert not pieces[0].startswith("##")


def test_kcenter_distances_monotone_nonincreasing(spark):
    """Greedy farthest-point: the selected min-distance sequence is
    non-increasing after the seed (each new center can only shrink
    later max-min distances)."""
    rows = _rows(spark, "kcenter_coreset_selection")
    assert [r["pick_idx"] for r in rows] == list(range(1, 9))
    assert rows[0]["vec_id"] == 0
    assert float(rows[0]["min_dist_sq"]) == 0.0
    dists = [float(r["min_dist_sq"]) for r in rows[1:]]
    assert all(d > 0 for d in dists)
    assert all(a >= b - 1e-9 for a, b in zip(dists, dists[1:]))
    assert len({r["vec_id"] for r in rows}) == 8


def test_rbo_bounds_and_overlap_monotonicity(spark):
    """RBO is a [0,1] agreement; depth-5 overlap can neither exceed 5
    nor the depth-10 overlap."""
    (row,) = _rows(spark, "rank_biased_overlap")
    assert row["depth"] == 10
    assert 0 <= row["overlap_at_5"] <= 5
    assert row["overlap_at_5"] <= row["overlap_at_10"] <= 10
    assert 0.0 <= float(row["rbo_p09"]) <= 1.0


def test_postfilter_results_are_prefix_of_prefilter_truth(spark):
    """Post-filtering can only ever return a PREFIX of the true
    filtered ranking (the label-1 vectors that survived the global
    overfetch cut, in the same order) — and on this fixture it comes
    back short, which is the recall loss the operator measures."""
    rows = _rows(spark, "filtered_ann_pre_vs_post")
    pre = [r for r in rows if r["method"] == "prefilter"]
    post = [r for r in rows if r["method"] == "postfilter"]
    assert len(pre) == 10
    assert len(post) <= len(pre)
    for p, q in zip(post, pre):
        assert p["rk"] == q["rk"]
        assert p["vec_id"] == q["vec_id"]
        assert p["cos_sim"] == q["cos_sim"]


def test_mean_shift_drift_bounds(spark):
    """MMD² under the linear kernel is a sum of squares (≥ 0) and the
    top dimension's squared shift can never exceed it."""
    (row,) = _rows(spark, "embedding_mean_shift_drift")
    mmd = float(row["mmd_sq"])
    top = float(row["top_shift"])
    assert mmd >= 0.0
    assert top * top <= mmd + 1e-9
    assert 1 <= row["top_dim"] <= 64
    assert row["n_a"] > 0 and row["n_b"] > 0


def test_ngram_coverage_decays_with_order(spark):
    """Higher-order coverage can only drop: every covered 2-gram
    implies both unigrams are covered, so the curve is monotone
    non-increasing in n; counts are containment-consistent."""
    rows = _rows(spark, "ngram_coverage_curve")
    assert [r["n"] for r in rows] == [1, 2, 4]
    prev = None
    for r in rows:
        assert 0 <= r["covered_grams"] <= r["heldout_grams"]
        cov = r["coverage"]
        assert 0.0 <= cov <= 1.0
        if prev is not None:
            assert cov <= prev + 1e-9
        prev = cov


def test_multiprobe_dominates_exact_bucket(spark):
    """Probing Hamming-1 neighbours is a strict superset of the exact
    bucket: both recall hits and candidate volume must dominate, and
    hits can never exceed the true-pair count."""
    (row,) = _rows(spark, "lsh_multiprobe_gain")
    assert row["probe_recall_hits"] >= row["exact_recall_hits"]
    assert row["probe_candidates"] >= row["exact_candidates"]
    assert row["exact_recall_hits"] <= row["true_pairs"]
    assert row["probe_recall_hits"] <= row["true_pairs"]
    assert row["probe_candidates"] <= 200 * 199 // 2


def test_simhash_pairs_within_hamming_ball_and_banded(spark):
    """Every returned pair is canonical (a < b), within the Hamming-3
    verify ball, sorted by distance, and — pigeonhole over 4 nibble
    bands — must share at least one whole band nibble."""
    rows = _rows(spark, "simhash_hamming_near_dup")
    assert rows, "fixture corpus must contain simhash near-dups"
    fp = {
        r["doc_id"]: r["simhash16"]
        for r in _rows(spark, "simhash_fingerprint")
    }
    prev = -1
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0 <= r["hamming"] <= 3
        assert r["hamming"] >= prev
        prev = r["hamming"]
        x = fp[r["doc_a"]] ^ fp[r["doc_b"]]
        assert bin(x).count("1") == r["hamming"]
        assert any((x >> (4 * b)) & 15 == 0 for b in range(4))


def test_ndcg_bounds_and_ideal_dominates(spark):
    """IDCG is the supremum ordering of the same gains, so
    0 <= DCG <= IDCG and nDCG lands in [0, 1]."""
    (row,) = _rows(spark, "ndcg_lexical_vs_dense")
    dcg, idcg, ndcg = (float(row[c]) for c in ("dcg", "idcg", "ndcg"))
    assert idcg > 0
    assert 0.0 <= dcg <= idcg + 1e-9
    assert 0.0 <= ndcg <= 1.0 + 1e-9


def test_packing_strategies_strictly_ordered(spark):
    """Bin counts must satisfy concat-lower-bound <= shelf <= naive,
    padding likewise (reversed), and utilization must reconcile with
    bins and padding exactly."""
    rows = {r["strategy"]: r for r in _rows(spark, "packing_strategy_advisor")}
    a, b, c = (
        rows["a_naive_one_per_bin"],
        rows["b_length_bucket_shelf"],
        rows["c_concat_lower_bound"],
    )
    assert c["bins"] <= b["bins"] <= a["bins"]
    assert c["padded_tokens"] <= b["padded_tokens"] <= a["padded_tokens"]
    for r in (a, b, c):
        assert 0 <= r["padded_tokens"] < r["bins"] * 256
        assert abs(
            r["utilization"] - (1.0 - r["padded_tokens"] / (r["bins"] * 256))
        ) < 1e-6


def test_event_trigrams_support_bounded_by_occurrences(spark):
    """User support can never exceed total occurrences; patterns are
    3 chars from the event-initial alphabet and ranked by count."""
    rows = _rows(spark, "event_trigram_patterns")
    assert len(rows) == 15
    prev = None
    for r in rows:
        assert len(r["pattern"]) == 3
        assert set(r["pattern"]) <= set("vcpse")
        assert 0 < r["n_users"] <= r["n_occurrences"]
        if prev is not None:
            assert r["n_occurrences"] <= prev
        prev = r["n_occurrences"]


def test_power_iteration_eigen_bounds(spark):
    """The dominant eigenvalue of a covariance matrix is positive,
    bounded by the trace (so anisotropy in (0, 1]); the loading is a
    unit-vector component; and lambda must dominate every diagonal
    entry of the block (Rayleigh quotient optimality over e_i)."""
    import heapdumpstardiver_spark as hds
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    (row,) = _rows(spark, "embedding_power_iteration_pca")
    lam = float(row["eigenvalue"])
    aniso = float(row["anisotropy"])
    loading = float(row["top_loading"])
    assert lam > 0
    assert 0.0 < aniso <= 1.0 + 1e-9
    assert abs(loading) <= 1.0 + 1e-6
    assert 1 <= row["top_dim"] <= 8
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    diag = [
        float(
            e.agg(
                F.covar_samp(
                    F.element_at("embedding", i).cast("double"),
                    F.element_at("embedding", i).cast("double"),
                )
            ).collect()[0][0]
        )
        for i in range(1, 9)
    ]
    assert lam >= max(diag) - 1e-6


def test_feature_matrix_has_no_temporal_leakage(spark):
    """The leakage guard itself: recompute the label window's purchase
    users and assert (a) every labeled user's label is reproducible
    from post-cutoff data alone and (b) recency is non-negative, i.e.
    no feature saw a post-cutoff event."""
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR
    from heapdumpstardiver_spark.catalog import load_table

    rows = _rows(spark, "leakage_free_feature_matrix")
    assert rows
    ev = load_table(spark, SF_DIR, "events")
    cutoff = F.lit("2024-01-22 00:00:00").cast("timestamp")
    end = F.lit("2024-01-29 00:00:00").cast("timestamp")
    labeled = {
        r["user_id"]
        for r in ev.filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= cutoff)
            & (F.col("ts") < end)
        )
        .select("user_id")
        .distinct()
        .collect()
    }
    for r in rows:
        assert r["recency_s"] >= 0
        assert r["n_purchases_hist"] <= r["n_events_hist"]
        assert r["label"] == (1 if r["user_id"] in labeled else 0)


def test_exclusion_rules_match_direct_recomputation(spark):
    """Recompute rule 1 (join AND scan AND NOT error) directly from
    token sets and assert the operator's count and first_doc agree —
    plus structural sanity on every rule."""
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    rows = {r["rule_id"]: r for r in _rows(spark, "percolate_with_exclusions")}
    assert set(rows) <= {1, 2, 3, 4}
    assert all(0 < r["n_matching_docs"] <= 500 for r in rows.values())

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = F.array_distinct(F.filter(F.split("text", " "), lambda x: x != ""))
    sat = d.select("doc_id", toks.alias("t")).filter(
        F.array_contains("t", "join")
        & F.array_contains("t", "scan")
        & ~F.array_contains("t", "error")
    )
    want_n = sat.count()
    want_first = sat.agg(F.min("doc_id")).collect()[0][0]
    assert rows[1]["n_matching_docs"] == want_n
    assert rows[1]["first_doc"] == want_first

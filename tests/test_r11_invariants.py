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

"""Validation for the compressibility quality signal (oracle-gated
audit since r12): the deflate ratio must order repetitive < natural <
noise, and the registered per-source rollup must run end-to-end on
the fixture warehouse with its audit bounds holding."""

from __future__ import annotations

import random
import zlib

from heapdumpstardiver_spark.queries.pipeline import (
    compressibility_quality_score,
)


def test_deflate_ratio_orders_repetition_natural_noise():
    rep = "spam ham " * 200
    nat = (
        "the quick brown fox jumps over the lazy dog while a heap "
        "analyzer walks object graphs and counts retained bytes "
    ) * 18
    rnd = random.Random(1)
    noise = "".join(chr(rnd.randrange(33, 127)) for _ in range(1600))

    def ratio(t: str) -> float:
        b = t.encode("utf-8")
        return len(zlib.compress(b, 6)) / len(b)

    assert ratio(rep) < ratio(nat) < ratio(noise)


def test_compressibility_rollup_end_to_end(spark):
    out = compressibility_quality_score(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows, "per-source rollup must be non-empty"
    for r in rows:
        assert r["n_docs"] > 0
        assert r["total_bytes"] > 0
        assert r["ratios_in_range"], r
        assert r["mean_compresses"], r
    # deterministic: a second run yields byte-identical results
    again = compressibility_quality_score(spark, "/root/testdata/sf0.001")
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_compressibility_self_concatenation_monotone():
    """Second self-validation invariant for the audit query: a
    text concatenated with itself must compress strictly better
    (lower deflate ratio) than the original — the redundancy signal
    the quality score is built on. Holds for natural-ish, repetitive,
    and noise-like inputs alike."""
    import random
    import zlib

    rng = random.Random(8)
    nat = " ".join(
        rng.choice(["table", "scan", "join", "value", "row", "query"])
        for _ in range(200)
    )
    noise = "".join(chr(rng.randrange(33, 127)) for _ in range(1000))
    rep = "spark " * 200

    def ratio(t: str) -> float:
        b = t.encode("utf-8")
        return len(zlib.compress(b, 6)) / len(b)

    for t in (nat, noise, rep):
        assert ratio(t + t) < ratio(t)

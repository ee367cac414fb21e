"""Structured Streaming tests: each streaming operator is drained with
availableNow into a memory sink and compared against its batch twin on
the same data — exact parity, not smoke checks."""

from __future__ import annotations

import shutil

import pytest
from pyspark.errors.exceptions.captured import StreamingQueryException
from pyspark.sql import functions as F

from heapdumpstardiver_spark import streaming as S
from heapdumpstardiver_spark.catalog import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Stage the events table as a one-file streaming input dir with
    µs timestamps (the nanos conversion happens at staging time, as a
    real pipeline's bronze layer would)."""
    d = tmp_path_factory.mktemp("events_stream")
    load_table(spark, SF_DIR, "events").write.mode("overwrite").parquet(str(d / "in"))
    return str(d / "in")


def _drain(spark, stream_df, name, tmp_path, mode="complete"):
    q = S.windowed.run_available_now(stream_df, name, str(tmp_path / f"ckpt_{name}"), mode)
    q.awaitTermination(120)
    return spark.table(name)


def test_tumbling_counts_match_batch(spark, events_dir, tmp_path):
    stream = S.tumbling_counts(S.stream_events(spark, events_dir))
    got = _drain(spark, stream, "t_tumbling", tmp_path).collect()
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
        .collect()
    )
    got_map = {(r["window_start"], r["event_type"]): r["n_events"] for r in got}
    want_map = {(r["window_start"], r["event_type"]): r["n_events"] for r in batch}
    assert got_map == want_map and len(got_map) > 100


def test_sliding_counts_match_batch_query(spark, events_dir, tmp_path):
    stream = S.sliding_counts(S.stream_events(spark, events_dir))
    got = _drain(spark, stream, "t_sliding", tmp_path).collect()
    import heapdumpstardiver_spark as hds

    batch = hds.QUERIES["window_sliding_15m"](spark, SF_DIR).collect()
    g = {r["window_start"]: r["n_events"] for r in got}
    w = {r["window_start"]: r["n_events"] for r in batch}
    assert g == w and len(g) > 100
    # overlap invariant: every event is in exactly 4 hopping windows
    n_events = spark.read.parquet(events_dir).count()
    assert sum(g.values()) == 4 * n_events


def test_sessionized_counts_match_lag_sessionizer(spark, events_dir, tmp_path):
    stream = S.sessionized_counts(S.stream_events(spark, events_dir))
    got = _drain(spark, stream, "t_sessions", tmp_path)
    per_user = got.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events")
    )
    # batch twin: the lag-based sessionizer from the query library
    import heapdumpstardiver_spark as hds

    batch = hds.QUERIES["sessionize_lag"](spark, SF_DIR)
    g = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in per_user.collect()}
    w = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in batch.collect()}
    assert g == w


def test_streaming_dedup(spark, events_dir, tmp_path):
    raw = S.stream_events(spark, events_dir)
    # duplicate the whole stream → dedup must halve it
    doubled = raw.unionByName(raw)
    deduped = S.streaming_dedup(doubled)
    got = _drain(spark, deduped, "t_dedup", tmp_path, mode="append")
    n_src = spark.read.parquet(events_dir).count()
    assert got.count() == n_src


def test_running_counts_stateful(spark, events_dir, tmp_path):
    stream = S.running_counts_stateful(S.stream_events(spark, events_dir))
    got = _drain(spark, stream, "t_state", tmp_path, mode="update")
    # final state per user must equal the batch aggregate
    final = {r["user_id"]: r["n_events"] for r in got.collect()}
    batch = {
        r["user_id"]: r["n"]
        for r in spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert final == batch


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


# Environment blockage probed conclusively (r5): google.protobuf is
# absent, the sandbox has no network (pip download protobuf fails with
# NewConnectionError/Name-or-service-not-known against the index), and
# a hand-vendored shim is infeasible — the generated
# StateMessage_pb2 module needs the full descriptor-pool runtime, not
# a stub surface. xfail(run=True) keeps the probe live: the moment an
# env ships protobuf, the test RUNS and must pass (strict on the
# inverse — if protobuf is present the xfail marker is absent).
# `raises` is pinned to the exact observed failure
# (StreamingQueryException: "TransformWithStateInPySpark driver worker
# exited unexpectedly" — the TWS driver worker dies on the protobuf
# import) so an unrelated assertion/data regression in the
# protobuf-absent path still surfaces as a real failure.
@pytest.mark.xfail(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs google.protobuf: absent here and "
    "unobtainable (no network — pip index unreachable; vendoring needs the "
    "full descriptor-pool runtime). Plan construction is covered by "
    "test_tws_plan_builds.",
    raises=StreamingQueryException,
    run=True,
    strict=False,
)
def test_running_counts_transform_with_state(spark, events_dir, tmp_path):
    """transformWithStateInPandas twin of the applyInPandasWithState
    operator: final per-user state must equal the batch aggregate, and
    match the older API's results exactly."""
    stream = S.running_counts_tws(S.stream_events(spark, events_dir))
    got = _drain(spark, stream, "t_tws", tmp_path, mode="update")
    final = {r["user_id"]: (r["n_events"], r["total_value"]) for r in got.collect()}
    batch = {
        r["user_id"]: (r["n"], r["total"])
        for r in spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert len(final) == len(batch) > 10
    for uid, (n, total) in batch.items():
        assert final[uid][0] == n
        # pandas pairwise-sums, Spark sums sequentially — ulp-level drift
        assert final[uid][1] == pytest.approx(total, rel=1e-12)


def test_tws_plan_builds(spark, events_dir):
    """The transformWithStateInPandas operator must analyze cleanly
    (schema + streaming plan) even where the protobuf runtime needed to
    execute it is unavailable."""
    df = S.running_counts_tws(S.stream_events(spark, events_dir))
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == ["user_id", "n_events", "total_value"]


def test_watermark_drops_late_data_across_batches(spark, tmp_path):
    """Two availableNow drains over one checkpoint: batch 1 advances
    the watermark past hour 7's window; a hour-7 event arriving in
    batch 2 is late beyond the watermark and must NOT be counted when
    the window finalizes (append mode emits only finalized windows)."""
    import datetime as dt

    from pyspark.sql import Row

    in_dir = tmp_path / "in"
    ck = str(tmp_path / "ck")

    def ev(event_id, hh, mm, etype="click"):
        return Row(
            event_id=event_id,
            ts=dt.datetime(2024, 1, 1, hh, mm, 0),
            user_id=1,
            event_type=etype,
            value=1.0,
            props="{}",
        )

    batch1 = [ev(1, 7, 30), ev(2, 7, 40), ev(3, 10, 30)]
    spark.createDataFrame(batch1, schema=S.windowed.EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    stream = S.tumbling_counts(
        S.stream_events(spark, str(in_dir)), window="1 hour", watermark="2 hours"
    )
    out_dir = str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # watermark after batch 1: 10:30 - 2h = 08:30 > hour-7 window end

    late = [ev(4, 7, 15), ev(5, 11, 0)]  # event 4 is beyond the watermark
    spark.createDataFrame(late, schema=S.windowed.EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    stream2 = S.tumbling_counts(
        S.stream_events(spark, str(in_dir)), window="1 hour", watermark="2 hours"
    )
    q2 = (
        stream2.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    emitted = {
        r["window_start"].hour: r["n_events"]
        for r in spark.read.parquet(out_dir).collect()
    }
    # hour-7 window finalized WITHOUT the late event (2, not 3)
    assert emitted.get(7) == 2, emitted


def test_click_view_attribution_matches_batch_join(spark, events_dir, tmp_path):
    """Stream-stream attribution join drains to exactly the batch
    join's pairs: clicks × same-user views within the preceding hour."""
    ev = S.stream_events(spark, events_dir)
    stream = S.click_view_attribution(
        ev.filter(F.col("event_type") == "click"),
        S.stream_events(spark, events_dir).filter(F.col("event_type") == "view"),
    )
    got = _drain(spark, stream, "t_attrib", tmp_path, mode="append")
    b = spark.read.parquet(events_dir)
    c = b.filter("event_type = 'click'").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    v = b.filter("event_type = 'view'").select(
        F.col("user_id").alias("vu"), F.col("event_id").alias("view_id"), F.col("ts").alias("vts")
    )
    want = c.join(
        v,
        (F.col("u") == F.col("vu"))
        & (F.col("vts") <= F.col("cts"))
        & (F.col("vts") >= F.col("cts") - F.expr("INTERVAL 1 HOUR")),
    )
    g = {(r["click_id"], r["view_id"]) for r in got.collect()}
    w = {(r["click_id"], r["view_id"]) for r in want.collect()}
    assert g == w and len(g) > 10


def test_stream_static_enrich_matches_batch(spark, events_dir, tmp_path):
    """Stream-static broadcast enrichment drains to the batch left
    join: every event row keeps its customer name when one exists."""
    dim = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_name")
    stream = S.stream_static_enrich(
        S.stream_events(spark, events_dir), dim, "user_id", "c_custkey"
    ).select("event_id", "user_id", "c_name")
    got = _drain(spark, stream, "t_enrich", tmp_path, mode="append")
    want = (
        spark.read.parquet(events_dir)
        .join(dim, F.col("user_id") == F.col("c_custkey"), "left")
        .select("event_id", "user_id", "c_name")
    )
    g = {(r["event_id"], r["c_name"]) for r in got.collect()}
    w = {(r["event_id"], r["c_name"]) for r in want.collect()}
    assert g == w and len(g) > 1000


def test_click_view_attribution_left_outer(spark, events_dir, tmp_path):
    """Left-outer stream-stream join: matched pairs equal the batch
    inner join exactly, AND unattributed clicks emit with null views
    — all of them for clicks whose match window the final view-side
    watermark has passed, and never a click the batch join matched."""
    ev = S.stream_events(spark, events_dir)
    stream = S.click_view_attribution(
        ev.filter(F.col("event_type") == "click"),
        S.stream_events(spark, events_dir).filter(F.col("event_type") == "view"),
        how="left_outer",
    )
    got = _drain(spark, stream, "t_attrib_outer", tmp_path, mode="append")
    b = spark.read.parquet(events_dir)
    c = b.filter("event_type = 'click'").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    v = b.filter("event_type = 'view'").select(
        F.col("user_id").alias("vu"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("vts"),
    )
    inner = c.join(
        v,
        (F.col("u") == F.col("vu"))
        & (F.col("vts") <= F.col("cts"))
        & (F.col("vts") >= F.col("cts") - F.expr("INTERVAL 1 HOUR")),
    )
    want_pairs = {(r["click_id"], r["view_id"]) for r in inner.collect()}
    got_rows = got.collect()
    got_pairs = {
        (r["click_id"], r["view_id"]) for r in got_rows if r["view_id"] is not None
    }
    assert got_pairs == want_pairs and len(got_pairs) > 10

    matched_clicks = {p[0] for p in want_pairs}
    null_clicks = {r["click_id"] for r in got_rows if r["view_id"] is None}
    # never a matched click, and some unattributed clicks must emit
    assert not (null_clicks & matched_clicks)
    assert null_clicks
    # completeness: every unmatched click safely below the final
    # global watermark must have emitted its null row. The eviction
    # boundary is (min-side max ts - 2h watermark) minus the 1h join
    # interval Spark folds into the outer-state watermark.
    import datetime

    wm = min(
        b.filter("event_type = 'view'").agg(F.max("ts")).collect()[0][0],
        b.filter("event_type = 'click'").agg(F.max("ts")).collect()[0][0],
    ) - datetime.timedelta(hours=2)
    horizon_closed = wm - datetime.timedelta(hours=1)
    all_clicks = {r["click_id"]: r["cts"] for r in c.collect()}
    expected_null = {
        cid
        for cid, cts in all_clicks.items()
        if cid not in matched_clicks and cts < horizon_closed
    }
    assert expected_null <= null_clicks, (
        f"{len(expected_null - null_clicks)} overdue null emissions missing"
    )


def test_foreach_batch_idempotent_sink(spark, events_dir, tmp_path):
    """The foreachBatch sink must (a) deliver exactly the batch input
    to the output table, and (b) be idempotent under batch replay —
    re-running the same epoch overwrites its batch partition rather
    than appending, so a crash between sink write and checkpoint
    commit cannot double rows."""
    import glob as _glob
    import os

    from heapdumpstardiver_spark.streaming.windowed import (
        stream_events,
        write_foreach_batch_idempotent,
    )

    out = str(tmp_path / "fb_out")
    ck = str(tmp_path / "fb_ck")
    src = stream_events(spark, events_dir).filter("event_type = 'click'")
    q = write_foreach_batch_idempotent(src, out, ck)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    want = (
        spark.read.parquet(events_dir)
        .filter("event_type = 'click'")
        .count()
    )
    assert got.count() == want
    assert "batch_id" in got.columns  # partition column surfaces

    # Replay epoch 0 by hand (at-least-once redelivery): same data,
    # same batch id → the partition is overwritten, counts unchanged.
    batch0 = spark.read.parquet(events_dir).filter("event_type = 'click'")
    batch0.write.mode("overwrite").parquet(os.path.join(out, "batch_id=0"))
    assert spark.read.parquet(out).count() == want

    # Restart from the same checkpoint with no new data: nothing
    # reprocesses, output unchanged.
    q2 = write_foreach_batch_idempotent(
        stream_events(spark, events_dir).filter("event_type = 'click'"),
        out,
        ck,
        query_name="fb_sink_restart",
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == want
    # exactly one batch directory — the replay never forked a new one
    assert len(_glob.glob(os.path.join(out, "batch_id=*"))) == 1


def test_foreach_batch_multi_epoch(spark, events_dir, tmp_path):
    """maxFilesPerTrigger=1 forces one micro-batch per source file —
    the sink must land each epoch in its own batch partition and the
    union must equal the batch-query total (incremental processing
    across epochs, not one availableNow mega-batch)."""
    import glob as _glob
    import os

    from heapdumpstardiver_spark.streaming.windowed import (
        EVENT_SCHEMA,
        write_foreach_batch_idempotent,
    )

    n_files = len(_glob.glob(os.path.join(events_dir, "*.parquet")))
    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    out = str(tmp_path / "fb_multi_out")
    q = write_foreach_batch_idempotent(
        src, out, str(tmp_path / "fb_multi_ck"), query_name="fb_multi"
    )
    q.awaitTermination(180)

    dirs = _glob.glob(os.path.join(out, "batch_id=*"))
    assert len(dirs) == n_files, dirs
    assert spark.read.parquet(out).count() == spark.read.parquet(events_dir).count()


def test_streaming_scd2_apply_matches_sequential_batch(spark, tmp_path):
    """Drive the SCD2 maintenance sink over three controlled epochs
    (one availableNow drain per staged file, same checkpoint) and
    check the committed state EXACTLY equals applying the same three
    batches sequentially with the batch merge — plus the SCD2
    structural invariants and idempotent replay of the last epoch."""
    import os

    from heapdumpstardiver_spark.queries.cdc import apply_scd2
    from heapdumpstardiver_spark.streaming.cdc_apply import (
        STATE_SCHEMA,
        apply_batch,
        batch_changes,
        read_state,
        streaming_scd2_apply,
    )
    from heapdumpstardiver_spark.streaming.windowed import EVENT_SCHEMA

    ev = load_table(spark, SF_DIR, "events")
    src_dir = str(tmp_path / "scd2_src")
    state_dir = str(tmp_path / "scd2_state")
    ck = str(tmp_path / "scd2_ck")
    chunks = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]

    os.makedirs(src_dir, exist_ok=True)
    expected = spark.createDataFrame([], STATE_SCHEMA)
    for i, chunk in enumerate(chunks):
        # stage as FLAT files (the file stream lists src_dir itself)
        stage = str(tmp_path / f"stage_{i}")
        chunk.coalesce(1).write.parquet(stage)
        import glob as _glob
        import shutil as _shutil

        for j, part in enumerate(sorted(_glob.glob(os.path.join(stage, "part-*.parquet")))):
            _shutil.move(part, os.path.join(src_dir, f"chunk_{i}_{j}.parquet"))
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src_dir)
        q = streaming_scd2_apply(stream, state_dir, ck, query_name=f"scd2_e{i}")
        q.awaitTermination(120)
        # batch twin over the same epoch, collected to pin the state
        expected_rows = apply_scd2(expected, batch_changes(chunk)).collect()
        expected = spark.createDataFrame(expected_rows, STATE_SCHEMA)

    got = read_state(spark, state_dir)
    key = lambda r: (r["key"], r["valid_from_us"], r["is_current"])
    got_rows = sorted(got.collect(), key=key)
    want_rows = sorted(expected.collect(), key=key)
    assert got_rows == want_rows and len(got_rows) > 0

    # SCD2 invariants: exactly one current row per key; each closed
    # row's valid_to chains to a successor's valid_from.
    per_key = {}
    for r in got_rows:
        per_key.setdefault(r["key"], []).append(r)
    for rows in per_key.values():
        assert sum(1 for r in rows if r["is_current"]) == 1
        starts = {r["valid_from_us"] for r in rows}
        for r in rows:
            if not r["is_current"]:
                assert r["valid_to_us"] in starts, rows

    # Idempotent replay: re-deliver the last epoch with its batch_id —
    # the version overwrite + pointer swap must leave state unchanged.
    with open(os.path.join(state_dir, "_CURRENT")) as f:
        last_version = f.read().strip()
    last_id = int(last_version[1:])
    # parent pointer must be restored for a faithful replay: the
    # pointer still named the parent when the original delivery ran
    parent = f"v{last_id - 1}" if last_id > 0 else None
    assert parent is not None and os.path.isdir(os.path.join(state_dir, parent))
    with open(os.path.join(state_dir, "_CURRENT"), "w") as f:
        f.write(parent)
    apply_batch(chunks[-1], last_id, state_dir)
    replay_rows = sorted(read_state(spark, state_dir).collect(), key=key)
    assert replay_rows == got_rows


def test_streaming_psi_drift_matches_batch(spark, events_dir, tmp_path):
    """Stream-side binned window counts + PSI arithmetic must equal
    the same pipeline computed purely in batch over the same data:
    the streaming piece is only the incremental count, so parity is
    exact, not approximate."""
    from heapdumpstardiver_spark.streaming.drift import (
        binned_window_counts,
        psi_from_counts,
        reference_cuts,
    )

    batch = spark.read.parquet(events_dir)
    ref_period = batch.filter(F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
    cuts = reference_cuts(ref_period)
    assert len(cuts) == 9 and cuts == sorted(cuts)

    # reference bin counts (batch, k-bounded)
    from functools import reduce

    bin_col = reduce(
        lambda acc, c: acc + F.when(F.col("value") > F.lit(c), 1).otherwise(0),
        cuts,
        F.lit(1),
    )
    ref_counts = (
        ref_period.select(bin_col.cast("long").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    stream = S.stream_events(spark, events_dir)
    got_counts = _drain(
        spark,
        binned_window_counts(stream, cuts),
        "t_drift_counts",
        tmp_path,
        mode="complete",
    )
    got = psi_from_counts(got_counts, ref_counts).collect()

    want_counts = (
        batch.select(F.col("ts"), bin_col.cast("long").alias("bin"))
        .groupBy(F.window("ts", "1 day").alias("w"), "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "bin", "n")
    )
    want = psi_from_counts(want_counts, ref_counts).collect()

    g = {r["window_start"]: r["psi"] for r in got}
    w = {r["window_start"]: r["psi"] for r in want}
    assert g.keys() == w.keys() and len(g) >= 25
    for k in g:
        assert abs(g[k] - w[k]) < 1e-12, (k, g[k], w[k])
    # reference-period windows should sit near zero PSI; at least one
    # window must carry a meaningful (finite) statistic
    assert all(abs(v) < 10 for v in g.values())


def test_streaming_lsh_dedup_matches_batch(spark, tmp_path):
    """The streaming near-dup path (micro-batches probing the
    persisted corpus band index via foreachBatch) must produce
    EXACTLY the per-doc verdicts of one batch pass over the same
    docs — and the batch=<id> partition layout must cover every
    streamed doc exactly once."""
    from heapdumpstardiver_spark.streaming import lsh_dedup as L

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 400)
    batch = docs.filter(F.col("doc_id") >= 400)

    index_dir = str(tmp_path / "index")
    L.build_corpus_index(spark, corpus, index_dir)

    # stage the new docs as TWO files -> two micro-batches
    in_dir = tmp_path / "incoming"
    batch.filter(F.col("doc_id") < 450).coalesce(1).write.parquet(
        str(in_dir / "f1")
    )
    batch.filter(F.col("doc_id") >= 450).coalesce(1).write.parquet(
        str(in_dir / "f2")
    )
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    out_dir = str(tmp_path / "verdicts")
    q = L.streaming_lsh_dedup(
        spark, stream, index_dir, out_dir, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    got = {
        r["doc_id"]: (r["n_candidates"], r["is_dup"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        r["doc_id"]: (r["n_candidates"], r["is_dup"])
        for r in L.flag_batch(spark, batch, index_dir).collect()
    }
    assert got == want
    assert len(got) == batch.count()
    assert any(v[1] for v in got.values())  # the fixture has near-dups


def test_lsh_index_appends_plus_compact_equal_oneshot_build(spark, tmp_path):
    """N appends + compaction must be ROW-IDENTICAL to a one-shot
    build on the union — for an arbitrary (non-monotone) id order,
    because the batch-local band cap is lossless w.r.t. the global
    smallest-doc_id rule. Before compaction the bands table must be a
    superset of the canonical one (probe-side no-false-negatives)."""
    import os

    from heapdumpstardiver_spark.streaming import lsh_dedup as L

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    # three batches deliberately interleaved by id (non-monotone)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter(F.col("doc_id") % 3 == 0)
    b3 = docs.filter(F.col("doc_id") % 3 == 2)

    inc_dir = str(tmp_path / "inc")
    L.build_corpus_index(spark, b1, inc_dir)
    L.append_to_corpus_index(spark, b2, inc_dir)
    L.append_to_corpus_index(spark, b3, inc_dir)

    one_dir = str(tmp_path / "oneshot")
    L.build_corpus_index(spark, docs, one_dir)

    def rows(d, name):
        return sorted(
            tuple(r) for r in spark.read.parquet(os.path.join(d, name)).collect()
        )

    # pre-compaction: per-segment-capped superset of the canonical bands
    assert set(rows(one_dir, "bands")) <= set(rows(inc_dir, "bands"))

    L.compact_corpus_index(spark, inc_dir)
    for name in ("bands", "shingles", "sizes"):
        assert rows(inc_dir, name) == rows(one_dir, name), name


def test_lsh_dedup_and_append_crawl_loop(spark, tmp_path):
    """The day-N loop: a batch's unique docs must be appended so the
    NEXT day's re-crawl of the same content is flagged; already-known
    duplicates must be flagged and NOT appended."""
    import os

    from heapdumpstardiver_spark.streaming import lsh_dedup as L

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    day1 = docs.filter(F.col("doc_id") < 300)
    index_dir = str(tmp_path / "index")
    L.build_corpus_index(spark, day1, index_dir)

    # day 2: novel docs + exact re-crawls of day-1 content under new ids
    novel = docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 350))
    recrawl = day1.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    day2 = novel.unionByName(recrawl)
    verdicts = {
        r["doc_id"]: r["is_dup"]
        for r in L.dedup_and_append_batch(spark, day2, index_dir).collect()
    }
    assert len(verdicts) == day2.count()
    # every re-crawled copy is caught against the day-1 index
    assert all(verdicts[100000 + i] for i in range(20) if 100000 + i in verdicts)
    dup_ids = {d for d, v in verdicts.items() if v}
    kept_ids = set(verdicts) - dup_ids

    # appended = exactly the unique survivors
    sizes = spark.read.parquet(os.path.join(index_dir, "sizes"))
    indexed = {r["doc_id"] for r in sizes.collect()}
    assert kept_ids <= indexed
    assert not (dup_ids & indexed)

    # day 3: re-crawl a day-2 NOVEL doc -> flagged against the appended index
    kept_novel = sorted(i for i in kept_ids if i < 100000)[:5]
    day3 = docs.filter(F.col("doc_id").isin(kept_novel)).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    v3 = {
        r["doc_id"]: r["is_dup"]
        for r in L.flag_batch(spark, day3, index_dir).collect()
    }
    assert v3 and all(v3.values())


def _phash_media_rows(pairs):
    """Media rows for (base, variant) pairs via the image_phash_near_dup
    fixture generator; media_id = base * 100 + variant (distinct from
    the query's own ids, irrelevant here)."""
    from heapdumpstardiver_spark import multimodal as M
    from heapdumpstardiver_spark.queries.media import _phash_pixel

    rows = []
    for b, j in pairs:
        luma = [_phash_pixel(b, j, x, y) for y in range(32) for x in range(32)]
        rgb = bytes(v for v in luma for _ in range(3))
        rows.append(
            (b * 100 + j, "image", M.encode_png(32, 32, rgb),
             ("png", 32, 32, None, None))
        )
    return rows


def test_streaming_phash_dedup_matches_batch_and_flags_variants(spark, tmp_path):
    """The streaming image near-dup path must reproduce the one-shot
    batch verdicts exactly, flag every perturbed variant of an indexed
    image as dup, and keep novel images."""
    from heapdumpstardiver_spark import multimodal as M
    from heapdumpstardiver_spark.streaming import phash_dedup as P

    corpus = spark.createDataFrame(
        _phash_media_rows([(b, 0) for b in range(8)]), M.MEDIA_SCHEMA
    )
    index_dir = str(tmp_path / "index")
    P.build_phash_index(spark, corpus, index_dir)

    # batch: variants of indexed bases (dups) + novel bases (kept)
    batch_rows = _phash_media_rows(
        [(b, j) for b in range(8) for j in (1, 2)]
        + [(b, 0) for b in range(8, 12)]
    )
    batch = spark.createDataFrame(batch_rows, M.MEDIA_SCHEMA)

    in_dir = tmp_path / "incoming"
    half = {r[0] for r in batch_rows[: len(batch_rows) // 2]}
    batch.filter(F.col("media_id").isin(list(half))).coalesce(1).write.parquet(
        str(in_dir / "f1")
    )
    batch.filter(~F.col("media_id").isin(list(half))).coalesce(1).write.parquet(
        str(in_dir / "f2")
    )
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    out_dir = str(tmp_path / "verdicts")
    q = P.streaming_phash_dedup(
        spark, stream, index_dir, out_dir, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    got = {
        r["media_id"]: (r["n_candidates"], r["is_dup"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        r["media_id"]: (r["n_candidates"], r["is_dup"])
        for r in P.flag_batch_images(spark, batch, index_dir).collect()
    }
    assert got == want
    assert len(got) == len(batch_rows)
    for b in range(8):
        assert got[b * 100 + 1][1] and got[b * 100 + 2][1]
    for b in range(8, 12):
        assert not got[b * 100][1]


def test_phash_index_appends_plus_compact_equal_oneshot(spark, tmp_path):
    """N image-batch appends + compaction ≡ one-shot index build on
    the union — the lsh_dedup lossless-cap lemma applied to pHash
    bands — and the append loop catches a re-crawl of a previously
    appended novel image."""
    import os

    from heapdumpstardiver_spark import multimodal as M
    from heapdumpstardiver_spark.streaming import phash_dedup as P

    b1 = spark.createDataFrame(
        _phash_media_rows([(b, 0) for b in range(4)]), M.MEDIA_SCHEMA
    )
    b2 = spark.createDataFrame(
        _phash_media_rows([(b, 0) for b in range(4, 8)]), M.MEDIA_SCHEMA
    )
    inc = str(tmp_path / "inc")
    P.build_phash_index(spark, b1, inc)
    P.append_to_phash_index(spark, b2, inc)
    P.compact_phash_index(spark, inc)

    one = str(tmp_path / "one")
    P.build_phash_index(
        spark,
        spark.createDataFrame(
            _phash_media_rows([(b, 0) for b in range(8)]), M.MEDIA_SCHEMA
        ),
        one,
    )
    for name in ("bands", "hashes"):
        rows = lambda d: sorted(
            tuple(r)
            for r in spark.read.parquet(os.path.join(d, name)).collect()
        )
        assert rows(inc) == rows(one), name

    # day-2 loop: novel base 8 appended; its day-3 variant is caught
    day2 = spark.createDataFrame(
        _phash_media_rows([(8, 0)]), M.MEDIA_SCHEMA
    )
    v2 = P.dedup_and_append_image_batch(spark, day2, inc).collect()
    assert len(v2) == 1 and not v2[0]["is_dup"]
    day3 = spark.createDataFrame(
        _phash_media_rows([(8, 1)]), M.MEDIA_SCHEMA
    )
    v3 = P.flag_batch_images(spark, day3, inc).collect()
    assert len(v3) == 1 and v3[0]["is_dup"]


def test_streaming_mean_shift_matches_batch_query(spark, tmp_path):
    """The d-row (sum, count) streaming state must reproduce the batch
    `embedding_mean_shift_drift` statistic over the same cohorts: the
    baseline (label 0) is fixed batch metadata, the label-1 cohort
    arrives as a stream, and the drained state yields the same MMD²,
    top dimension, and cohort sizes (floats within summation-order
    tolerance, structure exact)."""
    import heapdumpstardiver_spark as hds
    from tests.conftest import SF_DIR

    batch = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cohort_dir = str(tmp_path / "emb_stream")
    batch.filter(F.col("label") == 1).write.parquet(cohort_dir)

    baseline = S.baseline_dim_means(batch.filter(F.col("label") == 0))
    assert len(baseline) == 64
    n_baseline = batch.filter(F.col("label") == 0).count()

    sums = S.streaming_dim_sums(S.stream_embeddings(spark, cohort_dir))
    state = _drain(spark, sums, "t_mean_shift", tmp_path, mode="complete")
    assert state.count() == 64  # the whole streaming state is d rows

    (got,) = S.mean_shift_from_sums(state, baseline, n_baseline).collect()
    (want,) = hds.QUERIES["embedding_mean_shift_drift"](spark, SF_DIR).collect()

    assert got["n_a"] == want["n_a"]
    assert got["n_b"] == want["n_b"]
    assert got["top_dim"] == want["top_dim"]
    assert abs(float(got["mmd_sq"]) - float(want["mmd_sq"])) < 1e-9
    assert abs(float(got["top_shift"]) - float(want["top_shift"])) < 1e-9


def test_streaming_percolate_matches_batch(spark, tmp_path):
    """Percolation is per-document, so the union of all micro-batch
    verdict partitions must equal the batch matcher's output on the
    same corpus exactly — and rerunning a batch id must overwrite,
    not duplicate (replay idempotence)."""
    from heapdumpstardiver_spark.queries.llm import _PERCOLATE_RULES
    from heapdumpstardiver_spark.streaming.percolate import (
        percolate_matches,
        stream_documents,
        streaming_percolate,
    )
    from tests.conftest import SF_DIR

    # stage the documents table as a streaming input DIRECTORY (the
    # fixture parquet is a single file; file streams need a dir)
    docs_dir = str(tmp_path / "docs_stream")
    spark.read.parquet(f"{SF_DIR}/documents.parquet").write.mode(
        "overwrite"
    ).parquet(docs_dir)
    rules = spark.createDataFrame(
        [(rid, t) for rid, terms in _PERCOLATE_RULES for t in terms],
        ["rule_id", "term"],
    )
    out_dir = str(tmp_path / "perc_out")
    q = streaming_percolate(
        stream_documents(spark, docs_dir),
        rules,
        out_dir,
        str(tmp_path / "perc_ckpt"),
    )
    q.awaitTermination(120)

    got = {
        (r["doc_id"], r["rule_id"])
        for r in spark.read.parquet(out_dir).select("doc_id", "rule_id").collect()
    }
    want = {
        (r["doc_id"], r["rule_id"])
        for r in percolate_matches(spark.read.parquet(docs_dir), rules).collect()
    }
    assert got == want and len(want) > 0

    # replay idempotence: re-writing batch 0 with the same input is a
    # byte-identical no-op at the row level
    batch0 = spark.read.parquet(docs_dir)
    percolate_matches(batch0, rules).write.mode("overwrite").parquet(
        f"{out_dir}/batch=0"
    )
    again = {
        (r["doc_id"], r["rule_id"])
        for r in spark.read.parquet(out_dir).select("doc_id", "rule_id").collect()
    }
    assert again == want


def test_streaming_ivf_probe_matches_batch_probe(spark, tmp_path):
    """The streaming ANN face: micro-batches of query vectors probing
    the persisted IVF index must return, per query, EXACTLY the rows
    the batch probe_ivf_index returns for that vector — and the
    shared pruned scan must serve multiple queries per micro-batch."""
    from heapdumpstardiver_spark.ann_index import (
        build_ivf_index,
        probe_ivf_index,
    )
    from heapdumpstardiver_spark.streaming import ivf_probe as IP

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    index_dir = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, index_dir)

    qrows = [
        (int(r["vec_id"]), [float(x) for x in r["v"]])
        for r in emb.filter(F.col("vec_id") < 6)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    ]
    queries = spark.createDataFrame(qrows, IP.QUERY_SCHEMA)

    in_dir = tmp_path / "incoming"
    queries.filter(F.col("qid") < 3).coalesce(1).write.parquet(str(in_dir / "f1"))
    queries.filter(F.col("qid") >= 3).coalesce(1).write.parquet(str(in_dir / "f2"))
    stream = (
        spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    out_dir = str(tmp_path / "verdicts")
    q = IP.streaming_ivf_probe(
        spark, stream, index_dir, out_dir, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    got = {}
    for r in spark.read.parquet(out_dir).collect():
        got.setdefault(r["qid"], set()).add(
            (r["vec_id"], r["cid"], r["cos_sim"])
        )
    assert set(got) == {qid for qid, _ in qrows}
    for qid, qv in qrows:
        want = {
            (r["vec_id"], r["cid"], r["cos_sim"])
            for r in probe_ivf_index(spark, index_dir, qv).collect()
        }
        assert got[qid] == want, f"qid {qid} diverged from the batch probe"
        assert len(got[qid]) == 10


def test_streaming_ivf_probe_replay_idempotent(spark, tmp_path):
    """Re-delivering a micro-batch (foreachBatch at-least-once) must
    leave byte-identical verdict partitions: the batch=<id> overwrite
    contract the other streaming twins pin."""
    from heapdumpstardiver_spark.ann_index import build_ivf_index
    from heapdumpstardiver_spark.streaming import ivf_probe as IP

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    index_dir = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, index_dir)
    qrows = [
        (int(r["vec_id"]), [float(x) for x in r["v"]])
        for r in emb.filter(F.col("vec_id") < 2)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    ]
    out_dir = str(tmp_path / "verdicts")
    first = IP.probe_ivf_index_batch(spark, qrows, index_dir)
    first.write.mode("overwrite").parquet(f"{out_dir}/batch=0")
    before = sorted(
        map(tuple, spark.read.parquet(f"{out_dir}/batch=0").collect())
    )
    # replay: same batch id, same rows -> overwrite is a no-op
    again = IP.probe_ivf_index_batch(spark, qrows, index_dir)
    again.write.mode("overwrite").parquet(f"{out_dir}/batch=0")
    after = sorted(
        map(tuple, spark.read.parquet(f"{out_dir}/batch=0").collect())
    )
    assert before == after


def test_streaming_ivf_probe_batch_scan_is_partition_pruned(spark, tmp_path):
    """The shared micro-batch scan keeps the batch probe's 100 TB
    property: the union cid IN (...) predicate reaches the parquet
    scan as PartitionFilters, so unchosen inverted lists are never
    read even when several queries share the read."""
    from heapdumpstardiver_spark.ann_index import build_ivf_index
    from heapdumpstardiver_spark.streaming import ivf_probe as IP

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    index_dir = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, index_dir)
    qrows = [
        (int(r["vec_id"]), [float(x) for x in r["v"]])
        for r in emb.filter(F.col("vec_id") < 3)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    ]
    df = IP.probe_ivf_index_batch(spark, qrows, index_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the assignments read is the plan's only parquet FileScan (the
    # query/candidate sides are broadcast literals); its path can be
    # truncated in toString(), so match on the filter content
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scans, plan
    pruned = [
        ln
        for ln in scans
        if "PartitionFilters" in ln
        and "cid" in ln.split("PartitionFilters")[1][:80]
    ]
    assert pruned, scans

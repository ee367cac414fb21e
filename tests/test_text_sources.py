"""Crawl-format ingestion: the WARC DataSource and the JSONL corpus
reader — schema pinning, corrupt-input accounting, payload opacity."""

from __future__ import annotations

import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from heapdumpstardiver_spark.ingest.jsonl import (
    clean_documents,
    corrupt_stats,
    read_jsonl_corpus,
)
from heapdumpstardiver_spark.sources.warc_source import register as register_warc


def _warc_record(rid: str, uri: str, payload: bytes, wtype: str = "response") -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2024-01-15T00:00:00Z\r\n"
        f"Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


@pytest.fixture()
def warc_dir(tmp_path):
    d = tmp_path / "warc_in"
    d.mkdir()
    plain = (
        _warc_record("a1", "http://example.com/1", b"hello crawl one")
        + _warc_record("a2", "http://example.com/2", b"\x00\x01binary ok\xff")
        + _warc_record("a3", "http://example.com/3", b"third", wtype="request")
    )
    (d / "part-0.warc").write_bytes(plain)
    # per-record gzip members concatenated — the .warc.gz layout
    gz = b"".join(
        gzip.compress(_warc_record(f"b{i}", f"http://example.com/gz{i}", p))
        for i, p in enumerate([b"gzipped one", b"gzipped two"])
    )
    (d / "part-1.warc.gz").write_bytes(gz)
    return str(d)


def test_warc_source_reads_plain_and_gz(spark, warc_dir):
    register_warc(spark)
    df = spark.read.format("warc").load(warc_dir)
    rows = {r["record_id"]: r for r in df.collect()}
    assert len(rows) == 5
    r = rows["<urn:uuid:a2>"]
    assert bytes(r["payload"]) == b"\x00\x01binary ok\xff"
    assert r["content_length"] == len(b"\x00\x01binary ok\xff")
    assert r["warc_type"] == "response"
    assert rows["<urn:uuid:a3>"]["warc_type"] == "request"
    assert rows["<urn:uuid:b1>"]["target_uri"] == "http://example.com/gz1"
    # one partition per file — the crawl-scale parallelism unit
    assert df.rdd.getNumPartitions() == 2


def test_warc_source_composes_with_dataframe_ops(spark, warc_dir):
    register_warc(spark)
    df = spark.read.format("warc").load(warc_dir)
    got = (
        df.filter(F.col("warc_type") == "response")
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("content_length").alias("b"))
        .orderBy("file")
        .collect()
    )
    assert [(r["file"], r["n"]) for r in got] == [
        ("part-0.warc", 2),
        ("part-1.warc.gz", 2),
    ]


def test_warc_strict_raises_and_tolerant_salvages(spark, tmp_path):
    register_warc(spark)
    d = tmp_path / "warc_bad"
    d.mkdir()
    good = _warc_record("g1", "http://example.com/ok", b"fine")
    (d / "bad.warc").write_bytes(good + b"NOT A WARC HEADER\r\n")
    with pytest.raises(Exception):
        spark.read.format("warc").load(str(d)).collect()
    rows = (
        spark.read.format("warc")
        .option("tolerant", "true")
        .load(str(d))
        .collect()
    )
    assert [r["record_id"] for r in rows] == ["<urn:uuid:g1>"]


def test_warc_tolerant_salvages_truncated_gzip(spark, tmp_path):
    """A truncated/corrupt .warc.gz member raises from gzip
    (EOFError/BadGzipFile), not from our framing checks — tolerant
    mode must salvage the records decoded before the break instead of
    failing the task (the most common real crawl-archive corruption)."""
    register_warc(spark)
    d = tmp_path / "warc_gz_bad"
    d.mkdir()
    good = gzip.compress(_warc_record("g1", "http://example.com/ok", b"fine"))
    truncated = gzip.compress(
        _warc_record("g2", "http://example.com/cut", b"never finishes")
    )[:20]
    (d / "cut.warc.gz").write_bytes(good + truncated)
    with pytest.raises(Exception):
        spark.read.format("warc").load(str(d)).collect()
    rows = (
        spark.read.format("warc")
        .option("tolerant", "true")
        .load(str(d))
        .collect()
    )
    assert [r["record_id"] for r in rows] == ["<urn:uuid:g1>"]


def test_warc_folded_header_continuation(spark, tmp_path):
    """Spec-permitted folded header lines (continuations starting with
    SP/TAB, no colon) must extend the previous header's value — one
    long wrapped WARC-Target-URI must not fail the file in strict
    mode."""
    register_warc(spark)
    payload = b"folded ok"
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:f1>\r\n"
        b"WARC-Target-URI: http://example.com/very\r\n"
        b"\tlong/wrapped/path\r\n"
        b"WARC-Date: 2024-01-15T00:00:00Z\r\n"
        b"Content-Type: text/plain\r\n"
        + f"Content-Length: {len(payload)}\r\n\r\n".encode()
        + payload
        + b"\r\n\r\n"
    )
    d = tmp_path / "warc_folded"
    d.mkdir()
    (d / "folded.warc").write_bytes(rec)
    rows = spark.read.format("warc").load(str(d)).collect()
    assert len(rows) == 1
    assert rows[0]["target_uri"] == "http://example.com/very long/wrapped/path"
    assert bytes(rows[0]["payload"]) == payload


@pytest.fixture()
def jsonl_dir(tmp_path):
    d = tmp_path / "jsonl_in"
    d.mkdir()
    lines = [
        json.dumps(
            {"doc_id": i, "text": f"doc {i} text", "lang": "en",
             "source": "web", "n_chars": 10 + i}
        )
        for i in range(5)
    ]
    lines.insert(3, '{"doc_id": 99, "text": "broken')  # corrupt line
    (d / "part-0.jsonl").write_text("\n".join(lines) + "\n")
    return str(d)


def test_jsonl_permissive_accounts_and_cleans(spark, jsonl_dir):
    df = read_jsonl_corpus(spark, jsonl_dir)
    (stats,) = corrupt_stats(df).collect()
    assert stats["n_rows"] == 6
    assert stats["n_corrupt"] == 1
    clean = clean_documents(df)
    assert clean.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert clean.count() == 5
    assert clean.schema["doc_id"].dataType.simpleString() == "bigint"


def test_jsonl_strict_failfast(spark, jsonl_dir):
    with pytest.raises(Exception):
        read_jsonl_corpus(spark, jsonl_dir, strict=True).count()


def test_warc_to_documents_bridge(spark, warc_dir):
    from heapdumpstardiver_spark.sources.warc_source import (
        warc_responses_to_documents,
    )

    register_warc(spark)
    docs = warc_responses_to_documents(
        spark.read.format("warc").load(warc_dir)
    )
    assert docs.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    rows = docs.collect()
    assert len(rows) == 4  # responses only; the request record is dropped
    assert all(r["doc_id"] >= 0 for r in rows)
    assert len({r["doc_id"] for r in rows}) == 4
    by_text = {r["text"]: r for r in rows}
    assert by_text["hello crawl one"]["n_chars"] == len("hello crawl one")
    assert by_text["hello crawl one"]["source"] == "part-0.warc"
    # dirty bytes decode lossily instead of failing the task
    assert any("�" in t or "binary ok" in t for t in by_text)


# ---------------------------------------------------------------------------
# Pure-Python framing fuzz (no Spark session needed)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["response", "request", "metadata"]),
            st.binary(min_size=0, max_size=300),
        ),
        min_size=1,
        max_size=8,
    ),
    st.booleans(),
)
def test_warc_framing_roundtrip_fuzz(records, use_gzip):
    """Any payload bytes (including CRLFs, fake 'WARC/' lines, and
    nulls inside payloads) must round-trip through the writer/parser
    pair exactly — Content-Length framing means payload CONTENT can
    never confuse record boundaries. Gzip multi-member layout must
    parse identically."""
    import io

    from heapdumpstardiver_spark.sources.warc_source import iter_warc_records

    blobs = []
    for i, (wtype, payload) in enumerate(records):
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"WARC-Record-ID: <urn:uuid:f{i}>\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        raw = head + payload + b"\r\n\r\n"
        blobs.append(gzip.compress(raw) if use_gzip else raw)
    stream = io.BytesIO(b"".join(blobs))
    if use_gzip:
        stream = gzip.GzipFile(fileobj=stream)
    got = list(iter_warc_records(stream))
    assert len(got) == len(records)
    for (wtype, payload), (headers, got_payload) in zip(records, got):
        assert headers["warc-type"] == wtype
        assert got_payload == payload


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=1, max_size=200))
def test_warc_parser_rejects_garbage_loudly(junk):
    """A stream that does not start with a WARC version line must
    raise ValueError (loud-failure policy), never return wrong
    records or hang."""
    import io

    from heapdumpstardiver_spark.sources.warc_source import iter_warc_records

    if junk.strip().startswith(b"WARC/") or junk.strip() == b"":
        return  # generated a plausible prefix — not this test's target
    with pytest.raises(ValueError):
        list(iter_warc_records(io.BytesIO(junk)))


# ---------------------------------------------------------------------------
# Arrow IPC source (r12)
# ---------------------------------------------------------------------------


def test_arrow_ipc_reads_both_container_formats(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.ipc as ipc

    from heapdumpstardiver_spark.sources.arrow_ipc_source import register

    register(spark)
    d = tmp_path / "arrow_in"
    d.mkdir()
    schema = pa.schema([("id", pa.int64()), ("name", pa.string())])
    with ipc.new_file(str(d / "a.arrow"), schema) as w:
        # two batches in one FILE container — iteration must cover both
        w.write_batch(pa.record_batch([pa.array([1, 2]), pa.array(["a", "b"])], schema=schema))
        w.write_batch(pa.record_batch([pa.array([3]), pa.array(["c"])], schema=schema))
    with ipc.new_stream(str(d / "b.arrows"), schema) as w:
        w.write_batch(pa.record_batch([pa.array([4, 5]), pa.array(["d", "e"])], schema=schema))

    df = spark.read.format("arrowipc").load(str(d))
    rows = sorted((r["id"], r["name"]) for r in df.collect())
    assert rows == [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")]
    # one partition per file — the export-scale parallelism unit
    assert df.rdd.getNumPartitions() == 2


def test_arrow_ipc_schema_fidelity_rich_types(spark, tmp_path):
    """Temporal, boolean and nested list columns must land as the
    exact Spark types createDataFrame would produce (the
    from_arrow_schema mapping), with values intact through the
    RecordBatch fast path."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.ipc as ipc

    from heapdumpstardiver_spark.sources.arrow_ipc_source import register

    register(spark)
    d = tmp_path / "arrow_rich"
    d.mkdir()
    schema = pa.schema(
        [
            ("ts", pa.timestamp("us")),
            ("flag", pa.bool_()),
            ("emb", pa.list_(pa.float64())),
        ]
    )
    t0 = dt.datetime(2024, 1, 15, 12, 0, 0)
    with ipc.new_file(str(d / "rich.arrow"), schema) as w:
        w.write_batch(
            pa.record_batch(
                [
                    pa.array([t0, None], pa.timestamp("us")),
                    pa.array([True, False]),
                    pa.array([[1.0, 2.0], []], pa.list_(pa.float64())),
                ],
                schema=schema,
            )
        )
    df = spark.read.format("arrowipc").load(str(d))
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "timestamp",
        "boolean",
        "array<double>",
    ]
    rows = df.orderBy("flag", ascending=False).collect()
    assert rows[0]["flag"] is True and list(rows[0]["emb"]) == [1.0, 2.0]
    assert rows[1]["ts"] is None and list(rows[1]["emb"]) == []


def test_arrow_ipc_missing_path_fails_loudly(spark, tmp_path):
    from heapdumpstardiver_spark.sources.arrow_ipc_source import register

    register(spark)
    with pytest.raises(Exception):
        spark.read.format("arrowipc").load(str(tmp_path / "nope_dir")).collect()


def test_arrow_ipc_writer_roundtrip_and_overwrite(spark, tmp_path):
    """df.write.format('arrowipc') must commit one IPC FILE container
    per non-empty partition via the staged-rename protocol (no
    .staging leftovers), read back exactly, and a second overwrite
    must REPLACE the snapshot — including the name-collision case a
    fixed part-numbering scheme would get wrong."""
    import os

    from heapdumpstardiver_spark.sources.arrow_ipc_source import register

    register(spark)
    out = str(tmp_path / "export")
    df = spark.range(10).select(F.col("id"), (F.col("id") * 2.5).alias("x"))
    df.repartition(3).write.format("arrowipc").mode("overwrite").save(out)
    names = sorted(os.listdir(out))
    assert len(names) == 3 and all(n.endswith(".arrow") for n in names)
    assert not any(n.startswith(".staging") for n in names)
    back = spark.read.format("arrowipc").load(out)
    assert sorted((r["id"], r["x"]) for r in back.collect()) == sorted(
        (r["id"], r["x"]) for r in df.collect()
    )
    # overwrite replaces the snapshot, never merges with it
    spark.range(3).select(
        F.col("id"), F.lit(1.0).alias("x")
    ).coalesce(1).write.format("arrowipc").mode("overwrite").save(out)
    again = spark.read.format("arrowipc").load(out)
    assert again.count() == 3
    assert {r["x"] for r in again.collect()} == {1.0}


def test_arrow_ipc_writer_rejects_append_to_existing(spark, tmp_path):
    """Exports are immutable snapshots: appending onto a non-empty
    target is rejected loudly instead of silently mixing snapshots."""
    from heapdumpstardiver_spark.sources.arrow_ipc_source import register

    register(spark)
    out = str(tmp_path / "export")
    df = spark.range(4).select(F.col("id"), F.lit(0.5).alias("x"))
    df.write.format("arrowipc").mode("append").save(out)  # empty dir: fine
    with pytest.raises(Exception, match="overwrite"):
        df.write.format("arrowipc").mode("append").save(out)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=-(2**62), max_value=2**62),
                st.one_of(st.none(), st.text(max_size=40)),
                st.one_of(
                    st.none(),
                    st.floats(allow_nan=False, allow_infinity=False,
                              width=64),
                ),
            ),
            min_size=0,
            max_size=20,
        ),
        min_size=1,
        max_size=4,
    ),
    st.booleans(),
)
def test_arrow_ipc_framing_roundtrip_fuzz(batches, use_stream):
    """Arbitrary batch layouts (including EMPTY batches and null-laden
    columns) must round-trip bit-exactly through the writer's
    container choice and the reader's magic-sniffing `_iter_batches`
    path — for BOTH the FILE and STREAM layouts, regardless of file
    extension (the sniffer must never trust names)."""
    import tempfile

    import pyarrow as pa
    import pyarrow.ipc as ipc

    from heapdumpstardiver_spark.sources.arrow_ipc_source import (
        _is_file_format,
        _iter_batches,
    )

    schema = pa.schema(
        [("i", pa.int64()), ("s", pa.string()), ("x", pa.float64())]
    )
    # deliberately mismatched extension: stream bytes in ".arrow" etc.
    suffix = ".arrow" if use_stream else ".arrows"
    with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
        path = f.name
    opener = ipc.new_stream if use_stream else ipc.new_file
    with opener(path, schema) as w:
        for rows in batches:
            w.write_batch(
                pa.record_batch(
                    [
                        pa.array([r[0] for r in rows], pa.int64()),
                        pa.array([r[1] for r in rows], pa.string()),
                        pa.array([r[2] for r in rows], pa.float64()),
                    ],
                    schema=schema,
                )
            )
    assert _is_file_format(path) == (not use_stream)
    got = [b for b in _iter_batches(path)]
    flat = [tuple(r) for rows in batches for r in rows]
    got_flat = [
        (i, s, x)
        for b in got
        for i, s, x in zip(
            b.column("i").to_pylist(),
            b.column("s").to_pylist(),
            b.column("x").to_pylist(),
        )
    ]
    assert got_flat == flat
    import os as _os

    _os.unlink(path)


def test_arrow_ipc_writer_abort_leaves_no_committed_parts(spark, tmp_path):
    """A failing write job must commit NOTHING a reader can see:
    no part-*.arrow files, and no staging leftovers either — a failing
    task removes its own staging file (abort() never learns of files
    from tasks that died before returning a commit message), and the
    writer's TTL sweep only backstops hard process crashes, so it must
    not be needed here. Also proves a later overwrite of the same
    target works."""
    import os

    from heapdumpstardiver_spark.sources.arrow_ipc_source import register

    register(spark)
    out = str(tmp_path / "export")
    bad = spark.range(8).select(
        F.col("id"),
        F.when(F.col("id") == 7, F.lit(None))
        .otherwise(F.col("id"))
        .cast("long")
        .alias("v"),
    ).select(
        "id", F.assert_true(F.col("v").isNotNull()).alias("chk"), "v"
    )
    with pytest.raises(Exception):
        bad.write.format("arrowipc").mode("overwrite").save(out)
    committed = [f for f in os.listdir(out) if not f.startswith(".")]
    assert committed == [], committed
    # the directory is still a healthy write target afterwards
    spark.range(3).select(F.col("id"), F.lit(1.0).alias("x")).write.format(
        "arrowipc"
    ).mode("overwrite").save(out)
    assert spark.read.format("arrowipc").load(out).count() == 3
    # A straggler task of the FAILED job can stage its file after that
    # job's abort() sweep ran (task-kill latency) — such an orphan is
    # reader-invisible (dot-file) and is reaped by the TTL sweep, so
    # only staging files from the SECOND (successful) job would be a
    # protocol bug here.
    second_job = [
        f for f in os.listdir(out) if not f.startswith(".")
    ][0].split("-")[2].split(".")[0]
    assert not [
        f
        for f in os.listdir(out)
        if f.startswith(f".staging-{second_job}-")
    ], "successful write must leave none of its own staging files"


def test_arrow_ipc_stream_tails_new_files_only(spark, tmp_path):
    """availableNow drains over one checkpoint: a file committed
    between drains is read by the second drain alone, and stream rows
    over both drains == a batch read of the final directory."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    from heapdumpstardiver_spark.sources.arrow_ipc_source import register

    register(spark)
    src = tmp_path / "tail"
    src.mkdir()

    def shard(name, ids):
        t = pa.table({"id": pa.array(ids, pa.int64())})
        with ipc.new_file(str(src / name), t.schema) as w:
            w.write_table(t)

    shard("a.arrow", [1, 2, 3])
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def drain():
        q = (
            spark.readStream.format("arrowipc")
            .load(str(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == [1, 2, 3]
    shard("b.arrow", [4, 5])
    drain()
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3, 4, 5]  # not [1,2,3,1,2,3,4,5]: no re-read
    batch = spark.read.format("arrowipc").load(str(src))
    assert sorted(r.id for r in batch.collect()) == got


def test_arrow_ipc_stream_refuses_empty_start(spark, tmp_path):
    from heapdumpstardiver_spark.sources.arrow_ipc_source import register

    register(spark)
    empty = tmp_path / "nothing_yet"
    empty.mkdir()
    with pytest.raises(Exception, match="at least one.*committed file"):
        q = (
            spark.readStream.format("arrowipc")
            .load(str(empty))
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)


def test_arrow_ipc_stream_offset_planning(tmp_path):
    import pyarrow as pa
    import pyarrow.ipc as ipc

    from heapdumpstardiver_spark.sources.arrow_ipc_source import (
        ArrowIpcStreamReader,
    )

    d = tmp_path / "tail"
    d.mkdir()
    t = pa.table({"x": [1]})
    with ipc.new_file(str(d / "a.arrow"), t.schema) as w:
        w.write_table(t)
    # in-flight staging is invisible to discovery
    (d / ".staging-cafe-1.arrow").write_bytes(b"torn")
    r = ArrowIpcStreamReader(str(d))
    first = r.latestOffset()
    assert first == {"seen": ["a.arrow"]}
    assert r.partitions(first, r.latestOffset()) == []
    with ipc.new_file(str(d / "b.arrow"), t.schema) as w:
        w.write_table(t)
    import os as _os

    assert [
        _os.path.basename(p.path) for p in r.partitions(first, r.latestOffset())
    ] == ["b.arrow"]


def test_warc_stream_tails_new_archives_only(spark, warc_dir, tmp_path):
    """The crawl tail: two availableNow drains over one checkpoint —
    an archive moved in between drains is read by drain 2 alone, and
    stream rows over both drains == a batch read of the final
    directory (same per-file decode path)."""
    register_warc(spark)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def drain():
        q = (
            spark.readStream.format("warc")
            .load(warc_dir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert spark.read.parquet(out).count() == 5
    # a new archive is MOVED in (rename-atomic, the delivery contract)
    staged = tmp_path / "late.warc"
    staged.write_bytes(_warc_record("c1", "http://example.com/late", b"late doc"))
    os.rename(staged, os.path.join(warc_dir, "late.warc"))
    drain()
    got = spark.read.parquet(out)
    assert got.count() == 6
    batch = spark.read.format("warc").load(warc_dir)
    assert sorted(r.record_id for r in got.collect()) == sorted(
        r.record_id for r in batch.collect()
    )


def test_warc_stream_composes_with_documents_bridge(spark, warc_dir, tmp_path):
    """The crawl-to-curation streaming path: tail WARC archives →
    `warc_responses_to_documents` → downstream sink, producing the
    same documents relation as the batch bridge over the final
    directory (the bridge is one stateless projection, so it applies
    to a streaming frame unchanged)."""
    from heapdumpstardiver_spark.sources.warc_source import (
        warc_responses_to_documents,
    )

    register_warc(spark)
    out = str(tmp_path / "docs")
    q = (
        warc_responses_to_documents(
            spark.readStream.format("warc").load(warc_dir)
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.read.parquet(out)
    batch = warc_responses_to_documents(
        spark.read.format("warc").load(warc_dir)
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )
    # response-only filter held on the stream too
    assert streamed.count() == 4  # 5 records in the fixture, 1 request


# ---------------------------------------------------------------------------
# Arrow IPC streaming sink: continuous shard export
# ---------------------------------------------------------------------------


def test_arrow_ipc_stream_writer_commit_is_batch_replayable(tmp_path):
    """Replaying a batch id converges the directory to ONE shard set
    for that batch — including when the replay stages fewer shards
    than a wider earlier attempt (same contract as the TFRecord sink;
    the protocol is shared in BatchReplayStreamWriter)."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    from heapdumpstardiver_spark.sources.arrow_ipc_source import (
        ArrowIpcStreamWriter,
    )
    from heapdumpstardiver_spark.sources.stream_sink import StagedCommit

    d = tmp_path / "sink"
    d.mkdir()
    w = ArrowIpcStreamWriter(str(d))

    def stage(writer, ids):
        p = str(d / f".staging-{writer.stream_id}-{len(ids)}x{ids[0]}")
        t = pa.table({"id": pa.array(ids, pa.int64())})
        with ipc.new_file(p, t.schema) as fw:
            fw.write_table(t)
        return StagedCommit(staged=p, rows=len(ids))

    w.commit([stage(w, [1]), stage(w, [2])], batchId=7)
    assert sorted(os.listdir(d)) == [
        "part-b00000007-00000.arrow",
        "part-b00000007-00001.arrow",
    ]
    w2 = ArrowIpcStreamWriter(str(d))
    w2.commit([stage(w2, [9])], batchId=7)
    assert sorted(os.listdir(d)) == ["part-b00000007-00000.arrow"]
    with ipc.open_file(str(d / "part-b00000007-00000.arrow")) as r:
        assert r.read_all().column("id").to_pylist() == [9]


def test_arrow_ipc_stream_hop_end_to_end(spark, tmp_path):
    """Feature-store hop: tail upstream Arrow exports, transform,
    commit downstream Arrow shards. The second drain must add exactly
    the new upstream rows downstream — no duplicates of drain 1's
    batch — and downstream shards stay batch-readable."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    from heapdumpstardiver_spark.sources.arrow_ipc_source import register

    register(spark)
    up = tmp_path / "up"
    up.mkdir()
    down = str(tmp_path / "down")
    ck = str(tmp_path / "ck")

    def shard(name, ids):
        t = pa.table({"id": pa.array(ids, pa.int64())})
        with ipc.new_file(str(up / name), t.schema) as w:
            w.write_table(t)

    shard("a.arrow", [1, 2, 3])

    def drain():
        q = (
            spark.readStream.format("arrowipc")
            .load(str(up))
            .withColumn("doubled", F.col("id") * 2)
            .writeStream.format("arrowipc")
            .option("path", down)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    first = spark.read.format("arrowipc").load(down)
    assert sorted((r.id, r.doubled) for r in first.collect()) == [
        (1, 2),
        (2, 4),
        (3, 6),
    ]
    shard("b.arrow", [4])
    drain()
    final = spark.read.format("arrowipc").load(down)
    assert sorted((r.id, r.doubled) for r in final.collect()) == [
        (1, 2),
        (2, 4),
        (3, 6),
        (4, 8),
    ]
    names = sorted(os.listdir(down))
    assert all(n.startswith("part-b") and n.endswith(".arrow") for n in names)

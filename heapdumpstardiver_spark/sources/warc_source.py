"""Spark 4 Python DataSource for WARC web-crawl archives:
``spark.read.format("warc").load(path)`` — one row per WARC record.

WARC (ISO 28500) is THE interchange format crawl pipelines ingest
(Common Crawl ships it), so a training-data engine needs a native
reader next to parquet and JSONL. This implements the subset a
curation pipeline touches: version line, named headers, Content-Length
framed payload, and the two-CRLF record separator — stdlib only, with
per-record-gzip members handled transparently (Python's gzip reads
concatenated members, which is exactly how `.warc.gz` is laid out).

Scale shape mirrors the industry-standard Spark/WARC posture: one
input partition per FILE (crawl dumps are many ~1 GB files, so file
count is the parallelism unit; a 1000-executor cluster streams 1000
files concurrently with zero coordination), each task STREAMING its
file — payloads go straight into Arrow rows, never into a
driver-side list. Payload bytes stay an opaque ``binary`` column (the
multimodal discipline: decode downstream in one Arrow stage, never
shuffle raw payloads) with the headers a curation pass filters on
(type, target URI, date, content type) promoted to typed columns.
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from heapdumpstardiver_spark.sources.dir_tail import DirectoryTailStreamReader

WARC_SCHEMA = (
    "file STRING, record_id STRING, warc_type STRING, target_uri STRING,"
    " warc_date STRING, content_type STRING, content_length BIGINT,"
    " payload BINARY"
)


@dataclass
class _WarcFile(InputPartition):
    path: str


def _open_stream(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return io.BufferedReader(io.FileIO(path, "rb"))


def iter_warc_records(stream):
    """Yield (headers dict lower-cased, payload bytes) per record.

    Framing per the spec: a ``WARC/<ver>`` version line, header lines
    until a blank line, exactly Content-Length payload bytes, then a
    blank-line separator before the next record. Tolerates leading
    blank lines and stops cleanly at EOF; a record with a broken
    frame raises ValueError naming the offset (loud-failure policy —
    corrupt members are skipped at the file level by the caller when
    tolerance is requested)."""
    while True:
        line = stream.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"not a WARC version line: {line[:40]!r}")
        headers: dict[str, str] = {}
        last_key: str | None = None
        while True:
            h = stream.readline()
            if not h:
                raise ValueError("EOF inside WARC header block")
            if h.strip() == b"":
                break
            if h[:1] in (b" ", b"\t"):
                # spec-permitted folded continuation line (long values
                # like WARC-Target-URI wrap onto SP/TAB-prefixed lines
                # carrying no colon): extend the previous header value
                if last_key is None:
                    raise ValueError(
                        f"continuation line before any header: {h[:40]!r}"
                    )
                headers[last_key] = (
                    headers[last_key] + " " + h.strip().decode("utf-8", "replace")
                ).strip()
                continue
            if b":" not in h:
                raise ValueError(f"malformed WARC header line: {h[:40]!r}")
            k, v = h.split(b":", 1)
            last_key = k.strip().lower().decode("ascii", "replace")
            headers[last_key] = v.strip().decode("utf-8", "replace")
        try:
            n = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError(f"missing/invalid Content-Length: {exc}") from exc
        payload = stream.read(n)
        if len(payload) != n:
            raise ValueError(f"truncated payload: wanted {n}, got {len(payload)}")
        yield headers, payload


def _iter_file_rows(path: str, tolerant: bool):
    """Engine rows for one archive — shared by the batch reader and
    the stream tail so both surfaces decode identically."""
    try:
        with _open_stream(path) as stream:
            for headers, payload in iter_warc_records(stream):
                yield (
                    os.path.basename(path),
                    headers.get("warc-record-id", ""),
                    headers.get("warc-type", ""),
                    headers.get("warc-target-uri", ""),
                    headers.get("warc-date", ""),
                    headers.get("content-type", ""),
                    len(payload),
                    payload,
                )
    except (ValueError, EOFError, OSError):
        # EOFError/OSError (incl. gzip.BadGzipFile) cover the most
        # common real crawl-archive corruption: a truncated or
        # garbage .warc.gz member breaking mid-decompress, which
        # raises from gzip rather than from our framing checks.
        if not tolerant:
            raise
        # tolerant mode: a file whose framing breaks mid-stream
        # contributes the records parsed before the break (the
        # ignoreCorruptFiles posture, per file)
        return


class WarcReader(DataSourceReader):
    def __init__(self, path: str, tolerant: bool):
        p = os.path.abspath(path)
        if os.path.isdir(p):
            self.files = sorted(
                _glob.glob(os.path.join(p, "*.warc"))
                + _glob.glob(os.path.join(p, "*.warc.gz"))
            )
        else:
            self.files = sorted(_glob.glob(p)) or [p]
        self.tolerant = tolerant

    def partitions(self):
        return [_WarcFile(f) for f in self.files]

    def read(self, partition: _WarcFile):
        yield from _iter_file_rows(partition.path, self.tolerant)


class WarcStreamReader(DirectoryTailStreamReader):
    """``spark.readStream.format("warc").load(dir)`` tails a crawl
    directory: each micro-batch plans exactly the archives that
    appeared since the last committed offset, decoded executor-side
    by the same per-file generator as the batch reader. The tail
    assumes the standard crawl-delivery contract — archives are
    downloaded/written elsewhere and MOVED in when complete (rename-
    atomic visibility); a pipeline that writes ``.warc.gz`` in place
    under the tailed directory can surface torn members, which
    ``option("tolerant", "true")`` degrades to partial files instead
    of failed tasks."""

    def __init__(self, path: str, tolerant: bool, keep: int = 0):
        super().__init__(path, ("*.warc", "*.warc.gz"), keep)
        self.tolerant = tolerant

    def _partition(self, path: str):
        return _WarcFile(path)

    def read(self, partition: _WarcFile):
        yield from _iter_file_rows(partition.path, self.tolerant)


class WarcDataSource(DataSource):
    """``format("warc")``: one row per WARC record with the curation
    headers typed and the payload opaque binary.
    ``option("tolerant", "true")`` skips the remainder of a file whose
    framing breaks instead of failing the task (strict by default —
    the corrupt-shard policy of `catalog.load_table`)."""

    @classmethod
    def name(cls):
        return "warc"

    def schema(self):
        return WARC_SCHEMA

    def _opts(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("format('warc') requires .load(path)")
        tolerant = str(self.options.get("tolerant", "false")).lower() == "true"
        return path, tolerant

    def reader(self, schema):
        return WarcReader(*self._opts())

    def streamReader(self, schema):
        return WarcStreamReader(
            *self._opts(), int(self.options.get("offset_keep", 0))
        )


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(WarcDataSource)


def warc_responses_to_documents(warc_df):
    """Bridge a ``format("warc")`` DataFrame into the engine's
    `documents` contract: response records only, payload decoded
    UTF-8 (lossy replace — crawl bytes are dirty by definition),
    doc_id = first 60 bits of the payload xxhash (deterministic,
    collision-safe at crawl scale and positive in signed space),
    source = archive file. From here the full curation surface
    (dedup, quality, language-ID, tokenizers, mix weights) applies
    unchanged — this is the glue that makes WARC a first-class
    corpus input rather than a side format.

    One narrow projection, no shuffle: payload bytes decode in the
    same stage that read them and are immediately reduced to the
    text column."""
    from pyspark.sql import functions as F

    # binary -> string is an unvalidated UTF-8 reinterpretation;
    # make_valid_utf8 then substitutes U+FFFD for broken sequences
    # (ANSI decode() would THROW on dirty crawl bytes)
    text = F.expr("make_valid_utf8(CAST(payload AS STRING))")
    return (
        warc_df.filter(F.col("warc_type") == "response")
        .select(
            F.shiftrightunsigned(F.xxhash64("payload"), 4).alias("doc_id"),
            text.alias("text"),
            F.lit("und").alias("lang"),
            F.col("file").alias("source"),
            F.length(text).cast("long").alias("n_chars"),
        )
    )

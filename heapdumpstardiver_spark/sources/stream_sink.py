"""Shared per-batch staged-commit core for directory streaming sinks.

The TFRecord and Arrow IPC streaming sinks commit micro-batches the
same way, so the protocol lives here once (the write-side twin of
:mod:`.dir_tail`, which owns the read-side offset core):

- tasks stage into dot-files named ``.staging-<stream>-<uuid>`` —
  invisible to directory tails (glob skips dot-files) and to the
  batch readers;
- the driver's per-batch ``commit`` promotes staged files to names
  keyed by the BATCH id alone (``part-b<batchId>-<seq>.<ext>``,
  ``os.replace``), so a batch replayed after a crash REWRITES the
  same names instead of duplicating records;
- any leftover shard of a wider earlier attempt of the SAME batch is
  reaped before commit returns — the directory converges to exactly
  one shard set per batch id;
- ``abort`` sweeps by the sink's own staging scope only, because
  Spark hands it all-None messages on job failure (the incident
  contract documented on ArrowIpcWriter) and an unscoped sweep would
  delete a concurrent batch writer's in-flight staging on the same
  target, breaking its commit renames.

One stream per target directory: batch-id-keyed names are what make
replays idempotent, so two different streams sharing a target would
collide on them (the same single-writer contract as Spark's own file
sink, which pins it via its metadata log). Composed with the
directory tails this makes a curation hop (tail upstream exports →
transform → commit downstream shards) restart-safe end-to-end:
downstream tails see only rename-committed shards.
"""

from __future__ import annotations

import glob as _glob
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)


@dataclass
class StagedCommit(WriterCommitMessage):
    staged: str | None = None
    rows: int = 0


class BatchReplayStreamWriter(DataSourceStreamArrowWriter):
    """Subclasses set :attr:`ext` (committed-shard extension, with the
    dot) and implement :meth:`write_shard` — stream the task's Arrow
    RecordBatches into one open staging file, return the row count."""

    ext = ""

    def __init__(self, path: str):
        import uuid

        self.path = path
        # staging scope only — committed names must NOT carry this id,
        # or a post-restart replay of a half-committed batch would
        # duplicate instead of replace
        self.stream_id = uuid.uuid4().hex[:12]

    # -- task side ---------------------------------------------------------

    def write_shard(self, staged_path: str, batches) -> int:
        raise NotImplementedError

    def write(self, iterator):
        import uuid

        it = iter(iterator)
        first = next(it, None)
        if first is None:
            return StagedCommit()  # empty partition: no shard
        staged = os.path.join(
            self.path, f".staging-{self.stream_id}-{uuid.uuid4().hex}"
        )
        try:
            rows = self.write_shard(staged, (b for b in (first, *it)))
        except BaseException:
            try:
                os.remove(staged)  # failing tasks self-clean eagerly
            except OSError:
                pass
            raise
        return StagedCommit(staged=staged, rows=rows)

    # -- driver side -------------------------------------------------------

    def commit(self, messages, batchId: int) -> None:
        staged = sorted(m.staged for m in messages if m and m.staged)
        prefix = f"part-b{batchId:08d}-"
        final = []
        for i, s in enumerate(staged):
            dest = os.path.join(self.path, f"{prefix}{i:05d}{self.ext}")
            os.replace(s, dest)  # idempotent under batch replay
            final.append(dest)
        # a wider earlier attempt of this batch may have committed more
        # shards than this one staged — reap them or the replay leaks
        # their records into the total
        for old in _glob.glob(os.path.join(self.path, f"{prefix}*{self.ext}")):
            if old not in final:
                try:
                    os.remove(old)
                except OSError:
                    pass

    def abort(self, messages, batchId: int) -> None:
        # messages are all None on failure — sweep by own scope only
        for staged in _glob.glob(
            os.path.join(self.path, f".staging-{self.stream_id}-*")
        ):
            try:
                os.remove(staged)
            except OSError:
                pass

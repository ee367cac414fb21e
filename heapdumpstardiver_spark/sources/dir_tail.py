"""Shared offset/planning core for directory-tail streaming sources.

All three custom file sources (TFRecord, Arrow IPC, WARC) stream the
same way: a directory accumulates immutable files that become visible
atomically (staged dot-file promoted by rename, or a crawl shard
moved in when complete), so "what is new" is a pure set difference of
committed names. This base owns that logic once:

- the offset is ``{"seen": [sorted committed names]}`` — a JSON
  snapshot the streaming checkpoint persists, which makes replay
  (``partitions(start, end)`` re-planned after a crash) exact with no
  per-record bookkeeping;
- each micro-batch plans ONE input partition per newly appeared file
  (file count is the parallelism unit for these formats, matching
  their batch readers);
- ``commit`` is a no-op because the checkpoint log IS the durable
  seen-set.

Subclasses provide ``_partition(path)`` (their batch reader's
InputPartition for one file) and ``read`` (their batch reader's
per-file decode — tails must never decode differently from batch
reads of the same directory).

At fleet scale the name-set offset grows with shard count; export
layouts that accumulate millions of files per directory should roll
directories per day/epoch or compact retired names into a manifest
the way Spark's FileStreamSource ages out seen-map entries.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import DataSourceStreamReader, InputPartition


class DirectoryTailStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, patterns: tuple[str, ...]):
        self.path = path
        self.patterns = patterns

    def _snapshot(self) -> list[str]:
        # Names, not mtimes: rename-visibility is the only signal that
        # survives clock skew between writers.
        p = os.path.abspath(self.path)
        if os.path.isdir(p):
            names = [
                f
                for pat in self.patterns
                for f in _glob.glob(os.path.join(p, pat))
            ]
        else:
            names = [f for f in _glob.glob(p) if os.path.exists(f)]
        return sorted(os.path.basename(f) for f in names)

    def _partition(self, path: str) -> InputPartition:
        raise NotImplementedError

    def initialOffset(self) -> dict:
        return {"seen": []}

    def latestOffset(self) -> dict:
        return {"seen": self._snapshot()}

    def partitions(self, start: dict, end: dict):
        prior = set(start.get("seen", []))
        base = os.path.abspath(self.path)
        return [
            self._partition(os.path.join(base, name))
            for name in end.get("seen", [])
            if name not in prior
        ]

    def commit(self, end: dict) -> None:
        # the streaming checkpoint is the durable seen-set
        pass

"""Shared offset/planning core for directory-tail streaming sources.

All four custom sources (TFRecord, Arrow IPC, WARC, HPROF) stream the
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
  their batch readers; the HPROF subclass overrides this to expand
  each dump into byte-range splits);
- ``commit`` is a no-op because the checkpoint log IS the durable
  seen-set.

Subclasses provide ``_partition(path)`` (their batch reader's
InputPartition for one file) and ``read`` (their batch reader's
per-file decode — tails must never decode differently from batch
reads of the same directory).

**Bounded offsets at fleet scale** (``keep > 0``): a directory that
accumulates millions of shards would otherwise grow the name-set
offset — and every checkpoint write — linearly with history. With
``keep`` set, the offset compacts to ``{"floor": F, "seen": [the
last *keep* names]}``, where every name sorting ``<= F`` is covered
by the floor instead of being listed. This leans on the export
layouts' monotone naming (batch-id-keyed sink shards, timestamped
crawl archives): a file committed LATE with a name sorting below the
floor may be silently skipped (only a drain that advances the floor
past it would sweep it up) — the same horizon semantics as Spark's
own FileStreamSource ``maxFileAge`` (files older than the age
horizon are ignored if first seen too late), traded name-ordered
instead of mtime-ordered so it stays deterministic under clock skew.
Name shards so this cannot happen, or leave ``keep`` at 0. Stragglers
within the last ``keep`` names are still caught exactly once. A
fresh start (or a checkpoint predating the floor) recovers the
compacted region from the directory itself: planning reads the
listing for names under the floor not yet covered by the start
offset, so bootstrap-over-history still reads every file on disk
exactly once.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import DataSourceStreamReader, InputPartition


class DirectoryTailStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, patterns: tuple[str, ...], keep: int = 0):
        self.path = path
        self.patterns = patterns
        #: 0 = never compact (offset lists every committed name);
        #: N > 0 = keep the last N names explicit, floor the rest
        self.keep = keep

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

    @staticmethod
    def _covered(offset: dict, name: str) -> bool:
        return name <= offset.get("floor", "") or name in offset.get(
            "_seen_set", offset.get("seen", ())
        )

    def initialOffset(self) -> dict:
        return {"seen": []}

    def latestOffset(self) -> dict:
        names = self._snapshot()
        if self.keep and len(names) > self.keep:
            return {"floor": names[-self.keep - 1], "seen": names[-self.keep :]}
        return {"seen": names}

    def _new_names(self, start: dict, end: dict) -> list[str]:
        """Names covered by *end* but not by *start*, in sorted order —
        the micro-batch's file set, identical under replay."""
        # interning the membership set once keeps planning O(n), not
        # O(n^2), over large explicit lists
        start = dict(start)
        start["_seen_set"] = set(start.get("seen", ()))
        fresh = [
            n
            for n in end.get("seen", [])
            if not self._covered(start, n)
        ]
        floor = end.get("floor", "")
        if floor and floor > start.get("floor", ""):
            # bootstrap-over-compacted-history: the floor region is not
            # listed in the offset; recover it from the directory (the
            # files must exist to be read at all, so the listing is
            # authoritative here)
            fresh.extend(
                n
                for n in self._snapshot()
                if n <= floor and not self._covered(start, n)
            )
        return sorted(set(fresh))

    def partitions(self, start: dict, end: dict):
        base = os.path.abspath(self.path)
        return [
            self._partition(os.path.join(base, name))
            for name in self._new_names(start, end)
        ]

    def commit(self, end: dict) -> None:
        # the streaming checkpoint is the durable seen-set
        pass

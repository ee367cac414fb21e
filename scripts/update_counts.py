"""Regenerate the registry counters in README.md from the registry
itself (r9 verdict item: the hand-typed count went stale mid-round at
commit 6ad34cf). Run after registering queries; idempotent.

Rewrites every occurrence of the canonical counter phrase
``N named queries, M paired with a DuckDB oracle`` to the live
``len(hds.QUERIES)`` / ``len(hds.ORACLE_SQL)`` numbers.

``--check-head`` additionally validates the driver-head rotation in
``__spark_entry__.py`` against the registry and the cumulative
CORRECTNESS_r*.json record (r11 verdict item 6: rotation arithmetic
must be derived, never hand-typed): every head name must exist in the
registry, the head must be duplicate-free, and the emitted vintage
histogram + stale-row list come straight from the record.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import heapdumpstardiver_spark as hds  # noqa: E402

PATTERN = re.compile(
    r"\d+ named queries, \d+ paired with a DuckDB oracle"
)

DRIVER_CAP = 50  # the driver samples ~this many head entries per round


def latest_green_vintage() -> dict[str, int]:
    """query name -> newest round whose driver record has it fully
    green (rows+schema+hash). Derived, not typed."""
    vintage: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            rec = json.load(f)
        for name, row in rec.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match", True)
            ):
                vintage[name] = max(vintage.get(name, 0), rnd)
    return vintage


def check_head() -> int:
    import __spark_entry__ as em

    head = em._CHECK_PRIORITY
    errs = []
    unknown = [n for n in head if n not in hds.QUERIES]
    if unknown:
        errs.append(f"head names not in registry: {unknown}")
    dupes = sorted({n for n in head if head.count(n) > 1})
    if dupes:
        errs.append(f"duplicate head names: {dupes}")
    if len(head) > DRIVER_CAP:
        errs.append(
            f"head has {len(head)} entries > driver cap ~{DRIVER_CAP}: "
            f"the tail spills to the next round"
        )
    vintage = latest_green_vintage()
    hist: dict[int, int] = {}
    for name in hds.QUERIES:
        hist[vintage.get(name, 0)] = hist.get(vintage.get(name, 0), 0) + 1
    print("vintage histogram (latest green round -> count; 0 = never):")
    for rnd in sorted(hist):
        print(f"  r{rnd}: {hist[rnd]}")
    newest = max(vintage.values(), default=0)
    # a row sampled in round N is due again by N + cadence, where
    # cadence = ceil(registry / cap): at the upcoming round newest+1,
    # rows with vintage <= newest+1-cadence are overdue
    cadence = -(-len(hds.QUERIES) // DRIVER_CAP)
    stale_cut = newest + 1 - cadence
    # never-green rows (vintage 0) are NEW queries waiting for their
    # FIRST canonical row, not aging ones — report them separately so
    # "stale" means exactly what the freshness policy means by it
    # (green before, overdue for a re-sample). New rows take the next
    # round's head first per the policy in __spark_entry__.py.
    never = sorted(n for n in hds.QUERIES if vintage.get(n, 0) == 0)
    stale = sorted(
        n
        for n in hds.QUERIES
        if 0 < vintage.get(n, 0) <= stale_cut
    )
    uncovered = [n for n in stale if n not in head]
    new_uncovered = [n for n in never if n not in head]
    print(
        f"head: {len(head)}/{DRIVER_CAP} slots; stale (<= r{stale_cut}): "
        f"{len(stale)}; stale rows NOT in head: {len(uncovered)}; "
        f"never-green: {len(never)} ({len(new_uncovered)} awaiting a "
        f"next-round head slot)"
    )
    if uncovered:
        print(f"  uncovered stale rows: {uncovered}")
    if new_uncovered:
        print(f"  never-green rows not in head: {new_uncovered}")
    for e in errs:
        print(f"ERROR: {e}")
    return 1 if errs else 0


def main() -> None:
    n_q, n_o = len(hds.QUERIES), len(hds.ORACLE_SQL)
    phrase = f"{n_q} named queries, {n_o} paired with a DuckDB oracle"
    changed = []
    for fname in ("README.md", "COVERAGE.md"):
        path = os.path.join(_REPO, fname)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            text = f.read()
        new, n = PATTERN.subn(phrase, text)
        if n and new != text:
            with open(path, "w") as f:
                f.write(new)
            changed.append(f"{fname} ({n} site[s])")
    print(f"registry: {n_q} queries / {n_o} oracle-paired; "
          f"updated: {', '.join(changed) or 'nothing (already current)'}")
    if "--check-head" in sys.argv:
        sys.exit(check_head())


if __name__ == "__main__":
    main()

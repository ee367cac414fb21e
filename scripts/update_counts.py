"""Regenerate the registry counters in README.md from the registry
itself (r9 verdict item: the hand-typed count went stale mid-round at
commit 6ad34cf). Run after registering queries; idempotent.

Rewrites every occurrence of the canonical counter phrase
``N named queries, M paired with a DuckDB oracle`` to the live
``len(hds.QUERIES)`` / ``len(hds.ORACLE_SQL)`` numbers.
"""

from __future__ import annotations

import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import heapdumpstardiver_spark as hds  # noqa: E402

PATTERN = re.compile(
    r"\d+ named queries, \d+ paired with a DuckDB oracle"
)


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


if __name__ == "__main__":
    main()

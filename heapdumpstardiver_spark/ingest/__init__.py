from .convert import count_records, ingest_hprof  # noqa: F401
from .jsonl import (  # noqa: F401
    clean_documents,
    corrupt_stats,
    read_jsonl_corpus,
)
from .default_mode import resolve_refs_default_mode  # noqa: F401
from .snapshots import (  # noqa: F401
    SnapshotView,
    append_snapshot,
    list_snapshots,
    object_diff,
    snapshot_summary,
    type_histogram_delta,
)

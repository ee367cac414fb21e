from .convert import count_records, ingest_hprof  # noqa: F401

from .hprof_source import HprofDataSource, register  # noqa: F401

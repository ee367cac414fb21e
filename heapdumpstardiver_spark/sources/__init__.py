from .hprof_source import HprofDataSource, register  # noqa: F401
from .warc_source import (  # noqa: F401
    WarcDataSource,
    iter_warc_records,
)
from .warc_source import register as register_warc  # noqa: F401
from .arrow_ipc_source import ArrowIpcDataSource  # noqa: F401
from .arrow_ipc_source import register as register_arrow_ipc  # noqa: F401
from .tfrecord_source import TfRecordDataSource  # noqa: F401
from .tfrecord_source import register as register_tfrecord  # noqa: F401

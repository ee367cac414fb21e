from .findings import WasteFinding, classify_severity, format_bytes  # noqa: F401
from .runner import ALL_CHECKS, run_waste_analysis  # noqa: F401
from .reachability import (  # noqa: F401
    heap_edges,
    liveness_summary,
    reachable_from_roots,
    unreachable_by_type,
)

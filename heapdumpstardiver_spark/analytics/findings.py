"""Waste-finding model: severity classification, byte formatting, and
the JVM object-layout constants the waste estimates are built on.

Semantics mirror the reference's analysis library
(/root/reference/scripts/analyze_heap_parquet.py:30-90); the constants
are standard 64-bit-JVM/compressed-oops layout numbers.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Object-layout constants (bytes; compressed oops, 64-bit JVM).
OBJECT_HEADER = 16
ARRAY_HEADER = 16
REF_SIZE = 4
HASHMAP_ENTRY_SIZE = 32
HASHMAP_SHELL_SIZE = 48
ARRAYLIST_SHELL_SIZE = 40
LINKEDLIST_SHELL_SIZE = 48
LINKEDLIST_NODE_SIZE = 24
TREEMAP_SHELL_SIZE = 64
TREEMAP_ENTRY_SIZE = 48
CHM_SHELL_SIZE = 64
CHM_NODE_SIZE = 32
STRING_OBJ_OVERHEAD = 40  # header(16) + hash(4) + hashIsZero(1) + coder(1) + value ref(4) + pad

SEVERITY_RANK = {"CRITICAL": 0, "HIGH": 1, "MEDIUM": 2, "LOW": 3, "INFO": 4}


@dataclass
class WasteFinding:
    check_name: str
    tier: int
    severity: str  # CRITICAL, HIGH, MEDIUM, LOW, INFO
    affected_count: int
    estimated_waste_bytes: int
    details: str
    recommendation: str
    sub_findings: list = field(default_factory=list)

    def severity_rank(self) -> int:
        return SEVERITY_RANK.get(self.severity, 5)

    def to_dict(self) -> dict:
        return {
            "check_name": self.check_name,
            "tier": self.tier,
            "severity": self.severity,
            "affected_count": self.affected_count,
            "estimated_waste_bytes": self.estimated_waste_bytes,
            "estimated_waste_human": format_bytes(self.estimated_waste_bytes),
            "details": self.details,
            "recommendation": self.recommendation,
            "sub_findings": list(self.sub_findings),
        }


def classify_severity(waste_bytes: int) -> str:
    """CRITICAL >100 MB, HIGH >10 MB, MEDIUM >1 MB, LOW >100 KB, else INFO
    (analyze_heap_parquet.py:67-76)."""
    if waste_bytes > 100 * 1024 * 1024:
        return "CRITICAL"
    if waste_bytes > 10 * 1024 * 1024:
        return "HIGH"
    if waste_bytes > 1024 * 1024:
        return "MEDIUM"
    if waste_bytes > 100 * 1024:
        return "LOW"
    return "INFO"


def format_bytes(n: int) -> str:
    if n >= 1024**3:
        return f"{n / 1024**3:.2f} GB"
    if n >= 1024**2:
        return f"{n / 1024**2:.2f} MB"
    if n >= 1024:
        return f"{n / 1024:.2f} KB"
    return f"{n} B"

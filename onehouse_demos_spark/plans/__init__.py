"""Physical-plan inspection utilities (the engine's feedback loop for
the 100 TB design goal: verify pushdown, pruning, broadcast, codegen
from code instead of by eyeballing `.explain()`)."""

from onehouse_demos_spark.plans.inspect import (
    explain_str,
    num_exchanges,
    pushed_filters,
    read_schema_columns,
    scan_stats,
    uses_broadcast_join,
    wholestage_codegen_spans,
)

__all__ = [
    "explain_str",
    "num_exchanges",
    "pushed_filters",
    "read_schema_columns",
    "scan_stats",
    "uses_broadcast_join",
    "wholestage_codegen_spans",
]

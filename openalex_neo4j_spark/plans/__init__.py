"""Physical-plan audit helpers (Catalyst introspection)."""

from openalex_neo4j_spark.plans.audit import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    has_pushed_filters,
    pruned_scan_columns,
    python_eval_count,
    wholestage_codegen_spans,
)

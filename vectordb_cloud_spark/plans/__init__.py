from vectordb_cloud_spark.plans.inspect import (
    count_exchanges,
    explain_str,
    has_pushed_filters,
    physical_operators,
    uses_broadcast_join,
    whole_stage_codegen_spans,
)

__all__ = [
    "count_exchanges",
    "explain_str",
    "has_pushed_filters",
    "physical_operators",
    "uses_broadcast_join",
    "whole_stage_codegen_spans",
]

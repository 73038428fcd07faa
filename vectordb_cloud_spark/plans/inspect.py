"""Physical-plan introspection: make plan quality testable.

The scale contract (100 TB) lives in the plan shape, not the output values:
filters must reach the parquet scan, small dims must broadcast, top-k must be
TakeOrderedAndProject, shuffle count must match the algorithm's minimum.
These helpers parse ``explain("formatted")`` so tests/CI can assert those
properties and catch regressions that correctness checks can't see.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def physical_operators(df: DataFrame) -> list[str]:
    """Operator names in the formatted plan tree, in tree order."""
    plan = explain_str(df)
    ops = []
    for line in plan.splitlines():
        m = re.match(r"^[\s+*:-]*(?:\([0-9]+\)\s+)?([A-Za-z][A-Za-z0-9]+)", line)
        if m and line.lstrip().startswith(("+-", ":-", "*(", "(")) or re.match(r"^\(\d+\)", line.strip()):
            m2 = re.search(r"\(\d+\)\s+([A-Za-z][A-Za-z0-9 ]*?)(?:\s*\[|$)", line.strip())
            if m2:
                ops.append(m2.group(1).strip())
    return ops


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (each is a full network materialization —
    the quantity to minimize)."""
    plan = explain_str(df)
    return len(re.findall(r"\(\d+\)\s+Exchange", plan)) + len(
        re.findall(r"\(\d+\)\s+ShuffleExchange", plan)
    )


def has_pushed_filters(df: DataFrame, fragment: str | None = None) -> bool:
    """True if the parquet scan advertises PushedFilters (optionally
    containing ``fragment``)."""
    plan = explain_str(df)
    m = re.search(r"PushedFilters:\s*\[([^\]]*)\]", plan)
    if not m:
        return False
    if not m.group(1).strip():
        return False
    return fragment is None or fragment in m.group(1)


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Count of WholeStageCodegen subtrees (wider is better — more of the
    plan runs as generated JVM code)."""
    plan = explain_str(df, mode="simple")
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the parquet scan (column pruning check)."""
    plan = explain_str(df)
    m = re.search(r"ReadSchema:\s*struct<([^>]*)>", plan)
    if not m:
        return []
    return [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]

"""Formula-based score boosting — Qdrant's formula query, as column algebra.

Qdrant's query API can rescore candidates with a user-supplied *formula*
over the retrieval score and payload fields (public docs, "Score boosting"):
arithmetic (``sum``/``mult``/``div``/``neg``/``abs``/``sqrt``/``log10``/
``exp``/``pow``), payload variables, the reserved ``$score`` variable,
filter conditions used as 0/1 indicators, and distance-decay helpers
(``gauss_decay``/``exp_decay``/``lin_decay`` parameterized by ``target``,
``scale``, ``midpoint``). The reference reaches this engine through the
same client it uses for search (/root/reference/QdrantCloud.py:24).

This module compiles that formula JSON into ONE Spark ``Column``, so a
rescore is a narrow projection over the candidate set — JVM-side, no
Python boundary, and at 100 TB it costs nothing beyond the candidate scan
it decorates (the standard shape: ANN retrieves k·oversample candidates,
the formula re-orders them).

Decay semantics (Qdrant's documented forms, all peaking at 1.0 when
``x == target`` and passing ``midpoint`` at ``x = target ± scale``):

- ``lin_decay``:   ``max(0, -(1-m)/s · |x-t| + 1)`` (reaches 0 at
  ``s/(1-m)``)
- ``exp_decay``:   ``exp(ln(m)/s · |x-t|)``
- ``gauss_decay``: ``exp(ln(m)/s² · (x-t)²)``
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectordb_cloud_spark.filters import compile_filter

SCORE_VAR = "$score"
DEFAULT_MIDPOINT = 0.5


def _decay(kind: str, spec: dict[str, Any], resolve) -> Column:
    x = _compile(spec["x"], resolve)
    target = float(spec.get("target", 0.0))
    scale = float(spec.get("scale", 1.0))
    midpoint = float(spec.get("midpoint", DEFAULT_MIDPOINT))
    if not (0.0 < midpoint < 1.0):
        raise ValueError(f"midpoint must be in (0,1), got {midpoint}")
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    lam = math.log(midpoint)
    diff = F.abs(x - F.lit(target))
    if kind == "lin_decay":
        return F.greatest(
            F.lit(0.0), F.lit(-(1.0 - midpoint) / scale) * diff + F.lit(1.0)
        )
    if kind == "exp_decay":
        return F.exp(F.lit(lam / scale) * diff)
    if kind == "gauss_decay":
        return F.exp(F.lit(lam / (scale * scale)) * diff * diff)
    raise ValueError(f"unknown decay {kind!r}")


def _fold(items: list, resolve, op) -> Column:
    cols = [_compile(i, resolve) for i in items]
    if not cols:
        raise ValueError("empty operand list")
    out = cols[0]
    for c in cols[1:]:
        out = op(out, c)
    return out


def _compile(spec: Any, resolve) -> Column:
    if isinstance(spec, (int, float)) and not isinstance(spec, bool):
        return F.lit(float(spec))
    if isinstance(spec, str):
        return resolve(spec)
    if not isinstance(spec, dict):
        raise ValueError(f"unsupported formula node: {spec!r}")
    if len(spec) != 1:
        raise ValueError(f"formula node needs exactly one operator: {spec!r}")
    op, arg = next(iter(spec.items()))
    if op == "sum":
        return _fold(arg, resolve, lambda a, b: a + b)
    if op == "mult":
        return _fold(arg, resolve, lambda a, b: a * b)
    if op == "div":
        left = _compile(arg["left"], resolve)
        right = _compile(arg["right"], resolve)
        if "by_zero_default" in arg:
            # try_divide: NULL on /0 even under ANSI mode, then the default
            return F.coalesce(
                F.try_divide(left, right), F.lit(float(arg["by_zero_default"]))
            )
        return left / right
    if op == "pow":
        return F.pow(_compile(arg["base"], resolve),
                     _compile(arg["exponent"], resolve))
    if op == "neg":
        return -_compile(arg, resolve)
    if op == "abs":
        return F.abs(_compile(arg, resolve))
    if op == "sqrt":
        return F.sqrt(_compile(arg, resolve))
    if op == "log10":
        return F.log10(_compile(arg, resolve))
    if op == "ln":
        return F.log(_compile(arg, resolve))
    if op == "exp":
        return F.exp(_compile(arg, resolve))
    if op in ("lin_decay", "exp_decay", "gauss_decay"):
        return _decay(op, arg, resolve)
    if op == "condition":
        # a Qdrant filter document as a 0/1 indicator term
        pred = compile_filter(arg)
        if pred is None:
            return F.lit(1.0)
        return pred.cast("double")
    raise ValueError(f"unknown formula operator {op!r}")


def compile_formula(
    spec: Any, score_col: str = "score", id_col: str = "id"
) -> Column:
    """Compile a formula document to one numeric ``Column``.

    Strings resolve as variables: ``"$score"`` → the retrieval score
    column, anything else → a (possibly dotted) payload column.
    """

    def resolve(name: str) -> Column:
        if name == SCORE_VAR:
            return F.col(score_col).cast("double")
        c = F.col(name.split(".")[0])
        for part in name.split(".")[1:]:
            c = c.getField(part)
        return c.cast("double")

    return _compile(spec, resolve)


def rescore_with_formula(
    candidates: DataFrame,
    formula: Any,
    k: int | None = None,
    score_col: str = "score",
    id_col: str = "id",
    out_col: str = "new_score",
) -> DataFrame:
    """Re-order a candidate set by a formula — the second stage of the
    retrieve→boost pattern. Narrow projection + TakeOrderedAndProject when
    ``k`` is given; deterministic id tiebreak."""
    scored = candidates.withColumn(
        out_col, compile_formula(formula, score_col=score_col, id_col=id_col)
    )
    ordered = scored.orderBy(F.col(out_col).desc(), F.col(id_col).asc())
    return ordered.limit(k) if k is not None else ordered

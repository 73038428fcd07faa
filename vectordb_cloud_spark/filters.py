"""Qdrant-style filter DSL compiled to Spark ``Column`` expressions.

The reference reaches filtering through the qdrant-client filter models —
``Filter(must=[FieldCondition(key="user_id", match=MatchValue(value=...))])``
(/root/reference/search.py:9,38-44) — i.e. its *real* filter surface is the
full Qdrant filter grammar, of which the reference service exercises only
equality-``must``. This module implements that grammar as a JSON → Column
compiler, so a migrating user can POST the same filter documents they send
to Qdrant today.

Every clause compiles to native Spark column algebra (no Python UDFs):
simple field predicates stay scan-stage and pushdown/pruning-eligible,
boolean structure is ordinary AND/OR/NOT expression trees, and geo
predicates are haversine column math. At 100 TB the filter therefore costs
what the scan costs — Catalyst sees plain predicates, not an opaque filter
function.

Grammar (public Qdrant filter JSON):

- boolean clauses: ``must`` (AND), ``should`` (OR, at least one),
  ``must_not`` (NOT any), ``min_should`` ({"conditions": [...],
  "min_count": n}); clause items may themselves be nested filters.
- field conditions (``{"key": k, ...}``):
  ``match: {value}`` equality · ``match: {any: [...]}`` IN ·
  ``match: {except: [...]}`` NOT IN · ``match: {text}`` token match
  (every lowercased whitespace token must occur in the field) ·
  ``match: {regex}`` (extension, Spark ``rlike``) ·
  ``range: {gt,gte,lt,lte}`` (numeric or datetime-comparable) ·
  ``values_count: {gt,gte,lt,lte}`` over array length ·
  ``geo_radius: {center: {lat,lon}, radius: meters}`` ·
  ``geo_bounding_box: {top_left: {lat,lon}, bottom_right: {lat,lon}}``
  (no antimeridian wrap — documented Qdrant behavior for sane boxes)
- ``is_null: {key}`` · ``is_empty: {key}`` (null, empty array, or empty
  string) · ``has_id: [ids]`` (compiled against ``id_col``)
- ``nested: {key, filter}``: EXISTS over an array-of-struct column — an
  element must satisfy the sub-filter (compiled with keys resolved against
  the array element).

Dotted keys (``payload.meta.site``) resolve through struct fields.
"""

from __future__ import annotations

import math
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mean-Earth radius in meters (IUGG R1), the radius Qdrant's haversine uses.
EARTH_RADIUS_M = 6371008.8

Resolver = Callable[[str], Column]


def int_in_expr(col_name: str, vals) -> Column | None:
    """ONE parsed SQL ``col IN (...)`` predicate over integral literals,
    or None when any value is non-integral (callers fall back to isin /
    joins). ``Column.isin`` marshals every literal through py4j (~0.5 ms
    each — the graph_ann hot-loop measurement); the parsed string is one
    round trip. Shared by has_id compilation, the routed-text /funnel id
    pushdowns (operators.knn.restrict_to_ids), and the beam-search hop
    probes, so the integral-only guard and rendering live in one place."""
    vals = list(vals)
    if not vals or not all(
        isinstance(v, int) and not isinstance(v, bool) for v in vals
    ):
        return None
    return F.expr(
        f"`{col_name}` IN ({','.join(str(int(v)) for v in vals)})")


def _default_resolver(key: str) -> Column:
    c = F.col(key.split(".")[0])
    for part in key.split(".")[1:]:
        c = c.getField(part)
    return c


def haversine_meters(
    lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column
) -> Column:
    """Great-circle distance in meters between two (lat, lon) degree pairs,
    as a pure column expression (codegen-friendly, no Python boundary)."""
    dlat = F.radians(lat_b - lat_a)
    dlon = F.radians(lon_b - lon_a)
    h = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat_a)) * F.cos(F.radians(lat_b)) * F.pow(F.sin(dlon / 2), 2)
    )
    # clamp for float noise at antipodes before asin
    return 2 * EARTH_RADIUS_M * F.asin(F.sqrt(F.least(h, F.lit(1.0))))


def _range_pred(col: Column, spec: dict[str, Any]) -> Column:
    preds = []
    if "gt" in spec:
        preds.append(col > F.lit(spec["gt"]))
    if "gte" in spec:
        preds.append(col >= F.lit(spec["gte"]))
    if "lt" in spec:
        preds.append(col < F.lit(spec["lt"]))
    if "lte" in spec:
        preds.append(col <= F.lit(spec["lte"]))
    if not preds:
        raise ValueError(f"empty range condition: {spec!r}")
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def _match_pred(col: Column, spec: dict[str, Any]) -> Column:
    if "value" in spec:
        return col == F.lit(spec["value"])
    if "any" in spec:
        vals = list(spec["any"])
        if not vals:
            return F.lit(False)
        return col.isin(vals)
    if "except" in spec:
        vals = list(spec["except"])
        if not vals:
            return F.lit(True)
        # Qdrant MatchExcept keeps nulls out too (a missing payload value
        # can't be proven different) — mirror SQL NOT IN semantics minus
        # the null trap by requiring non-null explicitly.
        return col.isNotNull() & ~col.isin(vals)
    if "text" in spec:
        # full-text match on an UNINDEXED field: every query token must
        # occur as a SUBSTRING (the scan-stage extension — Qdrant only
        # defines MatchText on indexed fields). Query tokens derive from
        # the same `word` tokenizer the indexed path uses (lowercase,
        # split on non-alphanumeric, functions.hashing.word_tokens_py) so
        # the two paths share ONE token derivation; only the match
        # semantics differ (substring here, whole-token there).
        from vectordb_cloud_spark.functions.hashing import word_tokens_py

        tokens = word_tokens_py(str(spec["text"]))
        if not tokens:
            # the word tokenizer dropped EVERYTHING (pure punctuation,
            # e.g. "!!!"): fall back to one substring match on the raw
            # query so the clause still selects — lit(True) here would
            # make a must_not exclude every row. A genuinely empty query
            # is vacuously true (zero tokens to require), matching the
            # match.tokens branch below.
            raw = str(spec["text"]).strip().lower()
            if not raw:
                return F.lit(True)
            return F.lower(col).contains(raw)
        pred = F.lower(col).contains(tokens[0])
        for t in tokens[1:]:
            pred = pred & F.lower(col).contains(t)
        return pred
    if "regex" in spec:
        return col.rlike(str(spec["regex"]))
    if "tokens" in spec:
        # WHOLE-TOKEN match (extension): every given token must occur as a
        # complete token of the field under the named tokenizer — the
        # semantics an INDEXED MatchText has (Qdrant tokenizes indexed
        # fields), expressed as a scan predicate. Emitted by the service's
        # query-filter router when a text-indexed match.text clause has too
        # many candidates for a has_id rewrite (api.py); also usable
        # directly. `tokens` are taken as ALREADY tokenized+lowercased.
        from vectordb_cloud_spark.functions.text import word_tokens, words

        tokens = [str(t) for t in spec["tokens"]]
        if not tokens:
            return F.lit(True)
        if spec.get("tokenizer", "word") == "whitespace":
            toks_col = F.transform(words(col), lambda w: F.lower(w))
        else:
            toks_col = word_tokens(col)
        pred = F.array_contains(toks_col, tokens[0])
        for t in tokens[1:]:
            pred = pred & F.array_contains(toks_col, t)
        return pred
    raise ValueError(f"unsupported match condition: {spec!r}")


def _geo_radius_pred(col: Column, spec: dict[str, Any]) -> Column:
    center = spec["center"]
    dist = haversine_meters(
        col.getField("lat"),
        col.getField("lon"),
        F.lit(float(center["lat"])),
        F.lit(float(center["lon"])),
    )
    return dist <= F.lit(float(spec["radius"]))


def _geo_bbox_pred(col: Column, spec: dict[str, Any]) -> Column:
    tl, br = spec["top_left"], spec["bottom_right"]
    lat, lon = col.getField("lat"), col.getField("lon")
    return (
        (lat <= F.lit(float(tl["lat"])))
        & (lat >= F.lit(float(br["lat"])))
        & (lon >= F.lit(float(tl["lon"])))
        & (lon <= F.lit(float(br["lon"])))
    )


def _field_condition(cond: dict[str, Any], resolve: Resolver) -> Column:
    col = resolve(cond["key"])
    preds = []
    if "match" in cond:
        preds.append(_match_pred(col, cond["match"]))
    if "range" in cond:
        preds.append(_range_pred(col, cond["range"]))
    if "datetime_range" in cond:
        preds.append(_range_pred(col.cast("timestamp"),
                                 cond["datetime_range"]))
    if "values_count" in cond:
        preds.append(_range_pred(F.size(col), cond["values_count"]))
    if "geo_radius" in cond:
        preds.append(_geo_radius_pred(col, cond["geo_radius"]))
    if "geo_bounding_box" in cond:
        preds.append(_geo_bbox_pred(col, cond["geo_bounding_box"]))
    if not preds:
        raise ValueError(f"field condition with no predicate: {cond!r}")
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def _condition(cond: dict[str, Any], id_col: str, resolve: Resolver) -> Column:
    if "key" in cond:
        return _field_condition(cond, resolve)
    if "has_id" in cond:
        ids = list(cond["has_id"])
        if not ids:
            return F.lit(False)
        if resolve is _default_resolver and len(ids) > 64:
            # large integral id lists (the text router emits up to 4096)
            # as ONE parsed SQL IN — seconds of py4j marshaling avoided.
            # Only on the default column resolver (nested/element
            # resolvers can't be named in SQL text).
            pred = int_in_expr(id_col, ids)
            if pred is not None:
                return pred
        return resolve(id_col).isin(ids)
    if "is_null" in cond:
        return resolve(_key_of(cond["is_null"])).isNull()
    if "is_empty" in cond:
        col = resolve(_key_of(cond["is_empty"]))
        # null, empty array, or empty string.  The column type is unknown at
        # compile time (resolver-based), so the type-generic probe is the
        # string cast: arrays render as "[...]" in Spark 3+, so an empty
        # array becomes the literal "[]".  (Caveat: a *string* payload whose
        # value is exactly "[]" also matches, and "" counts as empty where
        # Qdrant's IsEmpty would not — an intentional extension of a
        # schema-blind DSL compiler, documented in COVERAGE.md §2.2 and
        # pinned by the test_properties.py fuzz oracle.)
        s = col.try_cast("string")
        return col.isNull() | (s == F.lit("")) | (s == F.lit("[]"))
    if "nested" in cond:
        key = cond["nested"]["key"]
        sub = cond["nested"]["filter"]
        arr = resolve(key)

        def elem_resolver_factory(elem: Column) -> Resolver:
            def r(k: str) -> Column:
                c = elem
                for part in k.split("."):
                    c = c.getField(part)
                return c

            return r

        return F.exists(
            arr,
            lambda elem: compile_filter(
                sub, id_col=id_col, resolver=elem_resolver_factory(elem)
            ),
        )
    if any(k in cond for k in ("must", "should", "must_not", "min_should")):
        return compile_filter(cond, id_col=id_col, resolver=resolve)
    raise ValueError(f"unsupported condition: {cond!r}")


def _key_of(spec: Any) -> str:
    # both {"is_null": {"key": "x"}} and the shorthand {"is_null": "x"}
    return spec["key"] if isinstance(spec, dict) else str(spec)


def _and_all(preds: list[Column]) -> Column:
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def _or_all(preds: list[Column]) -> Column:
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def compile_filter(
    spec: dict[str, Any] | None,
    id_col: str = "id",
    resolver: Resolver | None = None,
) -> Column | None:
    """Compile a Qdrant filter document to one Spark boolean ``Column``.

    Returns ``None`` for an empty/absent filter (match-all), so callers can
    pass the result straight to ``DataFrame.filter`` guards or ``knn_search``
    ``filters=``.
    """
    if not spec:
        return None
    resolve = resolver or _default_resolver
    parts: list[Column] = []
    must = spec.get("must") or []
    if isinstance(must, dict):
        must = [must]
    if must:
        parts.append(_and_all([_condition(c, id_col, resolve) for c in must]))
    should = spec.get("should") or []
    if isinstance(should, dict):
        should = [should]
    if should:
        parts.append(_or_all([_condition(c, id_col, resolve) for c in should]))
    must_not = spec.get("must_not") or []
    if isinstance(must_not, dict):
        must_not = [must_not]
    if must_not:
        # Qdrant semantics: a condition on a missing/null payload field does
        # not MATCH, so must_not must PASS such points.  Without the
        # coalesce, cond=NULL → ~NULL=NULL → filter drops the row.
        parts.append(
            ~_or_all([
                F.coalesce(_condition(c, id_col, resolve), F.lit(False))
                for c in must_not
            ])
        )
    if "min_should" in spec:
        ms = spec["min_should"]
        conds = [
            F.coalesce(_condition(c, id_col, resolve), F.lit(False))
            .cast("int")
            for c in ms["conditions"]
        ]
        total = conds[0]
        for c in conds[1:]:
            total = total + c
        parts.append(total >= F.lit(int(ms["min_count"])))
    if not parts:
        raise ValueError(f"filter with no recognized clause: {spec!r}")
    return _and_all(parts)


def geo_distance_meters_to(
    col: Column, lat: float, lon: float
) -> Column:
    """Distance column from a geo-struct column to a fixed point — the
    ordering key for geo-sorted results next to a ``geo_radius`` filter."""
    if math.isnan(lat) or math.isnan(lon):
        raise ValueError("query point must be finite")
    return haversine_meters(
        col.getField("lat"), col.getField("lon"),
        F.lit(float(lat)), F.lit(float(lon)),
    )

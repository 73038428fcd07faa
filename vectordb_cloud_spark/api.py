"""Service layer: the reference's six endpoints as engine calls.

Maps the FastAPI contract (/root/reference/app.py) 1:1 onto the Spark
operators, preserving observable semantics — including the 1/0 success
codes and the mandatory tenant filter — while fixing the documented
reference bugs (SURVEY.md §2.7 D2: the scroll mis-unpack that made
/remove_all_by_word always return 0; we implement the intended delete).

Batch-of-1 inserts are pathological on Spark; a real deployment micro-batches
via Structured Streaming (see streaming/ingest.py). This layer keeps the
per-request API for parity and tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_cloud_spark.collections import CollectionCatalog
from vectordb_cloud_spark.filters import compile_filter
from vectordb_cloud_spark.functions.embedding import DEFAULT_DIM, mock_embed, mock_vector
from vectordb_cloud_spark.operators.classify import classify_title
from vectordb_cloud_spark.operators.knn import knn_search, search_response
from vectordb_cloud_spark.session import local_df


class VectorService:
    """One prod collection, multi-tenant via user_id filter — the
    reference's deployment shape (/root/reference/QdrantCloud.py:24,
    README.md:22)."""

    def __init__(self, spark: SparkSession, catalog_root: str,
                 index_name: str = "EverGrowingVDB", dim: int = DEFAULT_DIM,
                 quantization: dict | None = None,
                 ann_index: dict | None = None,
                 disable_callsite_capture: bool = True):
        self.spark = spark
        self.catalog = CollectionCatalog(spark, catalog_root)
        self.index_name = index_name
        self.dim = dim
        self.catalog.create(index_name, dim, quantization=quantization,
                            ann_index=ann_index)
        # Compiled-plan memo for /search (VERDICT r9 #4): key includes the
        # IMMUTABLE data.v{N} dir (every write publishes a new one, so a
        # version advance naturally invalidates), the tenant, the filter
        # document, k, and the query vector. A repeat request re-collects
        # the SAME DataFrame — zero plan re-construction (the measured
        # r9/r10 serving cost was driver-side py4j plan building, not
        # execution). LRU-bounded; DataFrames are lazy plans (a few KB),
        # not cached data.
        from collections import OrderedDict
        self._plan_memo: OrderedDict[tuple, DataFrame] = OrderedDict()
        self._PLAN_MEMO_CAP = 512
        # Shape-keyed serving-template memo (VERDICT r10 wrong#1): the
        # plan memo above only hits on EXACT-repeat requests (the query
        # vector is part of its key), so every distinct query text used
        # to pay the full serving construction — catalog meta reads,
        # tenant read, text-clause routing, filter-DSL compile, and four
        # eagerly-analyzed DataFrame ops — ~156 ms of driver work (r10
        # PLANS.md split). The shape memo keys on everything EXCEPT the
        # vector: the vector-independent candidate frame (tenant-pruned +
        # routed + filtered + projected) registers once per shape as a
        # temp view, and a distinct-text request costs ONE spark.sql()
        # whose only per-request piece is the query vector as a
        # `from_json('<json>', 'array<double>')` constant — one string
        # literal in the tree instead of 64 literal nodes (analysis walks
        # it once; ConstantFolding folds it out of the physical plan, so
        # execution is identical to the literal-array form — bit-equality
        # pinned in test_api). Measured ~12 ms p50 vs 156 ms, with the
        # same invalidation as the plan memo: the immutable data.v dir +
        # incarnation stamp ride in the key.
        self._shape_memo: OrderedDict[tuple, tuple[str, str]] = OrderedDict()
        self._SHAPE_MEMO_CAP = 128
        self._shape_seq = 0
        # observability: how often requests were served WITHOUT plan
        # construction (exact-repeat plan-memo hits vs distinct-text
        # shape-template hits) — asserted by the oracle rows and tests,
        # readable in production
        self._plan_hits = 0
        self._shape_hits = 0
        # Serving sessions should not pay PySpark's per-op call-site
        # capture (SPARK-47274: 3-4 extra py4j round trips on every
        # DataFrame method, ~3 ms each — it alone turns the ~4 ms
        # distinct-text tail into ~40 ms). session.get_spark() disables it
        # at build time; when the service is handed a session that was
        # built elsewhere, set the conf AND drop pyspark's
        # read-once cache so it takes effect (best-effort — private attr,
        # guarded for forward compatibility). NOTE: the fallback flip is
        # PROCESS-GLOBAL (pyspark caches the flag once per process), so an
        # application that wants call-site capture kept for its other
        # DataFrame code must construct the service with
        # ``disable_callsite_capture=False`` — instantiation must not
        # silently change global behavior for hosts that opted out.
        if not disable_callsite_capture:
            return
        try:
            try:
                # static conf: settable only at session build
                # (session.get_spark does); raises on a live session
                spark.conf.set(
                    "spark.python.sql.dataFrameDebugging.enabled", "false")
            except Exception:
                pass
            if (spark.conf.get(
                    "spark.python.sql.dataFrameDebugging.enabled",
                    "true").lower() == "false"):
                import pyspark.errors.utils as _peu

                _peu._enable_debugging_cache = None  # re-read the conf
            else:
                # the session was built without the conf and it's static —
                # flip pyspark's read-once gate directly (private attr,
                # guarded; the capture is a debug aid, not a semantic)
                import pyspark.errors.utils as _peu

                _peu._enable_debugging_cache = False
        except Exception:  # pragma: no cover - forward-compat guard
            pass

    # GET /insert (/root/reference/app.py:36-55)
    def insert(self, id: int, user_id: int, text: str, site: str = "", lang: str = "") -> int:
        try:
            df = self.spark.createDataFrame(
                [(id, id, text, user_id, site, lang)],
                "id long, text_id long, text string, user_id long, site string, lang string",
            ).withColumn("embedding", mock_embed("text", self.dim))
            self.catalog.upsert(self.index_name, df)
            return 1
        except Exception:
            return 0  # reference bare-except contract (/root/reference/app.py:53-55)

    def insert_batch(self, rows: list[dict]) -> int:
        """Micro-batched ingest — the Spark-appropriate write path (one MERGE
        for N requests instead of N table rewrites; SURVEY.md §3.2). Returns
        the number of rows upserted."""
        from vectordb_cloud_spark.sources.readers import read_insert_requests

        df = read_insert_requests(self.spark, rows).withColumn(
            "embedding", mock_embed("text", self.dim)
        )
        self.catalog.upsert(self.index_name, df)
        return len(rows)

    # GET /search (/root/reference/app.py:58-75)
    def search(self, user_id: int, text: str, limit: int = 5,
               site: str | None = None, lang: str | None = None,
               query_filter: dict | None = None,
               exact: bool = True) -> DataFrame:
        """``query_filter`` accepts the full Qdrant filter JSON the
        reference's client library speaks (/root/reference/search.py:9,
        38-44 builds exactly such a document) — compiled to scan-stage
        column predicates by :mod:`vectordb_cloud_spark.filters`.

        ``exact=False`` (Qdrant ``params: {"exact": false}``) routes
        through the collection's quantized codes sidecar when a
        quantization_config is set (``CollectionCatalog.search_quantized``);
        with no config it silently stays exact, as in Qdrant."""
        import json as _json
        import struct as _struct

        qvec = mock_vector(text, self.dim)
        # plan memo probe: everything downstream is a deterministic function
        # of (data version, tenant, predicates, k, qvec) — including the
        # text-index routing and ANN/quantized sidecar paths, whose sidecars
        # are keyed by the same version
        meta0 = self._safe_meta()
        data_dir = self.catalog._current_data_dir(self.index_name, meta=meta0)
        memo_key = None
        stamp = self._memo_stamp(data_dir, meta0)
        if stamp is not None:
            try:
                # type-tagged serialization: default=str would collide a
                # datetime with its equal string form under one key while
                # compile_filter builds differently-typed literals
                filt_key = (_json.dumps(
                    query_filter, sort_keys=True,
                    default=lambda o: f"__{type(o).__name__}__:{o}")
                    if query_filter else None)
            except (TypeError, ValueError):
                # non-serializable filter document: skip BOTH memo probes
                # (memo_key stays None) but serve the request normally
                pass
            else:
                memo_key = (
                    data_dir, stamp, user_id, limit, site, lang,
                    bool(exact), filt_key,
                    _struct.pack(f"{len(qvec)}d",
                                 *[float(x) for x in qvec]),
                )
        if memo_key is not None:
            hit = self._plan_memo.get(memo_key)
            if hit is not None:
                self._plan_memo.move_to_end(memo_key)
                self._plan_hits += 1
                return hit
            # distinct-text fast path: the candidate view + SQL template
            # for this SHAPE (everything but the vector) is already built
            # — skip the catalog reads, routing, filter compile, and all
            # but one py4j call
            df = self._serve_from_shape(memo_key[:8], qvec)
            if df is not None:
                self._shape_hits += 1
                return self._memo_plan(memo_key, df)
        # tenant-pruned scan: user_id predicate + derived partition-bucket
        # predicate (PartitionFilters prune files, search.py:37 semantics)
        points = self.catalog.read_for_user(self.index_name, user_id)
        # match.text clauses on text-INDEXED fields route through the
        # postings sidecar (whole-token semantics, Qdrant's indexed
        # MatchText); the residual filter stays scan-stage
        cand_ids, query_filter = self.catalog.route_text_clauses(
            self.index_name, query_filter)
        if cand_ids is not None:
            # small candidate sets push down as an id IN predicate (row-
            # group pruning on the id-sorted buckets); large ones stay a
            # broadcast left-semi join (collections.restrict_to_ids)
            points = self.catalog.restrict_to_ids(points, cand_ids)
        pred = None
        if site is not None:  # optional predicates (search.py:38-41)
            pred = F.col("site") == F.lit(site)
        if lang is not None:
            lang_pred = F.col("lang") == F.lit(lang)
            pred = lang_pred if pred is None else pred & lang_pred
        extra = compile_filter(query_filter, id_col="id")
        if extra is not None:
            pred = extra if pred is None else pred & extra
        meta = (meta0 or self.catalog.meta(self.index_name)
                ) if not exact else None
        if (meta is not None and (meta.ann_index or meta.quantization)
                and cand_ids is None  # text-routed searches go exact over
                # the (small) candidate set — the filtered-ANN fallback
                and self.catalog._has_data(self.index_name)):
            # empty collection falls through to the exact path below, which
            # returns the reference's [] instead of a build error
            qpred = F.col("user_id") == F.lit(user_id)
            if pred is not None:
                qpred = qpred & pred
            if meta.ann_index:  # index for candidates beats codes-only scan
                hits = self.catalog.search_ann(
                    self.index_name, qvec, k=limit, predicate=qpred)
            else:
                hits = self.catalog.search_quantized(
                    self.index_name, qvec, k=limit, predicate=qpred)
            # re-attach the payload for the response shape: the hit set is
            # k rows, so it broadcasts into one pruned base probe
            payload = self.catalog.read_for_user(
                self.index_name, user_id).select("id", "text_id", "text")
            hits = (
                payload.join(F.broadcast(hits), "id")
                .orderBy(F.col("dist").asc(), F.col("id").asc())
            )
            return self._memo_plan(memo_key, search_response(hits))
        # plain exact path: remember this SHAPE's candidate frame (the
        # vector-independent prefix of the plan — tenant read, routed
        # candidate restriction, compiled predicates, response-column
        # projection) as a temp view + SQL template so the NEXT
        # distinct-text request with the same shape skips construction
        # entirely. Filter-before-projection keeps the view row-equal to
        # knn_search(points, filters=pred).
        if memo_key is not None:
            cand = points if pred is None else points.filter(pred)
            need = {"id", "text_id", "text", "embedding"}
            if need <= set(cand.columns):
                self._store_shape(memo_key[:8], cand.select(
                    "id", "text_id", "text", "embedding"), limit)
        hits = knn_search(points, qvec, k=limit, filters=pred, tiebreak="id")
        return self._memo_plan(memo_key, search_response(hits))

    # The distance expression is the EXACT SQL twin of
    # functions.vector.l2_distance_to (same zip_with/aggregate fold, same
    # casts) and the order/limit/projection mirror knn_search(tiebreak=
    # "id") + search_response, so the templated path is bit-equal to the
    # built path — parity-pinned in test_api.py. The vector rides as ONE
    # from_json string constant (see _shape_memo comment above).
    # The point id is carried as __pid so the outer ORDER BY cannot
    # capture the `text_id AS id` OUTPUT alias (Spark resolves sort
    # references against the projection's aliases first) — the tiebreak
    # must be the POINT id, exactly like the built path, even for rows
    # where text_id != id. `dist`/`__pid` are not output names, so both
    # resolve to the child attributes (Spark adds missing sort columns
    # and prunes them after the sort).
    _SHAPE_SQL = """
    SELECT text_id AS id, text AS string, dist AS score
    FROM (
      SELECT text_id, text, id AS __pid,
             SQRT(aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>),
                  from_json('{{qjson}}', 'array<double>'),
                  (x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE),
                  (acc, v) -> acc + v)) AS dist
      FROM {view}
    )
    ORDER BY dist ASC, __pid ASC
    LIMIT {k}
    """

    def _store_shape(self, shape_key: tuple, cand: DataFrame,
                     k: int) -> None:
        self._register_shape(
            shape_key, cand, self._SHAPE_SQL.replace("{k}", str(int(k))))

    def _register_shape(self, shape_key: tuple, cand: DataFrame,
                        sql_template: str) -> None:
        """Register ``cand`` as this shape's temp view and memoize the
        per-request SQL (only ``{view}`` is formatted here; the
        ``{qjson}`` slot survives for ``_serve_from_shape`` to bind each
        request's vector). Shared by the /search and /query templates —
        one LRU, one eviction policy, superseded/evicted views dropped
        rather than leaked in the session catalog."""
        prior = self._shape_memo.get(shape_key)
        if prior is not None:
            # re-store of a live shape (a non-finite-vector request falls
            # through the fast path to here) — drop the superseded view
            try:
                self.spark.catalog.dropTempView(prior[0])
            except Exception:  # pragma: no cover - already dropped
                pass
        view = f"vdb_search_shape_{id(self):x}_{self._shape_seq}"
        self._shape_seq += 1
        cand.createOrReplaceTempView(view)
        self._shape_memo[shape_key] = (view, sql_template.format(view=view))
        while len(self._shape_memo) > self._SHAPE_MEMO_CAP:
            _, (old_view, _) = self._shape_memo.popitem(last=False)
            try:
                self.spark.catalog.dropTempView(old_view)
            except Exception:  # pragma: no cover - already dropped
                pass

    # /query twin of _SHAPE_SQL for the TEMPLATE-ELIGIBLE subset: a plain
    # dense kNN body (vector or {"text":...} query + filter/limit/offset/
    # using/response selectors — the high-QPS production shape; prefetch/
    # fusion/group_by/recommend/... keep full construction). The view
    # holds the tenant read filtered by the REWRITTEN filter document
    # (rewrite_text_filter is deterministic per data version, which rides
    # in the shape key), so a distinct-text /query costs one spark.sql
    # exactly like /search. Mirrors query_points' plain dense leg:
    # knn_search(metric='l2', tiebreak='id') + offset paging + the
    # _select_response projection ({keep} is baked at store time).
    _QSHAPE_SQL = """
    SELECT {keep}
    FROM (
      SELECT *, SQRT(aggregate(zip_with(CAST({vcol} AS ARRAY<DOUBLE>),
           from_json('{{qjson}}', 'array<double>'),
           (x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE),
           (acc, v) -> acc + v)) AS dist
      FROM {view}
    )
    {where}ORDER BY dist ASC, id ASC
    LIMIT {k}{off}
    """

    _QSHAPE_KEYS = frozenset({"query", "filter", "limit", "offset",
                              "using", "with_payload", "with_vectors",
                              "score_threshold"})

    def _query_dense_vec(self, body: dict):
        """The embedded query vector of a template-eligible /query body,
        else None (any other grammar branch, or a non-dense query)."""
        if (not isinstance(body, dict) or set(body) - self._QSHAPE_KEYS
                or "query" not in body):
            return None
        q = body["query"]
        if isinstance(q, dict) and set(q) == {"nearest"}:
            # the explicit NearestQuery spelling of the same plain dense
            # body shares the template (an "mmr" sibling — or any other
            # key — keeps full construction); scalar ids stay cold too
            q = q["nearest"]
        if isinstance(q, dict) and set(q) == {"text"}:
            return mock_vector(q["text"], self.dim)
        if (isinstance(q, (list, tuple)) and q
                and not isinstance(q[0], (list, tuple, dict))):
            try:
                return [float(x) for x in q]
            except (TypeError, ValueError):
                return None
        return None

    def _query_shape_key(self, data_dir, stamp, user_id,
                         body: dict) -> tuple | None:
        """Everything about a template-eligible /query body EXCEPT the
        query vector — the /query analog of the /search shape key.
        Returns None for any slot value outside the canonical forms (the
        body keeps full construction): selector/using forms must be
        EXACT — a lax coercion here would collide distinct shapes under
        one key (e.g. an object-form with_payload hashing like True) or
        put unhashables in the key, and coercions must match the built
        path exactly so a malformed body fails identically whether the
        shape is warm or cold (offset=None must 422 both times)."""
        import json as _json
        import math

        using = body.get("using")
        if using is not None and not isinstance(using, str):
            return None
        wp = body.get("with_payload", True)
        if isinstance(wp, (list, tuple)):
            if not all(isinstance(c, str) for c in wp):
                return None
            wp_key = tuple(wp)
        elif isinstance(wp, bool):
            wp_key = wp
        else:
            return None  # object/other forms: full construction decides
        wv = body.get("with_vectors", False)
        if not isinstance(wv, bool):
            return None
        try:
            filt_key = (_json.dumps(body.get("filter"), sort_keys=True)
                        if body.get("filter") else None)
            # same coercions as the built path (query() / query_points):
            # a value int() rejects must raise identically when warm
            k = int(body.get("limit", 10))
            off = int(body.get("offset", 0))
            thr = body.get("score_threshold")
            thr = None if thr is None else float(thr)
            if thr is not None and not math.isfinite(thr):
                return None  # not renderable as a SQL literal
        except (TypeError, ValueError):
            return None
        return ("qshape", data_dir, stamp, user_id, using,
                filt_key, k, off, wp_key, wv, thr)

    def _serve_from_shape(self, shape_key: tuple, qvec) -> DataFrame | None:
        import json as _json
        import math

        memo = self._shape_memo.get(shape_key)
        if memo is None:
            return None
        vals = [float(v) for v in qvec]
        if not vals or not all(map(math.isfinite, vals)):
            return None  # not JSON-expressible; the built path handles it
        self._shape_memo.move_to_end(shape_key)
        _, sql = memo
        try:
            return self.spark.sql(sql.replace("{qjson}", _json.dumps(vals)))
        except Exception:
            # the temp view is gone (e.g. the host called
            # spark.catalog.clearTempViews or dropped it by name): evict
            # the stale shape and let the caller rebuild + re-store —
            # a robustness fallback, never the expected path
            self._shape_memo.pop(shape_key, None)
            return None

    def _safe_meta(self, name: str | None = None):
        """One ``_meta.json`` read, or None when unreadable (collection
        missing / concurrently dropped / malformed) — memo callers skip
        the memo on None instead of raising off the serving path."""
        try:
            return self.catalog.meta(name or self.index_name)
        except (OSError, TypeError, ValueError):
            return None

    def close(self) -> None:
        """Drop this service's shape-template temp views from the session
        catalog and clear both memos. Optional hygiene for hosts that
        build many short-lived services on one long-lived SparkSession —
        eviction already bounds the view count (_SHAPE_MEMO_CAP), but a
        dropped service's views would otherwise linger until the session
        ends. Idempotent; the service keeps working after close() (the
        next request simply rebuilds its shape)."""
        while self._shape_memo:
            _, (view, _) = self._shape_memo.popitem(last=False)
            try:
                self.spark.catalog.dropTempView(view)
            except Exception:  # pragma: no cover - already dropped
                pass
        self._plan_memo.clear()

    def _incarnation(self, name: str, data_dir: str | None, meta=None):
        """Which INCARNATION of a collection name a data dir belongs to:
        the creation nonce persisted in ``_meta.json`` (drop+recreate
        restarts the version counter, so a recurring ``data.v1`` path must
        not hit the old incarnation's cached file listing). Legacy
        catalogs without a nonce fall back to the dir's inode — best
        effort only (inodes recycle; meaningless on object-store mounts),
        which is exactly why create() now persists a nonce. Returns None
        when unstampable — caller skips the memo. ``meta`` lets hot-path
        callers reuse an already-read CollectionMeta instead of paying
        another disk read per request."""
        import os as _os

        if meta is None:
            meta = self._safe_meta(name)
        if meta is None:
            return None
        if meta.nonce is not None:
            return meta.nonce
        if data_dir is None:
            return None
        try:
            return _os.stat(data_dir).st_ino
        except OSError:
            return None

    def _memo_stamp(self, data_dir: str | None, meta=None):
        """Memo-key components beyond the path of the current data version:
        the collection's incarnation (see ``_incarnation``) and the
        payload-index declaration state (create/drop_payload_index changes
        match.text ROUTING semantics without any data rewrite). Returns
        None when unstampable — caller skips the memo. Pass the request's
        already-read ``meta`` so the hot serving path pays ONE meta read
        (nonce and payload_indexes live on the same CollectionMeta)."""
        if data_dir is None:
            return None
        if meta is None:
            meta = self._safe_meta()
        if meta is None:
            return None
        inc = self._incarnation(self.index_name, data_dir, meta=meta)
        if inc is None:
            return None
        return (inc, tuple(sorted((meta.payload_indexes or {}).items())))

    def _memo_plan(self, key, df: DataFrame) -> DataFrame:
        if key is not None:
            self._plan_memo[key] = df
            while len(self._plan_memo) > self._PLAN_MEMO_CAP:
                self._plan_memo.popitem(last=False)
        return df

    # GET /remove_by_user (/root/reference/app.py:78-91)
    def remove_by_user(self, user_id: int) -> int:
        try:
            self.catalog.delete_where(self.index_name, F.col("user_id") == F.lit(user_id))
            return 1
        except Exception:
            return 0

    # GET /remove_all_by_word — intended semantics (/root/reference/app.py:94-117)
    def remove_all_by_word(self, user_id: int, word: str) -> int:
        try:
            self.catalog.delete_where(
                self.index_name,
                (F.col("user_id") == F.lit(user_id)) & F.col("text").contains(word),
            )
            return 1
        except Exception:
            return 0

    # GET /remove_all_by_regex (/root/reference/app.py:120-143)
    def remove_all_by_regex(self, user_id: int, regex: str) -> int:
        try:
            self.catalog.delete_where(
                self.index_name,
                (F.col("user_id") == F.lit(user_id)) & F.col("text").rlike(regex),
            )
            return 1
        except Exception:
            return 0

    # GET /get_category_for_title (/root/reference/app.py:146-169)
    def get_category_for_title(self, user_id: int, cats: str, title: str) -> str:
        return classify_title(self.spark, user_id, cats, title, self.dim)

    # Qdrant-surface extensions the reference reaches through its client:
    # /points/count (tenant-scoped filtered count, a pruned scan) and
    # /points/payload set_payload (tenant-scoped field update; vectors/ids
    # refused by the catalog — vectors go through insert/upsert).
    def sample(self, user_id: int, n: int, seed: int = 42) -> DataFrame:
        """Qdrant random-sampling query (``query: {"sample": "random"}``),
        tenant-scoped and deterministic per seed."""
        from vectordb_cloud_spark.sources.readers import random_sample

        return random_sample(
            self.catalog.read_for_user(self.index_name, user_id), n,
            seed=seed, id_col="id",
        )

    def count(self, user_id: int, word: str | None = None,
              query_filter: dict | None = None) -> int:
        pred = F.col("user_id") == F.lit(user_id)
        if word is not None:
            pred = pred & F.col("text").contains(word)
        extra = compile_filter(query_filter, id_col="id")
        if extra is not None:
            pred = pred & extra
        return self.catalog.count_where(self.index_name, pred)

    def set_payload(self, user_id: int, values: dict,
                    word: str | None = None) -> int:
        pred = F.col("user_id") == F.lit(user_id)
        if word is not None:
            pred = pred & F.col("text").contains(word)
        return self.catalog.update_payload(self.index_name, values, pred)

    def facet(self, user_id: int, key: str, limit: int = 20,
              query_filter: dict | None = None) -> dict:
        """Qdrant POST /collections/{c}/facet: value counts of one payload
        field under the tenant scope (+ optional filter DSL), served by the
        one-pass facet_counts operator."""
        from vectordb_cloud_spark.operators.knn import facet_counts

        points = self.catalog.read_for_user(self.index_name, user_id)
        pred = compile_filter(query_filter, id_col="id")
        rows = facet_counts(points, [key], filters=pred,
                            max_values_per_facet=limit).collect()
        return {"hits": [{"value": r["value"], "count": r["n"]}
                         for r in rows]}

    def search_matrix_pairs(self, user_id: int, sample: int = 10,
                            limit: int = 3,
                            query_filter: dict | None = None) -> dict:
        """Qdrant POST /collections/{c}/points/search/matrix/pairs,
        tenant-scoped: sample `sample` points under the filter, return
        each sample's `limit` nearest other samples as pair records
        (the API behind payload-similarity exploration UIs). The
        quadratic stays sample-local — sample² pairs, never corpus²."""
        from vectordb_cloud_spark.operators.knn import distance_matrix_pairs

        points = self.catalog.read_for_user(self.index_name, user_id)
        pred = compile_filter(query_filter, id_col="id")
        rows = distance_matrix_pairs(
            points, sample_size=sample, k=limit, vector_col="embedding",
            id_col="id", filters=pred,
        ).collect()
        return {"pairs": [{"a": r["id_a"], "b": r["id_b"],
                           "score": float(r["dist"])} for r in rows]}

    def search_matrix_offsets(self, user_id: int, sample: int = 10,
                              limit: int = 3,
                              query_filter: dict | None = None) -> dict:
        """Qdrant POST /collections/{c}/points/search/matrix/offsets —
        the same sampled computation in the CSR-style envelope (r13)."""
        from vectordb_cloud_spark.operators.knn import (
            distance_matrix_offsets,
        )

        points = self.catalog.read_for_user(self.index_name, user_id)
        pred = compile_filter(query_filter, id_col="id")
        return distance_matrix_offsets(
            points, sample_size=sample, k=limit, vector_col="embedding",
            id_col="id", filters=pred)

    def query(self, user_id: int, body: dict) -> list[dict]:
        """Qdrant POST /points/query, tenant-scoped: the universal query
        API (vector / sparse / multivector / fusion / recommend / discover
        / sample / scroll, with recursive ``prefetch`` funnels, plus
        ``score_threshold`` on the scored branches) over the
        tenant-pruned collection read. ``body`` is the Qdrant request
        document; a ``{"text": ...}`` TOP-LEVEL or PREFETCH query (at any
        nesting depth) embeds through the service's embedder (the
        reference's text-in/ids-out shape); recommend/discover documents
        take point ids / raw vectors, as in the operators. Returns
        JSON-ready hit dicts with vector columns dropped (Qdrant returns
        vectors only on request)."""
        import json as _json

        from vectordb_cloud_spark.query_api import query_points

        # compiled-plan memo, the /search pattern: everything downstream is
        # a deterministic function of (data versions, tenant, body) — the
        # RAW body keys the memo (text embedding + filter rewrite are
        # deterministic), lookup collections' immutable data dirs ride in
        # the key so their writes invalidate too. A repeat body skips the
        # whole construction, including the filter-rewrite postings probe.
        memo_key = None
        meta0 = self._safe_meta()
        data_dir = self.catalog._current_data_dir(self.index_name, meta=meta0)
        stamp = self._memo_stamp(data_dir, meta0)
        if stamp is not None:
            try:
                body_key = _json.dumps(body, sort_keys=True, default=None)
            except (TypeError, ValueError):
                body_key = None  # non-JSON body (e.g. a DataFrame) — no memo
            if body_key is not None:
                extra = []
                for slot in ("with_lookup", "lookup_from"):
                    v = body.get(slot)
                    if v:
                        try:
                            name = self.catalog.resolve(
                                str(v["collection"])
                                if isinstance(v, dict) else str(v))
                            ldir = self.catalog._current_data_dir(name)
                            # incarnation rides with the path: a lookup
                            # collection dropped+recreated reuses data.v1,
                            # and serving its OLD memoized plan would read
                            # deleted part files (ADVICE r10, the same
                            # hazard _memo_stamp closes for the primary)
                            linc = self._incarnation(name, ldir)
                            if linc is None:
                                extra = None
                                break
                            extra.append((ldir, linc))
                        except (KeyError, FileNotFoundError, ValueError):
                            extra = None  # malformed/unknown: no memo;
                            break         # execution raises its own error
                if extra is not None:
                    memo_key = ("query", data_dir, stamp, user_id,
                                body_key, tuple(extra))
        qshape_key = None
        if memo_key is not None:
            hit = self._plan_memo.get(memo_key)
            if hit is not None:
                self._plan_memo.move_to_end(memo_key)
                self._plan_hits += 1
                return [r.asDict(recursive=True) for r in hit.collect()]
            # distinct-text fast path (the /search shape template, on
            # /query's plain dense subset): a body differing only in its
            # query vector/text reuses this shape's candidate view + SQL.
            # A body carrying params:{exact:true} (or empty params) is
            # exact-path identical to one without params — THIS engine's
            # no-params default is an exact scan, so strip it before the
            # shape checks, keying the shape on the NORMALIZED body.
            # NOTE: Qdrant's own SearchParams default is exact=FALSE
            # (ANN); {"exact": false} must NOT join this benign set — it
            # requests ANN routing and keeps the full path (ADVICE r11/r12)
            tbody = body
            qp0 = body.get("params")
            if "params" in body and qp0 in (None, {}, {"exact": True}):
                tbody = {k: v for k, v in body.items() if k != "params"}
            qvec = self._query_dense_vec(tbody)
            if qvec is not None:
                qshape_key = self._query_shape_key(
                    data_dir, stamp, user_id, tbody)
            if qshape_key is not None:
                df = self._serve_from_shape(qshape_key, qvec)
                if df is not None:
                    self._shape_hits += 1
                    self._memo_plan(memo_key, df)
                    return [r.asDict(recursive=True) for r in df.collect()]

        # Qdrant params.exact=false: a plain dense body routes through the
        # collection's ANN/quantized sidecar, exactly like /search's
        # exact=False (with no sidecar configured it silently stays exact,
        # as in Qdrant). Non-plain bodies (prefetch/fusion/sparse/...)
        # keep the exact grammar path — Qdrant applies params per vector
        # leg; here the universal endpoint supports the high-QPS plain
        # shape, the one the sidecars exist for.
        qparams = body.get("params")
        if (isinstance(qparams, dict)
                and qparams.get("exact", True) is False):
            served = self._query_ann(user_id, body, memo_key)
            if served is not None:
                return served

        def _embed_text(q):
            if isinstance(q, dict) and set(q) == {"text"}:
                return mock_vector(q["text"], self.dim)
            if (isinstance(q, dict) and "nearest" in q
                    and isinstance(q["nearest"], dict)
                    and set(q["nearest"]) == {"text"}):
                # the explicit NearestQuery form embeds its text too (the
                # mmr sibling, if any, rides through untouched)
                return dict(q, nearest=mock_vector(q["nearest"]["text"],
                                                   self.dim))
            return q

        def _translate(spec: dict) -> dict:
            out = dict(spec)
            if "query" in out:
                out["query"] = _embed_text(out["query"])
            if out.get("filter"):
                # text-INDEXED match.text clauses keep their whole-token
                # index semantics on /query too (no indexed-vs-unindexed
                # behavior flip between endpoints): routed clauses rewrite
                # to has_id (postings-served) or match.tokens filter-DSL
                # equivalents, which thread through fusion/prefetch filter
                # semantics unchanged (collections.rewrite_text_filter)
                out["filter"] = self.catalog.rewrite_text_filter(
                    self.index_name, out["filter"])
            inner = out.get("prefetch")
            if inner:
                inner = [inner] if isinstance(inner, dict) else list(inner)
                out["prefetch"] = [_translate(s) for s in inner]
            return out

        body = _translate(dict(body))
        if int(body.get("limit", 10)) < 0:
            # client error, not a raw Spark INVALID_LIMIT AnalysisException
            # (and the HTTP layer maps ValueError to the 422 envelope);
            # query_batch's shared-scan path dispatches k<0 here too, so
            # batch and per-request agree on degenerate input (ADVICE r13)
            raise ValueError("limit must be non-negative")
        points = self.catalog.read_for_user(self.index_name, user_id)
        lookup = None
        if body.get("with_lookup"):
            # Qdrant group-by lookup: another collection's name — bare
            # string or the object form {"collection": name} (same grammar
            # as lookup_from); its point ids are the group values
            wl = body["with_lookup"]
            lookup = self.catalog.read(
                str(wl["collection"]) if isinstance(wl, dict) else str(wl))
        example_src = None
        if body.get("lookup_from"):
            # Qdrant recommend lookup_from: {"collection": name} or a bare
            # name — example ids resolve against that collection
            lf = body["lookup_from"]
            name = lf["collection"] if isinstance(lf, dict) else str(lf)
            example_src = self.catalog.read(name)
        hits = query_points(
            points, body.get("query"), prefetch=body.get("prefetch"),
            using=body.get("using"), query_filter=body.get("filter"),
            limit=int(body.get("limit", 10)), id_col="id",
            group_by=body.get("group_by"),
            group_size=int(body.get("group_size", 3)),
            with_lookup=lookup,
            lookup_id_col="id" if lookup is not None else None,
            order_by=body.get("order_by"),
            offset=int(body.get("offset", 0)),
            lookup_from=example_src,
            score_threshold=body.get("score_threshold"),
        )
        keep = self._select_response(
            hits.columns,
            with_vectors=bool(body.get("with_vectors", False)),
            with_payload=body.get("with_payload", True),
        )
        shaped = hits.select(*keep)
        if qshape_key is not None and "dist" not in points.columns:
            # remember this shape's candidate frame (tenant read + the
            # REWRITTEN filter — body was _translate()d above) + rendered
            # SQL so the next distinct-text body with the same shape skips
            # construction. `dist` as a stored payload column would
            # collide with the computed column — such schemas (unseen in
            # practice) just keep full construction.
            from vectordb_cloud_spark.query_api import _vector_col

            vcol = _vector_col(body.get("using"))
            # column names containing braces would break the {view}
            # .format in _register_shape and backticks would break the
            # rendered SQL — such schemas (unseen in practice) keep full
            # construction rather than 500 on the store path
            safe = not any(ch in c for c in [*keep, vcol]
                           for ch in "{}`")
            if vcol in points.columns and "id" in points.columns and safe:
                flt = compile_filter(body.get("filter"), id_col="id")
                cand = points if flt is None else points.filter(flt)
                off = int(body.get("offset", 0))
                thr = body.get("score_threshold")
                sql = (
                    self._QSHAPE_SQL
                    .replace("{keep}", ", ".join(f"`{c}`" for c in keep))
                    .replace("{vcol}", f"`{vcol}`")
                    .replace("{k}", str(int(body.get("limit", 10))))
                    .replace("{off}", f" OFFSET {off}" if off else "")
                    # l2 distances rank ascending: threshold keeps <= t
                    .replace("{where}",
                             f"WHERE dist <= {float(thr)!r}D\n    "
                             if thr is not None else "")
                )
                self._register_shape(qshape_key, cand, sql)
        self._memo_plan(memo_key, shaped)
        return [r.asDict(recursive=True) for r in shaped.collect()]

    # response-shaping: Qdrant's with_payload / with_vectors selectors.
    # id + score/rank columns always ride; payload columns follow
    # with_payload (True = all, False = none, list = those fields);
    # vector columns only when with_vectors.
    _SCORE_COLS = frozenset({
        "id", "dist", "score", "rrf_score", "dbsf_score", "maxsim",
        "new_score", "context_score", "sq_dist", "group_rank", "hit_rank",
        "query_id", "mmr_rank",
    })

    def _select_response(self, cols: list[str], with_vectors: bool = False,
                         with_payload=True) -> list[str]:
        nonvec = set(self._response_columns(cols))
        keep = []
        for c in cols:
            if c.startswith("__"):
                continue
            if c in self._SCORE_COLS:
                keep.append(c)
            elif c not in nonvec:  # vector-typed
                if with_vectors:
                    keep.append(c)
            elif with_payload is True or (
                isinstance(with_payload, (list, tuple)) and c in with_payload
            ):
                keep.append(c)
        return keep

    @staticmethod
    def _response_columns(cols: list[str]) -> list[str]:
        """The JSON response envelope's column set: everything except
        vector-typed columns (dense, named, multivector, sparse pairs —
        also behind a ``lookup_`` prefix) and internal ``__*`` columns.
        Shared by query() and query_batch() so the envelope doesn't depend
        on which path served the request."""
        return [
            c for c in cols
            if not c.endswith(("embedding", "token_vectors",
                               "_indices", "_values"))
            and not c.startswith(("vec_", "mv_", "sparse_", "__",
                                  "lookup_vec_", "lookup_mv_"))
        ]

    def _query_ann(self, user_id: int, body: dict,
                   memo_key) -> list[dict] | None:
        """Serve a ``params.exact=false`` /query body through the
        collection's ANN or quantized sidecar. Returns None when the body
        is not the supported plain-dense shape, no sidecar is configured,
        or the collection is empty — the caller falls through to the
        exact path (Qdrant's silent-exact behavior). ``with_vectors`` and
        named ``using`` vectors also fall back (the sidecars index the
        default dense column).

        Honors the rest of Qdrant's search ``params`` on this path:
        ``hnsw_ef`` overrides the graph config's beam width (ignored by
        IVF, as in Qdrant); ``quantization: {ignore, rescore,
        oversampling}`` — ignore=true skips the codes sidecar (exact over
        originals), rescore/oversampling pass into search_quantized.

        ``score_threshold`` on this path cuts on the distances the
        sidecar RETURNS: on the quantized path with ``rescore=false``
        those are the approximate (affine-decoded) distances, so cuts
        near the boundary can admit/drop different points than the exact
        path would for the same body — exactly Qdrant's behavior, where
        the threshold applies to the scores the (possibly quantized)
        search produced. Request ``quantization: {"rescore": true}`` for
        an exact-distance cut (ADVICE r11, documented deviation-free)."""
        meta = self._safe_meta()
        if meta is None or not (meta.ann_index or meta.quantization):
            return None
        qp = body.get("params") if isinstance(body.get("params"), dict) \
            else {}
        quant = qp.get("quantization") if isinstance(
            qp.get("quantization"), dict) else {}
        if not meta.ann_index and quant.get("ignore"):
            return None  # quantized codes disabled: exact over originals
        core = {k: v for k, v in body.items() if k != "params"}
        qvec = self._query_dense_vec(core)
        if (qvec is None or core.get("using")
                or core.get("with_vectors")
                or not self.catalog._has_data(self.index_name)):
            return None
        import math as _math

        try:
            k = int(core.get("limit", 10))
            off = int(core.get("offset", 0))
            thr = core.get("score_threshold")
            thr = None if thr is None else float(thr)
        except (TypeError, ValueError):
            return None
        if thr is not None and not _math.isfinite(thr):
            return None  # the exact path rejects NaN/inf with a 422
        pred = F.col("user_id") == F.lit(user_id)
        extra = compile_filter(
            self.catalog.rewrite_text_filter(self.index_name,
                                             core.get("filter")),
            id_col="id")
        if extra is not None:
            pred = pred & extra
        if meta.ann_index:
            # malformed values raise ValueError/TypeError — the same loud
            # coercion style as limit above; the HTTP layer maps both to
            # the 422 envelope (Qdrant validates params the same way)
            ef = qp.get("hnsw_ef")
            hits = self.catalog.search_ann(
                self.index_name, qvec, k=k + off, predicate=pred,
                beam=int(ef) if ef else None)
        else:
            # Qdrant oversampling is a FLOAT (e.g. 2.4) — float(), not
            # int(): truncation would silently shrink the rescore pool
            ov = quant.get("oversampling")
            hits = self.catalog.search_quantized(
                self.index_name, qvec, k=k + off, predicate=pred,
                rescore=bool(quant.get("rescore", False)),
                oversampling=float(ov) if ov else None)
        payload = self.catalog.read_for_user(self.index_name, user_id)
        joined = (payload.join(F.broadcast(hits.select("id", "dist")), "id")
                  .orderBy(F.col("dist").asc(), F.col("id").asc()))
        if thr is not None:
            joined = joined.filter(F.col("dist") <= F.lit(thr))
        if off:
            joined = joined.offset(off)
        joined = joined.limit(k)
        keep = self._select_response(
            joined.columns, with_vectors=False,
            with_payload=core.get("with_payload", True))
        shaped = joined.select(*keep)
        self._memo_plan(memo_key, shaped)
        return [r.asDict(recursive=True) for r in shaped.collect()]

    def _query_ann_batch(self, user_id: int, entries):
        """Shared-sidecar service for >=2 ANN-batchable /query bodies
        (r14): plan ONCE — one narrow tenant count instead of one per
        request — then either hand the batch to the shared EXACT scan
        (returns ``"exact"``: the planner's small-matching-set band,
        where the per-request path serves the exact filtered top-k
        anyway) or serve every query from ONE pruned scan of the union
        of their probed inverted lists (``operators.ann.ivf_knn_join``:
        routing is a broadcast of the tiny centers table, candidates an
        equi-join on centroid_id) plus ONE batched sample audit, instead
        of a count + probed scan + audit per request. Returns a
        {body_index: response_rows} dict; audit-flagged queries are
        omitted so the caller's per-request fallback re-serves them
        exact (rare — the correlated-filter case). Returns None when the
        collection has no plain-IVF sidecar (graph / ivf_sq / quantized
        kinds serve per-request as before). Per-request parity — ids,
        distances, response envelope — is pytest-pinned
        (test_api.py::test_query_batch_ann_shared_parity)."""
        import json as _json
        import os as _os

        from vectordb_cloud_spark.functions.vector import l2_distance
        from vectordb_cloud_spark.operators.ann import ivf_knn_join

        meta = self._safe_meta()
        if (meta is None or not meta.ann_index
                or not self.catalog._has_data(self.index_name)):
            return None
        name = self.catalog.resolve(self.index_name)
        adir = self.catalog.build_ann_index(name)
        with open(_os.path.join(adir, "params.json")) as f:
            params = _json.load(f)
        if params.get("kind") != "ivf":
            return None
        pred = F.col("user_id") == F.lit(user_id)
        base = self.catalog.read(name)
        fst = int(params.get("full_scan_threshold", 10_000) or 0)
        if fst and base.filter(pred).count() <= fst:
            return "exact"
        centers = [(int(i), list(c)) for i, c in params["centers"]]
        queries = local_df(
            self.spark,
            [(i, [float(x) for x in v]) for i, (v, _k) in entries],
            "query_id int, embedding array<double>",
        )
        codes = self.spark.read.parquet(_os.path.join(adir, "ivf")) \
            .filter(pred)
        tdir = _os.path.join(adir, "tombstones")
        if _os.path.isdir(tdir):
            # incremental-delete tombstones: parity with search_ann's
            # anti-join — stale layout rows can't displace live ones
            codes = codes.join(
                F.broadcast(self.spark.read.parquet(tdir)), "id",
                "left_anti")
        ks = {i: k for i, (_v, k) in entries}
        hits = ivf_knn_join(
            queries, codes, centers, k=max(ks.values()),
            nprobe=int(params["nprobe"]), query_id="query_id",
            query_vec="embedding", point_id="id", point_vec="embedding")
        per_q: dict[int, list] = {i: [] for i in ks}
        for r in hits.collect():  # <= |batch| * max_k rows by contract
            per_q[r["query_id"]].append((int(r["id"]), float(r["dist"])))
        for i, lst in per_q.items():
            lst.sort(key=lambda t: (t[1], t[0]))
            del lst[ks[i]:]
        flagged: set[int] = set()
        audit_mod = params.get("audit_sample_mod", 31) if fst else None
        if audit_mod:
            # the batched edition of operators.knn.filtered_sample_audit:
            # ONE pruned scan of the ~1/mod matching sample, cross-joined
            # against the broadcast (tiny) query batch — a sample row
            # outside a query's results beating its worst distance (or
            # ANY such row when fewer than k came back) flags that query
            qb = local_df(
                self.spark,
                [(i, [float(x) for x in v],
                  per_q[i][-1][1] if len(per_q[i]) >= ks[i] and per_q[i]
                  else None,
                  [pid for pid, _ in per_q[i]])
                 for i, (v, _k) in entries],
                "query_id int, qv array<double>, worst double, "
                "res array<bigint>",
            )
            samp = pred & (
                F.pmod(F.xxhash64(F.col("id")), F.lit(int(audit_mod))) == 0)
            viol = (
                base.filter(samp).select("id", "embedding")
                .crossJoin(F.broadcast(qb))
                .filter(~F.array_contains(F.col("res"), F.col("id")))
                .withColumn("d", l2_distance(F.col("embedding"),
                                             F.col("qv")))
                .filter(F.col("worst").isNull()
                        | (F.col("d") < F.col("worst")))
                .select("query_id").distinct().collect()
            )
            flagged = {int(r["query_id"]) for r in viol}
        keep_q = [i for i in ks if i not in flagged]
        if not keep_q:
            return {}
        all_hits = local_df(
            self.spark,
            [(i, pid, d) for i in keep_q for pid, d in per_q[i]],
            "query_id int, id long, dist double",
        )
        payload = self.catalog.read_for_user(self.index_name, user_id)
        joined = payload.join(F.broadcast(all_hits), "id")
        keep = self._select_response(
            [c for c in joined.columns if c != "query_id"],
            with_vectors=False, with_payload=True)
        rows = joined.select(*keep, "query_id").collect()
        served: dict[int, list] = {i: [] for i in keep_q}
        for r in rows:
            d = r.asDict(recursive=True)
            served[d.pop("query_id")].append(d)
        for lst in served.values():
            lst.sort(key=lambda d: (d["dist"], d["id"]))
        return served

    def query_batch(self, user_id: int, bodies: list[dict]) -> list[list[dict]]:
        """Qdrant POST /points/query/batch, tenant-scoped. Requests whose
        primary ranking is a plain dense L2 top-k share ONE corpus scan —
        ``operators.knn.knn_batch`` broadcasts the query batch and
        window-ranks per query, so N requests cost one pass over the
        tenant's buckets instead of N (the Spark-first batching the
        per-request endpoint can't give you). The batchable set (r13,
        VERDICT r12 #5 — was plain dense only):

        - a vector or ``{"text": ...}`` query (optionally wrapped in
          Qdrant's explicit ``{"nearest": X}``), only ``limit`` beside it;
        - query-by-stored-point-ID (bare scalar or nearest-wrapped): ALL
          referenced ids across the batch resolve in ONE bounded probe,
          and each request's self-exclusion is applied after the shared
          window (the scan over-fetches by the batch's widest exclusion
          set, so the final top-k equals the per-request answer);
        - ``{"recommend": {...}}`` with the default ``average_vector``
          strategy and id/vector examples: example ids join the same
          shared probe, the derived mean(pos)−mean(neg) vector joins the
          shared scan, id-form examples are excluded like the
          per-request path.

        Anything else (prefetch, filters, fusion, group_by, best_score,
        lookup_from, mmr, ...) dispatches through :meth:`query` per
        request. Results align with the input order; a missing referenced
        point raises ``PointNotFoundError`` exactly as per-request (the
        HTTP layer maps it to 404).

        ROUTING RULE (r14, measured — VERDICT r13 #2): the shared scan
        engages at >= 2 batchable entries; a single batchable body
        dispatches per-request (one scan either way, and the per-request
        path rides the warm shape template). The SCALE.md
        query_batch_mixed series measured shared vs per-request on
        single-tenant collections at 100k/1M/4M rows: shared wins at
        every size (2.02/3.80/12.97 s vs 2.26/4.09/13.50 s) — there is
        no crossover where per-request wins a >=2 batch, so no upper
        routing bound exists; the sf0.1 bench pair's apparent parity is
        the plan-bound tiny-tenant regime, not the scan-bound one."""
        import numpy as np

        from vectordb_cloud_spark.errors import PointNotFoundError
        from vectordb_cloud_spark.operators.knn import knn_batch

        def _dense_vec(q):
            if isinstance(q, dict) and set(q) == {"text"}:
                return mock_vector(q["text"], self.dim)
            if (isinstance(q, (list, tuple)) and q
                    and not isinstance(q[0], (list, tuple))):
                return [float(x) for x in q]
            return None

        def _is_id(x):
            return isinstance(x, int) and not isinstance(x, bool)

        def _split_examples(xs):
            # ids vs raw vectors, the recommend grammar; any other element
            # type opts the body out of the fast path (per-request raises)
            ids, vecs = [], []
            for x in xs:
                if isinstance(x, (list, tuple)) and x:
                    vecs.append([float(v) for v in x])
                elif _is_id(x):
                    ids.append(x)
                else:
                    return None
            return ids, vecs

        def _classify(b: dict):
            """(kind, payload, excl_ids, k) for batchable bodies, else
            None. kind: 'dense' (payload = vector), 'by_id' (payload =
            point id), 'rec' (payload = (pos_ids, pos_vecs, neg_ids,
            neg_vecs))."""
            if set(b) - {"query", "limit"}:
                return None
            try:
                k = int(b.get("limit", 10))
            except (TypeError, ValueError):
                return None  # per-request path raises the client error
            if k < 0:
                # degenerate limit: the shared window's final [:k] slice
                # would mean all-but-|k| rows while per-request returns
                # empty — dispatch per-request so both paths agree
                return None
            q = b.get("query")
            if isinstance(q, dict) and set(q) == {"nearest"}:
                q = q["nearest"]
            v = _dense_vec(q)
            if v is not None:
                return ("dense", v, [], k)
            if _is_id(q):
                return ("by_id", q, [q], k)
            if isinstance(q, dict) and set(q) == {"recommend"}:
                spec = q["recommend"]
                if not isinstance(spec, dict) or (
                        set(spec) - {"positive", "negative", "strategy"}):
                    return None
                if spec.get("strategy",
                            "average_vector") != "average_vector":
                    return None  # best_score is not a plain dense top-k
                pos = _split_examples(list(spec.get("positive") or []))
                neg = _split_examples(list(spec.get("negative") or []))
                if pos is None or neg is None or not (pos[0] or pos[1]):
                    return None
                return ("rec", (pos[0], pos[1], neg[0], neg[1]),
                        pos[0] + neg[0], k)
            return None

        def _classify_ann(b: dict):
            """(qvec, k) for ANN-batchable bodies: Qdrant's plain dense
            search carrying exactly ``params: {"exact": false}`` — the
            ANN default — and nothing else beside ``limit``. Filters,
            offset, score_threshold, hnsw_ef, and quantization knobs keep
            per-request dispatch (each changes the serve plan)."""
            if set(b) - {"query", "limit", "params"}:
                return None
            if b.get("params") != {"exact": False}:
                return None
            try:
                k = int(b.get("limit", 10))
            except (TypeError, ValueError):
                return None
            if k < 1:
                return None  # degenerate limits: per-request semantics
            v = self._query_dense_vec(
                {kk: vv for kk, vv in b.items() if kk != "params"})
            return None if v is None else (v, k)

        results: list[list[dict] | None] = [None] * len(bodies)
        entries = [(i, c) for i, c in
                   ((i, _classify(b)) for i, b in enumerate(bodies))
                   if c is not None]
        # r14: ANN-batchable bodies (params.exact=false — Qdrant's
        # default search mode) share the plain-IVF sidecar: ONE planning
        # count + ONE pruned scan of the union of probed inverted lists +
        # ONE batched sample audit instead of each per request. The
        # planner's small-matching-set band folds them into the shared
        # EXACT scan below (which is what per-request would serve).
        ann_entries = [(i, c) for i, c in
                       ((i, _classify_ann(b)) for i, b in enumerate(bodies))
                       if c is not None]
        if len(ann_entries) >= 2:
            plan = self._query_ann_batch(user_id, ann_entries)
            if plan == "exact":
                entries = entries + [
                    (i, ("dense", v, [], k)) for i, (v, k) in ann_entries]
            elif plan is not None:
                for i, rows_i in plan.items():
                    results[i] = rows_i
        if len(entries) >= 2:
            points = self.catalog.read_for_user(self.index_name, user_id)
            # ONE bounded probe resolves every point id the batch
            # references (by-id targets + recommend examples) — the
            # per-request path pays one probe per request
            need = sorted({pid for _, c in entries for pid in c[2]})
            found: dict[int, list] = {}
            if need:
                rows = (
                    points.filter(F.col("id").isin(need))
                    .select("id", F.col("embedding").cast("array<double>")
                            .alias("__v"))
                    .collect()
                )
                found = {r["id"]: r["__v"] for r in rows}
                missing = [i for i in need if i not in found]
                if missing:
                    raise PointNotFoundError(
                        f"example ids not found in collection: {missing}")
            batch = []  # (idx, qvec, k, excl_ids)
            for i, (kind, payload, excl, k) in entries:
                if kind == "dense":
                    qv = payload
                elif kind == "by_id":
                    qv = [float(x) for x in found[payload]]
                else:  # rec — the recommend average_vector derivation
                    pos_ids, pos_vecs, neg_ids, neg_vecs = payload
                    pos_pool = [np.asarray(found[p], dtype=np.float64)
                                for p in pos_ids] + [
                        np.asarray(v, dtype=np.float64) for v in pos_vecs]
                    neg_pool = [np.asarray(found[p], dtype=np.float64)
                                for p in neg_ids] + [
                        np.asarray(v, dtype=np.float64) for v in neg_vecs]
                    qnp = np.mean(pos_pool, axis=0)
                    if neg_pool:
                        qnp = qnp - np.mean(neg_pool, axis=0)
                    qv = [float(x) for x in qnp]
                batch.append((i, qv, k, excl))
            # array<double>, not <float>: the recommend-derived mean
            # vector is float64 in the per-request path — a float32
            # round-trip here would perturb near-tie distances vs
            # per-request parity (l2_distance casts everything to double
            # anyway; plain float32-exact vectors are unaffected)
            queries = local_df(
                self.spark,
                [(i, qv) for i, qv, _, _ in batch],
                "query_id int, embedding array<double>",
            )
            # the shared window over-fetches by the widest exclusion set:
            # dropping a request's excluded ids from its top
            # (k + |excl|) leaves at least its true top-k
            scan_k = max(k + len(excl) for _, _, k, excl in batch)
            hits = knn_batch(points, queries, k=scan_k,
                             points_vec="embedding", metric="l2",
                             tiebreak="id")
            keep = self._response_columns(hits.columns)
            if "query_id" not in keep:
                keep.append("query_id")
            rows = hits.select(*keep).collect()
            per_query: dict[int, list] = {i: [] for i, _, _, _ in batch}
            for r in rows:
                per_query[r["query_id"]].append(r)
            limits = {i: k for i, _, k, _ in batch}
            excls = {i: set(excl) for i, _, _, excl in batch}
            for i, lst in per_query.items():
                lst.sort(key=lambda r: (r["dist"], r["id"]))
                results[i] = [
                    {k: v for k, v in r.asDict(recursive=True).items()
                     if k != "query_id"}
                    for r in lst if r["id"] not in excls[i]
                ][: limits[i]]
        for i, body in enumerate(bodies):
            if results[i] is None:
                results[i] = self.query(user_id, body)
        return results  # type: ignore[return-value]

    def info(self) -> dict:
        """Qdrant GET /collections/{name} over the service's collection."""
        return self.catalog.collection_info(self.index_name)

    def create_index(self, field: str, field_schema: str = "keyword") -> dict:
        """Qdrant PUT /collections/{name}/index: declare a payload field
        indexed (re-clusters the collection's file layout by it)."""
        meta = self.catalog.create_payload_index(
            self.index_name, field, field_schema)
        return {"result": {"status": "completed"},
                "payload_indexes": dict(meta.payload_indexes or {})}

    def delete_index(self, field: str) -> dict:
        """Qdrant DELETE /collections/{name}/index/{field}."""
        meta = self.catalog.drop_payload_index(self.index_name, field)
        return {"result": {"status": "completed"},
                "payload_indexes": dict(meta.payload_indexes or {})}

    # 422 validation contract (/root/reference/app.py:28-33): coercion
    # failures return {status_code: 10422, message, data: None} instead of
    # raising — the FastAPI handler's observable shape.
    @staticmethod
    def _validation_error(message: str) -> dict:
        return {"status_code": 10422, "message": message, "data": None}

    def handle_search_request(self, params: dict):
        """Endpoint-style dispatch: coerce/validate query params like the
        FastAPI layer, 10422 envelope on failure, hits payload on success."""
        try:
            user_id = int(params["user_id"])
            text = str(params["text"])
            limit = int(params.get("limit", 5))
            if limit <= 0:
                raise ValueError("limit must be positive")
        except (KeyError, TypeError, ValueError) as exc:
            return self._validation_error(f"Validation error: {exc}")
        site = params.get("site")
        lang = params.get("lang")
        hits = self.search(user_id, text, limit, site, lang)
        return {
            "status_code": 200,
            "data": [
                {"id": r["id"], "string": r["string"], "score": r["score"]}
                for r in hits.collect()
            ],
        }

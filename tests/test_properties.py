"""Property-based tests (hypothesis) for the operator contracts from
SURVEY.md §5: kNN monotonicity, upsert idempotence/LWW, distance metric
axioms on the native column expressions."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from vectordb_cloud_spark.functions.embedding import mock_vector
from vectordb_cloud_spark.operators.knn import knn_search

_vec = st.lists(
    st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
    min_size=4, max_size=4,
)


@settings(max_examples=20, deadline=None)
@given(a=_vec, b=_vec)
def test_l2_symmetry_and_nonneg(spark_global, a, b):
    from vectordb_cloud_spark.functions.vector import l2_distance

    df = spark_global.createDataFrame([(a, b)], "a array<double>, b array<double>")
    r = df.select(
        l2_distance("a", "b").alias("ab"), l2_distance("b", "a").alias("ba")
    ).collect()[0]
    assert r["ab"] == r["ba"]
    assert r["ab"] >= 0.0
    want = math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))
    assert math.isclose(r["ab"], want, rel_tol=1e-9, abs_tol=1e-12)


@settings(max_examples=5, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_knn_monotone_in_k(spark_global, seed):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(40, 8))
    df = spark_global.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(40)],
        "id long, embedding array<float>",
    )
    q = [float(x) for x in rng.normal(size=8)]
    k3 = {r["id"] for r in knn_search(df, q, k=3).collect()}
    k7 = {r["id"] for r in knn_search(df, q, k=7).collect()}
    assert k3 <= k7 and len(k3) == 3 and len(k7) == 7


@settings(max_examples=10, deadline=None)
@given(text=st.text(min_size=0, max_size=200))
def test_mock_embedder_total_and_stable(text):
    v1 = mock_vector(text, 16)
    v2 = mock_vector(text, 16)
    assert v1 == v2 and len(v1) == 16
    assert all(-1.0 <= x < 1.0 for x in v1)


# hypothesis can't use function-scoped fixtures; module-level session handle
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


@settings(max_examples=25, deadline=None)
@given(t=_text)
def test_pii_redaction_idempotent(spark_global, t):
    """redact(redact(x)) == redact(x): the token itself must never match a
    PII pattern, so scrubbing is safe to re-run (pipeline re-entry)."""
    from vectordb_cloud_spark.functions.pii import redact_pii

    df = spark_global.createDataFrame([(t,)], "text string")
    once, twice = df.select(
        redact_pii("text").alias("a")
    ).select("a", redact_pii("a").alias("b")).collect()[0]
    assert once == twice


@settings(max_examples=30, deadline=None)
@given(digits=st.text(alphabet="0123456789", min_size=13, max_size=19))
def test_luhn_expression_matches_python(spark_global, digits):
    from vectordb_cloud_spark.functions.pii import luhn_valid

    def py_luhn(ds):
        total = 0
        for i, ch in enumerate(reversed(ds)):
            d = int(ch)
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    df = spark_global.createDataFrame([(digits,)], "d string")
    got = df.select(luhn_valid(F.col("d")).alias("v")).collect()[0]["v"]
    assert got == py_luhn(digits)


# ---------------------------------------------------------------------------
# codecs: encode/decode are exact inverses on arbitrary uint8 images and
# quantization-bounded inverses on arbitrary PCM
# ---------------------------------------------------------------------------

@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 12), w=st.integers(1, 12), c=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, c, seed):
    from vectordb_cloud_spark.functions.codecs import decode_png, encode_png

    arr = np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)
    out = decode_png(encode_png(arr))
    want = arr[:, :, 0] if c == 1 else arr
    np.testing.assert_array_equal(out, want)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 400), ch=st.integers(1, 2), rate=st.sampled_from([8000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    from vectordb_cloud_spark.functions.codecs import decode_wav, encode_wav

    pcm = np.random.default_rng(seed).uniform(-0.999, 0.999, (n, ch))
    out, r = decode_wav(encode_wav(pcm, rate))
    assert r == rate
    out2 = out.reshape(n, ch)
    np.testing.assert_allclose(out2, pcm, atol=2.0 / 32767)


# ---------------------------------------------------------------------------
# SCD2: applying any change batch must equal rebuilding from the merged log
# ---------------------------------------------------------------------------

_changes = st.lists(
    st.tuples(
        st.integers(1, 4),                 # key
        st.integers(0, 50),                # ts
        st.sampled_from(["a", "b", "c"]),  # attr
    ),
    min_size=1, max_size=12,
)


@settings(max_examples=10, deadline=None)
@given(log=_changes, batch=_changes)
def test_scd2_apply_equals_full_rebuild(spark_global, log, batch):
    from collections import Counter

    from vectordb_cloud_spark.operators.temporal import (
        scd2_apply_changes,
        scd2_snapshot,
    )

    schema = "k long, ts long, attr string"
    # duplicate (k, ts) rows with different attrs are ambiguous input;
    # dedupe to the deterministic min-attr row like an ingest layer would
    def dedup(rows):
        best = {}
        for k, ts, a in rows:
            best[(k, ts)] = min(a, best.get((k, ts), a))
        return [(k, ts, a) for (k, ts), a in best.items()]

    def collapse(rows):
        # drop re-assertion events (same attrs as the key's previous event):
        # scd2_snapshot collapses them, so they are not retained in the
        # dimension and cannot influence later applies (documented in
        # scd2_apply_changes) — the property holds for collapse-free logs
        out, prev = [], {}
        for k, ts, a in sorted(rows):
            if prev.get(k) != a:
                out.append((k, ts, a))
            prev[k] = a
        return out

    log = collapse(dedup(log))
    batch = dedup(batch)
    batch = [r for r in batch if r[:2] not in {x[:2] for x in log}]
    if not batch:
        return
    ldf = spark_global.createDataFrame(log, schema)
    bdf = spark_global.createDataFrame(batch, schema)
    dim = scd2_snapshot(ldf, "k", "ts", ["attr"])
    applied = scd2_apply_changes(dim, bdf, "k", "ts", ["attr"])
    truth = scd2_snapshot(ldf.unionByName(bdf), "k", "ts", ["attr"])
    assert Counter(map(tuple, applied.collect())) == \
        Counter(map(tuple, truth.collect()))


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_sq_roundtrip_error_bound_property(spark_global, seed):
    """For ANY corpus, int8 dequantization error is within half a step per
    dimension — the equal-width quantizer's defining guarantee."""
    from vectordb_cloud_spark.operators.sq import sq_encode, sq_train

    rng = np.random.default_rng(seed)
    mat = rng.normal(scale=rng.uniform(0.01, 100), size=(30, 6))
    df = spark_global.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    mins, maxs = sq_train(df)
    rows = sq_encode(df, mins, maxs).select("embedding", "sq_code").collect()
    step = (np.asarray(maxs) - np.asarray(mins)) / 255.0
    for r in rows:
        x = np.asarray(r["embedding"], dtype=np.float64)
        deq = (np.asarray(r["sq_code"], dtype=np.float64) + 128.0) * step + mins
        assert np.all(np.abs(deq - x) <= step / 2 + 1e-9)
        assert all(-128 <= c <= 127 for c in r["sq_code"])


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000),
       dim=st.sampled_from([3, 64, 70, 130]))
def test_bq_packing_matches_numpy_any_dim(spark_global, seed, dim):
    """Bit packing parity with numpy for dims below/at/above word
    boundaries (3, 64, 70, 130 -> 1, 1, 2, 3 words)."""
    from vectordb_cloud_spark.operators.sq import bq_encode, bq_train

    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(10, dim))
    df = spark_global.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    thr = bq_train(df)
    t = np.asarray(thr)
    n_words = (dim + 63) // 64
    for r in bq_encode(df, thr).select("embedding", "bq_code").collect():
        x = np.asarray(r["embedding"], dtype=np.float64)
        bits = (x > t).astype(int)
        assert len(r["bq_code"]) == n_words
        for w in range(n_words):
            want = 0
            for j, b in enumerate(bits[w * 64:(w + 1) * 64]):
                want |= int(b) << j
            if want >= 1 << 63:
                want -= 1 << 64
            assert r["bq_code"][w] == want


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=30),
    n_frames=st.integers(min_value=1, max_value=6),
    fps=st.integers(min_value=1, max_value=60),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_avi_roundtrip_property(w, h, n_frames, fps, seed):
    """encode_avi -> decode_avi is the identity on pixels, frame count,
    and fps for ANY geometry (incl. odd widths that force row padding)."""
    import numpy as np

    from vectordb_cloud_spark.functions.codecs import decode_avi, encode_avi

    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
              for _ in range(n_frames)]
    back, got_fps = decode_avi(encode_avi(frames, fps=fps))
    assert got_fps == round(1_000_000 / (1_000_000 // fps))
    assert len(back) == n_frames
    for a, b in zip(frames, back):
        assert (a == b).all()


# --- filter DSL vs a pure-Python Qdrant-semantics evaluator ---------------
# Pins the ADVICE-r8 null semantics under fuzz: a condition on a
# missing/null payload field never MATCHES (so must_not passes such rows,
# min_should counts them as 0), is_empty covers null/''/[] — for random
# boolean-clause trees over match/range/is_null/is_empty conditions.

_FILTER_ROWS = [
    (0, "en", 10, ["a"], "Hello, world!"),
    (1, "de", None, [], "fresh cookies. daily"),
    (2, None, 250, ["a", "b"], "hello-there WORLD"),
    (3, "en", 400, None, None),
    (4, "fr", 120, [], ""),
    (5, None, None, ["c"], "two cookies two"),
]


def _cond_matches(row, cond) -> bool:
    lang, n, tags, text = row[1], row[2], row[3], row[4]
    fields = {"lang": lang, "n": n, "tags": tags, "text": text}
    if "is_null" in cond:
        key = cond["is_null"]["key"] if isinstance(cond["is_null"], dict) else cond["is_null"]
        return fields[key] is None
    if "is_empty" in cond:
        key = cond["is_empty"]["key"] if isinstance(cond["is_empty"], dict) else cond["is_empty"]
        v = fields[key]
        return v is None or v == "" or (isinstance(v, list) and not v)
    key = cond["key"]
    v = fields[key]
    if "match" in cond and "tokens" in cond["match"]:
        # the r10 whole-token extension: every given token occurs as a
        # complete word-tokenizer token (null text matches nothing)
        from vectordb_cloud_spark.functions.hashing import word_tokens_py

        if v is None:
            return False
        toks = set(word_tokens_py(v))
        return all(t in toks for t in cond["match"]["tokens"])
    if "match" in cond:
        return v is not None and v == cond["match"]["value"]
    if "range" in cond:
        if v is None:
            return False
        ok = True
        r = cond["range"]
        if "gte" in r:
            ok = ok and v >= r["gte"]
        if "lt" in r:
            ok = ok and v < r["lt"]
        return ok
    raise AssertionError(cond)


def _filter_matches(row, spec) -> bool:
    out = True
    must = spec.get("must") or []
    if must:
        out = out and all(_cond_matches(row, c) for c in must)
    should = spec.get("should") or []
    if should:
        out = out and any(_cond_matches(row, c) for c in should)
    must_not = spec.get("must_not") or []
    if must_not:
        out = out and not any(_cond_matches(row, c) for c in must_not)
    if "min_should" in spec:
        ms = spec["min_should"]
        out = out and sum(
            _cond_matches(row, c) for c in ms["conditions"]
        ) >= ms["min_count"]
    return out


_condition_st = st.one_of(
    st.builds(lambda v: {"key": "lang", "match": {"value": v}},
              st.sampled_from(["en", "de", "fr", "zz"])),
    st.builds(lambda g, w: {"key": "n", "range": {"gte": g, "lt": g + w}},
              st.integers(0, 300), st.integers(1, 300)),
    st.sampled_from([{"is_null": {"key": "lang"}}, {"is_null": {"key": "n"}},
                     {"is_empty": "tags"}, {"is_empty": "lang"}]),
    st.builds(lambda ts: {"key": "text", "match": {"tokens": ts}},
              st.lists(st.sampled_from(
                  ["hello", "world", "cookies", "two", "there", "zz"]),
                  min_size=1, max_size=2, unique=True)),
)

_filter_st = st.fixed_dictionaries(
    {},
    optional={
        "must": st.lists(_condition_st, min_size=1, max_size=2),
        "should": st.lists(_condition_st, min_size=1, max_size=2),
        "must_not": st.lists(_condition_st, min_size=1, max_size=2),
        "min_should": st.builds(
            lambda cs, m: {"conditions": cs, "min_count": m},
            st.lists(_condition_st, min_size=2, max_size=3),
            st.integers(1, 2),
        ),
    },
).filter(bool)


@settings(max_examples=30, deadline=None)
@given(spec=_filter_st)
def test_filter_dsl_matches_python_semantics(spark_global, spec):
    from vectordb_cloud_spark.filters import compile_filter

    df = spark_global.createDataFrame(
        _FILTER_ROWS, "id long, lang string, n long, tags array<string>, text string"
    )
    got = sorted(r["id"] for r in df.filter(compile_filter(spec)).collect())
    want = sorted(r[0] for r in _FILTER_ROWS if _filter_matches(r, spec))
    assert got == want, spec

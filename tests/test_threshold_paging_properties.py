"""Property fuzz (r12): score_threshold + offset + limit compose
identically on every scored branch — the thresholded, paged result must
equal the qualifying prefix of the unthresholded full ranking, sliced
[offset : offset+limit]. Catches direction mixups, cut-vs-page ordering
bugs, and fetch-window truncation errors that pointwise tests miss."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vectordb_cloud_spark.query_api import query_points

_N = 40


@pytest.fixture(scope="module")
def fuzz_points(spark):
    rng = np.random.RandomState(7)
    rows = [(i, rng.randn(8).round(3).tolist()) for i in range(_N)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.localCheckpoint(), {i: np.asarray(v) for i, v in rows}


@settings(max_examples=12, deadline=None)
@given(qi=st.integers(min_value=0, max_value=_N - 1),
       k=st.integers(min_value=1, max_value=12),
       off=st.integers(min_value=0, max_value=6),
       frac=st.floats(min_value=0.0, max_value=1.2))
def test_dense_threshold_paging_consistency(fuzz_points, qi, k, off, frac):
    df, vecs = fuzz_points
    qv = vecs[qi].tolist()
    dists = sorted(
        (float(np.linalg.norm(v - vecs[qi])), i) for i, v in vecs.items())
    t = frac * dists[-1][0]  # anywhere from empty cut to no-op cut
    got = query_points(df, qv, limit=k, offset=off, id_col="vec_id",
                       score_threshold=t).collect()
    qualifying = [i for d, i in dists if d <= t]
    assert [r["vec_id"] for r in got] == qualifying[off:off + k]
    assert all(r["dist"] <= t for r in got)


@settings(max_examples=8, deadline=None)
@given(qi=st.integers(min_value=0, max_value=_N - 1),
       k=st.integers(min_value=1, max_value=8),
       off=st.integers(min_value=0, max_value=4),
       cut_rank=st.integers(min_value=0, max_value=15))
def test_recommend_avg_threshold_paging_consistency(fuzz_points, qi, k, off,
                                                    cut_rank):
    df, vecs = fuzz_points
    dists = sorted(
        (float(np.linalg.norm(v - vecs[qi])), i)
        for i, v in vecs.items() if i != qi)
    # midpoint between adjacent ranks: strictly between, so numpy's and
    # Spark's last-ulp distance differences cannot flip the boundary
    t = (dists[cut_rank][0] + dists[cut_rank + 1][0]) / 2
    got = query_points(df, {"recommend": {"positive": [qi]}}, limit=k,
                       offset=off, id_col="vec_id",
                       score_threshold=t).collect()
    qualifying = [i for d, i in dists if d <= t]
    assert [r["vec_id"] for r in got] == qualifying[off:off + k]


@settings(max_examples=8, deadline=None)
@given(pi=st.integers(min_value=0, max_value=_N - 1),
       ni=st.integers(min_value=0, max_value=_N - 1),
       k=st.integers(min_value=1, max_value=8),
       cut_rank=st.integers(min_value=0, max_value=10))
def test_context_threshold_consistency(fuzz_points, pi, ni, k, cut_rank):
    df, vecs = fuzz_points
    full = query_points(
        df, {"context": {"positive": vecs[pi].tolist(),
                         "negative": vecs[ni].tolist()}},
        limit=_N, id_col="vec_id").collect()
    t = full[min(cut_rank, len(full) - 1)]["context_score"]
    got = query_points(
        df, {"context": {"positive": vecs[pi].tolist(),
                         "negative": vecs[ni].tolist()}},
        limit=k, id_col="vec_id", score_threshold=t).collect()
    want = [r["vec_id"] for r in full if r["context_score"] >= t][:k]
    assert [r["vec_id"] for r in got] == want

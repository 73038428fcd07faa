"""Per-corpus memos must invalidate when a fixture is regenerated in place
(VERDICT r14 #8): every cache in queries.py keys on ``_corpus_key`` — the
corpus path plus each parquet file's (name, mtime, size) — so a rewritten
fixture can never serve stale collected scalars or oracle artifacts."""

import os
import time

import pandas as pd
import pytest

from vectordb_cloud_spark import queries as qmod


def _write_embeddings(sf_dir: str, base: float) -> None:
    pd.DataFrame({
        "vec_id": [0, 1, 2],
        "embedding": [
            [base, 0.0], [0.0, base], [base, base],
        ],
        "label": [0, 1, 0],
    }).to_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def test_corpus_key_changes_when_fixture_rewritten(tmp_path):
    sf = str(tmp_path)
    _write_embeddings(sf, 1.0)
    k1 = qmod._corpus_key(sf)
    time.sleep(0.01)  # ensure a distinct mtime even on coarse filesystems
    _write_embeddings(sf, 2.0)
    k2 = qmod._corpus_key(sf)
    assert k1 != k2
    assert k1[0] == k2[0] == os.path.abspath(sf)


def test_query_vec_memo_invalidates_on_rewrite(spark, tmp_path):
    sf = str(tmp_path)
    _write_embeddings(sf, 1.0)
    v1 = qmod._query_vec(spark, sf, 0)
    assert v1 == [1.0, 0.0]
    # memo hit: same corpus state returns the cached list (a copy)
    assert qmod._query_vec(spark, sf, 0) == v1
    time.sleep(0.01)
    _write_embeddings(sf, 2.0)
    v2 = qmod._query_vec(spark, sf, 0)
    assert v2 == [2.0, 0.0], "rewritten fixture must invalidate the memo"


def test_read_relation_memo_reuses_then_invalidates(spark, tmp_path):
    sf = str(tmp_path)
    _write_embeddings(sf, 1.0)
    df1 = qmod._t(spark, sf, "embeddings")
    assert qmod._t(spark, sf, "embeddings") is df1  # memo hit
    time.sleep(0.01)
    _write_embeddings(sf, 3.0)
    df2 = qmod._t(spark, sf, "embeddings")
    assert df2 is not df1
    row = df2.filter("vec_id = 0").first()
    assert list(row["embedding"]) == [3.0, 0.0]

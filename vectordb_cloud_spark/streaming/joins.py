"""Streaming joins: stream-static enrichment and watermarked stream-stream
interval joins.

The two shapes a streaming pipeline needs beyond windowed aggregation:

- **stream-static**: every micro-batch joins against a batch dimension
  table. Spark re-plans the static side per batch, so a broadcast hint keeps
  it a map-side hash join — no stream state at all.
- **stream-stream interval join**: both sides watermarked, the join
  condition carries an equality key AND a time interval bound. The interval
  bound is what makes state finite: each side buffers only rows younger than
  (watermark + interval), so state size is rate x window, independent of
  stream lifetime. Without the time bound Spark would have to keep every row
  forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich a stream with a static dimension table. ``broadcast_dim``
    pins the map-side hash join (right for the usual small-dim case; turn
    off for a dimension too large to broadcast, where a shuffled join with
    the stream is the only option)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join each left row to right rows with the same ``key`` whose
    ``right_ts`` lies in ``[left_ts - max_lag, left_ts]`` (the
    "purchase within the hour before the click" shape).

    ``left_ts`` and ``right_ts`` must be distinct column names (rename one
    side first) — the condition references both. Both sides get the same
    ``watermark``; state eviction then follows watermark + max_lag. Works
    identically on batch DataFrames (watermarks are no-ops there), which is
    how the tests cross-check streamed results against batch truth.
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must differ; rename one side")
    overlap = (set(left.columns) & set(right.columns)) - {key}
    if overlap:
        raise ValueError(f"ambiguous non-key columns on both sides: {sorted(overlap)}")
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {max_lag}"))
        & (F.col(right_ts) <= F.col(left_ts))
    )
    return lw.join(rw, cond, how).drop(rw[key])

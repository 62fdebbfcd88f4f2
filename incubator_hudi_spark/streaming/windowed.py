"""Watermarked event-time window aggregation — the standard late-data
pattern for streaming ingest into engine tables.

The reference has no watermark/window semantics (SURVEY §2.7: Hudi treats
late records as plain upserts keyed by record key); this operator is part of
the beyond-reference streaming layer, built on stock Structured Streaming
primitives:

- :func:`windowed_agg` — batch twin over a table snapshot / incremental
  pull: tumbling event-time windows via ``F.window``.  Pure codegen, one
  keyed shuffle; oracle-checkable (a window is just ``floor(epoch/size)``).
- :func:`windowed_agg_stream` — streaming twin: ``withWatermark`` bounds
  state, late rows beyond the watermark are dropped, finalized windows are
  emitted in append mode.  Feed the result to
  ``HudiStreamingSink``/``foreachBatch`` with the window start as record key
  for exactly-once idempotent upserts (late corrections overwrite the
  window row instead of duplicating it).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _aggs(value_col: Optional[str]):
    out = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        out += [F.sum(value_col).alias("sum_value"),
                F.min(value_col).alias("min_value"),
                F.max(value_col).alias("max_value")]
    return out


def windowed_agg(events: DataFrame, window_minutes: int = 10,
                 ts_col: str = "ts", key_cols: Sequence[str] = ("event_type",),
                 value_col: Optional[str] = "value") -> DataFrame:
    """Tumbling event-time windows over a batch frame.

    Output: key columns + ``window_start``/``window_end`` timestamps +
    count/sum/min/max.  Identical results to the streaming twin once the
    stream's watermark passes the window end.
    """
    w = F.window(F.col(ts_col).cast("timestamp"), f"{window_minutes} minutes")
    return (events.groupBy(*key_cols, w.alias("w"))
            .agg(*_aggs(value_col))
            .select(*key_cols,
                    F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "n_events",
                    *([c for c in ("sum_value", "min_value", "max_value")]
                      if value_col else [])))


def windowed_agg_stream(events: DataFrame, window_minutes: int = 10,
                        watermark_minutes: int = 30,
                        ts_col: str = "ts",
                        key_cols: Sequence[str] = ("event_type",),
                        value_col: Optional[str] = "value") -> DataFrame:
    """Streaming twin: watermark bounds the state store (windows older than
    the watermark are finalized and dropped); rows later than the watermark
    are discarded — the documented Structured Streaming late-data contract.

    Returns a streaming DataFrame for ``writeStream`` (append mode emits
    each window exactly once, when the watermark passes its end).
    """
    wm = events.withWatermark(ts_col, f"{watermark_minutes} minutes")
    w = F.window(F.col(ts_col), f"{window_minutes} minutes")
    return (wm.groupBy(*key_cols, w.alias("w"))
            .agg(*_aggs(value_col))
            .select(*key_cols,
                    F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "n_events",
                    *([c for c in ("sum_value", "min_value", "max_value")]
                      if value_col else [])))

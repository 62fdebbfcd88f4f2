"""Event sessionization — the canonical custom stateful operator a
training-data / clickstream pipeline needs on top of the engine's tables.

Two implementations with identical semantics (gap-based sessions, events
ordered by (ts, order_col) within a user):

- :func:`sessionize` — batch, pure window functions (lag → break flag →
  running sum).  One shuffle keyed by user; whole-stage codegen; this is the
  oracle-checkable path and the one to use on table snapshots.
- :func:`sessionize_stream` — Structured Streaming via
  ``applyInPandasWithState`` (Arrow-batched, grouped state per user): emits a
  session row the moment a later event closes it, keeps the open session in
  state across micro-batches.  Use on ``readStream`` sources feeding a
  :class:`~incubator_hudi_spark.streaming.sink.HudiStreamingSink`.

The reference has no session/window semantics (SURVEY §2.7: Hudi delegates
all relational work) — this is part of the beyond-reference pipeline layer.
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _epoch_s(col):
    """Epoch seconds for TIMESTAMP and TIMESTAMP_NTZ alike (NTZ has no
    direct long cast in Spark 4; route through TIMESTAMP — value-preserving
    under a UTC session timezone)."""
    return col.cast("timestamp").cast("long")


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts",
               order_col: str = "event_id") -> DataFrame:
    """Batch gap-based sessionization.

    Returns one row per (user, session): ``session_id`` (1-based per user in
    time order), start/end timestamps, and event count.  Deterministic
    ordering ties broken by ``order_col``.
    """
    gap_s = gap_minutes * 60
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    prev = F.lag(ts_col).over(w)
    brk = F.when(
        prev.isNull()
        | (_epoch_s(F.col(ts_col)) - _epoch_s(prev) > gap_s),
        F.lit(1)).otherwise(F.lit(0))
    cum = Window.partitionBy(user_col).orderBy(ts_col, order_col) \
                .rowsBetween(Window.unboundedPreceding, 0)
    marked = events.withColumn("_brk", brk) \
                   .withColumn("session_id", F.sum("_brk").over(cum))
    return (marked.groupBy(user_col, "session_id")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count(F.lit(1)).alias("n_events")))


def sessionize_stream(stream_df: DataFrame, gap_minutes: int = 30,
                      user_col: str = "user_id", ts_col: str = "ts",
                      order_col: str = "event_id") -> DataFrame:
    """Streaming sessionization with per-user state.

    ``applyInPandasWithState`` keeps (start, last, count) of the OPEN session
    per user; each micro-batch folds its (sorted) events into that state and
    emits every session that a later event closed.  Trailing open sessions
    stay in state — they are emitted once a later batch closes them (the
    standard continuous-sessionization contract; no watermark needed because
    state is one tuple per user, not buffered events).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_s = gap_minutes * 60
    out_schema = (f"{user_col} long, session_start long, session_end long, "
                  f"n_events long")
    state_schema = "start long, last long, n long"

    def fold(key: Tuple, pdfs: Iterator["pd.DataFrame"],
             state: GroupState) -> Iterator["pd.DataFrame"]:
        (uid,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start = last = n = None
        closed = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, order_col])
            # unit-agnostic epoch seconds (Arrow may hand datetime64[us] or [ns])
            ts_s = pdf[ts_col].values.astype("datetime64[s]").astype("int64").tolist()
            for t in ts_s:
                if start is None:
                    start, last, n = t, t, 1
                elif t - last > gap_s:
                    closed.append((uid, start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = t, n + 1
        if start is not None:
            state.update((start, last, n))
        if closed:
            yield pd.DataFrame(closed, columns=[user_col, "session_start",
                                                "session_end", "n_events"])

    return (stream_df.groupBy(user_col)
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))

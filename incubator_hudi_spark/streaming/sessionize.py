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


def _epoch_us(col):
    """Epoch MICROseconds for TIMESTAMP and TIMESTAMP_NTZ alike (NTZ has no
    direct long cast in Spark 4; route through TIMESTAMP — value-preserving
    under a UTC session timezone).  Microsecond precision keeps the gap
    comparison exact for parquet timestamps, matching an interval-based SQL
    oracle at the session boundary."""
    return F.unix_micros(col.cast("timestamp"))


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts",
               order_col: str = "event_id") -> DataFrame:
    """Batch gap-based sessionization.

    Returns one row per (user, session): ``session_id`` (1-based per user in
    time order), start/end timestamps, and event count.  Deterministic
    ordering ties broken by ``order_col``.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    prev = F.lag(ts_col).over(w)
    brk = F.when(
        prev.isNull()
        | (_epoch_us(F.col(ts_col)) - _epoch_us(prev) > gap_us),
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

    Output: (user, session_start, session_end, n_events) with the session
    bounds as epoch-microsecond longs (state schemas need primitives); the
    user column keeps the input column's type.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    user_t = stream_df.schema[user_col].dataType.simpleString()
    out_schema = (f"{user_col} {user_t}, session_start long, "
                  f"session_end long, n_events long")
    state_schema = "start long, last long, n long"

    def fold(key: Tuple, pdfs: Iterator["pd.DataFrame"],
             state: GroupState) -> Iterator["pd.DataFrame"]:
        (uid,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start = last = n = None
        closed = []
        # a group's micro-batch may arrive as several Arrow chunks in
        # arbitrary order — concatenate first, sort ONCE across the batch
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks, ignore_index=True) \
                      .sort_values([ts_col, order_col])
            # unit-agnostic epoch micros (Arrow hands datetime64[us] or [ns])
            ts_us = batch[ts_col].values.astype("datetime64[us]") \
                                 .astype("int64").tolist()
            for t in ts_us:
                if start is None:
                    start, last, n = t, t, 1
                elif t - last > gap_us:
                    closed.append((uid, start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = t, n + 1
        if start is not None:
            state.update((int(start), int(last), int(n)))
        if closed:
            yield pd.DataFrame(closed, columns=[user_col, "session_start",
                                                "session_end", "n_events"])

    return (stream_df.groupBy(user_col)
            .applyInPandasWithState(fold, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))

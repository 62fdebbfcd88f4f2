"""Temporal join operators Spark lacks as built-ins: as-of join and
bounded time-range join.

The reference engine has no temporal-join operators (all relational work is
delegated to the host engine, SURVEY §2.8); these are part of the
training-data-pipeline extension surface (event attribution, feature
backfill, session features).  Both are expressed as compositions of existing
DataFrame ops — no UDFs, no driver loops — with shuffle counts that hold at
100 TB:

- ``asof_join``: ONE exchange (hash by join key).  The classic union+prefix
  window formulation: interleave both sides ordered by time within each key
  and carry the last-seen right row forward.  This beats the naive
  inequality join (O(n·m) per key) and needs no per-key driver state.
- ``range_join``: bucketized interval join.  Right rows land in
  fixed-width time buckets; each left row probes the two buckets its window
  can overlap, turning an unbounded theta-join into an equi-join with
  bounded fan-out (2×), then an exact filter.  Equi-join ⇒ Catalyst picks
  hash join + AQE handles skew.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _secs(c) -> Column:
    """Epoch seconds from timestamp / timestamp_ntz / numeric columns
    (TIMESTAMP_NTZ has no direct double cast; route it via TIMESTAMP, which
    interprets it in the session timezone — UTC everywhere in this engine)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("timestamp").cast("double")


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str, right_ts: str,
              right_cols: Optional[Sequence[str]] = None,
              strict: bool = True,
              tolerance_seconds: Optional[float] = None,
              prefix: str = "matched_") -> DataFrame:
    """For each left row, attach the latest right row of the same key with
    ``right_ts < left_ts`` (``<=`` when ``strict=False``); unmatched left
    rows keep nulls (LEFT ASOF JOIN semantics, backward direction).

    Deterministic under (key, right_ts) ties: the lexicographically greatest
    right payload wins.  ``tolerance_seconds`` voids matches older than
    ``left_ts - tolerance``.

    One hash exchange by ``on``; within each key the window scans
    chronologically — the same single-shuffle shape Flink/Pandas merge_asof
    use.  Skewed keys can be salted upstream; the window itself spills.
    """
    on = list(on)
    rcols = [c for c in (right_cols or right.columns)
             if c not in on and c != right_ts]
    rstruct = F.struct(F.col(right_ts).alias("_rts"),
                       *[F.col(c) for c in rcols])
    r = right.select(*on, F.col(right_ts).alias("_ts"),
                     F.lit(1 if strict else 0).alias("_side"),
                     rstruct.alias("_r"))
    l = left.select(*left.columns, F.col(left_ts).alias("_ts"),
                    F.lit(0 if strict else 1).alias("_side"),
                    F.lit(None).cast(r.schema["_r"].dataType).alias("_r"))
    u = l.unionByName(r, allowMissingColumns=True)
    # strict: at equal ts the right row sorts AFTER the left (side 1 > 0) so
    # it is invisible to that left row; non-strict: before it.  Among equal
    # (key, ts) right rows the struct itself breaks the tie — "last" picks
    # the greatest payload.
    w = (Window.partitionBy(*on).orderBy("_ts", "_side", "_r")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = u.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == (0 if strict else 1)) \
           .filter(F.col(left_ts).isNotNull())
    if tolerance_seconds is not None:
        lo = _secs(F.col("_ts")) - F.lit(float(tolerance_seconds))
        out = out.withColumn(
            "_match",
            F.when(_secs(F.col("_match._rts")) >= lo,
                   F.col("_match")))
    keep = [c for c in left.columns]
    sel = [F.col(c) for c in keep]
    sel.append(F.col("_match._rts").alias(f"{prefix}{right_ts}"))
    sel += [F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in rcols]
    return out.select(*sel)


def range_join(left: DataFrame, right: DataFrame, on: Sequence[str],
               left_ts: str, right_ts: str,
               before_seconds: float, after_seconds: float = 0.0,
               right_cols: Optional[Sequence[str]] = None,
               prefix: str = "r_") -> DataFrame:
    """Inner join of each left row to every right row of the same key with
    ``right_ts ∈ [left_ts - before_seconds, left_ts + after_seconds]``.

    Bucketized: right rows are assigned to fixed-width time buckets (width =
    window span), left rows probe the ceil(span/width)+1 = 2 covering
    buckets, then the exact interval filter runs on the equi-joined pairs.
    Fan-out per left row is bounded by bucket occupancy, not table size —
    the 100 TB-safe shape for bounded temporal correlation.
    """
    on = list(on)
    span = float(before_seconds) + float(after_seconds)
    if span <= 0:
        raise ValueError("window span must be positive")
    rcols = [c for c in (right_cols or right.columns) if c not in on]
    bucket = lambda ts: F.floor(_secs(ts) / F.lit(span))
    r = right.select(
        *on, bucket(right_ts).alias("_bkt"),
        _secs(right_ts).alias("_rsec"),
        F.struct(*[F.col(c) for c in rcols]).alias("_r"))
    # a left window [lts-before, lts+after] spans at most 2 width-`span`
    # buckets; probe both via a 2-element explode
    l = left.withColumn(
        "_bkt",
        F.explode(F.array_distinct(F.array(
            F.floor((_secs(left_ts) - F.lit(float(before_seconds)))
                    / F.lit(span)),
            F.floor((_secs(left_ts) + F.lit(float(after_seconds)))
                    / F.lit(span)),
        ))))
    j = l.join(r, on=on + ["_bkt"], how="inner")
    lsec = _secs(left_ts)
    j = j.filter((F.col("_rsec") >= lsec - F.lit(float(before_seconds)))
                 & (F.col("_rsec") <= lsec + F.lit(float(after_seconds))))
    sel = [F.col(c) for c in left.columns]
    sel += [F.col(f"_r.{c}").alias(f"{prefix}{c}") for c in rcols]
    return j.select(*sel)

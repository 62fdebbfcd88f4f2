"""Temporal join operators (operators/joins.py): as-of and range joins."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from incubator_hudi_spark.operators.joins import asof_join, range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:00")),
         (2, 10, _ts("2024-01-01 12:00:00")),
         (3, 20, _ts("2024-01-01 09:00:00")),   # no prior right row
         (4, 30, _ts("2024-01-01 09:30:00"))],  # key absent on right
        "id long, user long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 09:00:00"), 1.0),
         (10, _ts("2024-01-01 10:00:00"), 2.0),   # ties left #1's ts exactly
         (10, _ts("2024-01-01 11:30:00"), 3.0),
         (20, _ts("2024-01-01 09:45:00"), 4.0)],
        "user long, ts timestamp, value double")
    return left, right


def test_asof_strict_excludes_equal_ts(spark, frames):
    left, right = frames
    out = {r["id"]: r["matched_value"]
           for r in asof_join(left, right, ["user"], "ts", "ts",
                              right_cols=["value"]).collect()}
    assert out == {1: 1.0,   # 10:00 purchase sees 09:00 click, not 10:00
                   2: 3.0, 3: None, 4: None}


def test_asof_non_strict_includes_equal_ts(spark, frames):
    left, right = frames
    out = {r["id"]: r["matched_value"]
           for r in asof_join(left, right, ["user"], "ts", "ts",
                              right_cols=["value"], strict=False).collect()}
    assert out[1] == 2.0


def test_asof_tolerance(spark, frames):
    left, right = frames
    out = {r["id"]: r["matched_value"]
           for r in asof_join(left, right, ["user"], "ts", "ts",
                              right_cols=["value"],
                              tolerance_seconds=2400).collect()}
    # left #2 at 12:00: last click 11:30 is within 40 min; left #1 at 10:00:
    # last strict click 09:00 is 60 min old → voided
    assert out == {1: None, 2: 3.0, 3: None, 4: None}


def test_range_join_window_bounds(spark, frames):
    left, right = frames
    pairs = range_join(left, right, ["user"], "ts", "ts",
                       before_seconds=3600.0, right_cols=["value"])
    got = sorted((r["id"], r["r_value"]) for r in pairs.collect())
    # id1 @10:00 ± [09:00,10:00] → 1.0, 2.0; id2 @12:00 → [11:00,12:00] → 3.0
    # id3 @09:00 → none (right 09:45 is later); id4 → key absent
    assert got == [(1, 1.0), (1, 2.0), (2, 3.0)]


def test_range_join_matches_naive_inequality(spark, frames):
    """Bucketized plan ≡ naive theta-join on random-ish data."""
    left = spark.range(0, 200).select(
        F.col("id"), (F.col("id") % 7).alias("user"),
        F.timestamp_seconds(1700000000 + (F.col("id") * 137) % 10000).alias("ts"))
    right = spark.range(0, 300).select(
        (F.col("id") + 1000).alias("rid"), (F.col("id") % 7).alias("user"),
        F.timestamp_seconds(1700000000 + (F.col("id") * 89) % 10000).alias("ts"))
    got = range_join(left, right, ["user"], "ts", "ts",
                     before_seconds=500.0, after_seconds=250.0,
                     right_cols=["rid"])
    naive = (left.alias("l").join(
        right.alias("r"),
        (F.col("l.user") == F.col("r.user"))
        & (F.col("r.ts") >= F.col("l.ts") - F.expr("INTERVAL 500 SECONDS"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 250 SECONDS")))
        .select(F.col("l.id"), F.col("r.rid")))
    assert (sorted((r["id"], r["r_rid"]) for r in got.collect())
            == sorted((r["id"], r["rid"]) for r in naive.collect()))

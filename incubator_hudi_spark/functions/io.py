"""Testdata loading helpers.

The driver's ``events.parquet`` uses INT64 TIMESTAMP(NANOS) which Spark 4
rejects by default (PARQUET_TYPE_ILLEGAL).  We flip the legacy nanos-as-long
conf at runtime and convert to microsecond timestamps (truncation — matching
what DuckDB's ``CAST(ts AS TIMESTAMP)`` does to TIMESTAMP_NS)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
        return df
    return spark.read.parquet(path)

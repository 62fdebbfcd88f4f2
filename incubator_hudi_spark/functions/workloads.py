"""Shared benchmark/probe workload constructions (bench.py, tools/scale_probe.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_local_update_batch(li: DataFrame, qty_bump: float = 2.0) -> DataFrame:
    """The 'partition-local' workload both perf harnesses time: 1-in-10 keys
    of the single most-populated month, quantities bumped.  Deterministic
    month pick (count desc, month asc tie-break)."""
    month = (li.select(F.date_format("l_shipdate", "yyyy-MM").alias("m"))
             .groupBy("m").count()
             .orderBy(F.desc("count"), "m").first()[0])
    return (li.filter(F.date_format("l_shipdate", "yyyy-MM") == month)
            .filter("l_orderkey % 10 = 3")
            .withColumn("l_quantity", F.col("l_quantity") + qty_bump))

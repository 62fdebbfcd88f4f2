"""Shared operator plumbing."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def checkpoint(df: DataFrame, checkpoint_dir: Optional[str],
               eager: bool) -> DataFrame:
    """Pin ``df`` off its lineage: ``localCheckpoint`` by default (cheap,
    executor-local — blocks lost to executor failure are unrecoverable), or
    a RELIABLE ``checkpoint`` when ``checkpoint_dir`` is set (survives
    executor loss; pass an HDFS/object-store path on long-lived clusters).
    Results are identical either way."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=eager)


def ensure_min_parallelism(df: DataFrame, key: Optional[str] = None) -> DataFrame:
    """Spread a narrow input across the cluster before CPU-heavy per-row work.

    Small corpora often arrive as one or two scan partitions (a single
    parquet file), which would serialize an explode/regex/hash pipeline onto
    one core.  Repartition up to the default parallelism ONLY in that case —
    at scale the input already has ≥ cores partitions and this is a no-op
    (no shuffle inserted).  ``key``: hash-partition by this column so a
    downstream groupBy(key) reuses the exchange instead of adding its own.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    if cur >= target:
        return df
    return df.repartition(target, F.col(key)) if key else df.repartition(target)

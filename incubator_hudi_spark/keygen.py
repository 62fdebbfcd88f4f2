"""Key generators — derive (record key, partition path) as pure Column
expressions; no per-row Python ever runs.

Reference parity (hudi-client/hudi-spark-client/.../keygen/):
  - SimpleKeyGenerator.java:31      — one record-key field
  - ComplexKeyGenerator.java:31     — multi-field ``k1:v1,k2:v2``
  - TimestampBasedKeyGenerator.java:36 — partition path from a timestamp format
  - NonpartitionedKeyGenerator.java:34 — constant empty partition
  - GlobalDeleteKeyGenerator.java:34   — key only (deletes across partitions)
  - CustomKeyGenerator.java:46         — per-field mix (field:simple / field:timestamp)

A key-gen spec in our engine is just ``(recordkey_fields, partition_expr)``
stored in TableConfig; this module turns the spec into columns.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NON_PARTITIONED = "__HIVE_DEFAULT_PARTITION__"


def record_key_col(fields: Sequence[str]) -> Column:
    """Simple (1 field, raw value) or Complex (``f1:v1,f2:v2``) record key."""
    if len(fields) == 1:
        return F.col(fields[0]).cast("string")
    parts = [F.concat_ws(":", F.lit(f), F.col(f).cast("string")) for f in fields]
    return F.concat_ws(",", *parts)


def partition_path_col(partition_expr: Optional[str]) -> Column:
    """Partition path from a SQL expression (Timestamp-based keygen becomes
    ``date_format(ts,'yyyy-MM')``; field-list keygen ``concat_ws('/',a,b)``;
    NonPartitioned → constant)."""
    if not partition_expr:
        return F.lit(NON_PARTITIONED)
    return F.expr(partition_expr).cast("string")


def add_key_columns(df: DataFrame, recordkey_fields: Sequence[str],
                    partition_expr: Optional[str],
                    key_col: str, partition_col: str) -> DataFrame:
    return df.withColumn(key_col, record_key_col(recordkey_fields)) \
             .withColumn(partition_col, partition_path_col(partition_expr))

"""``hoodie.*``-option-compatible datasource facade.

The reference's primary user surface is
``df.write.format("hudi").options(...).save(path)`` /
``spark.read.format("hudi").options(...).load(path)`` — option keys from
hudi-spark-datasource/hudi-spark/src/main/scala/.../DataSourceOptions.scala
and dispatch from HoodieSparkSqlWriter.scala:62-257 / DefaultSource.scala:
111-137.  The READ side also exists as a genuine registered format —
``spark.read.format("hudi_py")`` / ``spark.readStream.format("hudi_py")``
via PySpark 4's Python DataSource API (pyds.py); writes need the full engine
(indexing, merge planning), so the write contract stays function-shaped,
taking the identical option map:

    write_hudi(df, path, {"hoodie.table.name": "trips",
                          "hoodie.datasource.write.recordkey.field": "uuid",
                          "hoodie.datasource.write.partitionpath.field": "dt",
                          "hoodie.datasource.write.operation": "upsert"})
    read_hudi(spark, path, {"hoodie.datasource.query.type": "incremental",
                            "hoodie.datasource.read.begin.instanttime": t0})

Unknown ``hoodie.*`` keys are ignored (reference behavior); our engine-native
extras use the ``hoodie.spark.*`` prefix.
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import DataFrame, SparkSession

from .config import (COPY_ON_WRITE, MERGE_ON_READ, QUERY_INCREMENTAL,
                     QUERY_READ_OPTIMIZED, QUERY_SNAPSHOT, WriteConfig)
from .metaclient import TableMetaClient
from .table import HudiTable

# DataSourceOptions.scala:133-140 / WriteOperationType.java:28-62
_OPERATIONS = {"upsert", "insert", "bulk_insert", "delete",
               "insert_overwrite", "insert_overwrite_table",
               "delete_partition", "bootstrap"}

_TABLE_TYPES = {"COPY_ON_WRITE": COPY_ON_WRITE, "MERGE_ON_READ": MERGE_ON_READ,
                "cow": COPY_ON_WRITE, "mor": MERGE_ON_READ}

_QUERY_TYPES = {"snapshot": QUERY_SNAPSHOT, "read_optimized": QUERY_READ_OPTIMIZED,
                "incremental": QUERY_INCREMENTAL}


def _partition_expr(opts: Mapping[str, str]) -> Optional[str]:
    """partitionpath.field (comma list) + keygenerator/hive-style semantics →
    a SQL expression (keygen.py turns it into columns)."""
    expr = opts.get("hoodie.spark.partitionpath.expr")
    if expr:
        return expr
    fields = [f.strip() for f in
              opts.get("hoodie.datasource.write.partitionpath.field", "").split(",")
              if f.strip()]
    if not fields:
        return None
    hive = str(opts.get("hoodie.datasource.write.hive_style_partitioning",
                        "false")).lower() == "true"
    if hive:
        parts = [f"concat('{f}=', cast({f} as string))" for f in fields]
    else:
        parts = [f"cast({f} as string)" for f in fields]
    return parts[0] if len(parts) == 1 else "concat_ws('/', " + ", ".join(parts) + ")"


def _write_config(opts: Mapping[str, str]) -> WriteConfig:
    cfg = WriteConfig()
    m = {
        "hoodie.parquet.max.file.size": ("target_file_size_bytes", int),
        "hoodie.parquet.small.file.limit": ("small_file_limit_bytes", int),
        "hoodie.parquet.compression.codec": ("parquet_compression", str),
        "hoodie.copyonwrite.record.size.estimate": ("record_size_estimate", int),
        "hoodie.index.type": ("index_type", lambda s: s.lower()),
        "hoodie.combine.before.upsert": ("combine_before_upsert", _bool),
        "hoodie.combine.before.insert": ("combine_before_insert", _bool),
        "hoodie.compact.inline": ("inline_compaction", _bool),
        "hoodie.compact.inline.max.delta.commits": ("compact_max_delta_commits", int),
        "hoodie.cleaner.commits.retained": ("clean_retain_commits", int),
        "hoodie.cleaner.fileversions.retained": ("clean_retain_file_versions", int),
        "hoodie.keep.min.commits": ("archive_min_commits", int),
        "hoodie.keep.max.commits": ("archive_max_commits", int),
        "hoodie.upsert.shuffle.parallelism": ("write_parallelism", int),
        "hoodie.bulkinsert.sort.mode": ("bulk_insert_sort_mode", lambda s: s.lower()),
    }
    kw = {}
    for key, (attr, conv) in m.items():
        if key in opts:
            kw[attr] = conv(opts[key])
    return cfg.with_(**kw) if kw else cfg


def _bool(s) -> bool:
    return str(s).lower() == "true"


def write_hudi(df: DataFrame, path: str, options: Mapping[str, str],
               mode: str = "append") -> str:
    """HoodieSparkSqlWriter.write equivalent.  Creates the table on first
    write (or ``mode='overwrite'``), then dispatches on
    ``hoodie.datasource.write.operation`` (default upsert).  Returns the
    commit instant time."""
    op = options.get("hoodie.datasource.write.operation", "upsert").lower()
    if op not in _OPERATIONS:
        raise ValueError(f"unknown operation {op!r}; one of {sorted(_OPERATIONS)}")

    spark = df.sparkSession
    cfg = _write_config(options)
    if TableMetaClient.exists(path) and mode != "overwrite":
        table = HudiTable.load(spark, path, write_config=cfg)
    else:
        keys = [f.strip() for f in
                options.get("hoodie.datasource.write.recordkey.field", "uuid").split(",")]
        table = HudiTable.create(
            spark, path,
            name=options.get("hoodie.table.name") or path.rstrip("/").rsplit("/", 1)[-1],
            recordkey_fields=keys,
            partition_expr=_partition_expr(options),
            precombine_field=options.get("hoodie.datasource.write.precombine.field"),
            table_type=_TABLE_TYPES[
                options.get("hoodie.datasource.write.table.type", "COPY_ON_WRITE")],
            payload=_payload(options),
            write_config=cfg)

    if op == "upsert":
        return table.upsert(df)
    if op == "insert":
        return table.insert(df)
    if op == "bulk_insert":
        return table.bulk_insert(df)
    if op == "delete":
        return table.delete(df)
    if op == "insert_overwrite":
        return table.insert_overwrite(df)
    if op == "insert_overwrite_table":
        return table.insert_overwrite_table(df)
    if op == "delete_partition":
        parts = options.get("hoodie.datasource.write.partitions.to.delete", "")
        return table.delete_partitions([p.strip() for p in parts.split(",") if p.strip()])
    if op == "bootstrap":
        return table.bootstrap(options["hoodie.bootstrap.base.path"],
                               mode=options.get("hoodie.bootstrap.mode",
                                                "full_record"))
    raise AssertionError(op)


def _payload(opts: Mapping[str, str]) -> Optional[str]:
    cls = opts.get("hoodie.datasource.write.payload.class", "")
    if cls.endswith("DefaultHoodieRecordPayload"):
        from .config import PAYLOAD_DEFAULT
        return PAYLOAD_DEFAULT
    if cls.endswith("OverwriteNonDefaultsWithLatestAvroPayload"):
        from .config import PAYLOAD_OVERWRITE_NON_DEFAULTS
        return PAYLOAD_OVERWRITE_NON_DEFAULTS
    if cls.endswith("OverwriteWithLatestAvroPayload") or not cls:
        return None  # table default
    raise ValueError(f"unsupported payload class {cls!r} (supported: "
                     "OverwriteWithLatestAvroPayload, DefaultHoodieRecordPayload, "
                     "OverwriteNonDefaultsWithLatestAvroPayload)")


def read_hudi(spark: SparkSession, path: str,
              options: Optional[Mapping[str, str]] = None) -> DataFrame:
    """DefaultSource.createRelation(read) equivalent: dispatch on
    ``hoodie.datasource.query.type`` (DataSourceOptions.scala:43-48)."""
    opts = options or {}
    qt = _QUERY_TYPES[opts.get("hoodie.datasource.query.type", "snapshot").lower()]
    table = HudiTable.load(spark, path)
    return table.read(
        qt,
        begin=opts.get("hoodie.datasource.read.begin.instanttime"),
        end=opts.get("hoodie.datasource.read.end.instanttime"),
        as_of=opts.get("hoodie.datasource.read.as.of.instant"))

"""Write/table configuration for the PySpark-native Hudi-capability engine.

Mirrors the reference's config surface (``hoodie.*`` keys) with a small
dataclass.  Reference parity:
  - hudi-client/hudi-client-common/src/main/java/org/apache/hudi/config/HoodieWriteConfig.java
  - hudi-client/hudi-client-common/src/main/java/org/apache/hudi/config/HoodieStorageConfig.java:37-40
    (120 MB target file size)
  - hudi-client/hudi-client-common/src/main/java/org/apache/hudi/config/HoodieCompactionConfig.java:135-138
    (100 MB small-file limit), :59-64 (cleaner retains 10 commits),
    :79-83 (compact every 5 delta commits)
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional

# Table types — HoodieTableType.java:30-32
COPY_ON_WRITE = "COPY_ON_WRITE"
MERGE_ON_READ = "MERGE_ON_READ"

# Write operations — org/apache/hudi/common/model/WriteOperationType.java:28-62
UPSERT = "upsert"
INSERT = "insert"
BULK_INSERT = "bulk_insert"
DELETE = "delete"
DELETE_PARTITION = "delete_partition"
INSERT_OVERWRITE = "insert_overwrite"
INSERT_OVERWRITE_TABLE = "insert_overwrite_table"
BOOTSTRAP = "bootstrap"
COMPACT = "compact"
CLUSTER = "cluster"

# Query types — DataSourceOptions.scala:43-48
QUERY_SNAPSHOT = "snapshot"
QUERY_READ_OPTIMIZED = "read_optimized"
QUERY_INCREMENTAL = "incremental"

# Payloads (merge semantics) — OverwriteWithLatestAvroPayload.java:38,
# DefaultHoodieRecordPayload.java:41,93,
# OverwriteNonDefaultsWithLatestAvroPayload.java:38-75
PAYLOAD_OVERWRITE_LATEST = "overwrite_latest"   # arriving batch always wins
PAYLOAD_DEFAULT = "default"                     # precombine (event-time) ordering guard
# partial update: null fields in the winning version fall back to the newest
# stored non-null value (reference: fields equal to their schema default keep
# the stored value; null is the default for nullable Avro fields)
PAYLOAD_OVERWRITE_NON_DEFAULTS = "overwrite_non_defaults"

# Bulk-insert sort modes — BulkInsertSortMode (GlobalSortPartitioner.java:34-45 etc.)
SORT_GLOBAL = "GLOBAL_SORT"
SORT_PARTITION = "PARTITION_SORT"
SORT_NONE = "NONE"

# Index types — HoodieIndex.java:106-108 (subset meaningful on Spark)
INDEX_SIMPLE = "SIMPLE"
INDEX_GLOBAL_SIMPLE = "GLOBAL_SIMPLE"
INDEX_BLOOM = "BLOOM"          # min/max-key stats pruning from commit metadata
INDEX_GLOBAL_BLOOM = "GLOBAL_BLOOM"
# key→location cache held on the table object across batches
# (SparkInMemoryHashIndex.java — ours is a persisted DataFrame, not a
# driver hashmap, so it scales past driver memory)
INDEX_INMEMORY = "INMEMORY"

# Table layout version (hudi-common/.../HoodieTableVersion.java): v1 =
# manifests without per-file record-key ranges; v2 = ranges present
# (stats pruning).  services/upgrade.py migrates between them.
CURRENT_TABLE_VERSION = 2

# Cleaning policies — HoodieCleaningPolicy.java:24-26
CLEAN_KEEP_LATEST_COMMITS = "KEEP_LATEST_COMMITS"
CLEAN_KEEP_LATEST_FILE_VERSIONS = "KEEP_LATEST_FILE_VERSIONS"

META_COMMIT_TIME = "_hoodie_commit_time"
META_COMMIT_SEQNO = "_hoodie_commit_seqno"
META_RECORD_KEY = "_hoodie_record_key"
META_PARTITION_PATH = "_hoodie_partition_path"
META_FILE_NAME = "_hoodie_file_name"  # carries the file-group id in our engine
META_COLUMNS = [
    META_COMMIT_TIME,
    META_COMMIT_SEQNO,
    META_RECORD_KEY,
    META_PARTITION_PATH,
    META_FILE_NAME,
]
DELETE_MARKER = "_hoodie_is_deleted"  # OverwriteWithLatestAvroPayload.java:81-84


@dataclass
class TableConfig:
    """Persistent table-level config (reference: HoodieTableConfig.java /
    ``hoodie.properties``; ours: ``.hoodie/table_properties.json``)."""

    name: str
    table_type: str = COPY_ON_WRITE
    recordkey_fields: tuple[str, ...] = ()
    # partition path: either a list of fields or a SQL expression string
    # (TimestampBasedKeyGenerator-style, e.g. "date_format(ts,'yyyy-MM')").
    partition_expr: Optional[str] = None
    precombine_field: Optional[str] = None
    payload: str = PAYLOAD_OVERWRITE_LATEST
    version: int = CURRENT_TABLE_VERSION
    # base-file format (HoodieTableConfig.BASE_FILE_FORMAT /
    # HoodieFileFormat.java: PARQUET, ORC, HFILE).  Governs BASE files only;
    # MOR delta files stay parquet (they replace the reference's own .log
    # block format, which is base-format-independent).  HFILE is the
    # metadata-table-internal format in the reference — out of scope.
    base_format: str = "parquet"

    def to_json(self) -> dict:
        return {
            "hoodie.table.name": self.name,
            "hoodie.table.type": self.table_type,
            "hoodie.table.recordkey.fields": list(self.recordkey_fields),
            "hoodie.table.partition.expr": self.partition_expr,
            "hoodie.table.precombine.field": self.precombine_field,
            "hoodie.table.payload": self.payload,
            "hoodie.table.version": self.version,
            "hoodie.table.base.file.format": self.base_format,
        }

    @staticmethod
    def from_json(d: dict) -> "TableConfig":
        return TableConfig(
            name=d["hoodie.table.name"],
            table_type=d.get("hoodie.table.type", COPY_ON_WRITE),
            recordkey_fields=tuple(d.get("hoodie.table.recordkey.fields") or ()),
            partition_expr=d.get("hoodie.table.partition.expr"),
            precombine_field=d.get("hoodie.table.precombine.field"),
            payload=d.get("hoodie.table.payload", PAYLOAD_OVERWRITE_LATEST),
            version=int(d.get("hoodie.table.version", 1)),
            base_format=d.get("hoodie.table.base.file.format", "parquet"),
        )


@dataclass
class WriteConfig:
    """Per-writer tunables (reference: HoodieWriteConfig.java:135-160,
    HoodieStorageConfig.java:37-40, HoodieCompactionConfig.java)."""

    target_file_size_bytes: int = 120 * 1024 * 1024     # hoodie.parquet.max.file.size
    small_file_limit_bytes: int = 100 * 1024 * 1024     # hoodie.parquet.small.file.limit
    record_size_estimate: int = 1024                    # hoodie.copyonwrite.record.size.estimate
    index_type: str = INDEX_SIMPLE
    combine_before_upsert: bool = True                  # hoodie.combine.before.upsert
    combine_before_insert: bool = False
    bulk_insert_sort_mode: str = SORT_GLOBAL
    # MOR compaction (HoodieCompactionConfig.java:79-83)
    compact_max_delta_commits: int = 5
    inline_compaction: bool = False
    # CompactionTriggerStrategy.java:21-29 — num_commits | time_elapsed |
    # num_and_time | num_or_time
    compact_trigger: str = "num_commits"
    compact_max_delta_seconds: int = 3600
    # cleaning (HoodieCompactionConfig.java:46-69); hoodie.clean.automatic
    # defaults true in the reference
    auto_clean: bool = True
    auto_archive: bool = True
    clean_policy: str = CLEAN_KEEP_LATEST_COMMITS
    clean_retain_commits: int = 10
    clean_retain_file_versions: int = 3
    # archival (HoodieTimelineArchiveLog.java:120)
    archive_min_commits: int = 20
    archive_max_commits: int = 30
    # shuffle parallelism cap for write repartitions (HoodieWriteConfig.java:135-160).
    # None → one task per planned bucket (file-group), the natural Spark choice.
    write_parallelism: Optional[int] = None
    parquet_compression: str = "snappy"                 # ref default gzip; snappy/zstd is the Spark norm
    # column-stats index: per-file [min, max] of these columns is collected
    # into the commit manifest at write time (beyond the always-on record-key
    # range) and drives read-side data skipping via HudiTable.read_filtered
    stats_columns: tuple = ()
    # batches up to this many rows broadcast their key set to prune the index
    # scan (indexing.tag_locations) instead of shuffling/building it
    index_broadcast_max_rows: int = 1_000_000
    # SIMPLE index: pin the scanned key→file-group index as a persisted
    # DataFrame on the table object across batches (same machinery as
    # INMEMORY), invalidated whenever the last completed data instant
    # differs from the one the cache was built at — multi-writer safe, any
    # out-of-band commit bumps the timeline and drops the cache.  The
    # reference's SparkSimpleIndex re-scans base files per batch
    # (HoodieSimpleIndex.java fetchRecordLocations); caching trades executor
    # memory (key+partition+fg columns, spilled to disk past memory) for
    # skipping that table-sized scan on every steady-state batch.
    cache_simple_index: bool = True
    # auto-run table-version upgrade at write start when the table is from
    # an older layout (hoodie.auto.upgrade / UpgradeDowngrade default true);
    # False → raise TableVersionError instead
    auto_upgrade: bool = True
    # batches up to this many rows may collect their key set driver-side to
    # bloom-prune the COW rewrite set (bloom.py sidecar; the reference BLOOM
    # index's second pruning stage after min/max ranges)
    bloom_prune_max_batch_keys: int = 5_000
    # global indexes: when an update's partition expression maps to a new
    # partition, False (reference default) routes it to the record's EXISTING
    # partition; True MOVES the record — delete in the old partition + insert
    # in the new (hoodie.bloom/simple.index.update.partition.path,
    # SparkHoodieGlobalBloomIndex.java:143)
    global_index_update_partition_path: bool = False
    # COW rewrite strategy: None = auto (broadcast anti-join pass-through when
    # the batch is broadcastable AND semantically eligible — new-commit-wins
    # payload, preCombined batch — else the per-file-group window merge).
    # True forces the broadcast path whenever semantically eligible (skips
    # the size guard only); False always uses the window merge.
    cow_broadcast_merge: Optional[bool] = None
    # COW fast-lane pre-write probe strategy:
    #   "auto" (default) — per batch: "warm_tag" when the previous batch's
    #                row count says the batch touches a MINORITY of file
    #                groups (keys < 0.5 × groups — the point-fix/CDC/GDPR
    #                shape), else "profile" (the full-spread shape).  First
    #                batch runs "profile" (no history).  Homogeneous
    #                workloads are routed correctly from batch 2.
    #   "warm_tag" — with a warm cached index: bounded limit(cap+1) size
    #                probe + one tag-profile action over the PINNED index.
    #                The rewrite set is EXACT, so a point-fix batch on an
    #                unsorted layout rewrites only the groups that hold
    #                batch keys (measured 17 vs 210 groups, ~40% faster
    #                wall at sf0.1 — and the difference between a bounded
    #                write and a partition rewrite at 120 MB group sizes);
    #                ~5% slower on full-spread batches (interleaved A/Bs,
    #                BASELINE.md).  Falls back to "profile" while the
    #                cache is cold.
    #   "profile"  — one per-batch workload-profile action over the raw
    #                keyed batch (count/min/max per partition); tagging
    #                fuses into the write job; rewrite set = manifest-stats
    #                superset (+ bloom second stage when a sidecar exists).
    fast_lane_probe: str = "auto"
    # MOR merged read/compaction: when a dirty slice-set's total log bytes is
    # under this, the base side is split by a broadcast of the log key set —
    # untouched keys pass through in their scan partitions (ZERO shuffle of
    # the base table) and only touched keys enter the latest-wins window.
    # Above it, the global union+window path runs (logs too big to broadcast).
    mor_merge_broadcast_max_log_bytes: int = 64 * 1024 * 1024
    # write a metadata-table view checkpoint every N data commits
    # (HoodieBackedTableMetadataWriter sync cadence; 0 disables)
    metadata_checkpoint_commits: int = 10
    # MOR grouped delta files: a small update batch writes ONE (or a few,
    # AQE-sized) shared delta files per commit instead of one tiny file per
    # touched file group — the engine's answer to the reference's appendable
    # per-group avro logs (HoodieAppendHandle rolls blocks into one growing
    # log; parquet can't append, so grouping bounds the small-file count the
    # same way).  Rows carry their file group in _hoodie_file_name; the
    # manifest records exact per-(group, file) membership, reads dedupe the
    # shared paths and filter to the selected groups, and the cleaner only
    # deletes a shared file when no retained slice references it.
    mor_grouped_deltas: bool = True

    def __post_init__(self):
        if self.fast_lane_probe not in ("auto", "profile", "warm_tag"):
            raise ValueError(
                f"fast_lane_probe must be 'auto', 'profile' or 'warm_tag', "
                f"got {self.fast_lane_probe!r}")

    def with_(self, **kw) -> "WriteConfig":
        return replace(self, **kw)

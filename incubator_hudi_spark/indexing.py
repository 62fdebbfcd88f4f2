"""Index operators: key → file-group lookup, as DataFrame joins.

Reference parity (hudi-client/.../index/):
  - SIMPLE / GLOBAL_SIMPLE (SparkHoodieSimpleIndex.java:91-143): read
    (key, partition, fileId) from latest base files of affected partitions,
    left-join the incoming batch.  This is our default.
  - BLOOM / GLOBAL_BLOOM (SparkHoodieBloomIndex.java:70-140): the reference
    prunes candidate files with per-file min/max key ranges + bloom filters
    from parquet footers before verifying against actual keys.  PySpark can't
    read footer blooms, so our commit manifest stores per-file min/max record
    keys (fsview.key_stats) and we prune the *file list* before the key scan —
    same correctness (pruning is only an accelerator), one fewer pass.

Scale notes: the key scan is column-pruned to the 3 meta columns (parquet
columnar → reads ~nothing else), restricted to partitions present in the
incoming batch (non-global), and further restricted by key-range overlap
(BLOOM).  The join shuffles only (incoming ∪ candidate-keys), never the table.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from .config import (INDEX_BLOOM, INDEX_GLOBAL_BLOOM, INDEX_GLOBAL_SIMPLE,
                     INDEX_SIMPLE, META_FILE_NAME, META_PARTITION_PATH,
                     META_RECORD_KEY)
from .fsview import FileSystemView
from .scan import scan_parquet
from .metaclient import TableMetaClient

FG_COL = "_hoodie_index_fg"
CUR_PART_COL = "_hoodie_index_partition"

_KEY_SCAN_SCHEMA = StructType([
    StructField(META_RECORD_KEY, StringType()),
    StructField(META_PARTITION_PATH, StringType()),
    StructField(META_FILE_NAME, StringType()),
])


def is_global(index_type: str) -> bool:
    return index_type in (INDEX_GLOBAL_SIMPLE, INDEX_GLOBAL_BLOOM)


def _candidate_slices(view: FileSystemView, index_type: str,
                      partitions: Optional[list[str]],
                      key_range: Optional[tuple[str, str]]):
    parts = None if is_global(index_type) else partitions
    slices = view.latest_slices(parts)
    if index_type in (INDEX_BLOOM, INDEX_GLOBAL_BLOOM) and key_range is not None:
        from .fsview import base_key_range
        lo, hi = key_range
        pruned = []
        for sl in slices:
            rng = base_key_range(sl)
            if rng is None:
                pruned.append(sl)  # incomplete stats → cannot prune
            elif not (hi < rng[0] or lo > rng[1]):
                pruned.append(sl)
        slices = pruned
    return slices


def load_key_index(spark: SparkSession, meta: TableMetaClient, view: FileSystemView,
                   index_type: str = INDEX_SIMPLE,
                   partitions: Optional[list[str]] = None,
                   key_range: Optional[tuple[str, str]] = None,
                   tc=None, only_fgs: Optional[set] = None) -> DataFrame:
    """DataFrame(key, partition, fg) of all live records in candidate slices.

    MOR: records first inserted into log files don't exist in base files; we
    also scan the key columns of log (delta parquet) files so tagging sees
    them (the reference achieves this via HoodieMergedLogRecordScanner).
    Deleted keys resolve via latest-wins on the delete marker downstream —
    for tagging purposes a delete row still maps the key to its file group.

    METADATA_ONLY-bootstrapped (external) base files carry no meta columns;
    their keys are derived with the keygen expressions (``tc`` required when
    such files exist) — still a column-pruned scan of just the key fields.
    """
    slices = _candidate_slices(view, index_type, partitions, key_range)
    if only_fgs is not None:
        # caller proved (bloom second stage) batch keys live only here
        slices = [sl for sl in slices if sl.file_group in only_fgs]
    base_paths, log_paths = [], []
    ext: list[tuple[str, str]] = []   # (abs path, fg)
    for sl in slices:
        for f in sl.base_files:
            if f.external:
                ext.append((meta.abs_path(f.path), sl.file_group))
            else:
                base_paths.append(meta.abs_path(f.path))
        log_paths.extend(meta.abs_path(l.path) for l in sl.log_files)
    base_fmt = getattr(tc, "base_format", "parquet") if tc else "parquet"
    dfs = []
    if base_fmt == "parquet":
        paths = base_paths + log_paths   # one combined scan (both parquet)
        if paths:
            dfs.append(scan_parquet(spark, paths, _KEY_SCAN_SCHEMA)
                       .select(META_RECORD_KEY, META_PARTITION_PATH,
                               META_FILE_NAME))
    else:
        # ORC bases + parquet delta files can't share a scan
        for plist, f in ((base_paths, base_fmt), (log_paths, "parquet")):
            if plist:
                dfs.append(scan_parquet(spark, plist, _KEY_SCAN_SCHEMA, fmt=f)
                           .select(META_RECORD_KEY, META_PARTITION_PATH,
                                   META_FILE_NAME))
    if ext:
        if tc is None:
            raise ValueError("external base files need the table config for "
                             "key derivation")
        from .keygen import partition_path_col, record_key_col
        src = scan_parquet(spark, [p for p, _ in ext])
        norm = F.regexp_replace(F.input_file_name(), "^file:/*", "/")
        fg_map = F.create_map(*[x for p, fg in ext
                                for x in (F.lit(p), F.lit(fg))])
        dfs.append(src.select(
            record_key_col(tc.recordkey_fields).alias(META_RECORD_KEY),
            partition_path_col(tc.partition_expr).alias(META_PARTITION_PATH),
            fg_map[norm].alias(META_FILE_NAME)))
    if not dfs:
        return spark.createDataFrame([], _KEY_SCAN_SCHEMA) \
            .select(F.col(META_RECORD_KEY),
                    F.col(META_PARTITION_PATH).alias(CUR_PART_COL),
                    F.col(META_FILE_NAME).alias(FG_COL))
    df = dfs[0]
    for x in dfs[1:]:
        df = df.unionByName(x)
    # NOTE: a key may map to the same file group several times (MOR base+log,
    # or duplicate keys within one file).  We deliberately do NOT dedup here —
    # that would shuffle the table-sized key scan on every upsert.  Duplicate
    # tagged rows are benign: the per-file-group latest-wins merge collapses
    # them deterministically (the reference's SIMPLE index likewise emits one
    # row per stored location, SparkHoodieSimpleIndex.java:112).
    return df.select(F.col(META_RECORD_KEY),
                     F.col(META_PARTITION_PATH).alias(CUR_PART_COL),
                     F.col(META_FILE_NAME).alias(FG_COL))


def tag_locations(incoming: DataFrame, index_df: DataFrame, index_type: str,
                  key_col: str = META_RECORD_KEY,
                  partition_col: str = META_PARTITION_PATH,
                  broadcast_incoming: bool = False,
                  update_partition_path: bool = False) -> DataFrame:
    """Attach (fg, current partition) to incoming rows; null fg → insert.

    Non-global: key unique within partition → join on (key, partition).
    Global: key unique table-wide → join on key only; an update whose
    incoming partition differs is routed to its *existing* partition
    (update-partition-path=false default, SparkHoodieGlobalBloomIndex.java:143).
    With ``update_partition_path`` the record MOVES instead: the row splits
    into a delete tagged to the old location plus an untagged insert in the
    incoming partition (the reference emits the same delete+insert pair).

    ``broadcast_incoming`` (batch ≪ table, the common upsert shape): never
    build a hash table from the big index side — broadcast the batch's key set
    to semi-join-prune the streamed index scan down to the matched locations
    (≤ batch size), then broadcast those back onto the batch.  At cluster
    scale this is the only plan that works: the key scan is table-sized and
    must stream; the reference gets the same effect from its bucketized bloom
    check (BucketizedBloomCheckPartitioner.java).
    """
    on = [key_col] if is_global(index_type) else [key_col, partition_col]
    idx = (index_df if is_global(index_type)
           else index_df.withColumnRenamed(CUR_PART_COL, partition_col))
    if broadcast_incoming:
        probe = incoming.select(*on).dropDuplicates(on)
        idx = idx.join(F.broadcast(probe), on=on, how="left_semi")
        # collapse multi-row locations (MOR base+log, duplicate keys within
        # one file) on the pruned ≤batch-sized side so the tagging join can
        # only multiply per distinct file group — callers then need no
        # batch-wide dedup shuffle
        dedup_cols = on + ([CUR_PART_COL] if is_global(index_type) else []) \
            + [FG_COL]
        idx = F.broadcast(idx.dropDuplicates(dedup_cols))
    tagged = incoming.join(idx, on=on, how="left")
    if is_global(index_type):
        if update_partition_path:
            from .writer import API_DELETE
            is_del = (F.coalesce(F.col(API_DELETE), F.lit(False))
                      if API_DELETE in tagged.columns else F.lit(False))
            moving = (F.col(CUR_PART_COL).isNotNull()
                      & (F.col(CUR_PART_COL) != F.col(partition_col))
                      & ~is_del)
            rest = (tagged.filter(~moving)
                    .withColumn(partition_col,
                                F.coalesce(F.col(CUR_PART_COL),
                                           F.col(partition_col)))
                    .drop(CUR_PART_COL))
            moved = tagged.filter(moving)
            # insert half: incoming partition, no location tag
            mv_ins = (moved.withColumn(FG_COL, F.lit(None).cast("string"))
                           .drop(CUR_PART_COL))
            # delete half: old location, marked as a hard delete
            mv_del = (moved.withColumn(partition_col, F.col(CUR_PART_COL))
                           .withColumn(API_DELETE, F.lit(True))
                           .drop(CUR_PART_COL))
            if API_DELETE not in rest.columns:
                rest = rest.withColumn(API_DELETE, F.lit(False))
                mv_ins = mv_ins.withColumn(API_DELETE, F.lit(False))
            return rest.unionByName(mv_ins).unionByName(mv_del)
        tagged = tagged.withColumn(
            partition_col,
            F.coalesce(F.col(CUR_PART_COL), F.col(partition_col)))
        tagged = tagged.drop(CUR_PART_COL)
    return tagged

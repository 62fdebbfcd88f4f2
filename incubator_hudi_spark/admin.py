"""Admin surface: timeline / file-system-view / stats as DataFrames.

Reference: hudi-cli (22 command classes under hudi-cli/.../commands/ —
CommitsCommand, FileSystemViewCommand, StatsCommand write-amplification,
CompactionCommand, SavepointsCommand, …) driven through SparkMain.java:74-77.
Ours returns DataFrames so the "CLI" is any Spark shell or notebook.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from . import timeline as tl


def commits_df(table) -> DataFrame:
    """CommitsCommand: one row per completed data instant."""
    rows = []
    for ins in table.timeline.completed(tl.DATA_ACTIONS):
        md = table.timeline.read_metadata(ins)
        rows.append((ins.time, ins.action, md.get("operation"),
                     md.get("num_records_written", 0),
                     md.get("total_bytes_written", 0),
                     len(md.get("write_stats", [])),
                     len(md.get("replaced_file_groups", []))))
    return table.spark.createDataFrame(
        rows, "instant string, action string, operation string, "
              "records_written long, bytes_written long, files_written int, "
              "file_groups_replaced int")


def timeline_df(table, include_archived: bool = False) -> DataFrame:
    insts = table.timeline.instants()
    if include_archived:
        insts += table.timeline.archived_instants()
    return table.spark.createDataFrame(
        [(i.time, i.action, i.state) for i in insts],
        "instant string, action string, state string")


def files_df(table, as_of: str | None = None) -> DataFrame:
    """FileSystemViewCommand: latest live file slices."""
    rows = []
    for sl in table.view(as_of).latest_slices():
        for f in sl.base_files:
            rows.append((sl.partition, sl.file_group, sl.base_instant,
                         "base", f.path, f.size, f.num_records,
                         f.min_key, f.max_key))
        for l in sl.log_files:
            rows.append((sl.partition, sl.file_group, sl.base_instant,
                         "log", l.path, l.size, l.num_records, None, None))
    return table.spark.createDataFrame(
        rows, "partition string, file_group string, base_instant string, "
              "kind string, path string, size long, num_records long, "
              "min_key string, max_key string")


def partitions_df(table) -> DataFrame:
    return table.spark.createDataFrame(
        [(p,) for p in table.view().partitions()], "partition string")


def stats_df(table) -> DataFrame:
    """StatsCommand: per-commit write amplification = bytes written per
    upsert relative to the logical record volume."""
    rows = []
    total_records = 0
    for ins in table.timeline.completed(tl.DATA_ACTIONS):
        md = table.timeline.read_metadata(ins)
        written = md.get("num_records_written", 0)
        bytes_w = md.get("total_bytes_written", 0)
        total_records = max(total_records, written)
        amp = (written / md["extra"]["input_records"]
               if md.get("extra", {}).get("input_records") else None)
        rows.append((ins.time, md.get("operation"), written, bytes_w, amp))
    return table.spark.createDataFrame(
        rows, "instant string, operation string, records_written long, "
              "bytes_written long, write_amplification double")


def pending_compactions_df(table) -> DataFrame:
    rows = []
    for p in table.timeline.pending():
        if p.action == tl.COMPACTION:
            md = table.timeline.read_metadata(p)
            for op in md.get("operations", []):
                rows.append((p.time, op["partition"], op["file_group"],
                             op.get("base_instant")))
    return table.spark.createDataFrame(
        rows, "instant string, partition string, file_group string, "
              "base_instant string")


def savepoints_df(table) -> DataFrame:
    rows = []
    for ins in table.timeline.completed([tl.SAVEPOINT]):
        md = table.timeline.read_metadata(ins)
        rows.append((ins.time, md.get("savepoint_at", ins.time)))
    return table.spark.createDataFrame(rows, "instant string, savepoint_at string")


def upgrade_table(table, to_version: int = None) -> int:
    """Version-gated layout migration (hudi-client/.../table/upgrade/
    UpgradeDowngrade.java) — see services/upgrade.py for the step handlers
    (v1 <-> v2: per-file key-range backfill/strip in commit manifests)."""
    from .config import CURRENT_TABLE_VERSION
    from .services.upgrade import upgrade_table as _up
    return _up(table, CURRENT_TABLE_VERSION if to_version is None else to_version)


def log_files_df(table) -> DataFrame:
    """HoodieLogFileCommand: MOR delta (log) files of the latest slices with
    the slice they attach to."""
    rows = []
    for sl in table.view().latest_slices():
        for lf in sl.log_files:
            rows.append((sl.partition, sl.file_group, sl.base_instant,
                         lf.instant, lf.path, lf.size, lf.num_records))
    return table.spark.createDataFrame(
        rows, "partition string, file_group string, base_instant string, "
              "log_instant string, path string, size long, num_records long")


def duplicate_keys_df(table) -> DataFrame:
    """RepairsCommand(deduplicate) inspection half: HoodieKeys that resolve
    to more than one live row in the current snapshot (legitimate after
    insert/bulk_insert, which don't combine)."""
    from pyspark.sql import functions as F
    from .config import META_PARTITION_PATH, META_RECORD_KEY
    return (table.read()
            .groupBy(META_RECORD_KEY, META_PARTITION_PATH)
            .agg(F.count(F.lit(1)).alias("copies"))
            .filter("copies > 1"))


def repair_deduplicate(table) -> str | None:
    """RepairsCommand(deduplicate): collapse duplicate-key rows to their
    payload winner by re-upserting one representative per key — the normal
    merge path then rewrites exactly the affected file groups."""
    from pyspark.sql import functions as F
    from .config import META_PARTITION_PATH, META_RECORD_KEY
    snap = table.read()
    dups = (snap.groupBy(META_RECORD_KEY, META_PARTITION_PATH)
                .agg(F.count(F.lit(1)).alias("_copies")).filter("_copies > 1")
                .drop("_copies"))
    victims = snap.join(
        F.broadcast(dups), on=[META_RECORD_KEY, META_PARTITION_PATH],
        how="left_semi")
    if not victims.take(1):
        return None
    data_cols = [c for c in victims.columns if not c.startswith("_hoodie_")]
    return table.upsert(victims.select(*data_cols))


def export_snapshot(table, dest_path: str, fmt: str = "parquet",
                    as_of: str | None = None,
                    partition_by_path: bool = True,
                    include_meta_columns: bool = False) -> int:
    """HoodieSnapshotExporter (hudi-utilities/.../HoodieSnapshotExporter.java):
    materialize the latest (or as-of) snapshot as a plain parquet/orc/json
    dataset outside the table — e.g. to hand a frozen copy to a non-engine
    consumer.  Partitioned by the hudi partition path when asked (the
    reference's --output-partition-field behavior).  Returns rows exported.

    Scale: a single distributed read→write; no driver materialization.
    """
    from .config import META_PARTITION_PATH
    df = table.read(as_of=as_of)
    if not include_meta_columns:
        keep = [c for c in df.columns if not c.startswith("_hoodie_")]
        out = df.select(*keep, META_PARTITION_PATH) if partition_by_path else df.select(*keep)
    else:
        out = df
    writer = out.write.mode("overwrite").format(fmt)
    if partition_by_path:
        writer = writer.partitionBy(META_PARTITION_PATH)
    writer.save(dest_path)
    if fmt == "parquet":
        # count from the written files' footers — no second table scan
        import os

        import pyarrow.parquet as pq
        total = 0
        for root, _d, files in os.walk(dest_path):
            for fn in files:
                if fn.endswith(".parquet"):
                    total += pq.ParquetFile(os.path.join(root, fn)).metadata.num_rows
        return total
    return df.count()


def cleans_df(table) -> DataFrame:
    """CleansCommand: one row per completed clean with its deletion count."""
    rows = []
    for ins in table.timeline.completed([tl.CLEAN]):
        md = table.timeline.read_metadata(ins)
        deleted = md.get("deleted_paths", [])
        rows.append((ins.time, len(deleted),
                     md.get("policy"), md.get("retained"),
                     md.get("earliest_retained")))
    return table.spark.createDataFrame(
        rows, "instant string, files_deleted int, policy string, "
              "retained string, earliest_retained string")


def rollbacks_df(table) -> DataFrame:
    """RollbacksCommand: completed rollbacks with their undone instants."""
    rows = []
    for ins in table.timeline.completed([tl.ROLLBACK]):
        md = table.timeline.read_metadata(ins)
        rows.append((ins.time, md.get("rolled_back_instant"),
                     len(md.get("deleted_paths", []))))
    return table.spark.createDataFrame(
        rows, "instant string, rolled_back_instant string, files_deleted int")


def write_amplification_df(table) -> DataFrame:
    """StatsCommand write-amplification: per commit, records written vs the
    batch's unique-record upper bound (for COW a 1%-update batch rewrites
    whole file groups, so WA >> 1 is expected and this is the visibility
    tool for it).  ``records_updated`` is the row count written into file
    groups that pre-existed the commit (for COW that is the rewritten group's
    full row count; for MOR it is the delta-log rows) — the denominator of
    the write-amplification ratio."""
    rows = []
    # seed from ARCHIVED commits too: a long-lived file group whose creating
    # commit sits behind the archival boundary must still count as
    # pre-existing, or mature tables report records_updated=0 on exactly the
    # update-heavy commits this diagnostic exists for
    seen_fgs: set = set()
    for ins in table.timeline.archived_instants():
        if ins.action not in tl.DATA_ACTIONS:
            continue
        md = table.timeline.read_metadata(ins)
        seen_fgs.update((s.get("partition"), s.get("file_group"))
                        for s in md.get("write_stats", []))
    for ins in table.timeline.completed(tl.DATA_ACTIONS):
        md = table.timeline.read_metadata(ins)
        written = md.get("num_records_written", 0)
        stats = md.get("write_stats", [])
        n_files = len(stats)
        log_records = sum(s.get("num_records", 0) for s in stats if s.get("log"))
        updated = sum(s.get("num_records", 0) for s in stats
                      if (s.get("partition"), s.get("file_group")) in seen_fgs)
        seen_fgs.update((s.get("partition"), s.get("file_group")) for s in stats)
        rows.append((ins.time, md.get("operation"), written, n_files,
                     log_records, updated))
    return table.spark.createDataFrame(
        rows, "instant string, operation string, records_written long, "
              "files int, log_records long, records_updated long")

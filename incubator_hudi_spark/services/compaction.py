"""Compaction: merge MOR delta (log) files into new base files.

Reference parity:
  - schedule: BaseScheduleCompactionActionExecutor + strategies under
    hudi-client/hudi-client-common/.../compact/strategy/ (LogFileSizeBased is
    the default) and triggers CompactionTriggerStrategy.java:21-29
    (NUM_COMMITS default 5, HoodieCompactionConfig.java:79-83); plan persisted
    as ``<t>.compaction.requested``.
  - run: HoodieSparkMergeOnReadTableCompactor.java:90-177 — per file group,
    merge base+logs and write a new base file, completing as a ``commit``.

Our run is the same union+latest-wins window the snapshot read uses, then a
partitionBy(_fg) write.  Record meta columns (notably ``_hoodie_commit_time``)
are **preserved**, so incremental queries through a compaction see original
change times (matching the reference's log-record carry-over).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import functions as F

from .. import timeline as tl
from ..config import COMPACT, META_FILE_NAME, MERGE_ON_READ
from ..writer import API_DELETE, FG, drop_deleted, latest_wins, write_instant_files


def schedule_compaction(table, max_logs_per_slice: int = 1,
                        partitions=None) -> Optional[str]:
    """LogFileSizeBased-style: pick latest slices carrying >= N log files
    (size-weighted at scale; count is the deterministic small-data proxy)."""
    if table.tc.table_type != MERGE_ON_READ:
        return None
    view = table.view()
    ops = []
    for sl in view.latest_slices(partitions):
        if len(sl.log_files) >= max_logs_per_slice and sl.log_files:
            ops.append({"partition": sl.partition, "file_group": sl.file_group,
                        "base_instant": sl.base_instant})
    if not ops:
        return None
    t = tl.new_instant_time()
    table.timeline.create_requested(t, tl.COMPACTION, {"operations": ops})
    return t


def run_compaction(table, instant_time: Optional[str] = None) -> Optional[str]:
    if instant_time is None:
        pend = [i for i in table.timeline.pending() if i.action == tl.COMPACTION]
        if not pend:
            instant_time = schedule_compaction(table)
            if instant_time is None:
                return None
        else:
            instant_time = pend[0].time
    req = tl.Instant(instant_time, tl.COMPACTION, tl.REQUESTED)
    plan = table.timeline.read_metadata(req)
    inflight = table.timeline.transition_to_inflight(req, plan)

    fgs = {op["file_group"]: op["partition"] for op in plan["operations"]}
    view = table.view()
    slices = [sl for sl in view.latest_slices() if sl.file_group in fgs]
    # _read_slices(raw=True) already merged base∪logs with the latest-wins
    # window and kept the delete markers; resolve them here.
    merged = table._read_slices(slices, read_optimized=False, raw=True)
    merged = drop_deleted(merged).drop(API_DELETE)
    merged = merged.withColumn(META_FILE_NAME, F.col(FG))
    schema = table._read_schema()
    stats = write_instant_files(
        merged.select(*[c for c in merged.columns if c in schema.names or c == FG]),
        table.meta, instant_time, fgs, table.cfg,
        sort_cols=["_hoodie_record_key"])
    table._complete(inflight, COMPACT, stats, schema,
                    completed_action=tl.COMMIT)
    return instant_time


def maybe_inline_compact(table) -> Optional[str]:
    """NUM_COMMITS trigger: compact when >= N delta commits landed since the
    last compaction (CompactionTriggerStrategy.NUM_COMMITS)."""
    comp = table.timeline.completed([tl.COMMIT])
    last_compact = comp[-1].time if comp else ""
    deltas_since = [i for i in table.timeline.completed([tl.DELTA_COMMIT])
                    if i.time > last_compact]
    if len(deltas_since) >= table.cfg.compact_max_delta_commits:
        return run_compaction(table)
    return None

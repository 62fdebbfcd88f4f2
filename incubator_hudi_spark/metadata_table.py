"""Metadata table: persisted checkpoints of the file-system view.

Reference: the internal metadata table under ``.hoodie/metadata``
(hudi-client/hudi-client-common/.../metadata/HoodieBackedTableMetadataWriter.java,
MetadataPartitionType.java:21-23 ``files`` partition, reader
HoodieBackedTableMetadata.java) — a key→file-list store synced on every commit
so that listing a 100 TB table is O(partitions), not O(files).

Our engine's active timeline already *is* a file manifest (fsview.py folds
commit metadata, zero listing), so the scale problem shifts: the fold is
O(#instants × files-per-commit) driver work and the timeline can never archive
an instant whose files are still live.  The metadata table solves both as a
**checkpoint of the folded view**: one parquet file under
``.hoodie/metadata/<instant>.ckpt.parquet`` holding every live file slice
(with size / row-count / record-key min-max stats — it doubles as the
BLOOM-index stats store, SparkHoodieBloomIndex.java:119-140).  A view build
becomes checkpoint + timeline tail, and archival may move anything a
checkpoint covers.

Correctness rules:
  - a checkpoint is named by the max completed instant it covers; readers pick
    the latest checkpoint ≤ their as-of and fold only newer instants;
  - a slice is persisted only if **all** its base files are un-cleaned (a
    slice with any cleaned base can never be served by
    ``FileSystemView._latest_live`` again, so dropping it is loss-less);
  - rollback/restore delete every checkpoint covering the rolled-back instant
    (services/rollback.py calls :func:`invalidate_from`);
  - a fold that cannot use a checkpoint (none yet, as-of predates them all, or
    a corrupt file) reads active **and archived** instants — exact history.

All I/O is tiny driver-side pyarrow (O(live files) rows); Spark jobs never
touch it, but :func:`files_df` exposes it as a DataFrame for admin/queries.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq

from . import timeline as tl

CKPT_SUFFIX = ".ckpt.parquet"

_SCHEMA = pa.schema([
    ("kind", pa.string()),            # base | log | replaced
    ("partition", pa.string()),
    ("file_group", pa.string()),
    ("base_instant", pa.string()),
    ("instant", pa.string()),         # log: deltacommit; replaced: replacecommit
    ("path", pa.string()),
    ("size", pa.int64()),
    ("num_records", pa.int64()),
    ("min_key", pa.string()),
    ("max_key", pa.string()),
    ("col_stats", pa.string()),       # JSON {col: [min, max]} or null
    ("external", pa.bool_()),
])


def metadata_dir(meta) -> str:
    return os.path.join(meta.meta_path, "metadata")


def checkpoint_times(meta) -> list[str]:
    d = metadata_dir(meta)
    if not os.path.isdir(d):
        return []
    return sorted(fn[: -len(CKPT_SUFFIX)] for fn in os.listdir(d)
                  if fn.endswith(CKPT_SUFFIX))


def latest_checkpoint_time(meta, as_of: Optional[str] = None) -> Optional[str]:
    times = [t for t in checkpoint_times(meta) if as_of is None or t <= as_of]
    return times[-1] if times else None


def _ckpt_path(meta, ckpt_time: str) -> str:
    return os.path.join(metadata_dir(meta), ckpt_time + CKPT_SUFFIX)


def invalidate_from(meta, instant_time: str) -> int:
    """Delete checkpoints covering ``instant_time`` or later (rollback path)."""
    n = 0
    for t in checkpoint_times(meta):
        if t >= instant_time:
            os.remove(_ckpt_path(meta, t))
            n += 1
    return n


def write_checkpoint(table) -> Optional[str]:
    """Snapshot the current file-system view.  Idempotent per cover instant."""
    from .fsview import FileSystemView

    covered = table.timeline.completed(list(tl.DATA_ACTIONS) + [tl.CLEAN])
    if not covered:
        return None
    ckpt_time = max(i.time for i in covered)
    path = _ckpt_path(table.meta, ckpt_time)
    if os.path.exists(path):
        return ckpt_time

    view = FileSystemView(table.meta)          # itself ckpt-accelerated
    cleaned = view.cleaned_paths()
    rows: list[dict] = []
    for (part, fg), slices in view.all_slices():
        for sl in slices:
            if any(f.path in cleaned for f in sl.base_files):
                continue                        # dead version — unservable
            for f in sl.base_files:
                rows.append(dict(kind="base", partition=part, file_group=fg,
                                 base_instant=sl.base_instant, instant=None,
                                 path=f.path, size=f.size,
                                 num_records=f.num_records,
                                 min_key=f.min_key, max_key=f.max_key,
                                 col_stats=(json.dumps(f.col_stats)
                                            if f.col_stats else None),
                                 external=f.external))
            for l in sl.log_files:
                if l.path in cleaned:
                    continue
                rows.append(dict(kind="log", partition=part, file_group=fg,
                                 # persist the writer's ORIGINAL tag (may be a
                                 # pending-compaction instant) so the load
                                 # re-resolves it once that base lands
                                 base_instant=l.tag or sl.base_instant,
                                 instant=l.instant,
                                 path=l.path, size=l.size,
                                 num_records=l.num_records,
                                 min_key=None, max_key=None, col_stats=None,
                                 external=False))
    for (part, fg), at in view.replaced_groups().items():
        rows.append(dict(kind="replaced", partition=part, file_group=fg,
                         base_instant=None, instant=at, path=None,
                         size=None, num_records=None,
                         min_key=None, max_key=None, col_stats=None,
                         external=False))

    os.makedirs(metadata_dir(table.meta), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pylist(rows, schema=_SCHEMA), tmp)
    os.replace(tmp, path)
    return ckpt_time


def load_state(meta, ckpt_time: str):
    """(groups, replaced) reconstructed from a checkpoint.  Raises on I/O /
    schema errors — the caller falls back to a full fold."""
    from .fsview import FileSlice, LogFile, WriteStat

    t = pq.read_table(_ckpt_path(meta, ckpt_time))
    groups: dict[tuple[str, str], dict[str, FileSlice]] = {}
    replaced: dict[tuple[str, str], str] = {}
    log_rows = []
    for r in t.to_pylist():
        key = (r["partition"], r["file_group"])
        if r["kind"] == "replaced":
            replaced[key] = r["instant"]
            continue
        if r["kind"] == "log":
            log_rows.append(r)
            continue
        slices = groups.setdefault(key, {})
        sl = slices.setdefault(
            r["base_instant"],
            FileSlice(r["partition"], r["file_group"], r["base_instant"]))
        sl.base_files.append(WriteStat(
            partition=r["partition"], file_group=r["file_group"],
            path=r["path"], size=r["size"] or 0,
            num_records=r["num_records"] or 0,
            min_key=r["min_key"], max_key=r["max_key"],
            col_stats=(json.loads(r["col_stats"])
                       if r.get("col_stats") else None),
            log=False, base_instant=r["base_instant"],
            external=bool(r.get("external", False))))
    # logs attach after all bases exist, re-applying the fold's rule for
    # pending-compaction tags (tag newer than every base → newest slice)
    for r in log_rows:
        slices = groups.get((r["partition"], r["file_group"]))
        if not slices:
            continue
        base = r["base_instant"]
        if base not in slices:
            if base is not None and base > max(slices):
                base = max(slices)
            else:
                continue
        slices[base].log_files.append(
            LogFile(r["instant"], r["path"], r["size"] or 0,
                    r["num_records"] or 0, tag=r["base_instant"]))
    for slices in groups.values():
        for sl in slices.values():
            sl.log_files.sort(key=lambda l: l.instant)
    return groups, replaced


def files_df(table, ckpt_time: Optional[str] = None):
    """The checkpoint as a Spark DataFrame (admin / index-stats queries).
    Writes one first if none exists yet."""
    t = ckpt_time or latest_checkpoint_time(table.meta) or write_checkpoint(table)
    if t is None:
        from pyspark.sql.types import StructType
        return table.spark.createDataFrame(
            [], StructType.fromJson({"type": "struct", "fields": [
                {"name": n, "type": "string" if str(f.type) == "string" else "long",
                 "nullable": True, "metadata": {}}
                for n, f in zip(_SCHEMA.names, _SCHEMA)]}))
    return table.spark.read.parquet(_ckpt_path(table.meta, t))

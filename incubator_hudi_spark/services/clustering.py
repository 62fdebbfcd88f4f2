"""Clustering: rewrite small file slices into fewer, larger, sorted files.

Reference parity:
  - plan: SparkRecentDaysClusteringPlanStrategy.java:54-123 /
    PartitionAwareClusteringPlanStrategy (group small slices per partition).
  - run: SparkSortAndSizeExecutionStrategy.java:68-87 — bulk-insert-style
    rewrite sorted by user columns; a ``replacecommit`` swaps the file groups
    atomically (SparkRDDWriteClient.java:335-348).

Record meta columns are preserved (layout change only — snapshot identical).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import functions as F

from .. import timeline as tl
from ..config import CLUSTER, META_FILE_NAME, META_PARTITION_PATH, META_RECORD_KEY
from ..plans.buckets import new_fg_id
from ..writer import API_DELETE, FG, drop_deleted, write_instant_files


def run_clustering(table, sort_columns: Optional[Sequence[str]] = None,
                   partitions: Optional[Sequence[str]] = None,
                   small_file_limit: Optional[int] = None) -> Optional[str]:
    limit = small_file_limit or table.cfg.small_file_limit_bytes
    view = table.view()
    groups: dict[str, list] = {}
    for sl in view.latest_slices(partitions):
        if sl.base_size + sl.log_size < limit:
            groups.setdefault(sl.partition, []).append(sl)
    groups = {p: sls for p, sls in groups.items() if len(sls) >= 2}
    if not groups:
        return None

    instant = table._start(tl.REPLACE_COMMIT)
    slices = [sl for sls in groups.values() for sl in sls]
    replaced = [(sl.partition, sl.file_group) for sl in slices]
    df = table._read_slices(slices, read_optimized=False, raw=True)
    df = drop_deleted(df).drop(API_DELETE)

    # one new file group per partition group (sized in plan_insert_buckets
    # terms the groups are already < target by construction)
    fg_map = {new_fg_id(): p for p in groups}
    part_to_fg = {p: fg for fg, p in fg_map.items()}
    mapping = F.create_map(*[x for p, fg in part_to_fg.items()
                             for x in (F.lit(p), F.lit(fg))])
    df = df.withColumn(FG, mapping[F.col(META_PARTITION_PATH)]) \
           .withColumn(META_FILE_NAME, F.col(FG))
    sort_cols = list(sort_columns) if sort_columns else [META_RECORD_KEY]
    schema = table._read_schema()
    stats = write_instant_files(
        df.select(*[c for c in df.columns if c in schema.names or c == FG]),
        table.meta, instant.time, fg_map, table.cfg, sort_cols=sort_cols)
    table._complete(instant, CLUSTER, stats, schema, replaced=replaced)
    return instant.time

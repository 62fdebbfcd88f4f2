"""Catalog sync — the engine-native equivalent of Hive sync.

Reference: hudi-sync/hudi-hive-sync/.../HiveSyncTool.java — after each write
Hudi registers/updates the table (and its partitions + evolved schema) in the
Hive metastore so SQL engines can query it by name; for MERGE_ON_READ it
registers TWO tables, ``<name>_ro`` (read-optimized: base files only) and
``<name>_rt`` (realtime: full merge), HiveSyncTool.java's
ROTABLE/RT_TABLE suffix handling.

Spark mapping: the session catalog IS our metastore.  Snapshot reads are
genuine DataFrames, so sync = registering them as (global) temp views — name
resolution, schema evolution, and partition pruning all ride on the view's
underlying plan, which re-lists file slices lazily per query.  No DDL
mirroring is needed: the timeline remains the source of truth and a re-sync
after each write refreshes the view over the newest snapshot.
"""

from __future__ import annotations

from typing import Optional

from .config import MERGE_ON_READ, QUERY_READ_OPTIMIZED, QUERY_SNAPSHOT


def sync_to_catalog(table, name: Optional[str] = None,
                    global_view: bool = False) -> list[str]:
    """Register the table's query views in the Spark session catalog.

    COW → one view ``<name>``.  MOR → ``<name>_ro`` + ``<name>_rt`` and a
    ``<name>`` alias of the realtime view (matching the reference's dual
    registration, HiveSyncTool.java syncHoodieTable).
    Returns the list of registered view names.
    """
    base = name or table.tc.name
    register = (lambda df, n: df.createOrReplaceGlobalTempView(n)) \
        if global_view else (lambda df, n: df.createOrReplaceTempView(n))
    out = []
    if table.tc.table_type == MERGE_ON_READ:
        ro = table.read(QUERY_READ_OPTIMIZED)
        rt = table.read(QUERY_SNAPSHOT)
        register(ro, f"{base}_ro")
        register(rt, f"{base}_rt")
        register(rt, base)
        out = [f"{base}_ro", f"{base}_rt", base]
    else:
        register(table.read(QUERY_SNAPSHOT), base)
        out = [base]
    return out


def sync_partitions(table) -> list[str]:
    """Partition registration half of HiveSyncTool: the distinct partition
    paths currently live in the table (the reference pushes these as ALTER
    TABLE ADD PARTITION; our views resolve partitions from the file-system
    view, so this is the informational listing)."""
    return sorted({sl.partition for sl in table.view().latest_slices()})

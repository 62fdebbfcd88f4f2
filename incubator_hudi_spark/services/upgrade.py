"""Table version upgrade/downgrade.

Reference: hudi-client/hudi-client-common/.../table/upgrade/
(UpgradeDowngrade.java orchestrates per-step handlers such as
ZeroToOneUpgradeHandler / TwoToOneDowngradeHandler; writers refuse tables
newer than themselves and auto-upgrade older ones under a table lock).

Our layout versions:

- **v1** — original layout: commit manifests may lack per-file record-key
  ranges (``min_key``/``max_key``); the engine still reads/writes such
  tables correctly but every stats-driven optimization (COW rewrite-set
  pruning, read_keys file pruning, BLOOM index candidate pruning)
  degrades to "rewrite/scan everything that range-overlaps nothing", i.e.
  no pruning.
- **v2** (current) — every base-file manifest entry carries its record-key
  range; written natively by this engine, backfilled from parquet footers
  on upgrade.

Upgrade/downgrade REWRITES completed commit manifests in place (atomic
per-file tmp+replace).  Like the reference, this must run with no
concurrent writers — callers stop ingestion first; the auto-upgrade path
runs at write start, before the instant is created.

At 100 TB the backfill is O(live files) footer reads; the driver loop
below batches per instant and only touches entries that lack stats, so a
native-v2 table upgrades in O(#instants) with zero footer reads.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from .. import timeline as tl
from ..config import CURRENT_TABLE_VERSION, META_RECORD_KEY


class TableVersionError(Exception):
    """Table was written by a newer engine version (reference:
    HoodieUpgradeDowngradeException on version mismatch)."""


def _footer_key_range(path: str) -> Optional[tuple]:
    """[min, max] of the record-key column from the parquet footer —
    column-chunk statistics only, no data pages read."""
    import pyarrow.parquet as pq
    try:
        f = pq.ParquetFile(path)
    except Exception:
        return None
    idx = None
    for i, name in enumerate(f.schema_arrow.names):
        if name == META_RECORD_KEY:
            idx = i
            break
    if idx is None:
        return None
    mins, maxs = [], []
    md = f.metadata
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None
        mins.append(st.min)
        maxs.append(st.max)
    if not mins:
        return None                      # empty file — no provable range
    return min(mins), max(maxs)


def _rewrite_manifest(timeline: tl.Timeline, instant: tl.Instant,
                      md: dict) -> None:
    path = os.path.join(timeline.meta_dir, instant.filename)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(md, f, default=str)
    os.replace(tmp, path)


def _upgrade_1_to_2(table) -> int:
    """Backfill per-file record-key ranges into completed commit manifests
    from parquet footers (ZeroToOneUpgradeHandler analogue: recover
    metadata the old layout never wrote)."""
    touched = 0
    for ins in table.timeline.completed_data_instants():
        md = table.timeline.read_metadata(ins)
        changed = False
        for st in md.get("write_stats", []):
            if st.get("log") or st.get("external"):
                continue                  # logs ride their base's range
            if st.get("min_key") is not None and st.get("max_key") is not None:
                continue
            p = table.meta.abs_path(st["path"])
            if not os.path.exists(p):
                continue                  # cleaned — stats never consulted
            rng = _footer_key_range(p)
            if rng is None:
                continue
            st["min_key"], st["max_key"] = rng
            changed = True
            touched += 1
        if changed:
            _rewrite_manifest(table.timeline, ins, md)
    return touched


def _downgrade_2_to_1(table) -> int:
    """Strip per-file key ranges from manifests (TwoToOneDowngradeHandler
    analogue: reshape metadata to what the old layout expects)."""
    touched = 0
    for ins in table.timeline.completed_data_instants():
        md = table.timeline.read_metadata(ins)
        changed = False
        for st in md.get("write_stats", []):
            if st.get("min_key") is not None or st.get("max_key") is not None:
                st["min_key"] = None
                st["max_key"] = None
                changed = True
                touched += 1
        if changed:
            _rewrite_manifest(table.timeline, ins, md)
    return touched


_STEPS = {
    (1, 2): _upgrade_1_to_2,
    (2, 1): _downgrade_2_to_1,
}


def upgrade_table(table, to_version: int = CURRENT_TABLE_VERSION) -> int:
    """Walk the version chain step by step (UpgradeDowngrade.run applies
    each handler in sequence); persists the new version last, so a crash
    mid-migration re-runs idempotent steps on reopen."""
    from dataclasses import replace
    cur = table.tc.version
    if to_version == cur:
        return cur
    step = 1 if to_version > cur else -1
    v = cur
    while v != to_version:
        handler = _STEPS.get((v, v + step))
        if handler is None:
            raise ValueError(f"no migration path {v} -> {v + step}")
        handler(table)
        v += step
    table.meta.update_config(replace(table.tc, version=to_version))
    # manifests changed under the metadata checkpoint's feet
    from ..metadata_table import invalidate_from
    first = table.timeline.completed_data_instants()
    if first:
        invalidate_from(table.meta, first[0].time)
    return to_version


def check_write_version(table) -> None:
    """Writer-side gate, run before each write starts (reference:
    UpgradeDowngrade.needsUpgradeOrDowngrade at write client init):
    refuse tables from a NEWER engine; auto-upgrade older ones when
    cfg.auto_upgrade (reference default) else refuse."""
    v = table.tc.version
    if v == CURRENT_TABLE_VERSION:
        return
    if v > CURRENT_TABLE_VERSION:
        raise TableVersionError(
            f"table version {v} is newer than this engine's "
            f"{CURRENT_TABLE_VERSION}; upgrade the engine")
    if table.cfg.auto_upgrade:
        upgrade_table(table, CURRENT_TABLE_VERSION)
    else:
        raise TableVersionError(
            f"table version {v} < engine version {CURRENT_TABLE_VERSION} "
            "and auto_upgrade is off; run upgrade_table() first")

"""Timeline archival (HoodieTimelineArchiveLog.java:72,120): bound the active
timeline by moving old completed instants to ``.hoodie/archived/``.

Because the active timeline doubles as the file manifest, archival must never
change what the file-system view resolves.  Safe rule: archive an **oldest
prefix** of completed instants where
  - a data instant qualifies only if every file it wrote has been cleaned
    (its manifest contributes nothing) and it isn't savepointed;
  - a clean instant qualifies only if every path it deleted was written by an
    already-archived instant (otherwise removing the clean record would
    resurrect dead paths in the view);
  - replacecommits follow the data rule — their replaced-group markers are
    only safe to drop once the commits that *created* those groups are
    archived, which the prefix order guarantees (creators precede replacers).
"""

from __future__ import annotations

from .. import timeline as tl


def run_archival(table) -> int:
    timeline = table.timeline
    data_instants = timeline.completed_data_instants()
    if len(data_instants) <= table.cfg.archive_max_commits:
        return 0
    budget = len(data_instants) - table.cfg.archive_min_commits
    # a metadata-table checkpoint carries the manifest contribution of every
    # instant it covers, so those archive freely (live files or not)
    from ..metadata_table import latest_checkpoint_time
    ckpt = latest_checkpoint_time(table.meta)

    savepoint_ats = {
        timeline.read_metadata(i).get("savepoint_at", i.time)
        for i in timeline.completed([tl.SAVEPOINT])}
    cleaned: set[str] = set()
    for ins in timeline.completed([tl.CLEAN]):
        cleaned.update(timeline.read_metadata(ins).get("deleted_paths", []))
    already_archived = {i.time for i in timeline.archived_instants()}

    to_move: list[tl.Instant] = []
    newly_archived: set[str] = set()
    for ins in timeline.completed(list(tl.DATA_ACTIONS) + [tl.CLEAN]):
        covered = ckpt is not None and ins.time <= ckpt
        if ins.action == tl.CLEAN:
            md = timeline.read_metadata(ins)
            owners = {p.split("/")[1] for p in md.get("deleted_paths", [])
                      if p.startswith("data/")}
            if covered or owners <= (already_archived | newly_archived):
                to_move.append(ins)
            else:
                break
        else:
            if budget <= 0 or ins.time in savepoint_ats:
                break
            md = timeline.read_metadata(ins)
            paths = [st["path"] for st in md.get("write_stats", [])]
            if covered or all(p in cleaned for p in paths):
                to_move.append(ins)
                newly_archived.add(ins.time)
                budget -= 1
            else:
                break

    import os
    os.makedirs(timeline.archive_dir, exist_ok=True)
    for ins in to_move:
        os.replace(os.path.join(timeline.meta_dir, ins.filename),
                   os.path.join(timeline.archive_dir, ins.filename))
    return len(to_move)

"""Timeline: the transaction log.

Every table mutation is an *instant* ``(time, action, state)`` persisted as a
JSON file under ``<table>/.hoodie/``:

    <instant>.<action>.requested   → planned
    <instant>.<action>.inflight    → running
    <instant>.<action>             → completed (readers only trust these)

Reference parity:
  - actions: hudi-common/.../timeline/HoodieTimeline.java:46-59
  - states:  hudi-common/.../timeline/HoodieInstant.java:61-74
  - instant time format yyyyMMddHHmmss + monotonic generation:
    hudi-common/.../timeline/HoodieActiveTimeline.java:61,80-92
    (we add a millisecond suffix to avoid collisions under fast commits)
  - commit metadata: hudi-common/.../model/HoodieCommitMetadata.java

All timeline I/O is driver-side, O(#instants) — never per-record.  Completed
commit metadata doubles as the **file manifest** (see fsview.py): readers
never list data directories, which is what makes the design object-store
friendly at 100 TB (no renames, no eventual-consistency hazards).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Iterable, Optional

# Actions — HoodieTimeline.java:46-59
COMMIT = "commit"
DELTA_COMMIT = "deltacommit"
REPLACE_COMMIT = "replacecommit"
CLEAN = "clean"
ROLLBACK = "rollback"
SAVEPOINT = "savepoint"
RESTORE = "restore"
COMPACTION = "compaction"
INDEXING = "indexing"

REQUESTED = "requested"
INFLIGHT = "inflight"
COMPLETED = "completed"

#: actions whose completed metadata contributes data files to the file-system view
DATA_ACTIONS = (COMMIT, DELTA_COMMIT, REPLACE_COMMIT)

#: every legal instant action — parsing is restricted to these so stray
#: dotted names in the meta dir (``table_properties.json``, editor drops)
#: can never masquerade as instants (HoodieActiveTimeline.VALID_EXTENSIONS
#: plays the same gatekeeper role in the reference)
ALL_ACTIONS = frozenset({COMMIT, DELTA_COMMIT, REPLACE_COMMIT, CLEAN,
                         ROLLBACK, SAVEPOINT, RESTORE, COMPACTION, INDEXING})

_LAST_INSTANT = [""]


def new_instant_time() -> str:
    """Monotonic ``yyyyMMddHHmmssSSS`` (HoodieActiveTimeline.java:80-92)."""
    while True:
        t = time.strftime("%Y%m%d%H%M%S", time.gmtime()) + f"{int(time.time() * 1000) % 1000:03d}"
        if t > _LAST_INSTANT[0]:
            _LAST_INSTANT[0] = t
            return t
        time.sleep(0.001)


def completed_from(instants: Iterable["Instant"],
                   actions: Optional[Iterable[str]] = None) -> list["Instant"]:
    """COMPLETED instants of ``actions`` from an existing listing — the
    snapshot-based twin of Timeline.completed(), shared so every consumer
    of a per-batch ``timeline.instants()`` snapshot applies the same filter."""
    acts = set(actions) if actions else None
    return [i for i in instants if i.state == COMPLETED
            and (acts is None or i.action in acts)]


def pending_from(instants: Iterable["Instant"]) -> list["Instant"]:
    """Pending instants from an existing listing — the snapshot-based twin
    of Timeline.pending(), preserving its subtlety: an instant whose
    (time, action) pair has a COMPLETED twin is not pending (compactions
    complete under a different action, so the pair — not the time — keys
    the done-set)."""
    done = {(i.time, i.action) for i in instants if i.state == COMPLETED}
    return [i for i in instants if i.state != COMPLETED
            and (i.time, i.action) not in done]


@dataclass(frozen=True, order=True)
class Instant:
    time: str
    action: str
    state: str = COMPLETED

    @property
    def filename(self) -> str:
        if self.state == COMPLETED:
            return f"{self.time}.{self.action}"
        return f"{self.time}.{self.action}.{self.state}"

    @staticmethod
    def parse(fn: str) -> Optional["Instant"]:
        parts = fn.split(".")
        if len(parts) >= 2 and parts[1] not in ALL_ACTIONS:
            return None
        if len(parts) == 2:
            return Instant(parts[0], parts[1], COMPLETED)
        if len(parts) == 3 and parts[2] in (REQUESTED, INFLIGHT):
            return Instant(parts[0], parts[1], parts[2])
        return None


class Timeline:
    """List/transition instants + read/write their metadata (driver-side).

    Reference: HoodieActiveTimeline.java (567 LoC).  Atomicity on a local /
    HDFS-like FS comes from write-temp + ``os.replace``; on object stores the
    single-file PUT of the completed instant is itself atomic.
    """

    def __init__(self, meta_dir: str):
        self.meta_dir = meta_dir
        self.archive_dir = os.path.join(meta_dir, "archived")

    # ---- listing -------------------------------------------------------
    def instants(self) -> list[Instant]:
        if not os.path.isdir(self.meta_dir):
            return []
        out = []
        for fn in os.listdir(self.meta_dir):
            ins = Instant.parse(fn)
            if ins is not None:
                out.append(ins)
        return sorted(out, key=lambda i: (i.time, i.action, i.state))

    def completed(self, actions: Optional[Iterable[str]] = None) -> list[Instant]:
        return completed_from(self.instants(), actions)

    def completed_data_instants(self) -> list[Instant]:
        return self.completed(DATA_ACTIONS)

    def pending(self) -> list[Instant]:
        return pending_from(self.instants())

    def last_completed(self, actions: Optional[Iterable[str]] = None) -> Optional[Instant]:
        comp = self.completed(actions)
        return comp[-1] if comp else None

    def contains(self, instant_time: str) -> bool:
        return any(i.time == instant_time for i in self.instants())

    # ---- transitions (3-phase protocol, HoodieInstant.java:61-74) ------
    def _path(self, instant: Instant) -> str:
        return os.path.join(self.meta_dir, instant.filename)

    def _write_json(self, path: str, payload: dict) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, default=str)
        os.replace(tmp, path)

    def create_requested(self, instant_time: str, action: str,
                         metadata: Optional[dict] = None,
                         exclusive: bool = False) -> Instant:
        """``exclusive=True`` claims the requested file atomically
        (O_CREAT|O_EXCL) and raises FileExistsError if another writer got
        there first — streaming replay and rollback re-creation keep the
        default overwrite semantics."""
        ins = Instant(instant_time, action, REQUESTED)
        if exclusive:
            fd = os.open(self._path(ins),
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                json.dump(metadata or {}, f, default=str)
            return ins
        self._write_json(self._path(ins), metadata or {})
        return ins

    def claim_instant(self, action: str,
                      metadata: Optional[dict] = None) -> Instant:
        """Mint a NEW instant time and atomically claim its requested file.

        new_instant_time() is monotonic per process only; two processes can
        mint the same millisecond (the reference's 0.x OCC shares this
        exposure, HoodieActiveTimeline.createNewInstantTime).  The claim
        loop makes same-(time, action) collisions impossible (O_EXCL — the
        loser re-mints the next millisecond), and re-mints when ANY instant
        of that time already exists so two actions never share a
        ``data/<instant>/`` directory either (scan-then-create: the
        remaining cross-action window is two processes passing the scan in
        the same millisecond with different actions, then both winning
        distinct O_EXCL files — mitigated to sub-millisecond and distinct
        timeline files; an external instant allocator closes it entirely)."""
        while True:
            t = new_instant_time()
            # cross-action same-ms guard: raw prefix scan of the active dir
            # (NOT a Timeline.instants() listing — no parse, and the
            # one-listing-per-batch accounting stays at one)
            try:
                taken = any(fn.startswith(t + ".")
                            for fn in os.listdir(self.meta_dir))
            except FileNotFoundError:
                taken = False
            if taken:
                continue
            try:
                return self.create_requested(t, action, metadata,
                                             exclusive=True)
            except FileExistsError:
                continue               # lost the same-action race — re-mint

    def transition_to_inflight(self, instant: Instant, metadata: Optional[dict] = None) -> Instant:
        inflight = Instant(instant.time, instant.action, INFLIGHT)
        self._write_json(self._path(inflight), metadata or {})
        req = Instant(instant.time, instant.action, REQUESTED)
        if os.path.exists(self._path(req)):
            os.remove(self._path(req))
        return inflight

    def transition_to_completed(self, instant: Instant, metadata: dict,
                                completed_action: Optional[str] = None) -> Instant:
        """Completed action may differ from the pending one (e.g. a
        ``compaction.requested`` completes as a ``commit`` — mirrors
        HoodieSparkMergeOnReadTableCompactor flow)."""
        done = Instant(instant.time, completed_action or instant.action, COMPLETED)
        self._write_json(self._path(done), metadata)
        for st in (REQUESTED, INFLIGHT):
            p = self._path(Instant(instant.time, instant.action, st))
            if os.path.exists(p):
                os.remove(p)
        return done

    def delete_instant(self, instant: Instant) -> None:
        p = self._path(instant)
        if os.path.exists(p):
            os.remove(p)

    # ---- metadata ------------------------------------------------------
    def read_metadata(self, instant: Instant) -> dict:
        p = self._path(instant)
        if not os.path.exists(p) and instant.state == COMPLETED:
            # may have been archived
            ap = os.path.join(self.archive_dir, instant.filename)
            if os.path.exists(ap):
                p = ap
        with open(p) as f:
            return json.load(f)

    # ---- archival (HoodieTimelineArchiveLog.java:120) -------------------
    def archive(self, keep_last: int, protected_times: Optional[set[str]] = None) -> int:
        """Move old completed data instants into ``.hoodie/archived/``.

        The file-system view only needs instants whose files are still live;
        we keep the last ``keep_last`` and anything in ``protected_times``
        (savepoints, instants still referenced by un-cleaned files).
        """
        comp = self.completed_data_instants()
        if len(comp) <= keep_last:
            return 0
        os.makedirs(self.archive_dir, exist_ok=True)
        protected = protected_times or set()
        moved = 0
        for ins in comp[:-keep_last]:
            if ins.time in protected:
                continue
            src = self._path(ins)
            os.replace(src, os.path.join(self.archive_dir, ins.filename))
            moved += 1
        return moved

    def archived_instants(self) -> list[Instant]:
        if not os.path.isdir(self.archive_dir):
            return []
        out = []
        for fn in os.listdir(self.archive_dir):
            ins = Instant.parse(fn)
            if ins:
                out.append(ins)
        return sorted(out, key=lambda i: i.time)

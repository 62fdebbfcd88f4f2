"""Concurrency control: single-writer default + optimistic concurrency with
file-group-level conflict detection and a pluggable lock provider.

Reference parity:
  - WriteConcurrencyMode.java:28-32 (SINGLE_WRITER / OPTIMISTIC_CONCURRENCY_CONTROL)
  - TransactionManager.java + SimpleConcurrentFileWritesConflictResolutionStrategy.java
    (two commits conflict iff they touched overlapping file groups)
  - lock/ZookeeperBasedLockProvider.java → ours is a local filesystem lock
    (atomic O_CREAT|O_EXCL), sufficient for a shared POSIX/DFS path; swap in
    an external provider for object stores.

Usage::

    with OccWriter(table):
        table.upsert(batch)   # validates under the table lock just before
                              # its instant turns COMPLETED; raises
                              # ConcurrentWriteConflict on overlap

Cross-process deployment note (pinned by tests/test_occ_cross_process.py —
two separate Spark processes, shared table, filesystem lock): instant
times are minted through ``timeline.claim_instant`` — an atomic
O_CREAT|O_EXCL claim of the requested file plus a same-time re-mint loop —
so two writers minting the same millisecond can never share a (time,
action) instant or a ``data/<instant>/`` directory (the reference's 0.x
OCC is exposed here, HoodieActiveTimeline.createNewInstantTime; ours
closes it to a sub-millisecond cross-action scan window on stores with
atomic exclusive create).  On object stores without atomic-create
semantics, front instant allocation with the external lock provider.
"""

from __future__ import annotations

import os
import time
from typing import Optional

from . import timeline as tl


class ConcurrentWriteConflict(Exception):
    pass


class FileSystemLockProvider:
    """Best-effort exclusive lock via atomic file creation (LockProvider SPI)."""

    def __init__(self, lock_path: str, timeout_s: float = 60.0,
                 stale_after_s: float = 600.0):
        self.lock_path = lock_path
        self.timeout_s = timeout_s
        self.stale_after_s = stale_after_s

    def acquire(self) -> None:
        deadline = time.time() + self.timeout_s
        while True:
            try:
                fd = os.open(self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return
            except FileExistsError:
                try:
                    if time.time() - os.path.getmtime(self.lock_path) > self.stale_after_s:
                        os.remove(self.lock_path)  # failed-writer heartbeat expiry
                        continue
                except FileNotFoundError:
                    continue
                if time.time() > deadline:
                    raise TimeoutError(f"could not acquire lock {self.lock_path}")
                time.sleep(0.05)

    def release(self) -> None:
        try:
            os.remove(self.lock_path)
        except FileNotFoundError:
            pass


def _touched_file_groups(table, instant_time: str) -> set[tuple[str, str]]:
    for ins in table.timeline.completed(tl.DATA_ACTIONS):
        if ins.time == instant_time:
            md = table.timeline.read_metadata(ins)
            out = {(st["partition"], st["file_group"])
                   for st in md.get("write_stats", [])}
            out |= {tuple(x) for x in md.get("replaced_file_groups", [])}
            return out
    return set()


class OccWriter:
    """Optimistic transaction scope: snapshot the completed timeline on entry
    and install a pre-commit guard on the table.  Any write completed inside
    the scope validates — *under the table lock, before its instant turns
    COMPLETED* — that no other writer's commit landed in between touching an
    overlapping file group.  The loser's instant stays inflight (invisible to
    readers) and is reclaimed by rollback-on-open, exactly the reference's
    eager-rollback behavior.

    ::

        with OccWriter(table):
            table.upsert(batch)   # raises ConcurrentWriteConflict on overlap
    """

    def __init__(self, table, lock_provider: Optional[FileSystemLockProvider] = None):
        self.table = table
        self.lock = lock_provider or FileSystemLockProvider(
            os.path.join(table.meta.meta_path, ".lock"))
        self._start_instants: set[str] = set()

    def __enter__(self) -> "OccWriter":
        self._start_instants = {
            i.time for i in self.table.timeline.completed(tl.DATA_ACTIONS)}
        self.table._pre_commit_hook = self._guard
        return self

    def __exit__(self, *exc) -> None:
        self.table._pre_commit_hook = None

    def _guard(self, instant_time: str, touched: set[tuple[str, str]]):
        writer = self

        class _Guard:
            def __enter__(self):
                writer.lock.acquire()
                others = [
                    i for i in writer.table.timeline.completed(tl.DATA_ACTIONS)
                    if i.time not in writer._start_instants
                    and i.time != instant_time]
                for other in others:
                    overlap = touched & _touched_file_groups(writer.table, other.time)
                    if overlap:
                        writer.lock.release()
                        raise ConcurrentWriteConflict(
                            f"instant {instant_time} conflicts with {other.time} "
                            f"on file groups {sorted(overlap)[:5]}")
                return self

            def __exit__(self, *a):
                writer.lock.release()
                # successful commit extends the snapshot so multiple writes
                # in one scope don't conflict with themselves
                writer._start_instants.add(instant_time)

        return _Guard()

"""Structured-streaming sink: ``df.writeStream.foreachBatch(HudiStreamingSink(t))``.

Reference: HoodieStreamingSink.scala:41-119 — per-micro-batch upsert with
retry; exactly-once via the batch id recorded in commit metadata (replayed
batches after a crash are skipped).  PySpark cannot register a custom v2 sink,
so the public surface is a `foreachBatch` callable — semantically identical
(the reference's sink is itself a per-batch writer).

The batch-id stamp travels as an explicit ``commit_extras`` argument through
the table's write op into the commit JSON (atomic with the commit — mirrors
HoodieStreamingSink.scala:92-94 / DeltaSync.java:311-360 recording the
checkpoint in the same commit).  It is never parked in mutable table state:
table services committing from daemon threads (async compaction/clustering)
complete through the same ``table._complete`` and would race for a
table-level "next commit" slot — the compaction commit could carry the stamp
while the data commit lost it, turning a crash replay into silent data loss.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame

from .. import timeline as tl

BATCH_ID_KEY = "streaming.batch_id"
QUERY_ID_KEY = "streaming.query_id"


def last_stamped_batch(timeline, query_id: str) -> Optional[int]:
    """Newest batch id stamped for ``query_id`` in commit-metadata extras —
    shared by this foreachBatch sink and the native stream writer
    (pyds_write.HudiStreamBulkWriter) so the two recognize each other's
    progress.  Scans active then archived commits: an idle stream's last
    stamp may sit behind the archival boundary."""
    active = list(timeline.completed(tl.DATA_ACTIONS))
    archived = sorted((i for i in timeline.archived_instants()
                       if i.action in tl.DATA_ACTIONS),
                      key=lambda i: i.time)
    for ins in reversed(archived + active):
        extra = timeline.read_metadata(ins).get("extra", {})
        if extra.get(QUERY_ID_KEY) == query_id and \
                extra.get(BATCH_ID_KEY) is not None:
            return int(extra[BATCH_ID_KEY])
    return None


class HudiStreamingSink:
    """Callable for ``writeStream.foreachBatch``; also usable directly for
    manual micro-batching (``sink(df, i)``).

    Single-writer-per-``query_id`` assumption: the stamp-probe cache skips
    instants at or below its high-water mark, so a stamped commit completing
    at a BURIED instant time — possible only when a second concurrent writer
    shares this ``query_id`` (e.g. a native HudiStreamBulkWriter on the same
    stream) — would go unseen until a fresh sink re-scans.  Structured
    Streaming itself guarantees one running query per checkpoint/query id,
    so this matches the engine's (and the reference sink's) operating model;
    do not share a query_id across concurrently-running writers."""

    def __init__(self, table, operation: str = "upsert",
                 query_id: str = "default",
                 retries: int = 2,
                 transform: Optional[Callable[[DataFrame], DataFrame]] = None):
        self.table = table
        self.operation = operation
        self.query_id = query_id
        self.retries = retries
        self.transform = transform
        # Stamp-probe cache: (last stamped batch id or None, newest instant
        # time scanned).  The first probe pays one full timeline+archive scan
        # (exactly what `last_stamped_batch` does); steady state then reads
        # only the metadata of instants NEWER than the high-water mark — a
        # stream into a table with heavy non-stream commit traffic no longer
        # re-reads the whole timeline every micro-batch.  Per-sink-instance,
        # so a crash replay (fresh sink) always re-scans from scratch.
        self._cached_last: Optional[int] = None
        self._probe_hwm: Optional[str] = None

    def last_committed_batch(self) -> Optional[int]:
        timeline = self.table.timeline
        if self._probe_hwm is None:
            self._cached_last = last_stamped_batch(timeline, self.query_id)
            active = list(timeline.completed(tl.DATA_ACTIONS))
            self._probe_hwm = active[-1].time if active else ""
            return self._cached_last
        active = list(timeline.completed(tl.DATA_ACTIONS))
        for ins in reversed(active):
            if ins.time <= self._probe_hwm:
                break  # completed() is time-ordered; the rest is scanned
            extra = timeline.read_metadata(ins).get("extra", {})
            if extra.get(QUERY_ID_KEY) == self.query_id and \
                    extra.get(BATCH_ID_KEY) is not None:
                b = int(extra[BATCH_ID_KEY])
                if self._cached_last is None or b > self._cached_last:
                    self._cached_last = b
                break
        if active:
            self._probe_hwm = max(self._probe_hwm, active[-1].time)
        return self._cached_last

    def __call__(self, batch_df: DataFrame, batch_id: int) -> Optional[str]:
        last = self.last_committed_batch()
        if last is not None and batch_id <= last:
            return None  # exactly-once: replayed batch already committed
        if self.transform is not None:
            batch_df = self.transform(batch_df)
        return self._attempts(batch_df, batch_id)

    def _attempts(self, batch_df: DataFrame,
                  batch_id: int) -> Optional[str]:
        err: Optional[Exception] = None
        for attempt in range(self.retries + 1):
            # a failed attempt may still have COMMITTED the data — e.g. the
            # commit landed and a post-commit service (auto-clean, sync
            # callback) raised afterwards.  Re-probe the stamp before every
            # retry so the batch is never written twice (the reference's
            # retry loop re-enters its sink, whose canSkipBatch re-reads the
            # last commit the same way, HoodieStreamingSink.scala:41-119).
            if attempt:
                lc = self.last_committed_batch()
                if lc is not None and batch_id <= lc:
                    return None
            try:
                # The stamp rides as an argument into the write op and lands
                # in _complete()'s commit JSON — atomic with the commit, so a
                # crash either leaves no commit (batch replays cleanly) or a
                # commit that already carries the stamp (replay is skipped).
                # No mutable state exists for a concurrent table-service
                # commit to steal (see module docstring).
                op = getattr(self.table, self.operation)
                instant = op(batch_df, commit_extras={
                    BATCH_ID_KEY: int(batch_id),
                    QUERY_ID_KEY: self.query_id,
                })
                # our own commit is the newest stamped one — advance the
                # probe cache so steady state does zero metadata re-reads
                self._cached_last = int(batch_id)
                if self._probe_hwm is not None and instant is not None:
                    self._probe_hwm = max(self._probe_hwm, instant)
                return instant
            except Exception as e:  # retry (HoodieStreamingSink retry loop)
                err = e
        raise err

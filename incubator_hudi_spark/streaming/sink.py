"""Structured-streaming sink: ``df.writeStream.foreachBatch(HudiStreamingSink(t))``.

Reference: HoodieStreamingSink.scala:41-119 — per-micro-batch upsert with
retry; exactly-once via the batch id recorded in commit metadata (replayed
batches after a crash are skipped).  PySpark cannot register a custom v2 sink,
so the public surface is a `foreachBatch` callable — semantically identical
(the reference's sink is itself a per-batch writer).
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
    manual micro-batching (``sink(df, i)``)."""

    def __init__(self, table, operation: str = "upsert",
                 query_id: str = "default",
                 retries: int = 2,
                 transform: Optional[Callable[[DataFrame], DataFrame]] = None):
        self.table = table
        self.operation = operation
        self.query_id = query_id
        self.retries = retries
        self.transform = transform

    def last_committed_batch(self) -> Optional[int]:
        return last_stamped_batch(self.table.timeline, self.query_id)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> Optional[str]:
        last = self.last_committed_batch()
        if last is not None and batch_id <= last:
            return None  # exactly-once: replayed batch already committed
        if self.transform is not None:
            batch_df = self.transform(batch_df)
        try:
            return self._attempts(batch_df, batch_id)
        finally:
            # ANY exit without a commit (incl. KeyboardInterrupt/SystemExit,
            # which `except Exception` never sees) must drop the pending
            # stamp, or it would attach to the user's next unrelated commit
            # and mark batch_id committed although its data never landed
            self.table._pending_commit_extras = None

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
                    self.table._pending_commit_extras = None
                    return None
            try:
                # The batch id rides inside the commit metadata written by
                # _complete() — atomic with the commit, so a crash either
                # leaves no commit (batch replays cleanly) or a commit that
                # already carries the stamp (replay is skipped).  Mirrors the
                # reference, which records the checkpoint in the same commit
                # (HoodieStreamingSink.scala:92-94, DeltaSync.java:311-360).
                self.table.set_commit_extras({
                    BATCH_ID_KEY: int(batch_id),
                    QUERY_ID_KEY: self.query_id,
                })
                op = getattr(self.table, self.operation)
                return op(batch_df)
            except Exception as e:  # retry (HoodieStreamingSink retry loop)
                err = e
        # all retries failed: drop the pending stamp so it cannot attach to
        # an unrelated later commit
        self.table._pending_commit_extras = None
        raise err

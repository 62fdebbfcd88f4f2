"""Async compaction: run compaction concurrently with ingestion.

Reference: SparkAsyncCompactService.java + the streaming-sink trigger
(HoodieStreamingSink.scala:92-94).  The timeline serializes correctness —
compaction completes as its own instant, and a compaction plan pins its file
groups (the cleaner skips them, upserts keep appending logs to the latest
slice which the compactor's plan snapshot doesn't cover).

Driver-thread based: Spark is thread-safe for concurrent job submission from
one SparkSession, so a daemon worker drains a queue of scheduled compaction
instants while the ingest loop keeps committing.
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

from .. import timeline as tl


class AsyncCompactionService:
    """``enqueue()`` scheduled compaction instants; a daemon thread runs
    them.  ``stop()`` drains outstanding work and joins."""

    def __init__(self, table):
        self.table = table
        self._q: "queue.Queue[Optional[str]]" = queue.Queue()
        self.completed: list[str] = []
        self.errors: list[Exception] = []
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def schedule_and_enqueue(self, **schedule_kw) -> Optional[str]:
        from .compaction import schedule_compaction
        t = schedule_compaction(self.table, **schedule_kw)
        if t is not None:
            self._q.put(t)
        return t

    def enqueue(self, instant_time: str) -> None:
        self._q.put(instant_time)

    def _run(self) -> None:
        from .compaction import run_compaction
        while True:
            item = self._q.get()
            if item is None:
                return
            try:
                run_compaction(self.table, item)
                self.completed.append(item)
            except Exception as e:  # surfaced on stop()
                self.errors.append(e)
            finally:
                self._q.task_done()

    def stop(self, raise_errors: bool = True) -> list[str]:
        self._q.join()
        self._q.put(None)
        self._worker.join(timeout=60)
        if self.errors and raise_errors:
            raise self.errors[0]
        return list(self.completed)


def pending_compaction_instants(table) -> list[str]:
    return [i.time for i in table.timeline.pending()
            if i.action == tl.COMPACTION]

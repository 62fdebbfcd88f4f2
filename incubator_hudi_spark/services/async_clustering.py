"""Async clustering: execute scheduled clustering plans concurrently with
ingestion.

Reference: AsyncClusteringService.java + SparkAsyncClusteringService.java
(daemon pool draining pending clustering instants) and the streaming trigger
SparkStreamingAsyncClusteringService.java.  Correctness is serialized by the
timeline exactly as for async compaction: ``schedule_clustering`` parks the
plan as ``<t>.replacecommit.requested`` and FREEZES its file groups — while
the plan is pending, upserts/deletes touching them are rejected
(SparkRejectUpdateStrategy.java:41-62 via ClusteringUpdateConflict) and
insert packing avoids them — so the daemon's rewrite races with nothing: the
planned slices cannot change between scheduling and execution.

Driver-thread based like AsyncCompactionService: Spark is thread-safe for
concurrent job submission from one SparkSession; a daemon worker drains a
queue of scheduled replacecommit instants while the ingest loop keeps
committing to OTHER file groups.
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

from .. import timeline as tl


class AsyncClusteringService:
    """``schedule_and_enqueue()`` parks a clustering plan and hands it to a
    daemon thread; ``stop()`` drains outstanding work and joins."""

    def __init__(self, table):
        self.table = table
        self._q: "queue.Queue[Optional[str]]" = queue.Queue()
        self.completed: list[str] = []
        self.errors: list[Exception] = []
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def schedule_and_enqueue(self, **schedule_kw) -> Optional[str]:
        from .clustering import schedule_clustering
        t = schedule_clustering(self.table, **schedule_kw)
        if t is not None:
            self._q.put(t)
        return t

    def enqueue(self, instant_time: str) -> None:
        self._q.put(instant_time)

    def _run(self) -> None:
        from .clustering import run_clustering
        while True:
            item = self._q.get()
            if item is None:
                return
            try:
                run_clustering(self.table, instant_time=item)
                self.completed.append(item)
            except Exception as e:  # surfaced on stop()
                self.errors.append(e)
            finally:
                self._q.task_done()

    def stop(self, raise_errors: bool = True) -> list[str]:
        self._q.join()
        self._q.put(None)
        self._worker.join(timeout=120)
        if self.errors and raise_errors:
            raise self.errors[0]
        return list(self.completed)


def pending_clustering_instants(table) -> list[str]:
    from .clustering import pending_clustering_plans
    return [p.time for p, _ in pending_clustering_plans(table)]

"""Async clustering: execute scheduled clustering plans concurrently with
ingestion.

Reference: AsyncClusteringService.java + SparkAsyncClusteringService.java
(daemon pool draining pending clustering instants) and the streaming trigger
SparkStreamingAsyncClusteringService.java.  Correctness is serialized by the
timeline exactly as for async compaction: ``schedule_clustering`` parks the
plan as ``<t>.replacecommit.requested`` and FREEZES its file groups — while
the plan is pending, upserts/deletes touching them are rejected
(SparkRejectUpdateStrategy.java:41-62 via ClusteringUpdateConflict) and
insert packing avoids them — so the daemon's rewrite races with no pending
writer.  After execution the replacecommit completes at the plan's old
scheduled instant time; session key-index caches stay coherent because
their validity token compares the full completed-instant set (table.py),
not just the newest time.
"""

from __future__ import annotations

from typing import Optional

from .async_base import AsyncInstantService


class AsyncClusteringService(AsyncInstantService):
    """``schedule_and_enqueue()`` parks a clustering plan and hands it to a
    daemon thread; ``stop()`` drains outstanding work and joins."""

    def _schedule(self, **schedule_kw) -> Optional[str]:
        from .clustering import schedule_clustering
        return schedule_clustering(self.table, **schedule_kw)

    def _execute(self, instant_time: str) -> None:
        from .clustering import run_clustering
        run_clustering(self.table, instant_time=instant_time)


def pending_clustering_instants(table) -> list[str]:
    from .clustering import pending_clustering_plans
    return [p.time for p, _ in pending_clustering_plans(table)]

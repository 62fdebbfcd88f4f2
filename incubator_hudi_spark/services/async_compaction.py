"""Async compaction: run compaction concurrently with ingestion.

Reference: SparkAsyncCompactService.java + the streaming-sink trigger
(HoodieStreamingSink.scala:92-94).  The timeline serializes correctness —
compaction completes as its own instant, and a compaction plan pins its file
groups (the cleaner skips them, upserts keep appending logs to the latest
slice which the compactor's plan snapshot doesn't cover).

Queue/daemon/stop machinery shared with async clustering (async_base.py).
"""

from __future__ import annotations

from typing import Optional

from .. import timeline as tl
from .async_base import AsyncInstantService


class AsyncCompactionService(AsyncInstantService):
    """``enqueue()`` scheduled compaction instants; a daemon thread runs
    them.  ``stop()`` drains outstanding work and joins."""

    join_timeout_s = 60.0

    def _schedule(self, **schedule_kw) -> Optional[str]:
        from .compaction import schedule_compaction
        return schedule_compaction(self.table, **schedule_kw)

    def _execute(self, instant_time: str) -> None:
        from .compaction import run_compaction
        run_compaction(self.table, instant_time)


def pending_compaction_instants(table) -> list[str]:
    return [i.time for i in table.timeline.pending()
            if i.action == tl.COMPACTION]

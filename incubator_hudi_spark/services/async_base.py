"""Shared daemon machinery for async table services.

Reference: AsyncCompactService.java / AsyncClusteringService.java both extend
HoodieAsyncService (queue of pending instants drained by a worker pool);
this is the same factoring — one queue/daemon/stop implementation, each
service supplying only its schedule and execute steps.

Driver-thread based: Spark is thread-safe for concurrent job submission from
one SparkSession, so a daemon worker drains instants while the ingest loop
keeps committing.  The timeline serializes correctness (each service's
plan pins/freezes its file groups; see the concrete services).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Optional


class ServiceStopTimeout(Exception):
    """stop() gave up waiting for the worker (a hung ``_execute``); the
    daemon thread is abandoned (it is a daemon — process exit kills it)."""


class AsyncInstantService:
    """``enqueue()`` scheduled instants; a daemon thread executes them via
    the subclass's ``_execute``.  ``stop()`` drains outstanding work and
    joins; errors surface there."""

    #: seconds stop() waits for the worker to drain the queue AND finish
    #: its last item; a hung _execute raises ServiceStopTimeout instead of
    #: deadlocking the caller
    join_timeout_s: float = 120.0

    def __init__(self, table):
        self.table = table
        self._q: "queue.Queue[Optional[str]]" = queue.Queue()
        self.completed: list[str] = []
        self.errors: list[Exception] = []
        self._stopped = False
        self._stop_timed_out = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # subclasses implement ------------------------------------------------
    def _schedule(self, **schedule_kw) -> Optional[str]:
        raise NotImplementedError

    def _execute(self, instant_time: str) -> None:
        raise NotImplementedError

    # shared machinery ----------------------------------------------------
    def schedule_and_enqueue(self, **schedule_kw) -> Optional[str]:
        t = self._schedule(**schedule_kw)
        if t is not None:
            self._q.put(t)
        return t

    def enqueue(self, instant_time: str) -> None:
        if self._stopped:
            raise RuntimeError(
                "service already stopped — enqueue() after stop() would "
                "never execute (the worker has exited)")
        self._q.put(instant_time)

    def _run(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                # mark the sentinel done too: unfinished_tasks == 0 then
                # means "worker retired cleanly", which stop() relies on
                self._q.task_done()
                return
            try:
                self._execute(item)
                self.completed.append(item)
            except Exception as e:  # surfaced on stop()
                self.errors.append(e)
            finally:
                self._q.task_done()

    def stop(self, raise_errors: bool = True) -> list[str]:
        """Drain outstanding work with a deadline, then retire the worker.
        Idempotent: a second stop() returns immediately.  A hung
        ``_execute`` raises ServiceStopTimeout after ``join_timeout_s``
        instead of blocking forever (Queue.join has no timeout, so the
        drain polls ``unfinished_tasks`` against the deadline)."""
        if self._stopped:
            # a prior stop() timed out: report honestly.  Still wedged →
            # re-raise (never report a clean stop over outstanding work);
            # unwedged since → fall through to the normal error/completed
            # report.  The timed-out stop() enqueued a retire sentinel that
            # counts toward unfinished_tasks until the worker consumes it
            # and exits — give the worker a brief grace join, then exclude
            # that sentinel from the outstanding count (FIFO: the sentinel
            # was enqueued last, so while the worker is alive exactly one
            # unconsumed sentinel is in the count; a recovered worker with
            # only the sentinel left is NOT wedged).
            if self._stop_timed_out:
                self._worker.join(timeout=0.5)
                outstanding = self._q.unfinished_tasks
                if self._worker.is_alive():
                    outstanding -= 1  # the unconsumed retire sentinel
                if outstanding > 0:
                    raise ServiceStopTimeout(
                        f"worker still busy ({outstanding} item(s) "
                        "outstanding since the timed-out stop)")
            if self.errors and raise_errors:
                raise self.errors[0]
            return list(self.completed)
        self._stopped = True
        deadline = time.monotonic() + self.join_timeout_s
        while self._q.unfinished_tasks:
            if time.monotonic() > deadline:
                # enqueue the sentinel anyway: if the hung _execute ever
                # returns, the worker drains it and retires instead of
                # blocking in q.get() forever
                self._stop_timed_out = True
                self._q.put(None)
                raise ServiceStopTimeout(
                    f"worker still busy after {self.join_timeout_s}s "
                    f"({self._q.unfinished_tasks - 1} item(s) outstanding)")
            time.sleep(0.05)
        self._q.put(None)
        self._worker.join(timeout=max(0.0, deadline - time.monotonic()) + 5)
        if self.errors and raise_errors:
            raise self.errors[0]
        return list(self.completed)

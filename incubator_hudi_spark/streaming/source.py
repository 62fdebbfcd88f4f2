"""Streaming source: poll the table's timeline for new commits and hand out
incremental batches.

Reference: HoodieStreamSource.scala:49-144 + HoodieSourceOffset.scala —
offsets are commit instants; ``getBatch(start, end)`` is an incremental query
between them.  The NATIVE streaming source lives in pyds.py
(``spark.readStream.format("hudi_py")``, PySpark 4 Python DataSource API);
this polling iterator remains as the non-streaming-query surface the user
drives directly (or feeds into foreachBatch of another table →
table-to-table incremental pipelines, the reference's HoodieIncrSource).
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame

from .. import timeline as tl
from ..config import QUERY_INCREMENTAL


class HudiStreamReader:
    def __init__(self, table, start_instant: Optional[str] = None):
        self.table = table
        self.offset = start_instant or ""

    def latest_offset(self) -> Optional[str]:
        last = self.table.timeline.last_completed(tl.DATA_ACTIONS)
        return last.time if last else None

    def next_batch(self) -> Optional[DataFrame]:
        """Incremental pull (self.offset, latest]; advances the offset.
        Returns None when caught up."""
        end = self.latest_offset()
        if end is None or end <= self.offset:
            return None
        df = self.table.read(QUERY_INCREMENTAL,
                             begin=self.offset or None, end=end)
        self.offset = end
        return df

    def batches(self) -> Iterator[DataFrame]:
        while True:
            b = self.next_batch()
            if b is None:
                return
            yield b

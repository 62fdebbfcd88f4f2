"""Env-gated wall-clock probes for write-path stages (HUDI_SPARK_TIMING=1)."""

from __future__ import annotations

import os

_TIMING = os.environ.get("HUDI_SPARK_TIMING") == "1"


class _stage:
    def __init__(self, label: str):
        self.label = label

    def __enter__(self):
        if _TIMING:
            import time
            self.t0 = time.time()
        return self

    def __exit__(self, *a):
        if _TIMING:
            import sys
            import time
            print(f"[timing] {self.label}: {time.time() - self.t0:.3f}s",
                  file=sys.stderr)

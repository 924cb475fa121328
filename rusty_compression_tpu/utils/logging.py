"""Structured metrics logging (SURVEY.md §5 "Metrics / logging").

Per-block structured records (block id, dims, achieved rank, relative
residual, wall time, process/device identity) as JSON lines — greppable,
streamable, and mergeable across hosts of a pod slice (each process logs
its own shard; records carry ``process`` for the merge).
"""

from __future__ import annotations

import json
import sys
import time
from typing import IO

import jax

__all__ = ["MetricsLogger"]


class MetricsLogger:
    """Append-only JSONL metrics writer.

    >>> log = MetricsLogger(open("metrics.jsonl", "a"))
    >>> for r in results:                      # BlockResults
    ...     log.write(r.record())
    """

    def __init__(self, stream: IO[str] | None = None):
        self.stream = stream if stream is not None else sys.stderr
        self._base = {
            "process": jax.process_index(),
            "n_devices": jax.local_device_count(),
        }

    def write(self, record: dict) -> None:
        rec = {"ts": time.time(), **self._base, **record}
        self.stream.write(json.dumps(rec) + "\n")
        self.stream.flush()

"""Observability: in-query counters + streaming progress capture.

Parity: the reference keeps per-request counters and a bounded
history ring buffer (``subgraphProvider.ts:27-62``) and logs per-block
deltas (``blockWatcher.ts:69-79,138-157``). Spark-native equivalents:
``df.observe`` metrics evaluated inside the job (no extra pass) and a
``StreamingQueryListener`` fed by micro-batch progress events.
"""

from __future__ import annotations

from collections import deque
from typing import Any

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQueryListener


def observed(df: DataFrame, name: str = "engine_metrics") -> DataFrame:
    """Attach a row counter to a plan; read it back from
    ``QueryExecution`` listeners or ``StreamingQueryProgress`` without
    a second scan. Only deterministic expressions are legal in
    ``observe`` under streaming (no ``spark_partition_id``)."""
    return df.observe(name, F.count(F.lit(1)).alias("rows"))


class ProgressRingListener(StreamingQueryListener):
    """Bounded history of micro-batch progress (cap defaults to the
    reference's 1000-entry ring)."""

    def __init__(self, capacity: int = 1000):
        self.history: deque[dict[str, Any]] = deque(maxlen=capacity)

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.history.append(
            {
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "durationMs": dict(p.durationMs) if p.durationMs else {},
                "observedMetrics": {
                    k: v.asDict() if hasattr(v, "asDict") else v
                    for k, v in (p.observedMetrics or {}).items()
                },
            }
        )

    def onQueryTerminated(self, event) -> None:
        pass

    def onQueryIdle(self, event) -> None:
        pass

    def totals(self) -> dict[str, int]:
        return {
            "batches": len(self.history),
            "rows": sum(h["numInputRows"] for h in self.history),
        }

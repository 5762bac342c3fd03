"""Streaming observability: capture per-micro-batch progress metrics.

A 100 TB streaming deployment lives or dies on its lag/throughput
telemetry: input rows per second, batch duration, state-store size,
watermark advancement. Spark emits all of it through
``StreamingQueryListener`` progress events; this module collects the
load-bearing subset into plain dicts a metrics pipeline (or a test)
can consume — no external dependency, works on any sink.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressCollector(StreamingQueryListener):
    """Collects one record per finished micro-batch.

    Thread-safe (listener callbacks arrive on Spark's listener bus
    thread); ``snapshot()`` returns a copy for inspection. Register
    with ``collector.attach(spark)``, detach with ``.detach(spark)``
    — always detach in a finally: listeners outlive queries."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._records: list[dict] = []

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        rec = {
            "query_name": p.get("name"),
            "batch_id": p.get("batchId"),
            "num_input_rows": p.get("numInputRows", 0),
            "input_rows_per_second": p.get("inputRowsPerSecond", 0.0),
            "process_rows_per_second": p.get("processedRowsPerSecond", 0.0),
            "batch_duration_ms": (p.get("durationMs") or {}).get("triggerExecution"),
            "state_rows": sum(
                s.get("numRowsTotal", 0) for s in p.get("stateOperators") or []
            ),
            "watermark": (p.get("eventTime") or {}).get("watermark"),
        }
        with self._lock:
            self._records.append(rec)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # -- user surface -------------------------------------------------------
    def attach(self, spark: SparkSession) -> "ProgressCollector":
        spark.streams.addListener(self)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)

    def snapshot(self) -> list[dict]:
        with self._lock:
            return list(self._records)

    def totals(self) -> dict:
        """Aggregate view: rows processed and worst batch duration —
        the two numbers an alert usually keys on."""
        records = self.snapshot()
        durations = [
            r["batch_duration_ms"] for r in records if r["batch_duration_ms"]
        ]
        return {
            "batches": len(records),
            "rows": sum(r["num_input_rows"] for r in records),
            "max_batch_ms": max(durations) if durations else None,
            "max_state_rows": max((r["state_rows"] for r in records), default=0),
        }

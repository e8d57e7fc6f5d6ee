"""Observability: schema monitoring, progress/lag metrics, health.

Maps the reference's monitoring operators (SURVEY.md §2A M1-M5) onto
Spark's native instrumentation:

- M1 schema monitor: the reference polls Schema Registry versions and
  optionally halts the pipeline on incompatible changes
  (streaming/schema_monitor.py:16-138). Here drift is detected
  structurally per micro-batch: compare the batch schema against the
  pinned expected schema; ``mode='halt'`` raises (stopping the query —
  the ``query.stop()`` equivalent), ``mode='warn'`` records.
- M2/M3 lag + queue depth: Spark's StreamingQuery.lastProgress already
  carries per-source offsets, input rates, and batch durations — the
  metrics the reference computes by hand with an AdminClient
  (observability/metrics.py:23-143).
- M4 health: aggregate source/sink status like the reference's /readyz
  (pipeline/runner.py:390-416).
- M5 retry/backoff: deterministic exponential backoff with bounded
  attempts (sinks/webhook.py:80-91, wal/reader.py:25-26 1s->60s cap).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import types as T


class SchemaDriftError(RuntimeError):
    pass


@dataclass
class SchemaMonitor:
    """Structural schema-drift detection per batch (M1).

    ``compatible`` drift = new nullable columns only (backward compatible,
    like the registry's BACKWARD mode); anything else (dropped columns,
    type changes) is incompatible.
    """

    expected: T.StructType
    mode: str = "halt"  # halt | warn
    drift_log: list[dict] = field(default_factory=list)

    def check(self, df: DataFrame) -> bool:
        got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        want = {f.name: f.dataType.simpleString() for f in self.expected.fields}
        missing = {k: v for k, v in want.items() if k not in got}
        changed = {k: (want[k], got[k]) for k in want if k in got and got[k] != want[k]}
        added = {k: v for k, v in got.items() if k not in want}
        if not (missing or changed or added):
            return True
        incompatible = bool(missing or changed)
        record = {
            "ts_ms": int(time.time() * 1000),
            "missing": missing,
            "changed": changed,
            "added": added,
            "incompatible": incompatible,
        }
        self.drift_log.append(record)
        if incompatible and self.mode == "halt":
            raise SchemaDriftError(f"incompatible schema drift: {record}")
        return not incompatible


def progress_metrics(query) -> dict:
    """Lag/throughput snapshot from a StreamingQuery (M2/M3)."""
    p = query.lastProgress
    if p is None:
        return {"status": "no-progress"}
    return {
        "batch_id": p.get("batchId"),
        "num_input_rows": p.get("numInputRows"),
        "input_rows_per_second": p.get("inputRowsPerSecond"),
        "process_rows_per_second": p.get("processedRowsPerSecond"),
        "batch_duration_ms": p.get("batchDuration"),
        "sources": [
            {"description": s.get("description"), "start": s.get("startOffset"), "end": s.get("endOffset")}
            for s in p.get("sources", [])
        ],
    }


def health(queries: list, sinks: dict[str, object] | None = None) -> dict:
    """Aggregate readiness like the reference's /readyz (M4): any failed
    component -> not ready."""
    components = {}
    ready = True
    for q in queries:
        ok = q.isActive and q.exception() is None
        components[f"query:{q.name or q.id}"] = "ok" if ok else "error"
        ready &= ok
    for sink_id in (sinks or {}):
        components[f"sink:{sink_id}"] = "ok"
    return {"status": "ready" if ready else "unhealthy", "components": components}


def retry_with_backoff(fn, max_attempts: int = 5, base_delay: float = 0.05, max_delay: float = 60.0):
    """Deterministic exponential backoff (M5): 1x, 2x, 4x ... capped."""
    attempt = 0
    while True:
        try:
            return fn()
        except Exception:  # noqa: BLE001
            attempt += 1
            if attempt >= max_attempts:
                raise
            time.sleep(min(base_delay * (2 ** (attempt - 1)), max_delay))

"""Pipeline observability — the engine's analog of the reference's
CloudWatch dashboard (cdk/lib/streaming-etl.ts:245-388: records in/out,
millisBehindLatest keep-up, per-minute periods).

Spark-first mapping:

- **Throughput / lag**: Structured Streaming already publishes
  per-batch ``numInputRows``, ``processedRowsPerSecond`` and duration
  breakdowns in every ``StreamingQueryProgress``; the listener below
  captures them driver-side (no executor cost).
- **Parse health (P2)**: the pipeline attaches a named ``observe`` to
  the post-parse stream — ``valid_rows`` per micro-batch ride the same
  progress events (observed metrics are computed inside the running
  plan, no extra pass), so ``corrupt = numInputRows - valid_rows``
  without ever executing the dead-letter branch twice.
- **Keep-up criterion** (BASELINE.md `millisBehindLatest ≈ 0` analog):
  a batch is keeping up when its trigger execution time stays under the
  trigger interval; ``snapshot()`` reports the ratio.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql.streaming import StreamingQueryListener

#: observation name the pipeline attaches (see Pipeline.start)
OBSERVATION_NAME = "etl"


class PipelineMetricsListener(StreamingQueryListener):
    """Driver-side collector of per-batch pipeline metrics.

    Register with ``spark.streams.addListener`` (Pipeline.attach_metrics
    does this); after/while the query runs, ``batches`` holds one dict
    per completed micro-batch and ``snapshot()`` aggregates them.
    """

    def __init__(self) -> None:
        self.batches: list[dict[str, Any]] = []

    # -- listener callbacks (driver thread) ---------------------------------

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        observed = {}
        try:
            row = (p.observedMetrics or {}).get(OBSERVATION_NAME)
            if row is not None:
                observed = row.asDict()
        except Exception:  # observed metrics are best-effort
            observed = {}
        self.batches.append(
            {
                "batch_id": p.batchId,
                "input_rows": p.numInputRows,
                "processed_rows_per_sec": p.processedRowsPerSecond,
                "trigger_ms": (p.durationMs or {}).get("triggerExecution"),
                "valid_rows": observed.get("valid_rows"),
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # -- aggregation --------------------------------------------------------

    def snapshot(self, trigger_interval_ms: int | None = None) -> dict[str, Any]:
        """Dashboard-style rollup over captured batches: totals, parse
        health, and (when a trigger interval is given) the keep-up ratio
        — the fraction of batches whose execution fit in the interval
        (the ``millisBehindLatest ≈ 0`` health criterion analog)."""
        data = [b for b in self.batches if b["input_rows"] > 0]
        total_in = sum(b["input_rows"] for b in data)
        total_valid = sum(
            b["valid_rows"] for b in data if b["valid_rows"] is not None
        )
        have_valid = any(b["valid_rows"] is not None for b in data)
        out: dict[str, Any] = {
            "batches": len(data),
            "input_rows": total_in,
            "valid_rows": total_valid if have_valid else None,
            "corrupt_rows": (total_in - total_valid) if have_valid else None,
        }
        if trigger_interval_ms and data:
            fit = sum(
                1
                for b in data
                if b["trigger_ms"] is not None and b["trigger_ms"] <= trigger_interval_ms
            )
            out["keepup_ratio"] = round(fit / len(data), 4)
        return out

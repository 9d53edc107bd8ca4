"""M5 — streaming observability: a StreamingQueryListener that appends one
JSON line per progress event (query, batch id, rows, durations) to a log
file. The Spark twin of the reference's tracing/pprof instrumentation
(/root/reference/example/src/main.rs:705-753); the per-commit data-level
lineage lives in the Icelite manifest (``IceliteTable.lineage()``)."""

from __future__ import annotations

import json

from pyspark.sql.streaming import StreamingQueryListener


class ProgressLogListener(StreamingQueryListener):
    def __init__(self, path: str):
        self.path = path

    def onQueryStarted(self, event) -> None:
        self._write({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._write(
            {
                "event": "progress",
                "name": p.name,
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "duration_ms": dict(p.durationMs or {}),
                "sources": [
                    {"description": s.description, "num_input_rows": s.numInputRows}
                    for s in (p.sources or [])
                ],
            }
        )

    def onQueryTerminated(self, event) -> None:
        self._write(
            {"event": "terminated", "id": str(event.id), "exception": event.exception}
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover
        pass

    def _write(self, rec: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

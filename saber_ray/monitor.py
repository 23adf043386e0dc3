"""Live monitoring endpoint for streaming jobs — the analogue of the
reference's REST monitoring server (www/RESTfulServer.java,
www/RESTfulHandler.java:16-47, which serves the PerformanceMonitor's
throughput counters over localhost HTTP).

On a long-running streaming job an operator wants CURRENT throughput and
watermark lag without reading checkpoint files. :class:`MetricsServer`
serves exactly that over stdlib ``http.server`` (no dependencies, daemon
thread, ephemeral port by default):

- it IS a callable, so it plugs straight into every engine's existing
  ``monitor=`` hook (fired per completed ingest task — sub-epoch
  granularity, streaming.drain_ingest) for LIVE in-flight progress;
- given the job's ``out_dir`` it also tails ``checkpoint.json`` per
  request for COMMITTED state: watermark, emitted/late totals and the
  last-N ``epoch_stats`` rows (the engines' per-epoch monitoring schema).

Endpoints (all JSON):
    GET /metrics  -> {"job_dir", "watermark", "finalized", "epoch",
                      "emitted_rows", "late_dropped",
                      "watermark_lag_us"  (now_us - watermark),
                      "epochs": [last-N epoch_stats rows],
                      "live": latest monitor tick or null}
    GET /health   -> {"ok": true}

Usage::

    srv = MetricsServer(out_dir)
    job = StreamingWindowedAggregate(out_dir, ..., monitor=srv)
    # poll http://127.0.0.1:<srv.port>/metrics while job.run(...) executes
    srv.stop()
"""

from __future__ import annotations

import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional


class MetricsServer:
    def __init__(self, out_dir: Optional[str] = None, *,
                 host: str = "127.0.0.1", port: int = 0,
                 keep_epochs: int = 60):
        self.out_dir = out_dir
        self.keep_epochs = int(keep_epochs)
        self._lock = threading.Lock()
        self._live: Optional[dict] = None
        self._live_at: Optional[float] = None
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):      # no stderr chatter per request
                pass

            def do_GET(self):
                if self.path.split("?")[0] in ("/", "/metrics"):
                    body = json.dumps(outer.snapshot()).encode()
                elif self.path == "/health":
                    body = b'{"ok": true}'
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        name="saber-metrics", daemon=True)
        self._thread.start()

    # ---- engine hook -------------------------------------------------------
    def __call__(self, tick: dict) -> None:
        """monitor= callback: one dict per completed ingest task."""
        with self._lock:
            self._live = dict(tick)
            self._live_at = time.time()

    # ---- snapshot ----------------------------------------------------------
    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}/metrics"

    def snapshot(self) -> dict:
        ck = None
        if self.out_dir:
            p = os.path.join(self.out_dir, "checkpoint.json")
            try:
                with open(p) as f:
                    ck = json.load(f)
            except (OSError, json.JSONDecodeError):
                ck = None                    # mid-replace or not yet written
        with self._lock:
            live = dict(self._live) if self._live is not None else None
            live_at = self._live_at
        out: dict = {"job_dir": self.out_dir, "live": live,
                     "live_age_sec": (round(time.time() - live_at, 3)
                                      if live_at else None)}
        if ck is not None:
            m = ck.get("metrics", {})
            wm = ck.get("watermark")
            out.update({
                "epoch": ck.get("epoch"),
                "watermark": wm,
                "watermark_lag_us": (int(time.time() * 1e6) - int(wm)
                                     if wm is not None else None),
                "finalized": bool(ck.get("finalized")),
                "emitted_rows": m.get("emitted_rows"),
                "late_dropped": m.get("late_dropped"),
                "epochs": m.get("epoch_stats", [])[-self.keep_epochs:],
            })
        return out

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()

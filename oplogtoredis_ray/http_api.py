"""HTTP control-plane server (stdlib only).

≙ the reference's HTTP surface (/root/reference/main.go:301-359):

- ``GET /healthz``          — dependency health (our deps are the log dir
  and the lake's manifests, not Mongo/Redis): 200 + JSON flags, 500 if any
  check fails (mirrors the mongoOK/redisOK shape).
- ``GET /metrics``          — Prometheus text exposition rendered from the
  lake's last-run metrics file (state/metrics.py) plus denylist gauges
  (≙ promhttp + otr_denylist_filter_enabled, lib/denylist/http.go:14-19).
- ``/denylist`` CRUD        — exact reference semantics
  (lib/denylist/http.go:22-144):
    GET    /denylist        → 200, JSON array of ids
    GET    /denylist/:id    → 200 + JSON id | 404
    PUT    /denylist/:id    → 201 created | 204 already present
    DELETE /denylist/:id    → 204 removed | 204 absent (the reference
                              deliberately returns success for non-existent
                              entries; ids containing "/" are 404)

Mutations write through the durable DenylistStore, so a concurrently
running ``run_ingest``/``run_follow`` picks them up at its next window
boundary — the runtime-toggle flow of denylist_oplog_test.go:12-75.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from oplogtoredis_ray.state.denylist import DenylistStore, load_denylist
from oplogtoredis_ray.state.metrics import read_metrics


def render_prometheus(lake_root: str) -> str:
    """Last-run metrics, per-database denylist counters and the per-window
    distribution histograms in Prometheus text format.

    HELP/TYPE headers are emitted exactly once per metric name (the text
    format rejects repeated TYPE lines for a name, so multi-sample metrics —
    the labeled denylist gauges/counters and every histogram — write one
    header followed by all their samples)."""
    lines: list[str] = []
    headered: set[str] = set()

    def header(name: str, mtype: str, help_: str | None):
        if name in headered:
            return
        headered.add(name)
        if help_:
            lines.append(f"# HELP {name} {help_}")
        lines.append(f"# TYPE {name} {mtype}")

    def sample(name: str, value, labels: str = "", mtype: str = "gauge",
               help_: str | None = None):
        if value is None:
            return
        header(name, mtype, help_)
        lines.append(f"{name}{labels} {value}")

    def _esc(v: str) -> str:
        return v.replace("\\", "\\\\").replace('"', '\\"')

    def histogram(name: str, hist: dict | None, help_: str | None = None):
        """≙ the reference's prometheus.Histogram exposition
        (lib/oplog/tail.go:88-94, lib/redispub/publisher.go:78-92):
        cumulative le-buckets + _sum + _count."""
        if not hist:
            return
        header(name, "histogram", help_)
        for le, n in hist.get("buckets", {}).items():
            lines.append(f'{name}_bucket{{le="{le}"}} {n}')
        lines.append(f'{name}_bucket{{le="+Inf"}} {hist.get("count", 0)}')
        lines.append(f"{name}_sum {hist.get('sum', 0)}")
        lines.append(f"{name}_count {hist.get('count', 0)}")

    m = read_metrics(lake_root) or {}
    ev = m.get("events", {})
    for key, help_ in [
        ("in", "events read in the last run"),
        ("dupes_dropped", "exact replays dropped"),
        ("below_watermark", "events below the applied watermark"),
        ("upserts", "inserts/updates applied"),
        ("deletes", "deletes applied"),
        ("patches", "partial updates applied"),
        ("patch_misses", "patches with no prior state"),
    ]:
        sample(f"otr_events_{key}", ev.get(key), help_=help_)
    sample("otr_windows_run", m.get("windows_run"))
    sample("otr_deadletter_rows", m.get("deadletter_rows"),
           help_="rows in the dead-letter channel")
    sample("otr_watermark_lag_us", m.get("watermark_lag_us"),
           help_="log end minus applied window end (staleness)")
    sample("otr_resume_gap_us", m.get("resume_gap_us"),
           help_="committed frontier minus slowest partition watermark")
    sample("otr_last_run_wall_seconds", m.get("wall_s"))
    # per-database filtered counts (≙ metricFilteredPerDB, tail.go:109-114)
    for db, n in sorted((m.get("denied_by_db") or {}).items()):
        sample(
            "otr_denylist_filtered_total",
            n,
            labels='{db="%s"}' % _esc(db),
            mtype="counter",
            help_="events dropped by the denylist in the last run, per database",
        )
    histogram("otr_window_wall_seconds", m.get("window_wall_seconds_hist"),
              help_="per-window ingest wall time distribution")
    histogram("otr_window_events", m.get("window_events_hist"),
              help_="events-per-window distribution")
    for db in sorted(load_denylist(lake_root)):
        sample(
            "otr_denylist_filter_enabled",
            1,
            labels='{db="%s"}' % _esc(db),
        )
    return "\n".join(lines) + "\n"


def make_handler(lake_root: str, log_dir: str | None):
    store = DenylistStore(lake_root)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes = b"", ctype: str = "application/json"):
            self.send_response(code)
            if body:
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if body:
                self.wfile.write(body)

        def _denylist_id(self) -> str | None:
            """id from /denylist/<id>; None if this isn't a single-entry
            path or the id contains '/' (reference 404s those)."""
            rest = self.path[len("/denylist/"):]
            return None if ("/" in rest or rest == "") else rest

        def do_GET(self):
            if self.path == "/healthz":
                import os

                from oplogtoredis_ray.state.manifest import ManifestReadError, read_all_manifests

                log_ok = log_dir is None or os.path.isdir(log_dir)
                try:
                    read_all_manifests(lake_root)
                    lake_ok = True
                except ManifestReadError:
                    lake_ok = False
                body = json.dumps({"logOK": log_ok, "lakeOK": lake_ok}).encode()
                self._send(200 if (log_ok and lake_ok) else 500, body)
            elif self.path == "/metrics":
                self._send(
                    200,
                    render_prometheus(lake_root).encode(),
                    ctype="text/plain; version=0.0.4",
                )
            elif self.path == "/denylist":
                self._send(200, json.dumps(store.entries()).encode())
            elif self.path.startswith("/denylist/"):
                entry = self._denylist_id()
                if entry is None or not store.contains(entry):
                    self._send(404, b"denylist entry not found with that id",
                               ctype="text/plain")
                else:
                    self._send(200, json.dumps(entry).encode())
            else:
                self._send(404)

        def do_PUT(self):
            if not self.path.startswith("/denylist/"):
                return self._send(404)
            entry = self._denylist_id()
            if entry is None:
                return self._send(404)
            created = store.add(entry)
            self._send(201 if created else 204)

        def do_DELETE(self):
            if not self.path.startswith("/denylist/"):
                return self._send(404)
            entry = self._denylist_id()
            if entry is None:
                return self._send(404)
            store.remove(entry)
            # 204 whether or not the entry existed (http.go:120-133: deploy
            # tooling requires success on absent entries)
            self._send(204)

    return Handler


def make_server(lake_root: str, log_dir: str | None = None, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Bind (port=0 → ephemeral) and return the server; caller runs
    ``serve_forever`` (typically on a daemon thread next to run_follow)."""
    return ThreadingHTTPServer((host, port), make_handler(lake_root, log_dir))

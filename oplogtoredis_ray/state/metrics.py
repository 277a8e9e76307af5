"""Per-run machine-readable metrics export.

≙ K7, the reference's observability surface: ~15 Prometheus metrics with
staleness gauges and the resume-gap histogram
(/root/reference/lib/oplog/tail.go:88-129), oldest-unprocessed-entry age
(/root/reference/lib/redispub/publisher.go:145-158) and the /healthz +
/metrics endpoints (/root/reference/main.go:301-359).  A batch engine has no
long-lived HTTP server to scrape, so the equivalent is a metrics FILE
written atomically after every ingest run (and readable mid-run from the
previous run): counters by event status, per-window wall times, dead-letter
volume, and the two lag gauges —

- ``watermark_lag_us``  — log end minus the max committed window end: how
  far the lake trails the log (0 after a complete run; >0 = unapplied tail).
- ``resume_gap_us``     — max committed window end minus the min partition
  watermark: how much one straggler partition trails the committed frontier
  (≙ the resume-gap histogram).
"""

from __future__ import annotations

import glob
import json
import os
import tempfile
import time


def metrics_path(lake_root: str) -> str:
    return os.path.join(lake_root, "metrics.json")


def _deadletter_totals(lake_root: str) -> tuple[int, int]:
    """(files, rows) in the dead-letter channel — rows from parquet footers
    only (no data read)."""
    files = glob.glob(os.path.join(lake_root, "errors", "*.parquet"))
    rows = 0
    for p in files:
        try:
            import pyarrow.parquet as pq

            rows += pq.ParquetFile(p).metadata.num_rows
        except Exception:  # unreadable dead-letter file: count it, rows unknown
            continue
    return len(files), rows


# histogram bucket bounds (Prometheus ``le`` semantics: cumulative counts of
# observations <= bound; +Inf is implied by ``count``)
WINDOW_WALL_BUCKETS = (0.1, 0.25, 0.5, 1.0, 2.0, 5.0, 10.0, 30.0, 60.0, 120.0)
WINDOW_EVENTS_BUCKETS = (
    1_000, 10_000, 100_000, 1_000_000, 10_000_000, 100_000_000
)


def _histogram(values, bounds) -> dict:
    """Cumulative-bucket histogram dict (≙ prometheus.Histogram state:
    entry-size/duration distributions in tail.go:88-94 and
    publisher.go:78-92, exported here as data instead of a live registry)."""
    vals = list(values)
    return {
        "buckets": {
            ("%g" % b): sum(1 for v in vals if v <= b) for b in bounds
        },
        "sum": float(sum(vals)),
        "count": len(vals),
    }


def build_run_metrics(
    lake_root: str,
    result,
    log_end_us: int | None,
    wall_s: float | None = None,
    denied_by_db: dict | None = None,
) -> dict:
    from oplogtoredis_ray.state.manifest import (
        ManifestReadError,
        read_all_manifests,
        read_completed_windows,
    )

    windows = read_completed_windows(lake_root)
    applied_end = max((w["end_us"] for w in windows), default=None)
    try:
        manifests = read_all_manifests(lake_root)
        min_wm = min((m.watermark[0] for m in manifests), default=None)
    except ManifestReadError:
        # observability must not mask the escape-hatch path (ingest already
        # decided how to handle the corruption); surface it instead
        manifests, min_wm = [], None
    dl_files, dl_rows = _deadletter_totals(lake_root)
    return {
        "at_unix": time.time(),
        "wall_s": wall_s,
        "windows_run": result.windows_run,
        "windows_skipped": result.windows_skipped,
        "events": {
            "in": result.events_in,
            "dupes_dropped": result.dupes_dropped,
            "below_watermark": result.below_watermark,
            "upserts": result.upserts,
            "deletes": result.deletes,
            "patches": result.patches,
            "patch_misses": result.patch_misses,
        },
        "deadletter_files": dl_files,
        "deadletter_rows": dl_rows,
        "applied_end_us": applied_end,
        "log_end_us": log_end_us,
        "watermark_lag_us": (
            max(log_end_us - applied_end, 0)
            if log_end_us is not None and applied_end is not None
            else None
        ),
        "resume_gap_us": (
            max(applied_end - min_wm, 0)
            if applied_end is not None and min_wm is not None
            else None
        ),
        # per-window distributions (≙ the histogram metrics class the
        # reference exports live; see http_api.render_prometheus)
        "window_wall_seconds_hist": _histogram(
            (w["wall_s"] for w in result.window_stats if w.get("wall_s") is not None),
            WINDOW_WALL_BUCKETS,
        ),
        "window_events_hist": _histogram(
            (w["events_in"] for w in result.window_stats), WINDOW_EVENTS_BUCKETS
        ),
        # per-database denylist-filtered counts (≙ tail.go:109-114)
        "denied_by_db": dict(sorted((denied_by_db or {}).items())),
        "window_stats": result.window_stats,
    }


def write_run_metrics(
    lake_root: str,
    result,
    log_end_us: int | None,
    wall_s: float | None = None,
    denied_by_db: dict | None = None,
) -> dict:
    metrics = build_run_metrics(lake_root, result, log_end_us, wall_s, denied_by_db)
    path = metrics_path(lake_root)
    os.makedirs(lake_root, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=lake_root, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(metrics, f, separators=(",", ":"))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return metrics


def read_metrics(lake_root: str) -> dict | None:
    path = metrics_path(lake_root)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)

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


def build_run_metrics(lake_root: str, result, log_end_us: int | None, wall_s: float | None = None) -> dict:
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
        "window_stats": result.window_stats,
    }


def write_run_metrics(lake_root: str, result, log_end_us: int | None, wall_s: float | None = None) -> dict:
    metrics = build_run_metrics(lake_root, result, log_end_us, wall_s)
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

#!/usr/bin/env python
"""Write-amplification sweep (BASELINE.md judge item).

Two measurements, one JSON line each:

1. The standard 16-window sf0.1 sustained row (length cap 12) — the
   cycle-closing operating point BASELINE.md tracks across rounds.
2. A leveled-compaction demonstration on an APPEND-MOSTLY synthetic mix
   (low update/delete rates → the compacted base dominates each cycle's
   delta suffix) at cap 4 across 32 windows, with partial merges ON
   (compact_partial_base_ratio=2, the default) vs OFF (inf) — the regime
   the leveled merge exists for.  On the standard UPDATE-heavy transcript
   mix the suffix folds to ≈ the base size, so partials rarely fire there
   (the BASELINE.md floor analysis binds); this demo quantifies the win
   where the base actually dominates.

Usage: python scripts/wamp_sweep.py [--demo-only|--row-only]
Owns its Ray session (do not call from the driver).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure(log_dir: str, cfg, n_events: int) -> dict:
    """One sustained run with concurrent GC; returns the bench's write-amp
    accounting (bytes written incl. GC-reclaimed / manifest-referenced)."""
    import shutil
    import threading

    from oplogtoredis_ray.pipelines.ingest import run_ingest
    from oplogtoredis_ray.state.gc import collect_garbage
    from oplogtoredis_ray.state.manifest import read_all_manifests

    lake = tempfile.mkdtemp(prefix="otr_wamp_")
    gc_stats = {"files": 0, "bytes": 0}
    stop = threading.Event()

    def gc_loop():
        while not stop.wait(3.0):
            for rel in collect_garbage(lake, dry_run=True, grace_seconds=2.0):
                path = os.path.join(lake, rel)
                try:
                    gc_stats["bytes"] += os.path.getsize(path)
                    os.unlink(path)
                    gc_stats["files"] += 1
                except OSError:
                    pass

    th = threading.Thread(target=gc_loop, daemon=True)
    th.start()
    t0 = time.perf_counter()
    res = run_ingest(log_dir, lake, cfg)
    sec = time.perf_counter() - t0
    stop.set()
    th.join()
    referenced: set[str] = set()
    partials = 0
    for m in read_all_manifests(lake):
        referenced.update(m.chain())
        if int(m.metrics.get("partials_since_full", 0)) > 0 or any(
            "-mid-" in f for f in m.chain()
        ):
            partials += 1
    live = resident = 0
    for root, _, files in os.walk(os.path.join(lake, "lake")):
        for f in files:
            p = os.path.join(root, f)
            sz = os.path.getsize(p)
            resident += sz
            if os.path.relpath(p, lake) in referenced:
                live += sz
    total = resident + gc_stats["bytes"]
    # canonical denominator: the FULLY-compacted state written once as
    # parquet — timing-independent, unlike referenced-bytes (a background
    # compaction finishing one window earlier/later swings the live chain
    # composition and with it the classic ratio by >1×; measured r5)
    import pyarrow.parquet as pq

    from oplogtoredis_ray.state.lake import read_partition_state_arrow

    compacted = 0
    cdir = tempfile.mkdtemp(prefix="otr_wamp_c_")
    for m in read_all_manifests(lake):
        t = read_partition_state_arrow(lake, m, tuple(cfgpay(lake)))
        p = os.path.join(cdir, f"{m.partition_id}.parquet")
        pq.write_table(t, p)
        compacted += os.path.getsize(p)
    shutil.rmtree(cdir, ignore_errors=True)
    out = {
        "sec": round(sec, 3),
        "windows": res.windows_run,
        "events": n_events,
        "bytes_written_total": total,
        "bytes_live": live,
        "bytes_state_compacted": compacted,
        "write_amplification": round(total / max(live, 1), 2),
        "write_amplification_vs_compacted": round(total / max(compacted, 1), 2),
        "gc_files_removed": gc_stats["files"],
        "partitions_with_mid_level": partials,
    }
    shutil.rmtree(lake, ignore_errors=True)
    return out


def cfgpay(lake: str) -> tuple:
    """Payload columns pinned by the lake's layout guard."""
    import json as _json

    p = os.path.join(lake, "lake_config.json")
    if os.path.exists(p):
        with open(p) as f:
            return tuple(_json.load(f).get("payload_cols", ("role", "text", "tool")))
    return ("role", "text", "tool")


def standard_row() -> dict:
    """16-window sf0.1 sustained run, length cap 12 (the BASELINE row)."""
    import pyarrow.parquet as pq

    from oplogtoredis_ray.config import PipelineConfig
    from oplogtoredis_ray.pipelines.queries import ensure_synth_log
    from oplogtoredis_ray.sources.event_log import log_ts_bounds

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = ensure_synth_log(sf_dir)
    n = 0
    for f in glob.glob(os.path.join(log_dir, "*.parquet")):
        pq.read_table(f)
        n += pq.read_metadata(f).num_rows
    lo, hi = log_ts_bounds(log_dir)
    cfg = PipelineConfig(
        num_partitions=128 if n >= 10_000_000 else 64,
        window_us=(hi - lo) // 16 + 1,
        state_mode="delta",
        compact_threshold=12,
        window_lookahead=True,
    )
    return {"case": "sf0.1 16-window cap-12 (standard row)", **_measure(log_dir, cfg, n)}


def leveled_demo() -> list[dict]:
    """Append-mostly mix, cap 4, 32 windows: partial merges on vs off."""
    from oplogtoredis_ray.config import PipelineConfig
    from oplogtoredis_ray.sources.event_log import log_ts_bounds
    from oplogtoredis_ray.sources.synthetic import (
        GeneratorSpec,
        generate_event_log,
        write_event_log,
    )

    spec = GeneratorSpec(
        seed=91,
        n_conversations=4000,
        mean_turns=6.0,
        mean_updates=0.15,   # append-mostly: keys mostly insert-once
        delete_frac=0.01,
        duplicate_rate=0.0,
        txn_rate=0.0,
    )
    log = generate_event_log(spec)
    d = tempfile.mkdtemp(prefix="otr_wamp_log_")
    write_event_log(log, d)
    lo, hi = log_ts_bounds(d)
    rows = []
    for ratio, label in ((float("inf"), "full-every-cycle"), (2.0, "leveled (default ratio 2)")):
        cfg = PipelineConfig(
            num_partitions=16,
            window_us=(hi - lo) // 32 + 1,
            state_mode="delta",
            compact_threshold=4,
            window_lookahead=True,
            compact_partial_base_ratio=ratio,
            compact_full_every=8,
        )
        rows.append({"case": f"append-mostly 32-window cap-4, {label}",
                     **_measure(d, cfg, len(log))})
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    return rows


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    rows = []
    if "--demo-only" not in sys.argv:
        rows.append(standard_row())
    if "--row-only" not in sys.argv:
        rows.extend(leveled_demo())
    for r in rows:
        print(json.dumps(r))
    ray.shutdown()


if __name__ == "__main__":
    main()

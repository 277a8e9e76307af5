#!/usr/bin/env python
"""Benchmark runner.

Headline: end-to-end windowed exactly-once CDC apply — replay the synthetic
transcript change-event log for $GRAFT_SF_DIR into a fresh Parquet lake
(change-events/sec).  Also times a representative slice of the operator
suite over the shared tables.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "events": N, "events_per_sec": N}

--scaling: runs the headline twice in fresh processes (num_cpus=8 vs 32 —
the sandbox stand-in for N vs 4N nodes) on the same input and reports both
throughputs + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time


def _run_bench() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from oplogtoredis_ray.config import PipelineConfig
    from oplogtoredis_ray.pipelines.ingest import run_ingest
    from oplogtoredis_ray.pipelines.queries import QUERIES, ensure_synth_log
    from oplogtoredis_ray.sources.event_log import log_ts_bounds
    from oplogtoredis_ray.state.lake import read_lake

    # --- setup (untimed): synth log + page-cache warm-up ---------------------
    log_dir = ensure_synth_log(sf_dir)
    import pyarrow.parquet as pq
    import glob

    n_events = 0
    for f in glob.glob(os.path.join(log_dir, "*.parquet")):
        pq.read_table(f)  # warm cache
        n_events += pq.read_metadata(f).num_rows
    for t in ("events", "documents", "embeddings", "lineitem"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            pq.read_table(p)

    # --- headline: windowed CDC apply ---------------------------------------
    lake_root = tempfile.mkdtemp(prefix="otr_bench_lake_")
    lo, hi = log_ts_bounds(log_dir)
    cfg = PipelineConfig(num_partitions=64, window_us=max((hi - lo) // 4, 1) + 1)
    t0 = time.perf_counter()
    run_ingest(log_dir, lake_root, cfg)
    rows = read_lake(lake_root).count()
    headline = time.perf_counter() - t0
    assert rows > 0

    # --- operator-suite timings ----------------------------------------------
    timed = [
        "cdc_last_state",
        "dedup_exact",
        "ordered_rank",
        "agg_pricing",
        "text_stats",
        "dedup_exact_docs",
        "knn_brute",
        "minhash_dedup",
        "change_records",
        "partition_assign",
    ]
    import ray.data as rd

    query_secs: dict[str, float] = {"cdc_apply": round(headline, 3)}
    for name in timed:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        out = fn(sf_dir)
        if isinstance(out, rd.Dataset):
            out.count()  # force full execution of the lazy pipeline
        query_secs[name] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": "cdc apply throughput (windowed exactly-once replay into lake)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": query_secs,
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "num_cpus": num_cpus,
        "events": int(n_events),
        "events_per_sec": round(n_events / headline, 1),
    }
    print(json.dumps(result))
    ray.shutdown()


def _run_scaling() -> None:
    lo_cpus, hi_cpus = 8, 32

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    r_lo = run(lo_cpus)
    r_hi = run(hi_cpus)
    tp_lo = r_lo["events_per_sec"]
    tp_hi = r_hi["events_per_sec"]
    eff = (tp_hi / tp_lo) / (hi_cpus / lo_cpus)
    print(
        json.dumps(
            {
                "metric": "scaling efficiency (N=8 vs 4N=32 cpus, same input)",
                "sec_8": r_lo["value"],
                "sec_32": r_hi["value"],
                "events_per_sec_8": tp_lo,
                "events_per_sec_32": tp_hi,
                "speedup": round(tp_hi / tp_lo, 3),
                "scaling_efficiency": round(eff, 3),
                "events": r_lo["events"],
                "sf": r_lo["sf"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _run_scaling()
    else:
        _run_bench()

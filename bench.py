#!/usr/bin/env python
"""Benchmark runner.

Headline: end-to-end windowed exactly-once CDC apply — replay the synthetic
transcript change-event log for $GRAFT_SF_DIR into a fresh Parquet lake
(change-events/sec).  Also times a representative slice of the operator
suite over the shared tables.

Methodology: the synthetic log is generated once (cached in /tmp), the OS
page cache and the Ray worker pool are warmed untimed, then the headline
runs REPS times into fresh lakes and the best steady-state time is
reported.  The sandbox host suffers invisible external contention (round-4
evidence: 5× wall-time spread on identical binaries), so the bench is
SELF-ADJUDICATING: a fixed-work calibration probe (sha256 + sort) brackets
every rep; reps whose probes deviate >1.5× from the session-quietest probe
are marked poisoned and re-run within a bounded retry budget, and the
artifact carries the per-rep probe times so a slow headline under a slow
probe reads as contention, not regression.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "events": N, "events_per_sec": N}

--scaling: runs the headline twice in fresh processes (num_cpus=8 vs 32 —
the sandbox stand-in for N vs 4N nodes) on the same input, same pipeline
config (fixed data-driven partitioning: P=64, read_blocks scale with the
log, NOT with the cluster), and reports both throughputs + efficiency.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile
import time

REPS = int(os.environ.get("OTR_BENCH_REPS", "3"))
# extra reps allowed when calibration flags a rep as contention-poisoned
CAL_RETRY_BUDGET = int(os.environ.get("OTR_BENCH_CAL_RETRIES", "3"))
# a rep is poisoned when its worst probe exceeds session-best × this
CAL_POISON_RATIO = 1.5

_CAL_STATE: dict = {}


def _calibration_probe() -> float:
    """Fixed-work contention probe: sha256 over a 64 MiB buffer + sort of
    8e6 scrambled int64 (CPU + memory bandwidth — the two resources the
    sandbox's invisible co-tenants steal), min-of-3 trials.  The min
    filters transient same-host spikes (idle Ray workers wake briefly and
    can triple a single trial — measured) while SUSTAINED external
    contention slows all three trials and still registers.  Run
    before/after each headline rep; a rep whose WORST probe deviates >1.5×
    from the session best ran under external contention and its time is
    not evidence.  ~0.18 s per trial on a quiet host (first call pays
    first-touch and is warmed untimed)."""
    import hashlib

    import numpy as np

    if "buf" not in _CAL_STATE:
        buf = np.arange(8 * 1024 * 1024, dtype=np.int64)  # 64 MiB
        with np.errstate(over="ignore"):
            arr = (buf.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)).view(
                np.int64
            )
        _CAL_STATE["buf"] = buf
        _CAL_STATE["arr"] = arr
        hashlib.sha256(memoryview(buf)).digest()  # warm
        np.sort(arr)  # warm (first-touch of the sort copy)
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        hashlib.sha256(memoryview(_CAL_STATE["buf"])).digest()
        np.sort(_CAL_STATE["arr"])
        trials.append(time.perf_counter() - t0)
    dt = min(trials)
    _CAL_STATE["best"] = min(_CAL_STATE.get("best", dt), dt)
    return dt


def _calibration_probe_mt() -> float:
    """Auxiliary MULTICORE probe (recorded, not gated on): 8 threads each
    sha256-ing 32 MiB concurrently (hashlib releases the GIL on large
    buffers), min-of-3.  A co-tenant stealing whole cores shows up here
    long before it moves the single-core probe — the 32-way headline is
    closer to this shape.  Quiet-host ~0.04-0.08 s; noisier than the
    single-core probe, hence informational only."""
    import hashlib
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    if "mt_bufs" not in _CAL_STATE:
        _CAL_STATE["mt_bufs"] = [
            np.arange(4 * 1024 * 1024, dtype=np.int64).tobytes()
            for _ in range(8)
        ]
        _CAL_STATE["mt_pool"] = ThreadPoolExecutor(8)

    def work(b: bytes) -> None:
        hashlib.sha256(b).digest()

    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        list(_CAL_STATE["mt_pool"].map(work, _CAL_STATE["mt_bufs"]))
        trials.append(time.perf_counter() - t0)
    return min(trials)


def _quiet_empty_schema_warnings() -> None:
    """Our stages emit schema-typed blocks everywhere (incl. empties), but
    Ray's sort-shuffle itself produces schema-LESS empty blocks for reduce
    partitions that received no rows (verified: the UDF is never called for
    them), which trips the executor's 'RefBundle with a different schema'
    warning.  That residue is Ray-internal and cosmetic — filter just that
    message so real schema drift still surfaces."""
    import logging

    class _DropEmptySchema(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return "RefBundle with a different schema" not in record.getMessage()

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_DropEmptySchema())


def _tune_host() -> None:
    """Best-effort: disable THP direct compaction — measured to stall large
    first-touch allocations by seconds under full-cluster concurrency in
    this sandbox (standard database-host tuning; no-op without privileges)."""
    try:
        with open("/sys/kernel/mm/transparent_hugepage/defrag", "w") as f:
            f.write("never")
    except OSError:
        pass


def _historical_reference(session_best: float) -> dict:
    """Quietest probe across archived BENCH/*.json artifacts (absolute
    cross-session reference for this box); empty when no history exists."""
    best = None
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    for p in glob.glob(os.path.join(bench_dir, "*.json")):
        try:
            with open(p) as f:
                txt = f.read()
        except OSError:
            continue
        import re

        for m in re.finditer(r'"session_best_sec"\s*:\s*([0-9.]+)', txt):
            v = float(m.group(1))
            if best is None or v < best:
                best = v
    if best is None:
        return {}
    return {
        "reference_quiet_sec": best,
        "session_contended": session_best > 1.15 * best,
    }


def _headline(sf_dir: str, num_cpus: int) -> dict:
    from oplogtoredis_ray.config import PipelineConfig
    from oplogtoredis_ray.pipelines.ingest import run_ingest, warmup_cluster
    from oplogtoredis_ray.pipelines.queries import ensure_synth_log
    from oplogtoredis_ray.sources.event_log import log_ts_bounds

    import pyarrow.parquet as pq

    log_dir = ensure_synth_log(sf_dir)
    n_events = 0
    for f in glob.glob(os.path.join(log_dir, "*.parquet")):
        pq.read_table(f)  # warm page cache
        n_events += pq.read_metadata(f).num_rows
    warmup_cluster()

    lo, hi = log_ts_bounds(log_dir)
    n_files = len(glob.glob(os.path.join(log_dir, "*.parquet")))
    # data-driven layout, identical at every cluster size: one reduce block
    # per lake partition, sized to the log (P=128 measured optimal for the
    # 48M-event bench log); one resumable window = one full exchange
    P = 128 if n_events >= 10_000_000 else 64
    cfg = PipelineConfig(
        num_partitions=P,
        window_us=(hi - lo) + 1,
        read_blocks=max(P, n_files),
    )
    import shutil

    def one_rep() -> dict:
        cal_before = _calibration_probe()
        mt_before = _calibration_probe_mt()
        lake_root = tempfile.mkdtemp(prefix="otr_bench_lake_")
        t0 = time.perf_counter()
        run_ingest(log_dir, lake_root, cfg)
        sec = time.perf_counter() - t0
        shutil.rmtree(lake_root, ignore_errors=True)
        cal_after = _calibration_probe()
        mt_after = _calibration_probe_mt()
        return {
            "sec": round(sec, 3),
            "cal_before": round(cal_before, 3),
            "cal_after": round(cal_after, 3),
            "cal_mt_before": round(mt_before, 3),
            "cal_mt_after": round(mt_after, 3),
        }

    # self-adjudicating reps: the fixed-work probe brackets each rep; reps
    # bracketed by slow probes ran under external host contention (observed
    # 5× wall-time swings on identical binaries) and are re-run within a
    # bounded retry budget rather than recorded as engine regressions
    reps = [one_rep() for _ in range(REPS)]

    def mark_poisoned() -> float:
        session_best = min(min(r["cal_before"], r["cal_after"]) for r in reps)
        bar = CAL_POISON_RATIO * session_best
        for r in reps:
            r["poisoned"] = max(r["cal_before"], r["cal_after"]) > bar
        return session_best

    retries = 0
    while retries < CAL_RETRY_BUDGET:
        mark_poisoned()
        if not min(reps, key=lambda r: r["sec"])["poisoned"]:
            break  # the fastest rep is clean — its time is trustworthy
        reps.append(one_rep())
        retries += 1
    cal_session_best = mark_poisoned()
    clean = [r for r in reps if not r["poisoned"]]
    best = min(r["sec"] for r in clean) if clean else min(r["sec"] for r in reps)
    times = [r["sec"] for r in reps]
    # per-stage execution stats of the last headline window → BENCH artifact
    from oplogtoredis_ray.pipelines import ingest as _ingest

    if _ingest.LAST_WINDOW_EXEC_STATS:
        bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
        os.makedirs(bench_dir, exist_ok=True)
        with open(os.path.join(bench_dir, "stats_headline.txt"), "w") as f:
            f.write(_ingest.LAST_WINDOW_EXEC_STATS)
    return {
        "sec": round(best, 3),
        "times": [round(t, 3) for t in times],
        "events": int(n_events),
        "events_per_sec": round(n_events / best, 1),
        "calibration": {
            "probe": "min-of-3 of sha256-64MiB + np.sort-8e6-int64 (fixed "
                     "work, bracketing each rep; quiet-host ~0.18 s)",
            "session_best_sec": round(cal_session_best, 3),
            "poison_ratio": CAL_POISON_RATIO,
            "contention_retries": retries,
            "per_rep": reps,
            # the poison gate is session-RELATIVE; compare session_best
            # against the quietest probe EVER recorded in BENCH/*.json to
            # spot sessions that were contended end-to-end (all-clean
            # flags, uniformly slow probes)
            **_historical_reference(cal_session_best),
        },
    }


def _run_bench() -> None:
    _tune_host()
    _quiet_empty_schema_warnings()
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

    DataContext.get_current().enable_progress_bars = False

    head = _headline(sf_dir, num_cpus)

    # sustained-ingest variant immediately after the headline (log still
    # page-cache-warm, object store quiet): measured 13.3 s here vs 18.5 s
    # when run at the END of the query suite — the suite churns the page
    # cache and object store in ways the calibration probe cannot see
    windowed = _windowed_delta_run(sf_dir, head["events"])

    # --- operator-suite timings ----------------------------------------------
    import pyarrow.parquet as pq
    import ray.data as rd

    from oplogtoredis_ray.pipelines.queries import QUERIES

    for t in ("events", "documents", "embeddings", "lineitem"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            pq.read_table(p)  # warm cache (the sustained ingest evicted them)

    timed = [
        "cdc_last_state",
        "dedup_exact",
        "ordered_rank",
        "agg_pricing",
        "text_stats",
        "pack_sequences",
        "stratified_sample",
        "dedup_exact_docs",
        "knn_brute",
        "ivf_topk",
        "minhash_dedup",
        "simhash_pairs",
        "neardup_lsh",
        "ngram_jaccard",
        "curate_corpus",
        "change_records",
        "partition_assign",
        "sessionize",
        "order_revenue",
        "top_spenders",
    ]
    query_secs: dict[str, float] = {"cdc_apply": head["sec"]}
    for name in timed:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        out = fn(sf_dir)
        if isinstance(out, rd.Dataset):
            out.count()  # force full execution of the lazy pipeline
        query_secs[name] = round(time.perf_counter() - t0, 3)

    query_secs["cdc_apply_8windows_delta"] = windowed["sec"]

    result = {
        "metric": "cdc apply throughput (windowed exactly-once replay into lake)",
        "value": head["sec"],
        "unit": "sec",
        "queries": query_secs,
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "num_cpus": num_cpus,
        "events": head["events"],
        "events_per_sec": head["events_per_sec"],
        "headline_reps": head["times"],
        "calibration": head["calibration"],
        "windowed_delta": windowed,
    }
    print(json.dumps(result))
    ray.shutdown()


def _windowed_delta_run(
    sf_dir: str, n_events: int, reps: int = 1, n_windows: int = 8,
    compact_threshold: int = 12,
) -> dict:
    """First-class sustained-ingest metric: ``n_windows`` resumable windows
    in the delta layout (compaction at the chain-length cap) with a
    CONCURRENT garbage collector, reporting throughput and write
    amplification (bytes written to the lake / bytes of the final live
    state)."""
    import shutil
    import threading

    from oplogtoredis_ray.config import PipelineConfig
    from oplogtoredis_ray.pipelines.ingest import run_ingest
    from oplogtoredis_ray.pipelines.queries import ensure_synth_log
    from oplogtoredis_ray.sources.event_log import log_ts_bounds
    from oplogtoredis_ray.state.gc import collect_garbage
    from oplogtoredis_ray.state.manifest import read_all_manifests

    log_dir = ensure_synth_log(sf_dir)
    lo, hi = log_ts_bounds(log_dir)
    P = 128 if n_events >= 10_000_000 else 64
    dcfg = PipelineConfig(
        num_partitions=P,
        window_us=(hi - lo) // n_windows + 1,
        state_mode="delta",
        compact_threshold=compact_threshold,
        # apply_mode="auto": the standing apply-actor exchange when ≥ 3
        # windows will execute.  Round-4: the exchange feeds GROUPS of
        # consecutive windows through ONE streaming executor (auto width
        # from the memory-budget rule, read blocks sized per group inside
        # run_ingest) — the round-3 depth-D per-window executors contended
        # on the driver (measured 2.3× slower than one wide executor at 32
        # cpus).  Measured on the 8-window sf0.1 run at quiet load:
        # 18.6 s (r3) → ~13 s (r4) at 32 cpus; 28.9 s → ~18.5-22 s at 8.
        window_lookahead=True,
    )
    best = None
    rep_i = 0
    retried = False
    while rep_i < reps:
        rep_i += 1
        cal_before = _calibration_probe()
        lake = tempfile.mkdtemp(prefix="otr_bench_delta_")
        gc_stats = {"files": 0, "bytes": 0}
        stop = threading.Event()

        def gc_loop():
            while not stop.wait(3.0):
                # size-then-unlink the grace-filtered candidates so removed
                # bytes count toward total write volume
                for rel in collect_garbage(lake, dry_run=True, grace_seconds=2.0):
                    path = os.path.join(lake, rel)
                    try:
                        gc_stats["bytes"] += os.path.getsize(path)
                        os.unlink(path)
                        gc_stats["files"] += 1
                    except OSError:
                        pass

        gc_thread = threading.Thread(target=gc_loop, daemon=True)
        gc_thread.start()
        t0 = time.perf_counter()
        res = run_ingest(log_dir, lake, dcfg)
        sec = time.perf_counter() - t0
        stop.set()
        gc_thread.join()
        # whatever GC hasn't reclaimed yet is still on disk: split into live
        # (manifest-referenced) and not-yet-collected garbage
        referenced: set[str] = set()
        for m in read_all_manifests(lake):
            referenced.update(m.chain())
        live_bytes = 0
        resident_bytes = 0
        for root, _, files in os.walk(os.path.join(lake, "lake")):
            for f in files:
                p = os.path.join(root, f)
                rel = os.path.relpath(p, lake)
                sz = os.path.getsize(p)
                resident_bytes += sz
                if rel in referenced:
                    live_bytes += sz
        total_written = resident_bytes + gc_stats["bytes"]
        cal_after = _calibration_probe()
        rep = {
            "sec": round(sec, 3),
            "windows": res.windows_run,
            "events_per_sec": round(res.events_in / sec, 1),
            "bytes_written_total": total_written,
            "bytes_live": live_bytes,
            "write_amplification": round(total_written / max(live_bytes, 1), 2),
            "gc_files_removed_during_ingest": gc_stats["files"],
            "cal_before": round(cal_before, 3),
            "cal_after": round(cal_after, 3),
        }
        shutil.rmtree(lake, ignore_errors=True)
        if best is None or rep["sec"] < best["sec"]:
            best = rep
        # one contention retry: if even the best rep's probes exceed the
        # process-wide quietest probe by the poison ratio, the observation
        # ran under contention — buy one more
        if (
            rep_i == reps
            and not retried
            and max(best["cal_before"], best["cal_after"])
            > CAL_POISON_RATIO * _CAL_STATE.get("best", 1e9)
        ):
            retried = True
            reps += 1
    best["cal_process_best"] = round(_CAL_STATE["best"], 3)
    return best


def _saturation_child() -> None:
    """Child mode: ONE 8-cpu sustained (8-window delta) ingest, one JSON
    line.  Used by --saturation to measure the node's shared-substrate
    ceiling."""
    _tune_host()
    _quiet_empty_schema_warnings()
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pyarrow.parquet as pq

    from oplogtoredis_ray.pipelines.queries import ensure_synth_log

    log_dir = ensure_synth_log(sf_dir)
    n_events = 0
    for f in glob.glob(os.path.join(log_dir, "*.parquet")):
        pq.read_table(f)  # warm page cache untimed (all children equally)
        n_events += pq.read_metadata(f).num_rows
    from oplogtoredis_ray.pipelines.ingest import warmup_cluster

    warmup_cluster()
    windowed = _windowed_delta_run(sf_dir, n_events, reps=1)
    print(json.dumps(windowed))
    ray.shutdown()


def _run_saturation() -> None:
    """Reproduce the BASELINE.md round-4 saturation evidence: a SOLO 8-cpu
    sustained ingest vs TWO CONCURRENT independent 8-cpu ingests (separate
    Ray clusters, disjoint lakes, same log).  If the node's substrate
    (memory bandwidth / page cache / disk / object store) were elastic the
    way adding NODES is, the concurrent runs would match the solo time and
    double the aggregate; the measured shortfall quantifies how much of
    the fixed-config 8→32 cpu ratio is the box, not the engine —
    `ray.init(num_cpus=8)` throttles only CPU, so a solo 8-cpu baseline
    enjoys ~4× its fair per-node substrate share."""

    def spawn():
        return subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--saturation-child"],
            env=dict(os.environ),
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )

    def collect(proc) -> dict:
        out, _ = proc.communicate()
        if proc.returncode != 0:
            raise RuntimeError(f"saturation child failed rc={proc.returncode}")
        return json.loads(out.strip().splitlines()[-1])

    solo = collect(spawn())
    time.sleep(60)  # let the solo run's loadavg decay before the A/B phase
    a, b = spawn(), spawn()
    ra, rb = collect(a), collect(b)
    agg = ra["events_per_sec"] + rb["events_per_sec"]
    print(
        json.dumps(
            {
                "metric": "single-node substrate saturation (solo vs 2x concurrent 8-cpu sustained ingest)",
                "solo_sec": solo["sec"],
                "solo_events_per_sec": solo["events_per_sec"],
                "concurrent_secs": [ra["sec"], rb["sec"]],
                "concurrent_events_per_sec": [
                    ra["events_per_sec"], rb["events_per_sec"],
                ],
                "aggregate_events_per_sec": round(agg, 1),
                # 2.0 = substrate elastic (like adding nodes); 1.0 = fully
                # saturated by one 8-cpu run
                "aggregate_over_solo": round(agg / solo["events_per_sec"], 3),
            }
        )
    )


def _scaling_child() -> None:
    """Child mode: headline only, one JSON line."""
    _tune_host()
    _quiet_empty_schema_warnings()
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    head = _headline(sf_dir, num_cpus)
    windowed = _windowed_delta_run(sf_dir, head["events"], reps=2)
    # production-width point on the window continuum: the same log as TWO
    # half-log windows — isolates per-window fixed cost amortization from
    # the 8-window stress case (1-window ≈ headline, 2-window, 8-window)
    windowed2 = _windowed_delta_run(sf_dir, head["events"], reps=2, n_windows=2)
    print(json.dumps({
        "num_cpus": num_cpus, "windowed": windowed, "windowed2": windowed2,
        **head,
    }))
    ray.shutdown()


def _run_scaling() -> None:
    lo_cpus, hi_cpus = 8, 32

    def run(ncpu: int) -> dict:
        # steady-state minimum needs more reps on this noisy shared host
        # (observed 2x swings; best-of-5 stabilizes the minimum)
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            OTR_BENCH_REPS=str(max(REPS, 5)),
        )
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-child"],
            env=env,
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise RuntimeError(
                f"scaling child (num_cpus={ncpu}) failed rc={proc.returncode}"
            )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    r_lo = run(lo_cpus)
    r_hi = run(hi_cpus)
    tp_lo = r_lo["events_per_sec"]
    tp_hi = r_hi["events_per_sec"]
    eff = (tp_hi / tp_lo) / (hi_cpus / lo_cpus)
    w_lo, w_hi = r_lo["windowed"], r_hi["windowed"]
    w_eff = (w_hi["events_per_sec"] / w_lo["events_per_sec"]) / (hi_cpus / lo_cpus)
    w2_lo, w2_hi = r_lo["windowed2"], r_hi["windowed2"]
    w2_eff = (
        w2_hi["events_per_sec"] / w2_lo["events_per_sec"]
    ) / (hi_cpus / lo_cpus)
    print(
        json.dumps(
            {
                "metric": "scaling efficiency (N=8 vs 4N=32 cpus, same input & config)",
                "sec_8": r_lo["sec"],
                "sec_32": r_hi["sec"],
                "reps_8": r_lo["times"],
                "reps_32": r_hi["times"],
                "events_per_sec_8": tp_lo,
                "events_per_sec_32": tp_hi,
                "speedup": round(tp_hi / tp_lo, 3),
                "scaling_efficiency": round(eff, 3),
                "events": r_lo["events"],
                # the window continuum (1 / 2 / 8 windows over the SAME
                # log): per-window fixed cost shrinks relative to W as
                # window width grows — 1-window is the production-width
                # bound, 8-window the resumability stress case
                "windowed_sec_8": w_lo["sec"],
                "windowed_sec_32": w_hi["sec"],
                "windowed_events_per_sec_8": w_lo["events_per_sec"],
                "windowed_events_per_sec_32": w_hi["events_per_sec"],
                "windowed_scaling_efficiency": round(w_eff, 3),
                "windowed_write_amplification": w_hi["write_amplification"],
                "windowed2_sec_8": w2_lo["sec"],
                "windowed2_sec_32": w2_hi["sec"],
                "windowed2_events_per_sec_8": w2_lo["events_per_sec"],
                "windowed2_events_per_sec_32": w2_hi["events_per_sec"],
                "windowed2_scaling_efficiency": round(w2_eff, 3),
                # per-child self-adjudication: probe times bracketing every
                # headline rep (see _calibration_probe) — a low efficiency
                # with poisoned reps reads as host contention, not engine
                "calibration_8": r_lo.get("calibration"),
                "calibration_32": r_hi.get("calibration"),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling-child" in sys.argv:
        _scaling_child()
    elif "--scaling" in sys.argv:
        _run_scaling()
    elif "--saturation-child" in sys.argv:
        _saturation_child()
    elif "--saturation" in sys.argv:
        _run_saturation()
    else:
        _run_bench()

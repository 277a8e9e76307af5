"""Windowed CDC ingest driver loop.

≙ the reference's tail supervision + resume computation
(/root/reference/lib/oplog/tail.go:151-207, 514-588) re-expressed as a loop
of Ray Data window pipelines:

    resume = end of last completed window (fail-closed on unreadable
             lineage — ≙ abort-and-retry on persistent Redis failure)
    while resume < log end:
        window = (resume, resume + Δ]
        read_parquet(ts ∈ window, pruned columns, unified schema)
          → map_batches(ParseStage)           # stateless, zero-copy Arrow
          → groupby(partition_id).map_groups(apply)   # the one shuffle
        commit window lineage

Each window executes as ONE streaming Dataset pipeline: read, parse and the
shuffle's map side pipeline with backpressure; only the tiny per-partition
stats rows (≤ P) are materialized on the driver.  Killed mid-window →
rerun replays the window; committed partitions skip via lineage, uncommitted
apply — bounded re-processing exactly like the reference's
restart_test.go:50-64 (≤ one window re-read, 0 lost, 0 double-applied).

Scale notes (100 TB): Δ controls read amplification on resume and shuffle
working-set; P decouples state layout from cluster size; the groupby
exchange moves only the events of one window, not the lake; the lake itself
is never rewritten whole — one state file per touched partition per window.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from oplogtoredis_ray.config import PipelineConfig
from oplogtoredis_ray.sources.event_log import log_ts_bounds, read_event_window
from oplogtoredis_ray.stages.apply import empty_stats, make_apply_fn
from oplogtoredis_ray.stages.parse import ParseStage
from oplogtoredis_ray.state.manifest import (
    append_completed_window,
    read_completed_windows,
    resume_watermark,
)


def warmup_cluster(num_tasks: int | None = None) -> None:
    """Pre-fault the worker pool: spawn workers, import the library and run
    the hot kernels once per worker.  Steady-state throughput measurements
    (bench.py) call this untimed; long-running ingest amortizes it anyway."""
    import ray
    import ray.data as rd

    if num_tasks is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_tasks = 2 * ncpu

    def _touch(batch):
        import time as _time

        import numpy as np
        import pyarrow as pa

        from oplogtoredis_ray.config import PipelineConfig
        from oplogtoredis_ray.stages.arrow_fold import fold_arrow, order_dedup_filter
        from oplogtoredis_ray.stages.parse import ParseStage

        # hold the worker briefly so the warmup fans out to EVERY worker
        # process instead of a few fast ones absorbing all tasks
        _time.sleep(0.4)
        # pre-fault the allocator: large first-touch numpy allocations page-
        # fault expensively under full-cluster concurrency (measured ~1s+)
        scratch = np.ones(32 * 1024 * 1024 // 8, dtype=np.int64)
        scratch += 1
        del scratch

        cfg = PipelineConfig(num_partitions=4)
        t = pa.table(
            {
                "ts": pa.array(np.array([1, 2], dtype="int64"), type=pa.timestamp("us")),
                "seq": pa.array([0, 0], type=pa.int32()),
                "tx_idx": pa.array([0, 0], type=pa.int32()),
                "op": pa.array(["i", "u"]),
                "conv_id": pa.array(["w", "w"]),
                "turn_idx": pa.array([0, 0], type=pa.int32()),
                "role": pa.array(["user", None]),
                "text": pa.array(["a", "b"]),
                "tool": pa.array([None, None], type=pa.string()),
            }
        )
        parsed = ParseStage(cfg)(t)
        g, _, _ = order_dedup_filter(parsed, (-1, -1, -1))
        fold_arrow(g)
        return batch

    rd.range(num_tasks, override_num_blocks=num_tasks).map_batches(_touch).count()


@dataclass
class IngestResult:
    """Aggregate ingest stats.  Caveat: after a mid-run pool failure the op
    counters (upserts/deletes/patches) for REPLAYED windows are recovered
    from each partition manifest's last-window metrics; a partition whose
    later window also committed before the failure surfaced reports zeros
    for the replayed window — the counters are lower bounds in that case
    (metrics-only; the lake itself is exact)."""

    windows_run: int = 0
    windows_skipped: int = 0
    events_in: int = 0
    dupes_dropped: int = 0
    below_watermark: int = 0
    upserts: int = 0
    deletes: int = 0
    patches: int = 0
    patch_misses: int = 0
    window_stats: list[dict] = field(default_factory=list)


def window_id_for(start_us: int, end_us: int) -> str:
    return f"w{start_us}-{end_us}"


# Ray Data execution stats of the most recent window (read → parse →
# shuffle → apply), for bench artifacts and stage-level tuning
LAST_WINDOW_EXEC_STATS: str | None = None


def _stabilize_lazy_imports() -> None:
    """Concurrent dataset creation (window lookahead) can race the FIRST
    import of Ray's lazily-imported optional deps.  In this environment
    ``fsspec.implementations.http`` fails to import (no aiohttp) — serial
    imports raise a ModuleNotFoundError Ray catches, but a concurrent first
    import can observe the half-initialized module as an uncaught
    ImportError.  Make the state terminal up front: if the real module is
    unavailable, register a stub exposing an ``HTTPFileSystem`` class
    nothing will ever be an instance of."""
    import sys

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
        return
    except ImportError:
        pass
    import types

    stub = types.ModuleType("fsspec.implementations.http")
    stub.HTTPFileSystem = type("HTTPFileSystem", (), {})
    sys.modules["fsspec.implementations.http"] = stub


def _retry_args(cfg: PipelineConfig) -> dict:
    # explicit retry budget (≙ publisher.go:228-253): transient failures
    # retried in place; the permanent-failure cutoff is enforced by
    # max_errored_blocks at execution time
    return {
        "max_retries": cfg.task_max_retries,
        "retry_exceptions": cfg.retry_exceptions,
    }


def build_window_dataset(
    log_dir: str,
    lake_root: str,
    cfg: PipelineConfig,
    start_us: int,
    end_us: int,
    deny_counter=None,
    read_blocks: int | None = None,
):
    """The stateless half of a window: read → parse (→ salt tag).  Depends
    on NO lake state (dedup/fold happen in the apply phase), so it can be
    built — and even materialized — ahead of the preceding window's apply
    (window lookahead).  ``read_blocks`` overrides cfg for multi-window
    GROUP datasets (blocks scale with the group span)."""
    blocks = read_blocks if read_blocks is not None else cfg.read_blocks
    if blocks is None:
        import ray

        blocks = 2 * int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 16
    # permanent-failure cutoff: Ray snapshots the DataContext when the
    # Dataset is CREATED, so the errored-block budget must be set before the
    # read is declared
    from ray.data.context import DataContext

    DataContext.get_current().max_errored_blocks = cfg.max_errored_blocks
    ds = read_event_window(log_dir, start_us, end_us, override_num_blocks=blocks)
    deadletter = f"{lake_root}/errors" if cfg.errors_to_deadletter else None
    # stateless tasks: with the vectorized poly64 partition hash the stage
    # holds no state worth amortizing (an actor pool here only added startup
    # latency and capped concurrency — measured)
    parse_kwargs: dict = {}
    if cfg.parse_concurrency is not None:
        parse_kwargs["concurrency"] = cfg.parse_concurrency
    ds = ds.map_batches(
        ParseStage(cfg, deadletter, emit_changed_fields=False,
                   deny_counter=deny_counter),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        **_retry_args(cfg),
        **parse_kwargs,
    )
    if cfg.distributed_salt_buckets > 1:
        import numpy as np
        import pyarrow as pa

        S = cfg.distributed_salt_buckets
        span = max((end_us - start_us) // S + 1, 1)

        def add_salt(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
            salt = ((ts - start_us) // span).astype(np.int32)
            return t.append_column("salt", pa.array(salt))

        ds = ds.map_batches(add_salt, batch_format="pyarrow")
    return ds


def run_window(
    log_dir: str,
    lake_root: str,
    cfg: PipelineConfig,
    start_us: int,
    end_us: int,
    pre_ds=None,
    deny_counter=None,
    actor_pool=None,
) -> pd.DataFrame:
    """Run one window as a single streaming Dataset pipeline; returns the
    per-partition stats frame (small).  ``pre_ds`` supplies a
    (possibly already materialized) stateless half from window lookahead.

    ``actor_pool`` switches the apply exchange to the standing actor pool
    (stages/actor_apply.py): feed wave + warm finish instead of a per-window
    sort shuffle.  The window is always (re-)fed here — the pipelined path
    in ``run_ingest`` owns prefed windows itself, and duplicate feeds are
    removed by the fold's identity dedup, so a redundant feed is merely a
    wasted data hop, never a correctness issue."""
    global LAST_WINDOW_EXEC_STATS
    wid = window_id_for(start_us, end_us)
    ds = pre_ds if pre_ds is not None else build_window_dataset(
        log_dir, lake_root, cfg, start_us, end_us, deny_counter=deny_counter
    )
    if actor_pool is not None:
        import ray
        attempts = max(cfg.task_max_retries, 0) + 1
        last_err: BaseException | None = None
        for _attempt in range(attempts):
            try:
                actor_pool.feed_dataset(ds, wid)
                stats = actor_pool.finish_window(wid)
                LAST_WINDOW_EXEC_STATS = ds.stats()
                if len(stats) == 0:
                    stats = empty_stats()
                return stats
            except ray.exceptions.RayError as e:
                # actor death / feed-wave failure / poisoned finish:
                # recreate the standing exchange and replay the window
                # (committed partitions skip via lineage; the rest re-apply
                # idempotently)
                last_err = e
                actor_pool.recreate()
        raise last_err  # bounded retries exhausted — fail-closed
    if cfg.distributed_salt_buckets > 1:
        # two-stage salted fold (north_rule skew): stage A pre-folds each
        # (partition, ts-salt) sub-group into pseudo-events — the hot
        # partition's work spreads over S tasks; stage B applies the much
        # smaller pseudo stream per partition.  Correct because the fold is
        # associative over ts-contiguous chunks and pseudo-events carry
        # their last real identity triples (salt order ≡ triple order).
        import numpy as np
        import pyarrow as pa

        from oplogtoredis_ray.stages.arrow_fold import (
            fold_arrow,
            order_dedup_filter,
            pseudo_events_table,
        )

        payload = tuple(cfg.payload_cols)

        def prefold(group: pa.Table) -> pa.Table:
            pid = group["partition_id"][0].as_py()  # group = one (pid, salt)
            g, _, _ = order_dedup_filter(group, (-(1 << 62), -1, -1))
            pseudo = pseudo_events_table(fold_arrow(g, payload), payload)
            return pseudo.append_column(
                "partition_id",
                pa.array(np.full(len(pseudo), pid, dtype=np.int32)),
            )

        # (the salt column was tagged in build_window_dataset)
        pseudo_ds = ds.groupby(["partition_id", "salt"]).map_groups(
            prefold, batch_format="pyarrow", **_retry_args(cfg)
        )
        apply_fn = make_apply_fn(lake_root, wid, cfg)
        # retried applies are safe: the manifest commit is monotonic/guarded,
        # so a replayed task that lost the race skips instead of double-applying
        stats_ds = pseudo_ds.groupby("partition_id").map_groups(
            apply_fn, batch_format="pyarrow", **_retry_args(cfg)
        )
    else:
        apply_fn = make_apply_fn(lake_root, wid, cfg)
        stats_ds = ds.groupby("partition_id").map_groups(
            apply_fn, batch_format="pyarrow", **_retry_args(cfg)
        )
    # (max_errored_blocks is snapshotted into each Dataset at creation by
    # build_window_dataset; save/restore of the global DataContext happens
    # once per run in run_ingest — not here, where the lookahead thread's
    # concurrent set for window N+1 would race the restore)
    stats = stats_ds.to_pandas()
    LAST_WINDOW_EXEC_STATS = stats_ds.stats()  # Ray per-stage execution stats
    if len(stats) == 0:
        stats = empty_stats()
    return stats


def run_follow(
    log_dir: str,
    lake_root: str,
    cfg: PipelineConfig | None = None,
    max_rounds: int = 1_000_000,
    idle_rounds_to_stop: int = 1,
    poll_sleep_s: float = 0.0,
    on_window=None,
) -> IngestResult:
    """Continuous tail mode (≙ the reference's endless tail loop,
    /root/reference/lib/oplog/tail.go:151-207): repeatedly re-scan the log
    directory for new data past the resume point and ingest it, stopping
    after ``idle_rounds_to_stop`` consecutive empty scans.

    Appended parquet files extend the log between rounds; each round is a
    normal resumable ingest, so kill/restart semantics are identical to
    ``run_ingest``.
    """
    import time

    cfg = cfg or PipelineConfig()
    total = IngestResult()
    idle = 0
    rounds = 0
    while rounds < max_rounds and idle < idle_rounds_to_stop:
        rounds += 1
        res = run_ingest(log_dir, lake_root, cfg, on_window=on_window)
        if res.windows_run == 0:
            idle += 1
            if poll_sleep_s:
                time.sleep(poll_sleep_s)
            continue
        idle = 0
        total.windows_run += res.windows_run
        total.windows_skipped += res.windows_skipped
        total.events_in += res.events_in
        total.dupes_dropped += res.dupes_dropped
        total.below_watermark += res.below_watermark
        total.upserts += res.upserts
        total.deletes += res.deletes
        total.patches += res.patches
        total.patch_misses += res.patch_misses
        total.window_stats.extend(res.window_stats)
    return total


def run_ingest(
    log_dir: str,
    lake_root: str,
    cfg: PipelineConfig | None = None,
    max_windows: int | None = None,
    on_window=None,
) -> IngestResult:
    """Resume-from-checkpoint windowed replay of the whole event log.

    ``on_window`` (optional callable, receives each window's aggregate stats
    dict after its commit) is the observability/control hook between
    windows — the point where runtime denylist mutations and external
    monitors naturally attach."""
    import time as _time

    t0 = _time.monotonic()
    cfg = cfg or PipelineConfig()
    lo, hi = log_ts_bounds(log_dir)
    # the partition layout is pinned in the lake on first ingest; any later
    # run whose config would remap conv_id→partition fails fast instead of
    # folding against the wrong prior state
    from oplogtoredis_ray.state.lake_config import write_or_check_lake_config

    write_or_check_lake_config(lake_root, cfg)
    # fail-closed resume (≙ getStartTime reading ALL ordinals, tail.go:514-588):
    # any present-but-unreadable checkpoint aborts instead of silently skipping
    from oplogtoredis_ray.state.denylist import load_denylist
    from oplogtoredis_ray.state.manifest import read_all_manifests
    from oplogtoredis_ray.state.metrics import write_run_metrics

    # resume-point read with bounded retries + linear backoff (≙
    # ResumeTsReadRetries/Delay): a present-but-unreadable checkpoint aborts
    # after retries — unless the explicit resume_from_end_on_failure escape
    # hatch is set, which starts from the log end at the documented cost of
    # skipping events (≙ OTR_RESUME_FROM_END_ON_FAILURE)
    from oplogtoredis_ray.state.manifest import ManifestReadError

    resume = None
    for attempt in range(1, max(cfg.resume_read_retries, 1) + 1):
        try:
            read_all_manifests(lake_root)  # raises ManifestReadError on corruption
            resume = resume_watermark(lake_root)
            break
        except ManifestReadError:
            if attempt >= max(cfg.resume_read_retries, 1):
                if not cfg.resume_from_end_on_failure:
                    raise
                import logging

                logging.getLogger(__name__).warning(
                    "resume point unreadable after %d attempts; "
                    "resume_from_end_on_failure is set — starting from the "
                    "log end (events before %d are SKIPPED)",
                    attempt,
                    hi,
                )
                resume = hi
                break
            _time.sleep(cfg.resume_read_retry_delay_s * attempt)

    start = max(resume, lo - 1)
    if cfg.max_catch_up_us is not None and hi - start > cfg.max_catch_up_us:
        # ≙ MaxCatchUp skip-to-end policy (tail.go:528-540): deliberate,
        # counted data skip when the resume point is too old.
        start = hi - cfg.max_catch_up_us

    result = IngestResult()
    done = {w["window_id"] for w in read_completed_windows(lake_root)}

    # fixed-width window schedule, precomputed so depth-D lookahead can
    # address windows beyond the next one
    schedule: list[tuple[int, int, str]] = []
    s_ = start
    while s_ < hi:
        e_ = min(s_ + cfg.window_us, hi)
        schedule.append((s_, e_, window_id_for(s_, e_)))
        s_ = e_

    # count the windows this run will actually EXECUTE (for apply_mode=
    # "auto"): already-committed windows skip in O(1) and must not tip a
    # resumed run with one remaining window into spinning up the actor pool
    n_sched = sum(1 for _, _, w in schedule if w not in done)

    # standing apply exchange (stages/actor_apply.py): created once per run,
    # reused across every window; the salted two-stage fold keeps the classic
    # groupby plan (its pre-fold IS an exchange).  "auto" picks actors for
    # sustained multi-window runs (≥ 3 windows — the measured crossover,
    # re-measured after the round-3 feed/pruning/compaction fixes) and
    # the spillable groupby shuffle for one-shot wide windows.
    actor_pool = None
    mode = cfg.apply_mode
    if mode == "auto":
        mode = "actors" if n_sched >= 3 else "groupby"
    group_width = 1
    if mode == "actors" and cfg.distributed_salt_buckets <= 1:
        from oplogtoredis_ray.stages.actor_apply import ActorApplyPool

        actor_pool = ActorApplyPool(lake_root, cfg, cfg.apply_actors)
        # execution-wave width (windows per feed group).  "auto" = the
        # memory-budget rule from config.py: a 4×-bigger cluster runs
        # 4×-wider waves over the SAME window schedule — throughput scales
        # with the cluster while commit/replay granularity stays one window
        gw = cfg.feed_group_windows
        if not cfg.window_lookahead:
            # lookahead off = the strictly-sequential contract: denylist
            # mutations and on_window hooks take effect at the very next
            # window, so no grouping and no feed/fold overlap
            gw = 1
        if gw == "auto":
            import ray

            from oplogtoredis_ray.sources.event_log import log_heap_stats

            _, ubytes = log_heap_stats(log_dir)
            span = max(hi - lo, 1)
            # in-heap window share ≈ footer uncompressed bytes × window
            # fraction × 2 (feed gather + actor buffer copies)
            window_heap = max(
                ubytes * min(cfg.window_us / span, 1.0), 1.0
            ) * 2.0
            ncpu = (
                int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized()
                else 8
            )
            budget = ncpu * cfg.mem_per_cpu_bytes * cfg.apply_heap_fraction
            # at most two groups resident (one folding, one feeding)
            group_width = int(max(1, min(budget / (2.0 * window_heap), 16)))
        else:
            group_width = max(int(gw), 1)

    # window lookahead (groupby mode only): depth-D prefetch of upcoming
    # windows' stateless halves, overlapping read+parse with the current
    # window's apply.  Actor mode replaces this with feed GROUPS — one wide
    # executor instead of D concurrent ones (the D-executor driver
    # contention measured 2.3× slower at 32 cpus).
    prefetch_pool = None
    # window_id -> Future[materialized Dataset]
    pending: dict[str, object] = {}
    depth = max(int(cfg.lookahead_depth), 1)
    if cfg.window_lookahead and actor_pool is None:
        from concurrent.futures import ThreadPoolExecutor

        _stabilize_lazy_imports()
        prefetch_pool = ThreadPoolExecutor(max_workers=depth)

    # per-database denylist-filtered counts (≙ tail.go:109-114): the counter
    # actor is created lazily at the first window whose effective denylist is
    # non-empty, so denylist-free runs pay nothing
    deny_counter = None

    def _effective_cfg():
        # reload the durable denylist at every window boundary so runtime
        # mutations (CLI `denylist add/remove`) take effect mid-session
        # (≙ the reference's runtime toggle, denylist_oplog_test.go:12-75)
        nonlocal deny_counter
        durable_deny = load_denylist(lake_root)
        wcfg = (
            cfg.with_denylist(set(cfg.denylist) | durable_deny)
            if durable_deny
            else cfg
        )
        if wcfg.denylist and deny_counter is None:
            from oplogtoredis_ray.state.counters import make_counter_actor

            deny_counter = make_counter_actor()
        return wcfg

    def _prefetch(wcfg, s, e):
        # groupby-mode lookahead: materialize the stateless half so the
        # window's apply starts from resident blocks
        return build_window_dataset(
            log_dir, lake_root, wcfg, s, e, deny_counter=deny_counter
        ).materialize()

    # the errored-block budget lives in the global DataContext (snapshotted
    # per Dataset at creation); save it ONCE here and restore in the finally
    # so neither run_window nor the concurrent lookahead thread can leak
    # cfg's value into later non-ingest Datasets in this process
    from ray.data.context import DataContext

    _ctx = DataContext.get_current()
    _prev_errored = _ctx.max_errored_blocks

    def _commit(wid, s, e, stats, w_t0):
        agg = {
            "window_id": wid,
            "start_us": s,
            "end_us": e,
            "wall_s": round(_time.monotonic() - w_t0, 4),
            "partitions": int(len(stats)),
            "events_in": int(stats["events_in"].sum()) if len(stats) else 0,
            "dupes_dropped": int(stats["dupes_dropped"].sum()) if len(stats) else 0,
            "below_watermark": int(stats["below_watermark"].sum()) if len(stats) else 0,
            "upserts": int(stats["upserts"].sum()) if len(stats) else 0,
            "deletes": int(stats["deletes"].sum()) if len(stats) else 0,
            "patches": int(stats["patches"].sum()) if len(stats) else 0,
            "patch_misses": int(stats["patch_misses"].sum()) if len(stats) else 0,
        }
        append_completed_window(lake_root, wid, e, agg)
        result.windows_run += 1
        result.events_in += agg["events_in"]
        result.dupes_dropped += agg["dupes_dropped"]
        result.below_watermark += agg["below_watermark"]
        result.upserts += agg["upserts"]
        result.deletes += agg["deletes"]
        result.patches += agg["patches"]
        result.patch_misses += agg["patch_misses"]
        result.window_stats.append(agg)
        if on_window is not None:
            on_window(agg)

    # pipelined finish drain (actor mode + lookahead): finish futures for
    # window N+1 are SUBMITTED while window N's are still folding (per-actor
    # submission order keeps per-partition window order), and window commits
    # drain in schedule order.  (wid, s, e, wcfg, futures, submit_epoch, t0)
    import collections

    inflight: collections.deque = collections.deque()

    def _drain_one():
        import ray

        wid, s, e, wcfg2, futs, sub_epoch, w_t0 = inflight.popleft()
        if sub_epoch == actor_pool.epoch:
            try:
                stats = actor_pool.collect_finish(futs)
                _commit(wid, s, e, stats, w_t0)
                return
            except ray.exceptions.RayError:
                actor_pool.recreate()
        # Pool restarted since submission (buffers died with it): EVERY
        # entry still in flight — this one and all queued behind it — was
        # submitted to a dead generation.  Replay them ALL here, in
        # schedule order, before returning control to the main loop:
        # otherwise the loop would feed window N+k into the fresh pool and
        # its finish would queue AHEAD of the replayed finish(N) on the new
        # actors, committing out of order and advancing watermarks past N —
        # the replay of N would then silently drop its events as
        # below-watermark.  Committed partitions skip via lineage.
        stale = [(wid, s, e, wcfg2, w_t0)]
        while inflight:
            w2, s2, e2, c2, _f2, _ep2, t2 = inflight.popleft()
            stale.append((w2, s2, e2, c2, t2))
        for w2, s2, e2, c2, t2 in stale:
            stats = run_window(
                log_dir, lake_root, c2, s2, e2,
                deny_counter=deny_counter, actor_pool=actor_pool,
            )
            _commit(w2, s2, e2, stats, t2)

    try:
        if actor_pool is not None:
            # ---- grouped actor path ----
            # One streaming executor reads+parses a GROUP of up to
            # `group_width` consecutive not-done windows; the feed wave
            # splits each block by (window, actor); finishes are submitted
            # per window in schedule order, so per-partition window order —
            # and exactly-once — is exactly the per-window protocol.  The
            # NEXT group's read+parse+feed overlaps the current group's
            # folds (at most two groups resident in actor heap, the
            # documented memory bound).  Denylist snapshots refresh at
            # group boundaries (≤ group_width-window lag on runtime
            # mutations, same bound as the old depth-D lookahead).
            import ray

            todo = [w for w in schedule if w[2] not in done]
            result.windows_skipped += len(schedule) - len(todo)
            if max_windows is not None:
                todo = todo[: max(max_windows, 0)]
            if cfg.feed_group_windows == "auto" and len(todo) > 1:
                # pipeline cap on the memory-budget width: keep ≥ 2 groups
                # so one group's folds overlap the next group's read+parse
                # (a single all-window group serializes feed then fold)
                group_width = max(1, min(group_width, -(-len(todo) // 2)))
            # maximal consecutive runs (a committed window in between breaks
            # the run so a group's read span never re-reads done windows)
            runs: list[list[tuple[int, int, str]]] = []
            cur: list[tuple[int, int, str]] = []
            for s_e_w in todo:
                if cur and cur[-1][1] != s_e_w[0]:
                    runs.append(cur)
                    cur = []
                cur.append(s_e_w)
            if cur:
                runs.append(cur)
            # uniform width-capped groups, with ONE window split off the
            # final group: the last group's folds have no next feed to hide
            # behind, so a 1-window tail shrinks the pipeline-drain wall to
            # ~one fold wave.  (A full [1,2,4,…,1] HEAD ramp was measured
            # and rejected: the extra per-group streaming-executor startups
            # cost more than the fill overlap they buy.)
            groups: list[list[tuple[int, int, str]]] = []
            for run in runs:
                for i in range(0, len(run), group_width):
                    groups.append(run[i : i + group_width])
            if groups and len(groups[-1]) > 2:
                tail = groups[-1].pop()
                groups.append([tail])
            ncpu = (
                int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized()
                else 8
            )
            per_win_blocks = cfg.read_blocks
            if per_win_blocks is None:
                per_win_blocks = max(2 * ncpu // max(group_width, 1), 4)
            for group in groups:
                wcfg = _effective_cfg()
                g_t0 = _time.monotonic()
                ds = build_window_dataset(
                    log_dir, lake_root, wcfg, group[0][0], group[-1][1],
                    deny_counter=deny_counter,
                    # floor at cluster width so small fill/drain groups
                    # don't starve the read of parallelism
                    read_blocks=max(per_win_blocks * len(group), ncpu),
                )
                try:
                    actor_pool.feed_group(ds, group)
                    fed = True
                except ray.exceptions.RayError:
                    fed = False
                if fed:
                    epoch = actor_pool.epoch
                    for s, e, wid in group:
                        inflight.append((
                            wid, s, e, wcfg,
                            actor_pool.submit_finish(wid), epoch, g_t0,
                        ))
                    # drain everything OLDER than this group before feeding
                    # the next one — its folds ran while this group fed.
                    # With lookahead off, drain THIS group too (sequential
                    # contract: next group's denylist snapshot must see
                    # this group's on_window mutations)
                    keep = len(group) if cfg.window_lookahead else 0
                    while len(inflight) > keep:
                        _drain_one()
                    continue
                # feed failed — pool is broken: drain in-flight finishes
                # (each replays via the epoch check), recreate, then replay
                # this group's windows one by one with run_window's retries
                while inflight:
                    _drain_one()
                actor_pool.recreate()
                for s, e, wid in group:
                    w_t0 = _time.monotonic()
                    stats = run_window(
                        log_dir, lake_root, wcfg, s, e,
                        deny_counter=deny_counter, actor_pool=actor_pool,
                    )
                    _commit(wid, s, e, stats, w_t0)
            while inflight:
                _drain_one()
        else:
            # ---- groupby path (one sort-shuffle per window) ----
            for idx, (start, end, wid) in enumerate(schedule):
                if (
                    max_windows is not None
                    and result.windows_run >= max_windows
                ):
                    break
                if wid in done:
                    result.windows_skipped += 1
                    continue
                wcfg = _effective_cfg()
                if prefetch_pool is not None:
                    # top up the lookahead: keep up to `depth` windows'
                    # stateless halves in flight, INCLUDING the current one
                    # on the first iteration — an inline window-0 build
                    # would serialize ~one window of read+parse before any
                    # overlap starts (denylist snapshot taken NOW —
                    # documented ≤ depth-window lag on runtime mutations)
                    for s2, e2, wid2 in schedule[idx:]:
                        if len(pending) >= depth:
                            break
                        if wid2 not in done and wid2 not in pending:
                            pending[wid2] = prefetch_pool.submit(
                                _prefetch, wcfg, s2, e2
                            )
                pre_ds = None
                fut = pending.pop(wid, None)
                if fut is not None:
                    pre_ds = fut.result()
                w_t0 = _time.monotonic()
                stats = run_window(
                    log_dir, lake_root, wcfg, start, end,
                    pre_ds=pre_ds, deny_counter=deny_counter,
                )
                _commit(wid, start, end, stats, w_t0)
        if actor_pool is not None:
            # clean completion: let pending background compactions land so
            # the lake ends in its steady compacted shape (failure paths
            # skip this — long chains stay read-correct via merge-on-read)
            actor_pool.drain_compactions()
    finally:
        # always reached — a mid-run window failure must not leave the
        # in-flight prefetch executing on the cluster, leak the errored-block
        # budget, or exit without a metrics file for the partial run
        if prefetch_pool is not None:
            prefetch_pool.shutdown(wait=False, cancel_futures=True)
        if actor_pool is not None:
            actor_pool.shutdown()
        _ctx.max_errored_blocks = _prev_errored
        from oplogtoredis_ray.state.counters import snapshot_counter

        import sys as _sys

        try:
            write_run_metrics(
                lake_root,
                result,
                hi,
                wall_s=_time.monotonic() - t0,
                denied_by_db=snapshot_counter(deny_counter),
            )
        except Exception:
            # best-effort ONLY while another exception is already
            # propagating (don't mask the window failure); on the success
            # path a metrics-write failure surfaces normally
            if _sys.exc_info()[0] is None:
                raise
            import logging

            logging.getLogger(__name__).warning(
                "metrics write failed for %s", lake_root, exc_info=True
            )
    return result

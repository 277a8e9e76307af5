"""Persistent-actor apply path — amortizes the per-window exchange.

The groupby apply path (`stages/apply.py` via `ingest.run_window`) pays a
sort-based shuffle barrier per window: sample wave → sort-map wave → reduce
wave, each with task launch + block-materialization latency.  For
production-width windows that fixed cost (~1.4 s measured at 32 cpus) is
noise; for the sustained multi-window delta-ingest mode it is ~35% of the
wall clock and is exactly the term that does NOT scale with cluster size
(BASELINE.md, T(n) = F + W/n fit).

This module replaces the per-window shuffle with a *standing* exchange:

- A pool of long-lived apply actors is created ONCE per ingest run; each
  actor owns `partition_id % num_actors` and keeps two things warm across
  windows: its worker process (no per-window task launch) and its owned
  partitions' manifests (no per-window checkpoint re-read).
- Per window, one wave of `_feed_block` tasks splits each parsed block by
  owning actor (single vectorized argsort + zero-copy slices) and ships the
  sub-tables directly to the actors — ONE data hop, no sample stage, no
  intermediate sorted blocks.  Feed tasks return the accept-ack refs
  without blocking on them (a blocked task would hold its CPU slot); the
  DRIVER awaits the acks, so the wave completing proves every row is
  buffered.
- `finish_window` then runs the identical per-partition exactly-once fold
  (`apply.apply_partition_window` — shared with the task path) against the
  cached manifests.

Why raw actors instead of Dataset here: the Dataset API cannot express a
shared mutable per-partition state that survives across pipeline runs
(each `groupby().map_groups()` is a fresh execution); this is the one
place the brief's "shared mutable index" escape hatch applies.

Correctness under failure is inherited, not re-invented:

- A retried/duplicated feed task re-sends the same events; the fold's
  identity-triple dedup (`order_dedup_filter`) drops them, exactly as it
  drops replayed log entries.
- An actor death mid-window loses only buffered (uncommitted) events; the
  driver recreates the pool and replays the window — committed partitions
  skip via lineage, the rest re-apply idempotently (same guarantee as a
  killed groupby run, restart_test.go:50-64 semantics).
- A NON-FATAL fold error (application exception in `finish_window`) POISONS
  the actor: every later queued finish raises before touching a manifest.
  Without this, the pipelined driver — which submits finish(N+1) before
  finish(N) collects — would let a SURVIVING actor commit window N+1 and
  advance watermarks past the failed window N; the replay of N would then
  see all its events below the watermark and silently drop them.  Poisoning
  turns that silent loss into the ordinary recreate-and-replay path.
- A stale manifest cache (competing consumer advanced the partition) is
  caught by the guarded monotonic `commit_manifest` — the losing fold's
  state file becomes GC garbage and the cache entry is invalidated.

Scale notes (100 TB): actors buffer their share of ONE window in heap, so
the constraint is `window working set ≤ cluster memory / safety factor` —
the same bound the shuffle's reduce side already imposed.  Actors are
created with `scheduling_strategy="SPREAD"` so the standing exchange spans
the cluster; `num_cpus=0` lets the feed wave and the fold alternate on the
same cores (they are phase-disjoint within a window; set
`apply_actor_num_cpus≈0.5` on a shared cluster to reserve headroom).

≙ reference: the persistent per-shard publisher goroutines that live for
the process lifetime and drain ordered channels
(/root/reference/lib/redispub/publisher.go:160-357) — this is the Ray
re-expression of that standing topology, where the groupby path was the
per-window re-creation of it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from oplogtoredis_ray.config import PipelineConfig
from oplogtoredis_ray.stages.apply import apply_partition_window, empty_stats
from oplogtoredis_ray.state.manifest import Manifest, read_manifest


class _ApplyActor:
    """One standing member of the apply exchange; owns
    ``{pid : pid % num_actors == idx}`` and their manifest cache.

    ``accept`` runs in its own concurrency group ("ingest") so feed waves
    for window N+1 are acked while the default group folds window N —
    without it, feed tasks block behind multi-second folds and the
    lookahead pipeline stalls.  Finishes stay in the default group
    (size 1), which serializes them in submission order — the per-actor
    window-order guarantee exactly-once relies on.  accept/finish touch
    the buffer dict for DIFFERENT window keys by protocol (a window's
    finish is only submitted after its feed wave fully acked), so the
    lock only guards the dict structure itself."""

    def __init__(self, lake_root: str, cfg: PipelineConfig, idx: int, num_actors: int):
        import threading

        self.lake_root = lake_root
        self.cfg = cfg
        self.idx = idx
        self.num_actors = num_actors
        # window_id -> list[pa.Table] (mixed-pid sub-tables, split at finish)
        self.buffers: dict[str, list[pa.Table]] = {}
        self.manifests: dict[int, Manifest] = {}
        self._lock = threading.Lock()
        # set to the failing window id by a finish that raised; all later
        # finishes fail-closed before any commit (see module docstring)
        self._poisoned: str | None = None
        # per-file row counts (footer reads, immutable files → cache forever)
        # for the size-tiered compaction trigger
        self._rows_cache: dict[str, int] = {}

    def ping(self) -> int:
        return self.idx

    @ray.method(concurrency_group="ingest")
    def accept(self, window_id: str, table: pa.Table) -> int:
        """Buffer one sub-table of a window.  Arrival order is irrelevant —
        order is created at finish time by the fold's explicit sort."""
        with self._lock:
            self.buffers.setdefault(window_id, []).append(table)
        return len(table)

    @ray.method(concurrency_group="ingest")
    def accept_group(
        self, window_ids: list, window_ends: list, table: pa.Table
    ) -> int:
        """Buffer one mixed-window sub-table of a feed GROUP: segment by ts
        into per-window zero-copy slices here, so the feed wave ships ONE
        object per (block, actor) regardless of group width — splitting by
        (window, actor) in the feed task fragmented the exchange into G×
        more, G× smaller plasma objects (measured: the per-object overhead,
        not bytes, dominated the feed wall)."""
        import pyarrow.compute as pc

        ts = pc.cast(table["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        ends = np.asarray(window_ends, dtype=np.int64)
        # the caller's read filter must bound rows by the group span — fail
        # LOUDLY (and identically on both paths) if that invariant drifts:
        # the slow path would otherwise silently drop rows past ends[-1]
        # while the fast path would IndexError on window_ids[w_lo]
        if int(ts.max()) > int(ends[-1]):
            raise ValueError(
                f"accept_group: rows beyond group span (max ts {int(ts.max())} "
                f"> last window end {int(ends[-1])}) — read filter / schedule drift"
            )
        # fast path: CDC blocks are time-contiguous, so most slices fall
        # entirely inside ONE window — detect via min/max and buffer the
        # table zero-copy instead of sort+gather
        w_lo = int(np.searchsorted(ends, int(ts.min()), side="left"))
        w_hi = int(np.searchsorted(ends, int(ts.max()), side="left"))
        if w_lo == w_hi:
            with self._lock:
                self.buffers.setdefault(window_ids[w_lo], []).append(table)
            return len(table)
        order = np.argsort(ts, kind="stable")
        t = table.take(pa.array(order, type=pa.int64()))
        bounds = np.searchsorted(ts[order], ends, side="right")
        starts = np.concatenate(([0], bounds[:-1]))
        with self._lock:
            for wid, s, e in zip(window_ids, starts, bounds):
                if e > s:
                    self.buffers.setdefault(wid, []).append(
                        t.slice(int(s), int(e - s))
                    )
        return len(table)

    def drop_window(self, window_id: str) -> None:
        with self._lock:
            self.buffers.pop(window_id, None)

    def finish_window(self, window_id: str) -> pd.DataFrame:
        """Fold + commit this actor's share of a window.  Fail-closed: a
        finish that raises (transient I/O, fold bug — anything non-fatal to
        the process) poisons the actor so the finishes already queued behind
        it raise BEFORE committing; the driver's normal RayError handling
        then recreates the pool and replays from the failed window in order."""
        if self._poisoned is not None:
            raise RuntimeError(
                f"apply actor {self.idx} poisoned by failed finish of "
                f"window {self._poisoned}; refusing {window_id} before any "
                "commit — recreate the pool and replay"
            )
        try:
            return self._finish_window(window_id)
        except Exception:
            self._poisoned = window_id
            raise

    def _finish_window(self, window_id: str) -> pd.DataFrame:
        with self._lock:
            tabs = self.buffers.pop(window_id, [])
        if not tabs:
            return empty_stats()
        t = pa.concat_tables(tabs)
        pids = t["partition_id"]
        if isinstance(pids, pa.ChunkedArray):
            pids = pids.combine_chunks()
        pid_np = pids.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        order = np.argsort(pid_np, kind="stable")
        t = t.take(pa.array(order, type=pa.int64()))
        pid_sorted = pid_np[order]
        # contiguous per-pid segments after the single gather
        bounds = np.flatnonzero(np.diff(pid_sorted)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(pid_sorted)]))
        rows = []
        to_compact = []
        deferred = self.cfg.state_mode == "delta"
        for s, e in zip(starts, ends):
            pid = int(pid_sorted[s])
            group = t.slice(int(s), int(e - s))
            with self._lock:
                manifest = self.manifests.get(pid)
            if manifest is None:
                manifest = read_manifest(self.lake_root, pid)
            stats, committed = apply_partition_window(
                self.lake_root, window_id, self.cfg, group, manifest,
                defer_compaction=deferred,
            )
            with self._lock:
                if committed is not None:
                    cur = self.manifests.get(pid)
                    # strictly-newer-lineage wins; an EQUAL-length cache
                    # entry is the background compactor's post-rewrite view
                    # of this same commit (fresher chain) — keep it, or the
                    # compactor would re-merge from the stale chain and
                    # burn a guaranteed-to-lose CAS
                    if cur is None or len(cur.lineage) < len(committed.lineage):
                        self.manifests[pid] = committed
                else:
                    # superseded by a competing consumer → cold-read next window
                    self.manifests.pop(pid, None)
            if (
                deferred
                and committed is not None
                and self._should_compact(committed)
            ):
                to_compact.append(pid)
            rows.append(stats)
            if self.cfg.test_fail_finish_flag is not None:
                self._maybe_inject_finish_fault(window_id)
        if to_compact:
            # background compaction: runs in the "compact" concurrency
            # group, CONCURRENT with the next windows' folds — the inline
            # compaction doubled those windows' fold wall time (measured
            # 9.6 s vs 4.5 s per-window commit walls on the 8-window sf0.1
            # run) and sat on the sustained-ingest critical path
            me = ray.get_runtime_context().current_actor
            for pid in to_compact:
                me.compact_partition.remote(pid)
        return pd.concat(rows, ignore_index=True)

    def _file_rows(self, rel: str) -> int:
        r = self._rows_cache.get(rel)
        if r is None:
            import os

            import pyarrow.parquet as pq

            try:
                r = pq.read_metadata(os.path.join(self.lake_root, rel)).num_rows
            except OSError:
                r = -1
            self._rows_cache[rel] = r
        return r

    def _should_compact(self, m: Manifest) -> bool:
        """Size-tiered trigger: compact when pending delta rows ≥
        compact_rows_factor × base rows (amortized write amplification ≈
        1 + (factor+1)/factor — see config.py), OR when the chain exceeds
        the compact_threshold length cap (merge-on-read latency bound).
        Row counts come from cached parquet footer reads of the immutable
        chain files; an unreadable footer falls back to the length cap."""
        chain = m.chain()
        if len(chain) <= 1:
            return False
        if len(chain) > self.cfg.compact_threshold:
            return True
        import math

        if math.isinf(self.cfg.compact_rows_factor):
            # default config: the size comparison below can never be true —
            # skip the per-finish footer reads on the fold critical path
            return False
        rows = [self._file_rows(rel) for rel in chain]
        if any(r < 0 for r in rows):
            return False  # length cap already checked above
        return sum(rows[1:]) >= self.cfg.compact_rows_factor * max(rows[0], 1)

    def _partial_eligible(self, chain: list[str], partials: int) -> bool:
        """Leveled-merge gate: the chain head must be a compacted BASE at
        least ``compact_partial_base_ratio`` × the delta suffix (rows, from
        cached footers), and at most ``compact_full_every`` consecutive
        partials may run before a full rewrite re-levels the chain.  On the
        update-heavy transcript mix the suffix folds to ≈ the base and this
        rarely fires (see config.py); on low-churn/append-mostly partitions
        it cuts the per-cycle compaction write from O(state) to O(suffix)."""
        import math
        import os

        if math.isinf(self.cfg.compact_partial_base_ratio):
            return False
        if len(chain) < 3:
            return False  # nothing worth merging below the base
        if "delta-" in os.path.basename(chain[0]):
            return False  # no base yet — the first compaction builds one
        if partials >= self.cfg.compact_full_every:
            return False
        base_rows = self._file_rows(chain[0])
        if base_rows <= 0:
            return False
        suffix_rows = 0
        for rel in chain[1:]:
            r = self._file_rows(rel)
            if r < 0:
                return False
            suffix_rows += r
        return base_rows >= self.cfg.compact_partial_base_ratio * max(
            suffix_rows, 1
        )

    def _maybe_inject_finish_fault(self, window_id: str) -> None:
        """Fault-injection hook (tests only): consume the one-shot flag file
        and raise an application error MID-finish — after at least one
        partition has committed — on exactly one actor.  File-based so the
        fault does not re-arm when the driver recreates the pool (same cfg)
        and replays; os.remove is the atomic consume, so concurrent actors
        race for at most one injection."""
        import os

        try:
            os.remove(self.cfg.test_fail_finish_flag)
        except OSError:
            return
        raise RuntimeError(f"injected finish fault in window {window_id}")

    @ray.method(concurrency_group="compact")
    def compact_partition(self, pid: int) -> bool:
        """Merge this partition's chain into one base file and swap it in
        with a prefix-CAS (`commit_chain_rewrite`).  Runs off the fold
        path; folds keep appending while the merge runs — appends commute
        with the prefix rewrite, so the CAS still succeeds.  A lost CAS
        (competing consumer rewrote the prefix) abandons the base file to
        GC and retries at the next threshold crossing."""
        return self._compact_pid(pid)

    def _compact_pid(self, pid: int) -> bool:
        from oplogtoredis_ray.state.lake import (
            merge_partition_chain,
            write_partition_delta_arrow,
            write_partition_state_arrow,
        )
        from oplogtoredis_ray.state.manifest import commit_chain_rewrite

        with self._lock:
            m = self.manifests.get(pid)
        if m is None:
            m = read_manifest(self.lake_root, pid)
        chain = m.chain()
        if not self._should_compact(m):
            return False
        payload = tuple(self.cfg.payload_cols)
        tag = f"{m.lineage[-1]}-bg" if m.lineage else "bg"
        partials = int(m.metrics.get("partials_since_full", 0))
        if self._partial_eligible(chain, partials):
            # leveled merge: fold ONLY the delta suffix into one mid-level
            # delta, leaving the (dominant) base untouched — write cost
            # O(suffix) instead of O(state); chain → [base, mid, newer...]
            import pyarrow.parquet as pq

            from oplogtoredis_ray.stages.arrow_fold import merge_deltas

            import os

            tables = [
                pq.read_table(os.path.join(self.lake_root, rel))
                for rel in chain[1:]
            ]
            mid = merge_deltas(tables, payload)
            mid_rel, _ = write_partition_delta_arrow(
                self.lake_root, pid, f"{tag}-mid", mid
            )
            committed = commit_chain_rewrite(
                self.lake_root, pid, chain, mid_rel, -1, keep=1,
                metrics_update={"partials_since_full": partials + 1},
            )
        else:
            base = merge_partition_chain(self.lake_root, chain, payload)
            base_rel, nrows = write_partition_state_arrow(
                self.lake_root, pid, tag, base
            )
            committed = commit_chain_rewrite(
                self.lake_root, pid, chain, base_rel, nrows,
                metrics_update={"partials_since_full": 0},
            )
        with self._lock:
            cur = self.manifests.get(pid)
            if committed is not None and (
                cur is None or len(cur.lineage) <= len(committed.lineage)
            ):
                self.manifests[pid] = committed
            else:
                # lost the CAS, or a fold appended (and cached) newer
                # windows while the merge ran — that cached chain predates
                # the rewrite, so drop it and cold-read the on-disk truth
                # at the next fold
                self.manifests.pop(pid, None)
        return committed is not None

    @ray.method(concurrency_group="compact")
    def drain_compactions(self) -> int:
        """End-of-run sweep: compact every owned partition whose chain
        still exceeds the threshold.  A plain FIFO barrier would be racy —
        the actor's self-submitted compactions and the driver's drain are
        different submitters, so arrival order is not guaranteed; sweeping
        makes the ≤-threshold postcondition deterministic.  Returns the
        number of chains compacted."""
        n = 0
        for pid in range(self.idx, self.cfg.num_partitions, self.num_actors):
            if self._compact_pid(pid):
                n += 1
        return n


@ray.remote(max_retries=0)
def _feed_block_group(
    actors: list, window_ends: list, window_ids: list, block: pa.Table
) -> list:
    """Multi-window variant of `_feed_block`: one streaming executor covers
    the whole GROUP's read+parse — measured 2.3× faster than
    `lookahead_depth` CONCURRENT per-window executors at 32 cpus (9.7 s vs
    4.2 s for the same 46 M-event read: driver-side executor contention,
    not cluster work, dominated the per-window path).  The split here is by
    owning ACTOR only (one shipped object per (block, actor), exactly like
    `_feed_block`); the actor segments its slice by window at accept time —
    splitting by (window, actor) here was measured slower: G× more, G×
    smaller plasma objects."""
    if not isinstance(block, pa.Table):
        block = pa.Table.from_pandas(block, preserve_index=False)
    if len(block) == 0:
        return []
    num_actors = len(actors)
    pids = block["partition_id"]
    if isinstance(pids, pa.ChunkedArray):
        pids = pids.combine_chunks()
    pid_np = pids.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    aidx = pid_np % num_actors
    if len(aidx) < 2 or bool(np.all(aidx[1:] >= aidx[:-1])):
        # block already actor-sorted (e.g. a single-actor pool or a
        # naturally clustered block) — ship zero-copy slices, no gather
        t = block
        aidx_sorted = aidx
    else:
        order = np.argsort(aidx, kind="stable")
        t = block.take(pa.array(order, type=pa.int64()))
        aidx_sorted = aidx[order]
    bounds = np.searchsorted(aidx_sorted, np.arange(num_actors + 1))
    acks = []
    for a in range(num_actors):
        s, e = int(bounds[a]), int(bounds[a + 1])
        if e > s:
            acks.append(
                actors[a].accept_group.remote(
                    window_ids, window_ends, t.slice(s, e - s)
                )
            )
    return acks


@ray.remote(max_retries=0)
def _feed_block(actors: list, window_id: str, block: pa.Table) -> list:
    """Split one parsed block by owning actor (one vectorized stable argsort
    + zero-copy slices; Arrow IPC truncates sliced buffers on send), ship
    the sub-tables, and return the accept-ack ObjectRefs WITHOUT waiting on
    them: a task blocked in ``ray.get`` keeps its CPU slot while idle, so
    under deep lookahead hundreds of blocked feed tasks oversubscribed the
    worker pool and starved read+parse (observed: 133 workers on a 32-cpu
    node).  The DRIVER awaits the acks (`feed_dataset`), preserving
    wave-completion ⇒ full delivery.  ``max_retries=0``: a lost feed task
    must fail the wave so the driver replays the whole window — a silent
    partial retry after an actor restart would feed a dead pool
    generation."""
    if not isinstance(block, pa.Table):  # pandas/other block formats
        block = pa.Table.from_pandas(block, preserve_index=False)
    if len(block) == 0:
        # windows whose pushdown filter empties a read block yield 0-row
        # (sometimes schema-less) blocks — nothing to route
        return []
    num_actors = len(actors)
    pids = block["partition_id"]
    if isinstance(pids, pa.ChunkedArray):
        pids = pids.combine_chunks()
    pid_np = pids.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    aidx = pid_np % num_actors
    if len(aidx) < 2 or bool(np.all(aidx[1:] >= aidx[:-1])):
        t = block  # already actor-sorted — zero-copy slices
        aidx_sorted = aidx
    else:
        order = np.argsort(aidx, kind="stable")
        t = block.take(pa.array(order, type=pa.int64()))
        aidx_sorted = aidx[order]
    bounds = np.searchsorted(aidx_sorted, np.arange(num_actors + 1))
    acks = []
    for a in range(num_actors):
        s, e = int(bounds[a]), int(bounds[a + 1])
        if e > s:
            acks.append(actors[a].accept.remote(window_id, t.slice(s, e - s)))
    return acks


class ActorApplyPool:
    """Driver-side handle on the standing apply exchange.

    ``epoch`` increments on every (re)creation so a prefed window can be
    detected as stale after a pool restart and re-fed from its materialized
    stateless half."""

    def __init__(self, lake_root: str, cfg: PipelineConfig, num_actors: int | None = None):
        self.lake_root = lake_root
        self.cfg = cfg
        if num_actors is None:
            ncpu = int(ray.cluster_resources().get("CPU", 8))
            num_actors = max(1, min(cfg.num_partitions, ncpu))
        self.num_actors = num_actors
        self.epoch = 0
        self.actors: list = []
        self._create()

    def _create(self) -> None:
        Actor = ray.remote(
            num_cpus=self.cfg.apply_actor_num_cpus,
            max_restarts=0,
            # "ingest" group acks feed waves while the default group folds;
            # default group stays size 1 so finishes execute in submission
            # order (the per-actor window-order guarantee); "compact" runs
            # background chain compaction without blocking either
            concurrency_groups={"ingest": 1, "compact": 1},
        )(_ApplyActor)
        self.actors = [
            Actor.options(scheduling_strategy="SPREAD").remote(
                self.lake_root, self.cfg, i, self.num_actors
            )
            for i in range(self.num_actors)
        ]
        self.epoch += 1
        # NO ping barrier: actor spawn (one fresh worker process each)
        # overlaps the first window's read+parse; a dead-on-arrival actor
        # surfaces at the first accept/finish and trips the normal
        # recreate-and-replay path

    def recreate(self) -> None:
        """Full restart: survivors may hold partial buffers for the failed
        window; dropping the whole generation keeps replay reasoning simple
        (the fold's dedup would also tolerate re-fed duplicates)."""
        self.shutdown()
        self._create()

    def feed_dataset(self, ds, window_id: str) -> int:
        """Drive the stateless half into the actors: one `_feed_block` task
        per block ref.  On a lazy dataset the bundles stream out as the
        read+parse executes, overlapping feed with parse; on a materialized
        one this is pure task-launch + one data hop.  Feed tasks return
        their accept-ack refs (they do not block on them — see
        `_feed_block`); the two-level `ray.get` here is the delivery
        barrier: it returns only when every sub-table is buffered in its
        owning actor, so a subsequent `submit_finish` cannot race a feed.

        Design note: fusing the split INTO the parse execution (a routing
        `map_batches` stage that awaits its own acks) was tried and
        measured 3.5× WORSE — each actor's single ingest thread drains
        accepts serially, so in-task ack waits pile route tasks up behind
        it while they hold CPU slots.  The separate wave decouples ack
        latency from task occupancy at the cost of one plasma round trip
        of the parsed window."""
        feed_refs = []
        for bundle in ds.iter_internal_ref_bundles():
            for block_ref in bundle.block_refs:
                feed_refs.append(
                    _feed_block.remote(self.actors, window_id, block_ref)
                )
        ack_refs = [r for refs in ray.get(feed_refs) for r in refs]
        return int(sum(ray.get(ack_refs)))

    def feed_group(self, ds, windows: list) -> int:
        """Drive ONE group dataset (read+parse spanning several consecutive
        windows) into the actors, splitting by (window, actor) in the feed
        wave.  ``windows`` is the ordered list of ``(start_us, end_us,
        window_id)`` the dataset covers.  The two-level ``ray.get`` is the
        delivery barrier for the WHOLE group: when it returns, every row of
        every window in the group is buffered in its owning actor, so the
        group's finishes can be submitted in window order.  Commit/replay
        granularity stays ONE window — grouping widens only the execution
        wave, never the exactly-once unit."""
        window_ends = [int(e) for _, e, _ in windows]
        window_ids = [w for _, _, w in windows]
        feed_refs = []
        for bundle in ds.iter_internal_ref_bundles():
            for block_ref in bundle.block_refs:
                feed_refs.append(
                    _feed_block_group.remote(
                        self.actors, window_ends, window_ids, block_ref
                    )
                )
        ack_refs = [r for refs in ray.get(feed_refs) for r in refs]
        return int(sum(ray.get(ack_refs)))

    def submit_finish(self, window_id: str) -> list:
        """Submit (don't await) the window's finish to every actor.  Safe to
        call for window N+1 while N's finish is still folding: the default
        concurrency group executes finishes per-actor in submission order,
        so per-partition window order — and the watermark monotonicity
        exactly-once rests on — is preserved without a driver-side barrier."""
        return [a.finish_window.remote(window_id) for a in self.actors]

    @staticmethod
    def collect_finish(futures: list) -> pd.DataFrame:
        frames = ray.get(futures)
        out = pd.concat(frames, ignore_index=True)
        return out if len(out) else empty_stats()

    def finish_window(self, window_id: str) -> pd.DataFrame:
        return self.collect_finish(self.submit_finish(window_id))

    def drop_window(self, window_id: str) -> None:
        import contextlib

        for a in self.actors:
            with contextlib.suppress(Exception):
                ray.get(a.drop_window.remote(window_id))

    def drain_compactions(self) -> None:
        """Barrier on every actor's compact group — called on CLEAN run
        completion so the lake ends in its steady compacted shape.  Failure
        paths skip it: leftover long chains are read-correct (merge-on-read)
        and the next run's threshold crossing re-schedules them.  Sweeps
        run on all actors concurrently (disjoint partitions) — awaiting
        serially would cost the SUM of per-actor merge times."""
        import contextlib

        refs = [a.drain_compactions.remote() for a in self.actors]
        for r in refs:
            with contextlib.suppress(Exception):
                ray.get(r)

    def shutdown(self) -> None:
        import contextlib

        for a in self.actors:
            with contextlib.suppress(Exception):
                ray.kill(a, no_restart=True)
        self.actors = []

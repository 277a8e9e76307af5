"""Pipeline configuration.

The reference's only user-extension surface is ~20 env vars
(/root/reference/lib/config/main.go:13-36); we keep the same idea as a
dataclass.  Each field cites the reference knob it generalizes.

Complete env-var parity map (lib/config/main.go:13-36 → here):

| OTR_* env var                     | here |
|-----------------------------------|------|
| MONGO_URL                         | ``log_dir`` argument (the source) |
| REDIS_URL                         | ``lake_root`` argument (the sink) |
| HTTP_SERVER_ADDR                  | CLI ``serve --port`` / ``follow --http-port`` |
| BUFFER_SIZE                       | Ray streaming-executor backpressure (K1, by design) |
| TIMESTAMP_FLUSH_INTERVAL          | ``window_us`` (checkpoint granularity) |
| MAX_CATCH_UP                      | ``max_catch_up_us`` |
| REDIS_DEDUPE_EXPIRATION           | TTL-free watermark dedup (deliberate upgrade: replay of any age is safe) |
| REDIS_METADATA_PREFIX             | lake directory layout (``manifests/``, ``lake/p=*``) |
| MONGO_CONNECT/QUERY_TIMEOUT       | n/a (local/remote FS IO; Arrow reader timeouts) |
| OPLOG_V2_EXTRACT_SUBFIELD_CHANGES | ``v2_deep`` |
| WRITE_PARALLELISM                 | ``num_partitions`` (decoupled from cluster size — see below) |
| READ_PARALLELISM                  | ``read_blocks`` |
| PG_PERSISTENCE_URL                | durable denylist store (always-on JSON under the lake root) |
| SENTRY_*                          | n/a — error channel is the dead-letter parquet + logging |
| RESUME_TS_READ_RETRIES            | ``resume_read_retries`` |
| RESUME_TS_READ_RETRY_DELAY        | ``resume_read_retry_delay_s`` |
| RESUME_FROM_END_ON_FAILURE        | ``resume_from_end_on_failure`` |
| REDIS_BATCH_SIZE                  | ``batch_size`` |
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    """Configuration for the CDC ingest pipeline.

    Attributes mirror reference knobs where one exists:

    - ``num_partitions``     ≙ WriteParallelism (lib/config/main.go:160-189) but
      decoupled from worker count: the partition→state mapping must be stable
      across cluster sizes, so P is fixed, not ``len(cluster)``.
    - ``denylist``           ≙ the denylist sync.Map (lib/denylist/*) — a set of
      denied conv_ids (reference: database names), applied pre-parse.
    - ``v2_deep``            ≙ OTR_OPLOG_V2_EXTRACT_SUBFIELD_CHANGES
      (lib/config/main.go:135-144): deep (recursive dotted-path) vs shallow
      changed-field extraction for v2 update specs.
    - ``window_us``          — resumable ingest window width; generalizes the
      tail window between checkpoint flushes (OTR_TIMESTAMP_FLUSH_INTERVAL,
      lib/config/main.go:68-75).
    - ``max_catch_up_us``    ≙ OTR_MAX_CATCH_UP (lib/config/main.go:83-86):
      if the resume watermark is further behind than this, optionally skip to
      the end of the log instead of replaying (None = always replay; our
      default — batch replays are always safe because dedup is TTL-free).
    - ``batch_size``         ≙ OTR_REDIS_BATCH_SIZE (lib/config/main.go:221-225),
      but sized for Arrow blocks, not Redis pipelines.
    - ``salt_rows_threshold``— hot-partition salting: a partition-window group
      larger than this is folded in ts-contiguous sub-chunks (salts) that are
      combined in deterministic salt order (north_rule skew requirement).
    """

    num_partitions: int = 32
    payload_cols: tuple[str, ...] = ("role", "text", "tool")
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx")
    denylist: frozenset[str] = field(default_factory=frozenset)
    v2_deep: bool = False
    window_us: int = 3_600_000_000  # 1 hour of event time per window
    max_catch_up_us: int | None = None
    # None → map_batches consumes whole blocks (no re-batching); block size is
    # governed by read_blocks.  Fewer, larger blocks keep the shuffle's
    # piece count (map_blocks × reduce_blocks) small.
    batch_size: int | None = None
    # read output blocks per window; None → 2 × cluster CPUs
    read_blocks: int | None = None
    parse_concurrency: int | None = None  # None → let Ray size the stateless stage
    apply_concurrency: tuple[int, int] | None = None
    salt_rows_threshold: int = 200_000
    salt_chunks: int = 16
    errors_to_deadletter: bool = True
    # partition hash: "poly64" (vectorized numpy over Arrow buffers, default)
    # or "sha256" (reference-parity P1, SQL-verifiable).  Both are stable and
    # cluster-size-independent; the choice only changes the lake layout.
    hash_algo: str = "poly64"
    # state layout: "rewrite" = each window rewrites the partition's full
    # state file (simple, read-optimal); "delta" = each window appends only
    # its folded delta (pseudo-events) and readers merge-on-read, with
    # automatic compaction once a partition accumulates compact_threshold
    # deltas — kills the per-window write amplification of frequent small
    # windows (the lakehouse tradeoff).
    state_mode: str = "rewrite"
    # chain-LENGTH cap: compact whenever a partition's chain exceeds this
    # many files — bounds merge-on-read cost.  Write volume is governed by
    # compact_rows_factor below; this cap only protects read latency.
    compact_threshold: int = 12
    # size-tiered compaction trigger (standing-actor path): compact when
    # pending delta rows ≥ factor × base rows.  Right for APPEND-mostly
    # data (base grows with the log; amortized write-amp ≈ 1+(factor+1)/
    # factor).  Default OFF (inf): this engine's transcript CDC mix is
    # UPDATE-heavy — the folded base converges to a near-constant size ≈
    # 1-2 windows of deltas, so a size trigger fires every couple of
    # windows and was MEASURED worse than the plain length cap (wamp 3.4
    # vs 2.5 on the 16-window sf0.1 run).  See BASELINE.md round-4 for the
    # sweep and the floor analysis.
    compact_rows_factor: float = float("inf")
    # leveled (partial) compaction: when the length cap fires and the chain
    # head is a compacted BASE at least this many times larger (rows) than
    # the delta suffix, merge ONLY the suffix into one mid-level delta and
    # leave the base untouched — write cost per cycle drops from
    # O(state) to O(suffix).  Right for low-churn/append-mostly partitions
    # where the base dominates; on the update-heavy transcript mix the
    # 12-window suffix folds to ≈ the base size and the trigger rarely
    # fires (the floor analysis still binds).  inf = always full rewrite.
    compact_partial_base_ratio: float = 2.0
    # force a FULL rewrite after this many consecutive partial merges, so
    # chain shape stays [base, mid, deltas...] and the mid level cannot
    # accrete unboundedly
    compact_full_every: int = 4
    # distributed salted fold: pre-fold (partition, ts-salt) sub-groups in a
    # first exchange, then apply the (much smaller) pseudo-events per
    # partition — for hot partitions too big for one task/node.  The in-task
    # chunked fold (salt_rows_threshold) covers single-node skew; this
    # distributes it.  0 = off.
    distributed_salt_buckets: int = 0
    # failure policy (≙ the reference's 30×1s retry-then-permanent-drop,
    # lib/redispub/publisher.go:228-253, and restart-streak escalation,
    # lib/oplog/tail.go:151-207):
    # - task_max_retries: transient task failures (worker death AND, with
    #   retry_exceptions=True, application exceptions) are retried up to
    #   this many times before the block is declared permanently failed.
    # - max_errored_blocks: after retries are exhausted, 0 (default) fails
    #   the window — fail-closed, nothing silently lost; N>0 tolerates up
    #   to N permanently-failed blocks per window (the reference's counted
    #   permanent-failure drop); negative = unlimited.
    task_max_retries: int = 4
    retry_exceptions: bool = True
    max_errored_blocks: int = 0
    # resume-point read policy (≙ ResumeTsReadRetries / ResumeTsReadRetryDelay
    # / OTR_RESUME_FROM_END_ON_FAILURE, lib/config/main.go:191-219): the
    # resume computation retries transient checkpoint-read failures with
    # linear backoff; after exhausting retries the default is to ABORT
    # (fail-closed — skipping ahead would silently drop every event since
    # the last processed position).  resume_from_end_on_failure=True is the
    # explicit escape hatch: start from the end of the log instead of
    # staying down, at the documented cost of skipping events.
    resume_read_retries: int = 5
    resume_read_retry_delay_s: float = 0.5
    resume_from_end_on_failure: bool = False
    # window lookahead: prefetch + materialize the NEXT window's stateless
    # half (read → parse → salt tag) while the current window's shuffle +
    # apply runs.  The apply order stays strictly sequential (exactly-once
    # unchanged; a crash discards prefetched data and the window replays).
    # Trade-off: the parse-time denylist snapshot is taken at prefetch time,
    # so runtime denylist mutations take effect one window later than with
    # lookahead off (the default).
    window_lookahead: bool = False
    # lookahead depth: number of future windows whose stateless half may be
    # in flight concurrently (each is an independent streaming Dataset
    # execution; they share the cluster and pipeline against each other).
    # Depth D means up to D windows materialized (and, in actor mode,
    # prefed) ahead, so the serial per-window read+parse latency stops
    # being the critical path of sustained ingest.  Costs: up to D+1
    # windows resident (object store + actor buffers) and a ≤ D-window lag
    # on runtime denylist mutations.  Only meaningful with
    # window_lookahead=True.
    lookahead_depth: int = 1
    # apply exchange topology (stages/actor_apply.py):
    # - "groupby": per-window `groupby(partition_id).map_groups`
    #   sort-shuffle — stateless-per-window, best for one-shot wide windows
    #   (the shuffle materializes in the SPILLABLE object store, and 1
    #   reduce task per partition packs better than per-actor serial folds
    #   when a window is most of the log).
    # - "actors": a standing pool of apply actors created once per run;
    #   partitions map to actors by pid % A, feed tasks split parsed blocks
    #   and ship sub-tables, manifests stay cached across windows and
    #   finishes pipeline in window order.  Kills the per-window shuffle
    #   fixed cost in sustained multi-window ingest (≙ the reference's
    #   persistent per-shard publisher goroutines, publisher.go:160-357).
    #   Constraint: in-flight windows buffer in actor HEAP (not spillable) —
    #   size window_us × lookahead_depth to cluster memory.
    # - "auto" (default): "actors" when the run will actually EXECUTE ≥ 3
    #   windows (not-yet-committed ones — a resumed run with 1 remaining
    #   window uses groupby even if the full schedule was wide), else
    #   "groupby".  Crossover measured on the sf0.1 log: groupby wins at
    #   1-2 windows, actors from 3 up.  Data-driven — the window count
    #   comes from log span / window_us, not cluster size.
    # Any mode falls back to "groupby" when distributed_salt_buckets > 1
    # (the two-stage salted fold needs the pre-fold exchange anyway).
    apply_mode: str = "auto"
    # standing-exchange width; None → min(num_partitions, cluster CPUs)
    apply_actors: int | None = None
    # actor-mode execution-wave width (windows per feed group): ONE
    # streaming executor reads+parses a group of consecutive windows and
    # the feed wave splits by (window, actor) — commit/replay granularity
    # stays one window.  "auto" sizes the group from the cluster memory
    # budget (below); an int pins it; 1 reproduces per-window feeding.
    # Rationale: N concurrent per-window executors contend on the driver
    # (measured 2.3× slower than one wide executor at 32 cpus), and group
    # width is the memory-budget knob a real cluster turns — a 4× cluster
    # runs 4×-wider execution waves over the same window schedule.
    feed_group_windows: int | str = "auto"
    # memory model for the auto group width: clusters provision memory
    # proportionally to cores (this sandbox: 32 cpus / 128 GiB = 4 GiB/cpu);
    # budget = num_cpus × mem_per_cpu × apply_heap_fraction, and at most
    # TWO groups are in actor heap at once (one folding, one feeding), so
    # auto G = budget / (2 × window_heap_bytes), window_heap_bytes being the
    # footer-stats uncompressed window share × a 2× gather/buffer factor
    mem_per_cpu_bytes: int = 4 << 30
    apply_heap_fraction: float = 0.25
    # CPU reservation per apply actor: 0 lets feed and fold phases alternate
    # on the same cores (they are phase-disjoint within a window); reserve a
    # fraction (e.g. 0.5) when co-tenant pipelines need guaranteed headroom
    apply_actor_num_cpus: float = 0
    # fault-injection hook (tests only): path to a one-shot flag file; the
    # first apply actor to consume it raises mid-finish AFTER committing at
    # least one partition (stages/actor_apply.py) — exercises the
    # poison-on-failed-finish path with SURVIVING actors
    test_fail_finish_flag: str | None = None

    def with_denylist(self, denied: set[str]) -> "PipelineConfig":
        from dataclasses import replace

        return replace(self, denylist=frozenset(denied))

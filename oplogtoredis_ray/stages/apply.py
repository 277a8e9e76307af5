"""Per-partition ordered apply — the exactly-once sink.

≙ the reference's publisher shard: a single-threaded consumer per write
shard draining an ordered queue through the Lua dedup+publish script with
post-publish watermark flush (/root/reference/lib/redispub/publisher.go:160-357).
Here each ``groupby(partition_id).map_groups`` call receives *all* of one
partition's window events (the keyed shuffle replaces the reference's
broadcast+discard read fan-out, tail.go:295-321), and:

1. skips the whole window if the manifest lineage already contains it
   (idempotent re-execution under Ray task retries / double-runs — ≙ HA
   competing consumers, HA_test.go:12-41);
2. creates order explicitly: sort by ``(ts, seq, tx_idx)`` (Ray Data gives
   no ordering; the reference *assumed* ``$natural`` order + FIFO channels);
3. drops exact duplicate identities and events ≤ the durable watermark
   (TTL-free dedup ≙ ``processed::<ts64>::<txIdx>`` keys);
4. folds vectorized (salted ts-chunk fold for oversized hot groups, merged
   in deterministic salt order) and merges into the partition's Parquet
   state with Arrow schema unification;
5. writes the new state file, then atomically commits the manifest
   (watermark, lineage, metrics) — data before checkpoint, so a crash
   between the two replays idempotently.

State lives in files, not in the actor: a restarted/retried task rebuilds
everything from the manifest (≙ the reference rebuilding from Redis on
restart, tail.go:514-588).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from oplogtoredis_ray.config import PipelineConfig
from oplogtoredis_ray.state.manifest import (
    Manifest,
    commit_manifest,
    read_manifest,
)

STATS_COLUMNS = [
    "partition_id",
    "window_id",
    "events_in",
    "dupes_dropped",
    "below_watermark",
    "deletes",
    "upserts",
    "patches",
    "patch_misses",
    "rows_out",
    "skipped",
]


_STATS_DTYPES = {
    c: ("object" if c == "window_id" else "bool" if c == "skipped" else "int64")
    for c in STATS_COLUMNS
}


def empty_stats() -> pd.DataFrame:
    """Schema-typed empty stats frame — keeps every block of the stats
    stream on ONE schema so the streaming executor never logs
    'RefBundle with a different schema' for our outputs."""
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in _STATS_DTYPES.items()})


def _stats_row(pid: int, window_id: str, **kw) -> pd.DataFrame:
    base = {c: 0 for c in STATS_COLUMNS}
    base.update({"partition_id": pid, "window_id": window_id, "skipped": False})
    base.update(kw)
    return pd.DataFrame([base], columns=STATS_COLUMNS).astype(_STATS_DTYPES)


def apply_partition_window(
    lake_root: str,
    window_id: str,
    cfg: PipelineConfig,
    group,
    manifest: Manifest,
    defer_compaction: bool = False,
):
    """Core exactly-once apply of ONE partition's window events (an Arrow
    table containing only that partition's rows).  ``manifest`` is the
    caller's view of the partition's current checkpoint — freshly read by
    the task path, possibly a warm cache held by a persistent apply actor
    (stages/actor_apply.py).  A stale cache is safe: the guarded monotonic
    ``commit_manifest`` re-reads under the partition lock and refuses to
    roll lineage backward, so the worst case is a wasted fold whose state
    file becomes GC garbage.

    ``defer_compaction=True`` (standing-actor path, delta layout): never
    compact inline — always append the window delta, and commit via
    `commit_delta_append` (the incumbent-chain append that commutes with
    the actor's BACKGROUND compactor).  The caller is responsible for
    scheduling compaction when the returned manifest's chain exceeds
    ``cfg.compact_threshold``.

    Returns ``(stats_row, committed_manifest_or_None)`` — ``None`` means
    the commit was superseded by a faster competing consumer and any cached
    manifest for this partition must be invalidated."""
    import pyarrow as pa

    from oplogtoredis_ray.stages.arrow_fold import (
        fold_arrow,
        fold_arrow_chunked,
        merge_into_state,
        order_dedup_filter,
    )
    from oplogtoredis_ray.state.lake import (
        read_partition_state_arrow,
        write_partition_state_arrow,
    )

    payload_cols = tuple(cfg.payload_cols)
    pid = int(group["partition_id"][0].as_py())
    if window_id in manifest.lineage:
        # recover the committed attempt's op counts when this window is the
        # partition's LAST committed one (the replay-after-pool-failure
        # case: the first attempt's stats frame was lost with the pool, so
        # without this the window's _windows.json/IngestResult entry would
        # undercount applied operations; older-than-last skips — HA double
        # runs — keep zeros, their window entry was committed by the winner)
        recovered = {}
        m = manifest.metrics
        if m.get("last_window") == window_id:
            recovered = {
                k: int(m.get(k, 0))
                for k in ("upserts", "deletes", "patches", "patch_misses")
            }
        return (
            _stats_row(
                pid, window_id, events_in=len(group), skipped=True, **recovered
            ),
            manifest,
        )

    events_in = len(group)
    g, dupes, below = order_dedup_filter(group, manifest.watermark)

    if len(g) == 0:
        # nothing new: still record lineage so re-runs stay cheap
        stats = _stats_row(
            pid, window_id, events_in=events_in, dupes_dropped=dupes,
            below_watermark=below,
        )
        if defer_compaction and cfg.state_mode == "delta":
            # lineage-only append against the incumbent (a cached-chain
            # commit_manifest here could resurrect a compacted-away chain)
            from oplogtoredis_ray.state.manifest import commit_delta_append

            lineage_manifest = Manifest(
                partition_id=pid,
                watermark=manifest.watermark,
                lineage=manifest.lineage + [window_id],
                metrics=manifest.metrics,
            )
            return stats, commit_delta_append(lake_root, lineage_manifest, None)
        manifest.lineage.append(window_id)
        ok = commit_manifest(lake_root, manifest)
        return stats, (manifest if ok else None)

    if len(g) > cfg.salt_rows_threshold:
        fr = fold_arrow_chunked(g, payload_cols, cfg.salt_chunks)
    else:
        fr = fold_arrow(g, payload_cols)

    if cfg.state_mode == "delta":
        # append-only: write the window's folded pseudo-events; compact
        # the chain once it exceeds the threshold (write amplification
        # is then O(compact_threshold), not O(windows))
        from oplogtoredis_ray.stages.arrow_fold import (
            merge_chain,
            pseudo_events_table,
        )
        from oplogtoredis_ray.state.lake import (
            merge_partition_chain,
            write_partition_delta_arrow,
        )

        delta = pseudo_events_table(fr, payload_cols)
        merge_stats = {
            "deletes": fr.n_deletes,
            "upserts": fr.n_upserts,
            "patches": fr.n_patches,
            "patch_misses": 0,  # resolved lazily at merge-on-read
        }
        prior = manifest.chain()
        if not defer_compaction and len(prior) + 1 > cfg.compact_threshold:
            # compact directly with the in-memory delta — the delta file
            # would be orphaned the moment the chain collapses
            base = merge_partition_chain(lake_root, prior, payload_cols)
            compacted = merge_chain([base, delta], payload_cols)
            base_rel, rows = write_partition_state_arrow(
                lake_root, pid, window_id, compacted
            )
            state_files = [base_rel]
            state_file = base_rel
        else:
            rel, _ = write_partition_delta_arrow(lake_root, pid, window_id, delta)
            state_files = prior + [rel]
            state_file = None
            rows = -1  # unknown until compaction
            delta_rel = rel
    else:
        state = read_partition_state_arrow(lake_root, manifest, payload_cols)
        new_state, merge_stats = merge_into_state(state, fr, payload_cols)
        rel, rows = write_partition_state_arrow(lake_root, pid, window_id, new_state)
        state_files = []
        state_file = rel

    # max identity triple = last row of the sorted table (tz-safe cast)
    import pyarrow.compute as _pc

    wts = int(_pc.cast(g["ts"], pa.int64())[-1].as_py())
    new_manifest = Manifest(
        partition_id=pid,
        watermark=(wts, int(g["seq"][-1].as_py()), int(g["tx_idx"][-1].as_py())),
        state_file=state_file,
        state_files=state_files,
        rows=rows,
        lineage=manifest.lineage + [window_id],
        metrics={
            "last_window": window_id,
            "events_applied": int(len(g)),
            **{k: int(v) for k, v in merge_stats.items()},
        },
    )
    if defer_compaction and cfg.state_mode == "delta":
        # standing-actor path: append to the INCUMBENT chain under the
        # partition lock so a concurrent background compaction commit is
        # composed with, not clobbered
        from oplogtoredis_ray.state.manifest import commit_delta_append

        committed = commit_delta_append(lake_root, new_manifest, delta_rel)
    else:
        committed = new_manifest if commit_manifest(lake_root, new_manifest) else None

    return (
        _stats_row(
            pid,
            window_id,
            events_in=events_in,
            dupes_dropped=dupes,
            below_watermark=below,
            rows_out=rows,
            **merge_stats,
        ),
        committed,
    )


def make_apply_fn(lake_root: str, window_id: str, cfg: PipelineConfig):
    """Closure for ``groupby("partition_id").map_groups(...,
    batch_format="pyarrow")`` — one call per partition per window (the
    partitioning assumption this operator relies on: a partition's whole
    window in one group, guaranteed by groupby).

    The whole path is Arrow-native (stages/arrow_fold.py): event-scale
    strings never box into Python objects — profiled at 3-4× the fold cost
    when they do."""
    import pyarrow as pa  # noqa: F401  (kept for map_groups type context)

    def apply_group(group) -> pd.DataFrame:
        if len(group) == 0:
            return empty_stats()
        pid = int(group["partition_id"][0].as_py())
        manifest = read_manifest(lake_root, pid)
        stats, _ = apply_partition_window(lake_root, window_id, cfg, group, manifest)
        return stats

    return apply_group

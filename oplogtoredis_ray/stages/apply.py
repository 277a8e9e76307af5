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
from oplogtoredis_ray.stages.fold import (
    apply_folded,
    drop_below_watermark,
    fold_events,
    fold_events_chunked,
    sort_and_dedup,
)
from oplogtoredis_ray.state.lake import read_partition_state, write_partition_state
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


def _stats_row(pid: int, window_id: str, **kw) -> pd.DataFrame:
    base = {c: 0 for c in STATS_COLUMNS}
    base.update({"partition_id": pid, "window_id": window_id, "skipped": False})
    base.update(kw)
    return pd.DataFrame([base], columns=STATS_COLUMNS)


def make_apply_fn(lake_root: str, window_id: str, cfg: PipelineConfig):
    """Closure for ``groupby("partition_id").map_groups`` — one call per
    partition per window (the partitioning assumption this operator relies
    on: a partition's whole window in one group, guaranteed by groupby)."""

    payload_cols = tuple(cfg.payload_cols)

    def apply_group(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) == 0:
            return pd.DataFrame(columns=STATS_COLUMNS)
        pid = int(group["partition_id"].iloc[0])
        manifest = read_manifest(lake_root, pid)
        if window_id in manifest.lineage:
            return _stats_row(pid, window_id, events_in=len(group), skipped=True)

        events_in = len(group)
        g = group.copy()
        g["ts"] = g["ts"].astype("int64")  # µs since epoch for total ordering
        g = sort_and_dedup(g)
        dupes = events_in - len(g)
        g = drop_below_watermark(g, manifest.watermark)
        below = events_in - dupes - len(g)

        if len(g) == 0:
            # nothing new: still record lineage so re-runs stay cheap
            manifest.lineage.append(window_id)
            commit_manifest(lake_root, manifest)
            return _stats_row(
                pid, window_id, events_in=events_in, dupes_dropped=dupes,
                below_watermark=below,
            )

        if len(g) > cfg.salt_rows_threshold:
            folded = fold_events_chunked(g, payload_cols, cfg.salt_chunks)
        else:
            folded = fold_events(g, payload_cols)

        state = read_partition_state(lake_root, manifest)
        if len(state):
            state["ts"] = state["ts"].astype("int64")
        new_state, merge_stats = apply_folded(state, folded, payload_cols)
        new_state = new_state.sort_values(["conv_id", "turn_idx"], kind="mergesort")

        rel, rows = write_partition_state(lake_root, pid, window_id, new_state)

        wm_row = g.iloc[-1]  # max identity triple (g is sorted)
        new_manifest = Manifest(
            partition_id=pid,
            watermark=(int(wm_row["ts"]), int(wm_row["seq"]), int(wm_row["tx_idx"])),
            state_file=rel,
            rows=rows,
            lineage=manifest.lineage + [window_id],
            metrics={
                "last_window": window_id,
                "events_applied": int(len(g)),
                **{k: int(v) for k, v in merge_stats.items()},
            },
        )
        commit_manifest(lake_root, new_manifest)

        return _stats_row(
            pid,
            window_id,
            events_in=events_in,
            dupes_dropped=dupes,
            below_watermark=below,
            rows_out=rows,
            **merge_stats,
        )

    return apply_group

"""Lake partition state IO.

The lake is the materialized transcript table partitioned by
``hash(conv_id) % P`` (P fixed, cluster-size-independent — ≙ the write-shard
hash, /root/reference/lib/oplog/processor.go:89-96).  Each partition's
current state is exactly one Parquet file named by the committing window;
the manifest points at it, so partially written files from failed/retried
tasks are invisible until the manifest rename commits (idempotence ≙ the
Lua GET-before-SETEX arbiter, lib/redispub/publisher.go:41-62).

Schema evolution: pre-evolution state files lack ``tool``; readers unify
schemas and null-fill.
"""

from __future__ import annotations

import os
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from oplogtoredis_ray.state.manifest import Manifest

STATE_SCHEMA_BASE = {
    "conv_id": pa.string(),
    "turn_idx": pa.int32(),
    "role": pa.string(),
    "text": pa.string(),
    "tool": pa.string(),
    "ts": pa.timestamp("us"),
}


def lake_partition_dir(lake_root: str, partition_id: int) -> str:
    return os.path.join(lake_root, "lake", f"p={partition_id:05d}")


def state_schema(payload_cols: tuple[str, ...] = ("role", "text", "tool")) -> dict:
    """Payload-driven state schema: key columns + string payload + ts."""
    out: dict[str, pa.DataType] = {"conv_id": pa.string(), "turn_idx": pa.int32()}
    for c in payload_cols:
        out[c] = pa.string()
    out["ts"] = pa.timestamp("us")
    return out


def empty_state_table(payload_cols: tuple[str, ...] = ("role", "text", "tool")) -> pa.Table:
    return pa.schema(state_schema(payload_cols)).empty_table()


def _unify_to_schema(table: pa.Table, schema: dict) -> pa.Table:
    cols = {}
    n = len(table)
    for name, typ in schema.items():
        if name in table.column_names:
            cols[name] = table[name].cast(typ)
        else:
            cols[name] = pa.nulls(n, typ)
    return pa.table(cols)


def _ensure_schema_cols(table: pa.Table, schema: dict) -> pa.Table:
    """Add (null-filled, typed) any schema column missing from ``table``
    while PRESERVING its extra columns (delta links carry op/seq/tx_idx and
    set_* flags the merge needs)."""
    n = len(table)
    for name, typ in schema.items():
        if name not in table.column_names:
            table = table.append_column(name, pa.nulls(n, typ))
    return table


def merge_partition_chain(
    lake_root: str,
    chain: list[str],
    payload_cols: tuple[str, ...] = ("role", "text", "tool"),
) -> pa.Table:
    """THE chain reader: load a manifest's state-file chain and merge it to
    the current partition state (single plain state file → read verbatim;
    anything else → fold-algebra merge-on-read).  Every consumer of chains
    (apply compaction, lake reads, exports) goes through here."""
    schema = state_schema(payload_cols)
    if not chain:
        return pa.schema(schema).empty_table()
    tables = [pq.read_table(os.path.join(lake_root, rel)) for rel in chain]
    if len(tables) == 1 and "op" not in tables[0].column_names:
        return _unify_to_schema(tables[0], schema)
    from oplogtoredis_ray.stages.arrow_fold import merge_chain

    # null-fill configured payload columns on EVERY chain link before the
    # merge (not only on the merged output): a link written before a
    # payload_cols evolution (or a compacted base) lacks the new column and
    # the fold kernels index state[c]/table[c] directly — the module
    # docstring's "readers unify schemas and null-fill" claim must hold
    # per-link, not just per-result
    tables = [_ensure_schema_cols(t, schema) for t in tables]
    return _unify_to_schema(merge_chain(tables, payload_cols), schema)


def chain_is_plain(chain: list[str]) -> bool:
    """True when the chain is a single compacted/rewritten state file that
    can be read verbatim (no merge needed)."""
    return len(chain) == 1 and "delta-" not in os.path.basename(chain[0])


def read_partition_state_arrow(
    lake_root: str,
    manifest: Manifest,
    payload_cols: tuple[str, ...] = ("role", "text", "tool"),
) -> pa.Table:
    """Current state of one partition as Arrow (schema-unified, no boxing).
    Delta chains are merged on read via the fold algebra."""
    return merge_partition_chain(lake_root, manifest.chain(), payload_cols)


def write_partition_state_arrow(
    lake_root: str, partition_id: int, window_id: str, table: pa.Table
) -> tuple[str, int]:
    pdir = lake_partition_dir(lake_root, partition_id)
    os.makedirs(pdir, exist_ok=True)
    fname = f"state-{window_id}-{uuid.uuid4().hex[:8]}.parquet"
    rel = os.path.join("lake", f"p={partition_id:05d}", fname)
    pq.write_table(table, os.path.join(lake_root, rel))
    return rel, len(table)


def write_partition_delta_arrow(
    lake_root: str, partition_id: int, window_id: str, table: pa.Table
) -> tuple[str, int]:
    """Delta layout: the window's folded pseudo-events only (named so
    readers can tell deltas from compacted state at a glance)."""
    pdir = lake_partition_dir(lake_root, partition_id)
    os.makedirs(pdir, exist_ok=True)
    fname = f"delta-{window_id}-{uuid.uuid4().hex[:8]}.parquet"
    rel = os.path.join("lake", f"p={partition_id:05d}", fname)
    pq.write_table(table, os.path.join(lake_root, rel))
    return rel, len(table)


def read_partition_state(
    lake_root: str,
    manifest: Manifest,
    payload_cols: tuple[str, ...] = ("role", "text", "tool"),
) -> pd.DataFrame:
    """Current state of one partition as pandas (delta chains merged)."""
    table = read_partition_state_arrow(lake_root, manifest, payload_cols)
    return table.to_pandas()


def write_partition_state(
    lake_root: str, partition_id: int, window_id: str, df: pd.DataFrame
) -> tuple[str, int]:
    """Write the new state file; returns (relative path, rows).  The file
    name embeds the window id + a uniquifier so concurrent retried tasks
    never collide; only the manifest rename makes one of them current."""
    pdir = lake_partition_dir(lake_root, partition_id)
    os.makedirs(pdir, exist_ok=True)
    fname = f"state-{window_id}-{uuid.uuid4().hex[:8]}.parquet"
    rel = os.path.join("lake", f"p={partition_id:05d}", fname)
    table = pa.table(
        {
            "conv_id": pa.array(df["conv_id"], type=pa.string()),
            "turn_idx": pa.array(df["turn_idx"], type=pa.int32()),
            "role": pa.array(df["role"], type=pa.string()),
            "text": pa.array(df["text"], type=pa.string()),
            "tool": pa.array(df["tool"], type=pa.string()),
            "ts": pa.array(df["ts"], type=pa.timestamp("us")),
        }
    )
    pq.write_table(table, os.path.join(lake_root, rel))
    return rel, len(df)


def read_lake(lake_root: str, payload_cols: tuple[str, ...] = ("role", "text", "tool")):
    """The whole lake as a Ray Dataset, resolved through manifests so only
    committed files are read.  Plain state files are read directly; delta
    chains are merged-on-read with one Ray task per partition."""
    import ray
    import ray.data as rd

    from oplogtoredis_ray.state.manifest import read_all_manifests

    manifests = [m for m in read_all_manifests(lake_root) if m.chain()]
    plain = [
        os.path.join(lake_root, m.chain()[0])
        for m in manifests
        if chain_is_plain(m.chain())
    ]
    chains = [m for m in manifests if not chain_is_plain(m.chain())]

    datasets = []
    if plain:
        # partitioning=None: `p=NNNNN` dirs are state layout, not hive columns
        datasets.append(rd.read_parquet(plain, partitioning=None))
    if chains:

        @ray.remote
        def _merge(rels: list[str]) -> pa.Table:
            return merge_partition_chain(lake_root, rels, payload_cols)

        refs = [_merge.remote(m.chain()) for m in chains]
        datasets.append(rd.from_arrow_refs(refs))
    if not datasets:
        return rd.from_arrow(pa.schema(state_schema(payload_cols)).empty_table())
    ds = datasets[0]
    for other in datasets[1:]:
        ds = ds.union(other)
    return ds

"""Lake maintenance: garbage collection and snapshot export.

- ``collect_garbage``: every apply commit leaves the previous state file
  behind (they are what makes the manifest rename safe); GC removes files
  no manifest references.  Safe to run concurrently with ingest: a file is
  only deleted when it is not the current state of any partition, and
  in-flight applies write *new* uniquely-named files.
- ``export_snapshot``: the multi-destination fan-out analog (≙ the
  reference publishing every message to every Redis URL —
  /root/reference/lib/oplog/tail.go:309-321): the lake is materialized
  once, and each destination gets a consistent copy of the committed state
  (manifest-pinned, so concurrent window commits don't tear the snapshot).
"""

from __future__ import annotations

import json
import os
import shutil

from oplogtoredis_ray.state.manifest import read_all_manifests


def collect_garbage(
    lake_root: str, dry_run: bool = False, grace_seconds: float = 900.0
) -> list[str]:
    """Delete state files not referenced by any manifest; returns the
    removed (or would-remove) relative paths.

    ``grace_seconds`` makes this safe while ingest runs: an apply task
    writes its new state file *before* the manifest rename commits it, so
    an unreferenced-but-recent file may be a commit in flight.  Only files
    older than the grace window are eligible (set 0 only on a quiesced
    lake)."""
    import time

    referenced: set[str] = set()
    for m in read_all_manifests(lake_root):
        referenced.update(m.chain())
    cutoff = time.time() - grace_seconds
    removed: list[str] = []
    lake_dir = os.path.join(lake_root, "lake")
    if not os.path.isdir(lake_dir):
        return removed
    for pdir in sorted(os.listdir(lake_dir)):
        full = os.path.join(lake_dir, pdir)
        if not os.path.isdir(full):
            continue
        for fname in sorted(os.listdir(full)):
            rel = os.path.join("lake", pdir, fname)
            if rel in referenced:
                continue
            path = os.path.join(lake_root, rel)
            try:
                if os.path.getmtime(path) > cutoff:
                    continue  # possible in-flight commit
            except OSError:
                continue
            removed.append(rel)
            if not dry_run:
                os.unlink(path)
    return removed


def export_snapshot(
    lake_root: str,
    destinations: list[str],
    payload_cols: tuple[str, ...] = ("role", "text", "tool"),
) -> dict:
    """Copy the committed lake state to every destination directory.

    The manifest set is read ONCE, pinning a consistent snapshot even if
    windows keep committing during the copy.  Each destination receives one
    state file per partition plus a ``_snapshot.json`` manifest.  Delta
    chains are compacted into the destination copy.  Re-exports are
    idempotent because every destination file name is content-identifying:
    plain state files carry their window-id + uuid, merged snapshots embed
    the partition watermark.
    """
    import pyarrow.parquet as pq

    from oplogtoredis_ray.state.lake import chain_is_plain, merge_partition_chain

    manifests = read_all_manifests(lake_root)
    pinned = []
    for m in manifests:
        chain = m.chain()
        if not chain:
            continue
        if chain_is_plain(chain):
            rows = m.rows if m.rows >= 0 else pq.read_metadata(
                os.path.join(lake_root, chain[0])
            ).num_rows
            pinned.append((m.partition_id, chain[0], None, rows, list(m.watermark)))
        else:
            merged = merge_partition_chain(lake_root, chain, payload_cols)
            pinned.append(
                (m.partition_id, None, merged, len(merged), list(m.watermark))
            )
    stats = {"partitions": len(pinned), "rows": sum(p[3] for p in pinned), "destinations": []}
    for dest in destinations:
        os.makedirs(dest, exist_ok=True)
        copied = 0
        entries = []
        for pid, rel, merged, rows, wm in pinned:
            if rel is not None:
                dst_name = os.path.basename(rel)
                dst = os.path.join(dest, dst_name)
                if not os.path.exists(dst):
                    shutil.copy2(os.path.join(lake_root, rel), dst)
                    copied += 1
            else:
                wm_tag = "-".join(str(int(x)) for x in wm)
                dst_name = f"state-snapshot-p{pid:05d}-wm{wm_tag}.parquet"
                dst = os.path.join(dest, dst_name)
                if not os.path.exists(dst):
                    pq.write_table(merged, dst)
                    copied += 1
            entries.append(
                {"partition_id": pid, "file": dst_name, "rows": rows, "watermark": wm}
            )
        snap = {"partitions": entries}
        tmp = os.path.join(dest, "_snapshot.json.tmp")
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, os.path.join(dest, "_snapshot.json"))
        stats["destinations"].append({"dest": dest, "files_copied": copied})
    return stats

"""Per-partition checkpoint manifests — the durable truth.

Generalizes the reference's Redis checkpoint design:

- watermark ≙ ``lastProcessedEntry.<ordinal>`` written *after* successful
  publish (/root/reference/lib/redispub/publisher.go:221-224, 319-357) —
  here the manifest is committed atomically (tmp + rename) only after the
  partition's new state file is durable, so data and checkpoint can never
  disagree.
- resume ≙ ``getStartTime``'s min-across-ordinals with fail-closed error
  handling (lib/oplog/tail.go:514-588; lib/redispub/lastProcessedTime.go:38-53):
  an unreadable manifest raises instead of silently skipping (the reference
  aborts unless the OTR_RESUME_FROM_END_ON_FAILURE escape hatch is set).
- dedup ≙ the Lua GET-before-SETEX keys ``processed::<ts64>::<txIdx>``
  (lib/redispub/publisher.go:41-62, 315-317) — but TTL-free: the watermark
  triple ``(ts_us, seq, tx_idx)`` compares totally, so replays of *any* age
  are dropped (deliberate generalization of the 150 s dedup window; batch
  replays can be arbitrarily delayed).

Window-level lineage lives in ``_windows.json``: the driver appends a window
after *all* its partitions committed; resume = end of the last completed
window, and partially-applied windows are replayed idempotently (committed
partitions skip via lineage).

The write-data-then-atomically-swap-manifest protocol follows the lakehouse
transaction-log design (Armbrust et al., "Delta Lake: High-Performance ACID
Table Storage over Cloud Object Stores", VLDB 2020), reduced to
one-manifest-per-partition because CDC apply partitions commute.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field

Watermark = tuple[int, int, int]  # (ts_us, seq, tx_idx)

ZERO_WATERMARK: Watermark = (-1, -1, -1)


@dataclass
class Manifest:
    partition_id: int
    watermark: Watermark = ZERO_WATERMARK
    state_file: str | None = None  # rewrite mode: the single current state
    # delta mode: ordered chain of files (a compacted base and/or deltas);
    # readers merge-on-read in this order
    state_files: list[str] = field(default_factory=list)
    rows: int = 0  # -1 = unknown until next compaction (delta mode)
    lineage: list[str] = field(default_factory=list)  # applied window ids
    metrics: dict = field(default_factory=dict)

    def chain(self) -> list[str]:
        """All live files in apply order (either layout)."""
        if self.state_files:
            return list(self.state_files)
        return [self.state_file] if self.state_file else []

    def to_json(self) -> dict:
        return {
            "partition_id": self.partition_id,
            "watermark": list(self.watermark),
            "state_file": self.state_file,
            "state_files": self.state_files,
            "rows": self.rows,
            "lineage": self.lineage,
            "metrics": self.metrics,
        }

    @staticmethod
    def from_json(obj: dict) -> "Manifest":
        return Manifest(
            partition_id=int(obj["partition_id"]),
            watermark=tuple(obj["watermark"]),  # type: ignore[arg-type]
            state_file=obj.get("state_file"),
            state_files=list(obj.get("state_files", [])),
            rows=int(obj.get("rows", 0)),
            lineage=list(obj.get("lineage", [])),
            metrics=dict(obj.get("metrics", {})),
        )


class ManifestReadError(RuntimeError):
    """Fail-closed: a present-but-unreadable checkpoint aborts the run
    (≙ tail.go:543-570 abort-and-retry on persistent Redis failure)."""


def _manifest_dir(lake_root: str) -> str:
    return os.path.join(lake_root, "manifests")


def manifest_path(lake_root: str, partition_id: int) -> str:
    return os.path.join(_manifest_dir(lake_root), f"p-{partition_id:05d}.json")


def _atomic_write_json(path: str, obj: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, separators=(",", ":"))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)  # atomic commit
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def read_manifest(lake_root: str, partition_id: int) -> Manifest:
    path = manifest_path(lake_root, partition_id)
    if not os.path.exists(path):
        return Manifest(partition_id=partition_id)
    try:
        with open(path) as f:
            return Manifest.from_json(json.load(f))
    except (json.JSONDecodeError, KeyError, ValueError, OSError) as e:
        raise ManifestReadError(f"unreadable manifest {path}: {e}") from e


def commit_manifest(lake_root: str, manifest: Manifest) -> bool:
    """Guarded monotonic commit — the HA arbiter (≙ the reference's atomic
    Lua GET-before-SETEX, lib/redispub/publisher.go:41-62).

    Competing consumers replay the same window sequence, so partition
    lineages are always prefixes of one sequence; a commit may only move a
    manifest FORWARD.  Under an exclusive per-partition file lock the
    current manifest is re-read and the commit is skipped when the
    incumbent already contains this commit's windows (a faster process won
    the race) — an unconditional rename here could roll lineage backward
    and make watermark dedup drop the rolled-back windows' events forever.
    On shared object stores the same guard is a conditional put / ETag CAS.

    Returns True if committed, False if superseded (the caller's state
    file becomes garbage for GC).
    """
    import fcntl

    path = manifest_path(lake_root, manifest.partition_id)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    lock_path = os.path.join(
        os.path.dirname(path), f".p-{manifest.partition_id:05d}.lock"
    )
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            current = read_manifest(lake_root, manifest.partition_id)
            if current.lineage and set(manifest.lineage) <= set(current.lineage):
                return False  # incumbent is at or ahead of us
            _atomic_write_json(path, manifest.to_json())
            return True
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)


def commit_delta_append(
    lake_root: str, new_manifest: Manifest, delta_rel: str | None
) -> Manifest | None:
    """Append-commit for the delta layout (standing-actor apply path).

    A delta file's CONTENT is chain-position-independent — it is just the
    window's folded pseudo-events — so appending it commutes with a
    concurrent prefix compaction (`commit_chain_rewrite`).  Under the
    partition flock the incumbent manifest is re-read and this window's
    delta is appended to the INCUMBENT chain, never to the caller's
    (possibly compaction-stale) cached view: a cached-chain write here
    could resurrect files the background compactor already made garbage,
    racing the GC's grace window.

    ``delta_rel=None`` commits a lineage-only advance (empty window).
    Returns the committed manifest — the on-disk truth, which the caller
    must adopt as its cache — or None when superseded (this window is
    already in the incumbent lineage; the delta file becomes GC garbage).
    """
    import fcntl

    pid = new_manifest.partition_id
    path = manifest_path(lake_root, pid)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    lock_path = os.path.join(os.path.dirname(path), f".p-{pid:05d}.lock")
    wid = new_manifest.lineage[-1]
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            current = read_manifest(lake_root, pid)
            if wid in set(current.lineage):
                return None  # a faster competing consumer won this window
            # window commits rebuild the metrics dict fresh; carry the
            # compactor's cycle counter forward from the INCUMBENT (same
            # lock the compactor's CAS holds) or `compact_full_every`
            # would never see a consecutive-partials streak
            metrics = dict(new_manifest.metrics)
            if "partials_since_full" in current.metrics:
                metrics.setdefault(
                    "partials_since_full", current.metrics["partials_since_full"]
                )
            if delta_rel is None:
                # lineage-only advance (empty window): the chain layout —
                # including a compacted base's plain-state pointer and
                # known row count — is untouched
                committed = Manifest(
                    partition_id=pid,
                    watermark=max(current.watermark, new_manifest.watermark),
                    state_file=current.state_file,
                    state_files=list(current.state_files),
                    rows=current.rows,
                    lineage=current.lineage + [wid],
                    metrics=metrics,
                )
            else:
                committed = Manifest(
                    partition_id=pid,
                    watermark=max(current.watermark, new_manifest.watermark),
                    state_file=None,
                    state_files=current.chain() + [delta_rel],
                    rows=-1,
                    lineage=current.lineage + [wid],
                    metrics=metrics,
                )
            _atomic_write_json(path, committed.to_json())
            return committed
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)


def commit_chain_rewrite(
    lake_root: str,
    partition_id: int,
    expected_prefix: list[str],
    base_rel: str,
    rows: int,
    keep: int = 0,
    metrics_update: dict | None = None,
) -> Manifest | None:
    """Prefix-CAS commit for background compaction: replace
    ``expected_prefix[keep:]`` with the merged file, keeping the first
    ``keep`` links (the untouched base for a leveled/partial merge; 0 = the
    classic full rewrite).  Watermark and lineage are untouched —
    compaction changes how state is stored, never what has been applied.

    Succeeds even when folds appended new deltas after the compactor took
    its snapshot (appends only grow the suffix).  Fails — returning None,
    the merged file becomes GC garbage — when the prefix itself changed
    (a competing consumer's inline compaction or a concurrent rewrite).
    ``metrics_update`` entries are merged into the committed manifest's
    metrics under the same lock (partial-merge cycle accounting).
    """
    import fcntl

    path = manifest_path(lake_root, partition_id)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    lock_path = os.path.join(
        os.path.dirname(path), f".p-{partition_id:05d}.lock"
    )
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            current = read_manifest(lake_root, partition_id)
            chain = current.chain()
            k = len(expected_prefix)
            if not 0 <= keep < k:
                raise ValueError(f"keep={keep} outside expected prefix of {k}")
            if chain[:k] != expected_prefix:
                return None
            new_chain = expected_prefix[:keep] + [base_rel] + chain[k:]
            single = len(new_chain) == 1
            metrics = dict(current.metrics)
            if metrics_update:
                metrics.update(metrics_update)
            committed = Manifest(
                partition_id=partition_id,
                watermark=current.watermark,
                state_file=new_chain[0] if single else None,
                state_files=new_chain,
                rows=rows if single else -1,
                lineage=current.lineage,
                metrics=metrics,
            )
            _atomic_write_json(path, committed.to_json())
            return committed
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)


def read_all_manifests(lake_root: str) -> list[Manifest]:
    mdir = _manifest_dir(lake_root)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in sorted(os.listdir(mdir)):
        if name.startswith("p-") and name.endswith(".json"):
            pid = int(name[2:-5])
            out.append(read_manifest(lake_root, pid))
    return out


# --- window lineage ----------------------------------------------------------


def windows_path(lake_root: str) -> str:
    return os.path.join(_manifest_dir(lake_root), "_windows.json")


def read_completed_windows(lake_root: str) -> list[dict]:
    path = windows_path(lake_root)
    if not os.path.exists(path):
        return []
    try:
        with open(path) as f:
            return json.load(f)["windows"]
    except (json.JSONDecodeError, KeyError, OSError) as e:
        raise ManifestReadError(f"unreadable window lineage {path}: {e}") from e


def append_completed_window(lake_root: str, window_id: str, end_us: int, stats: dict) -> None:
    """Best-effort append (lost updates between competing consumers are
    harmless — a missing entry just replays that window idempotently);
    duplicate entries from HA double-runs are skipped."""
    windows = read_completed_windows(lake_root)
    if any(w["window_id"] == window_id for w in windows):
        return
    windows.append({"window_id": window_id, "end_us": end_us, "stats": stats})
    _atomic_write_json(windows_path(lake_root), {"windows": windows})


def resume_watermark(lake_root: str) -> int:
    """Resume point in event-time microseconds: the end of the last fully
    committed window, or -inf sentinel (-1) for a fresh lake."""
    windows = read_completed_windows(lake_root)
    if not windows:
        return -1
    return max(w["end_us"] for w in windows)

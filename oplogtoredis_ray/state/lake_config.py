"""Lake-level layout metadata: persisted on first ingest, validated on every
later run.

The partition layout (num_partitions, hash_algo, key/payload columns,
state_mode) determines WHERE each conv_id's state lives.  Resuming the same
lake under a different layout would silently remap conv_id → partition and
fold events against the wrong prior state — duplicated/corrupted rows with
no error.  The reference avoids the whole class of bug by deriving layout
from one config source (lib/config/main.go); a lake that outlives processes
needs the layout pinned IN the lake, so any later invocation (CLI flags,
library defaults, a different host) either matches or fails fast.
"""

from __future__ import annotations

import fcntl
import json
import os
import tempfile

LAYOUT_FIELDS = ("num_partitions", "hash_algo", "payload_cols", "key_cols", "state_mode")


class LakeConfigError(RuntimeError):
    """This invocation's layout does not match the lake it targets."""


def lake_config_path(lake_root: str) -> str:
    return os.path.join(lake_root, "lake_config.json")


def layout_of(cfg) -> dict:
    out = {}
    for f in LAYOUT_FIELDS:
        v = getattr(cfg, f)
        out[f] = list(v) if isinstance(v, tuple) else v
    return out


def write_or_check_lake_config(lake_root: str, cfg) -> dict:
    """First ingest pins the layout; later ingests must match it exactly.

    Returns the pinned layout.  Raises LakeConfigError on any mismatch,
    naming every differing field (the fix is to pass the pinned values or
    ingest into a fresh lake)."""
    path = lake_config_path(lake_root)
    mine = layout_of(cfg)
    os.makedirs(lake_root, exist_ok=True)
    with open(os.path.join(lake_root, ".lake_config.lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            if not os.path.exists(path):
                fd, tmp = tempfile.mkstemp(dir=lake_root, suffix=".tmp")
                try:
                    with os.fdopen(fd, "w") as f:
                        json.dump(mine, f, separators=(",", ":"), sort_keys=True)
                        f.flush()
                        os.fsync(f.fileno())
                    os.replace(tmp, path)
                finally:
                    if os.path.exists(tmp):
                        os.unlink(tmp)
                return mine
            try:
                with open(path) as f:
                    pinned = json.load(f)
            except (json.JSONDecodeError, OSError) as e:
                raise LakeConfigError(f"unreadable lake config {path}: {e}") from e
            diffs = [
                f"{k}: lake={pinned.get(k)!r} invocation={mine[k]!r}"
                for k in LAYOUT_FIELDS
                if pinned.get(k) != mine[k]
            ]
            if diffs:
                raise LakeConfigError(
                    "partition-layout mismatch with existing lake "
                    f"{lake_root} — refusing to fold against wrong prior state: "
                    + "; ".join(diffs)
                )
            return pinned
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)

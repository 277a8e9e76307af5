"""Durable, runtime-mutable denylist store.

≙ the reference's denylist control plane: HTTP CRUD
(GET/PUT/DELETE /denylist[/:id], /root/reference/lib/denylist/http.go:22-144)
backed by write-through Postgres persistence
(/root/reference/lib/denylist/pg.go:32-79).  Here the durable medium is a
JSON file under the lake root, mutated atomically under an exclusive file
lock (the same discipline as manifest commits) so concurrent CLI mutations
and a running ingest never observe a torn file.  The ingest loop reloads
the store at every window boundary, so mutations take effect mid-session —
the batch analogue of the reference's runtime-toggle acceptance test
(integration-tests/acceptance/denylist_oplog_test.go:12-75).

On a shared object store the JSON file becomes a small versioned object
(conditional put); the per-window reload is one tiny read, never a shuffle.
"""

from __future__ import annotations

import fcntl
import json
import os
import tempfile


class DenylistError(RuntimeError):
    """Unreadable denylist file — fail closed, like manifests."""


def denylist_path(lake_root: str) -> str:
    return os.path.join(lake_root, "denylist.json")


def _atomic_write(path: str, entries: set[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump({"denylist": sorted(entries)}, f, separators=(",", ":"))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_denylist(lake_root: str) -> frozenset[str]:
    """Read the durable denylist (empty if never written).  Unreadable →
    raise: silently ingesting denied data is worse than stopping."""
    path = denylist_path(lake_root)
    if not os.path.exists(path):
        return frozenset()
    try:
        with open(path) as f:
            obj = json.load(f)
        return frozenset(str(x) for x in obj["denylist"])
    except (json.JSONDecodeError, KeyError, TypeError, OSError) as e:
        raise DenylistError(f"unreadable denylist {path}: {e}") from e


class DenylistStore:
    """CRUD over the durable denylist, one mutation per exclusive lock hold.

    Semantics mirror the reference HTTP API:

    - ``add``     ≙ PUT /denylist/:id — idempotent; returns True if newly
      added, False if already present (http.go:79-97 returns 200 either way).
    - ``remove``  ≙ DELETE /denylist/:id — the reference deliberately
      answers 204 (success) even for non-existent entries
      (http.go:120-133: deploy tooling needs absent-delete to succeed);
      ``remove`` returning False is that same no-op case.
    - ``entries`` ≙ GET /denylist — sorted id list (http.go:22-44).
    """

    def __init__(self, lake_root: str):
        self.lake_root = lake_root

    def _lock_path(self) -> str:
        return os.path.join(self.lake_root, ".denylist.lock")

    def _mutate(self, fn) -> bool:
        os.makedirs(self.lake_root, exist_ok=True)
        with open(self._lock_path(), "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                current = set(load_denylist(self.lake_root))
                changed, result = fn(current)
                if changed:
                    _atomic_write(denylist_path(self.lake_root), current)
                return result
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)

    def add(self, entry: str) -> bool:
        def _add(s: set[str]):
            if entry in s:
                return False, False
            s.add(entry)
            return True, True

        return self._mutate(_add)

    def remove(self, entry: str) -> bool:
        def _remove(s: set[str]):
            if entry not in s:
                return False, False
            s.discard(entry)
            return True, True

        return self._mutate(_remove)

    def entries(self) -> list[str]:
        return sorted(load_denylist(self.lake_root))

    def contains(self, entry: str) -> bool:
        return entry in load_denylist(self.lake_root)

"""Namespace parsing (≙ parseNamespace, /root/reference/lib/oplog/tail.go:769-779).

``"db.collection"`` → ``(database, collection)``; split on the *first* dot
only, so collection names may contain dots; no dot → empty collection.
"""

from __future__ import annotations


def parse_namespace(namespace: str) -> tuple[str, str]:
    parts = namespace.split(".", 1)
    database = parts[0]
    collection = parts[1] if len(parts) > 1 else ""
    return database, collection


def is_system_or_internal(database: str, collection: str) -> bool:
    """System/internal filter (≙ processor.go:34-43): index builds
    (``system.*`` collections) and the whole ``config`` database are never
    published."""
    return collection.startswith("system.") or database == "config"

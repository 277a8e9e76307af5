"""Transaction flattening (≙ parseRawOplogEntry, /root/reference/lib/oplog/tail.go:680-766).

One raw oplog entry → 0..N parsed entries:

- ``i``/``u``/``d`` → one entry; DocID from ``o2._id`` for updates, else
  ``o._id`` (tail.go:702-710); missing/empty id → drop (parseID,
  tail.go:590-601); ``tx_idx`` assigned from a shared monotonically
  increasing counter.
- ``c`` (command) on ``admin.$cmd`` with ``applyOps: [...]`` → recursively
  re-parse each inner op, propagating the *outer* ``(ts, wall)`` to every
  child; nested ``applyOps`` handled recursively (tail.go:714-761).
- ``c`` elsewhere / without applyOps (drop, createIndexes, …) and unknown
  ops → emit nothing.

Raw entries are plain dicts mirroring ``rawOplogEntry`` (tail.go:38-45):
``{"op", "ns", "ts": (t, i), "wall", "o", "o2"}``.

In the main transcript pipeline the event log already carries a materialized
``tx_idx`` column (applyOps happened upstream), so this kernel is exercised
by the parity unit tests and the ``tx_flatten`` query-demo; it is the
row-level semantic the vectorized explode implements.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from oplogtoredis_ray.functions.namespace import parse_namespace

ADMIN_CMD_NS = "admin.$cmd"


@dataclass
class ParsedEntry:
    """≙ oplogEntry (/root/reference/lib/oplog/oplogEntry.go:29-40)."""

    doc_id: Any
    ts: tuple[int, int]
    wall: Any
    data: dict | None
    op: str
    namespace: str
    database: str = ""
    collection: str = ""
    tx_idx: int = 0

    def __post_init__(self):
        if not self.database and self.namespace:
            self.database, self.collection = parse_namespace(self.namespace)


@dataclass
class _Counter:
    value: int = 0


def _parse_id(doc: dict | None) -> Any:
    if not isinstance(doc, dict):
        return None
    doc_id = doc.get("_id")
    if doc_id is None or doc_id == "":
        return None
    return doc_id


def flatten_raw_entry(
    raw: dict,
    _tx: "_Counter | None" = None,
    denylist: frozenset[str] = frozenset(),
) -> list[ParsedEntry]:
    """Flatten one raw entry (possibly a transaction) to parsed entries.

    The denylist is applied to inner entries the way the reference applies it
    in ``unmarshalEntryMetadata`` (tail.go:619-627): by database name, with
    ``admin.$cmd`` exempt so transactions are still unpacked.
    """
    if _tx is None:
        _tx = _Counter()

    ns = raw.get("ns", "") or ""
    if ns and ns != ADMIN_CMD_NS and denylist:
        db, _ = parse_namespace(ns)
        if db in denylist:
            return []

    op = raw.get("op")
    if op in ("i", "u", "d"):
        data = raw.get("o")
        # the reference consumes the tx index BEFORE the _id parse can fail
        # (tail.go parseRawOplogEntry): a dropped missing-_id inner op still
        # shifts subsequent ops' tx_idx, keeping (ts, seq, tx_idx) identity
        # bit-parity for transactions containing such an op
        my_idx = _tx.value
        _tx.value += 1
        doc_id = _parse_id(raw.get("o2") if op == "u" else raw.get("o"))
        if doc_id is None:
            return []
        entry = ParsedEntry(
            doc_id=doc_id,
            ts=tuple(raw.get("ts", (0, 0))),
            wall=raw.get("wall"),
            data=data,
            op=op,
            namespace=ns,
            tx_idx=my_idx,
        )
        return [entry]

    if op == "c":
        if ns != ADMIN_CMD_NS:
            return []
        doc = raw.get("o")
        if not isinstance(doc, dict) or "applyOps" not in doc:
            return []
        apply_ops = doc["applyOps"]
        if not isinstance(apply_ops, list):
            return []
        out: list[ParsedEntry] = []
        for inner in apply_ops:
            if not isinstance(inner, dict):
                continue
            child = dict(inner)
            # children inherit the outer (ts, wall) — tail.go:748-750
            child["ts"] = raw.get("ts", (0, 0))
            child["wall"] = raw.get("wall")
            out.extend(flatten_raw_entry(child, _tx, denylist))
        return out

    return []

"""Document-id normalization (≙ /root/reference/lib/oplog/processor.go:45-66).

The reference supports exactly two id types: ``string`` (passthrough) and
``primitive.ObjectID`` (hex for the channel; ``{"$type":"oid","$value":hex}``
for the message).  Anything else is a per-event error
(``ErrUnsupportedDocIDType``, processor.go:16).

In the transcript payload the row key is ``(conv_id: string, turn_idx:
int32)``; the parse stage performs key-column null/type validation and builds
``doc_id = str(turn_idx)`` — a documented deviation (ints are first-class
keys here).  This module keeps bit-parity with the reference for the generic
case and its tests.
"""

from __future__ import annotations

from typing import Any


class UnsupportedDocIDType(TypeError):
    """≙ ErrUnsupportedDocIDType (processor.go:16)."""


class ObjectID:
    """Minimal stand-in for a BSON ObjectID: 12 opaque bytes."""

    __slots__ = ("value",)

    def __init__(self, value: bytes):
        if not isinstance(value, bytes) or len(value) != 12:
            raise ValueError("ObjectID must be 12 bytes")
        self.value = value

    def hex(self) -> str:
        return self.value.hex()

    def __eq__(self, other: object) -> bool:
        return isinstance(other, ObjectID) and other.value == self.value

    def __hash__(self) -> int:
        return hash(self.value)

    def __repr__(self) -> str:
        return f"ObjectID({self.hex()})"


def normalize_doc_id(doc_id: Any) -> tuple[str, Any]:
    """Return ``(id_for_channel, id_for_message)`` (processor.go:48-66)."""
    if isinstance(doc_id, str):
        return doc_id, doc_id
    if isinstance(doc_id, ObjectID):
        h = doc_id.hex()
        return h, {"$type": "oid", "$value": h}
    raise UnsupportedDocIDType(
        f"expected string or ObjectID, got {type(doc_id).__name__} instead"
    )


def event_name_for_operation(op: str) -> str:
    """Output event name: ``d`` → ``r`` (removed); else passthrough
    (processor.go:119-124)."""
    return "r" if op == "d" else op

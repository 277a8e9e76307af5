"""Optime codec — (T seconds, I ordinal) ⇄ base-10 uint64 string.

Parity with the reference's Mongo-timestamp encoding
(/root/reference/lib/redispub/mongoTimestampEncoding.go:14-32):
``encode((T, I)) = str(T<<32 | I)``.  The pair is "*both* a monotonically
increasing timestamp *and* a unique identifier"
(lib/redispub/publication.go:19-21); our engine generalizes it to the triple
``(ts_us:int64, seq:int32, tx_idx:int32)`` used as the event identity / dedup
key (≙ lib/redispub/publisher.go:315-317), carried in manifests as a JSON
list — this codec remains for wire/string compatibility and tests.
"""

from __future__ import annotations

_U32 = 0xFFFFFFFF


def encode_optime(t: int, i: int) -> str:
    """(T, I) → base-10 string of ``T<<32 | I`` (mongoTimestampEncoding.go:14-16)."""
    if not (0 <= t <= _U32 and 0 <= i <= _U32):
        raise ValueError(f"optime components must be uint32, got ({t}, {i})")
    return str((t << 32) | i)


def decode_optime(s: str) -> tuple[int, int]:
    """Base-10 uint64 string → (T, I) (mongoTimestampEncoding.go:19-27)."""
    v = int(s, 10)
    if not (0 <= v <= 0xFFFFFFFFFFFFFFFF):
        raise ValueError(f"encoded optime out of uint64 range: {s}")
    return (v >> 32) & _U32, v & _U32


def optime_to_unix_seconds(t: int, i: int) -> int:
    """Wall-clock seconds of an optime (mongoTimestampEncoding.go:30-32)."""
    return t

"""Partition / shard hashing.

The reference's ordering unit is the database name: ``ParallelismKey =
int64(little-endian(last 8 bytes of sha256(database)))`` (signed wrap)
(/root/reference/lib/oplog/processor.go:89-96), and shard assignment is the
negative-safe modulo ``(k%n + n) % n`` (lib/oplog/tail.go:781-788).

Our ordering unit is ``conv_id``.  Two hash variants:

- ``parallelism_key``  — bit-exact parity with the reference (signed int64,
  little-endian last 8 bytes), pinned by the reference's own test constant
  ``fooHash = -5843589418109203719`` (processor_test.go:18-19).
- ``partition_key_u64`` — the engine's canonical key: unsigned big-endian
  *first* 8 bytes of sha256, chosen because it is also expressible in ANSI
  SQL (``('0x' || substr(sha256(x),1,16))::UBIGINT``) so the driver's DuckDB
  oracle can verify partition assignment bit-for-bit.

Both are stable across runs, processes and cluster sizes — the partition →
lake-state mapping must never depend on cluster topology.
"""

from __future__ import annotations

import hashlib

import numpy as np


def parallelism_key(name: str) -> int:
    """Reference-parity signed key (processor.go:89-96)."""
    digest = hashlib.sha256(name.encode("utf-8")).digest()
    return int.from_bytes(digest[-8:], "little", signed=True)


def partition_key_u64(name: str) -> int:
    """Engine-canonical unsigned key: big-endian first 8 bytes of sha256."""
    digest = hashlib.sha256(name.encode("utf-8")).digest()
    return int.from_bytes(digest[:8], "big", signed=False)


def assign_to_shard(key: int, shard_count: int) -> int:
    """Negative-safe modulo (≙ assignToShard, tail.go:786-788)."""
    return (key % shard_count + shard_count) % shard_count


def partition_id_for(name: str, num_partitions: int) -> int:
    return assign_to_shard(partition_key_u64(name), num_partitions)


_POLY_BASE = np.uint64(1000003)
_POLY_SEED = np.uint64(1469598103934665603)
_MAXLEN = 4096


def _poly_powers() -> np.ndarray:
    with np.errstate(over="ignore"):
        p = np.full(_MAXLEN, _POLY_BASE, dtype=np.uint64)
        p[0] = np.uint64(1)
        return np.cumprod(p)


_POWS = _poly_powers()


def poly_hash_strings(arr) -> np.ndarray:
    """Vectorized 64-bit polynomial hash of an Arrow string array — operates
    directly on the offsets/data buffers, no per-row Python.  This is the
    pipeline's default partition hash (stable, deterministic, orders of
    magnitude faster than per-string sha256); sha256 remains available as
    the reference-parity / SQL-verifiable variant."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.string())
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32, count=len(arr) + 1 + arr.offset)
    offsets = offsets[arr.offset:]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts = offsets[:-1].astype(np.int64)
    ends = offsets[1:].astype(np.int64)
    lens = ends - starts
    total = int(ends[-1] - starts[0]) if len(starts) else 0
    if total == 0:
        # all-empty batch: identical to the empty-string value on the main
        # path (seed through the same finalizer) so hashing is independent
        # of batch composition
        h = np.full(len(arr), _POLY_SEED, dtype=np.uint64)
        with np.errstate(over="ignore"):
            h ^= h >> np.uint64(33)
            h *= np.uint64(0xFF51AFD7ED558CCD)
            h ^= h >> np.uint64(33)
        return h
    base = starts[0]
    # flat positions of every byte, grouped by string
    seg_starts = (starts - base).astype(np.int64)
    rep_lens = lens
    flat_idx = np.arange(total, dtype=np.int64) + base
    pos_in_str = np.arange(total, dtype=np.int64) - np.repeat(seg_starts, rep_lens)
    L_r = np.repeat(lens, rep_lens)
    with np.errstate(over="ignore"):
        terms = data[flat_idx].astype(np.uint64) * _POWS[np.minimum(L_r - 1 - pos_in_str, _MAXLEN - 1)]
        # reduceat needs strictly valid starts; empty strings handled after
        nonempty = lens > 0
        red_starts = seg_starts[nonempty]
        sums = np.add.reduceat(terms, red_starts) if len(red_starts) else np.empty(0, np.uint64)
        h = np.full(len(arr), _POLY_SEED, dtype=np.uint64)
        h[nonempty] = sums + _POLY_SEED * _POWS[np.minimum(lens[nonempty], _MAXLEN - 1)]
        # splitmix-style finalizer
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
    return h


def poly_partition_ids(arr, num_partitions: int) -> np.ndarray:
    """Fast vectorized partition assignment over an Arrow string array;
    null entries get partition -1.

    Hashes the *dictionary* (unique values) and broadcasts through the
    codes: Arrow's C++ encoder does the per-row hashing, and the NumPy
    polynomial hash touches only uniques-sized temporaries (large per-call
    allocations page-fault badly under worker concurrency — measured)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    dict_arr = pc.dictionary_encode(arr)
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    uniq = dict_arr.dictionary
    h = poly_hash_strings(pc.fill_null(uniq, ""))
    lut = (h % np.uint64(num_partitions)).astype(np.int32)
    if uniq.null_count:
        lut[~pc.is_valid(uniq).to_numpy(zero_copy_only=False)] = -1
    codes = dict_arr.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
    out = np.full(len(arr), -1, dtype=np.int32)
    valid = codes >= 0
    out[valid] = lut[codes[valid]]
    return out


def partition_ids_for_array(values, num_partitions: int) -> np.ndarray:
    """Vectorized partition assignment for an Arrow/NumPy array of strings.

    sha256 is not a NumPy kernel, so we hash each *unique* value once and
    broadcast through the dictionary codes — at CDC scale the number of
    distinct conv_ids per batch is far below the row count, so the Python
    loop runs over uniques only.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        dict_arr = pc.dictionary_encode(values)
        if isinstance(dict_arr, pa.ChunkedArray):
            dict_arr = dict_arr.combine_chunks()
        uniques = dict_arr.dictionary.to_pylist()
        codes = dict_arr.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        arr = np.asarray(values)
        uniques_np, codes = np.unique(arr, return_inverse=True)
        uniques = uniques_np.tolist()
    lut = np.fromiter(
        (partition_id_for(u, num_partitions) if u is not None else -1 for u in uniques),
        dtype=np.int32,
        count=len(uniques),
    )
    codes = np.asarray(codes)
    out = np.full(codes.shape, -1, dtype=np.int32)
    valid = codes >= 0
    out[valid] = lut[codes[valid]]
    return out

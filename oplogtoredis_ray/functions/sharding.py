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

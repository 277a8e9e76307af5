"""Parse/normalize stage — M1-M9 as one vectorized Arrow batch transform.

≙ the reference chain unmarshalEntryMetadata → denylist → parseRawOplogEntry
→ processOplogEntry (/root/reference/lib/oplog/tail.go:606-677, 619-627,
680-766; lib/oplog/processor.go:23-117), collapsed into a single zero-copy
``map_batches(ParseStage, batch_format="pyarrow")`` stage:

- envelope validation (M1): op ∈ {i,u,d}; non-null conv_id / turn_idx / ts;
  malformed rows → dead-letter side output with a reason (M10), never a
  crash (the reference drops + logs per entry — tail.go:442-507)
- denylist filter (M2): broadcast frozenset membership on conv_id
- changed-fields (M7 analog on the transcript payload): for ``u`` the named
  non-null payload columns; for ``i`` all present columns; for ``d`` empty
  (lib/oplog/processor_test.go:143-167)
- partition assignment (P1/P2): stable sha256-based hash of conv_id mod P

ParseStage is a callable class so it can run as an actor pool
(``map_batches(ParseStage(cfg), concurrency=N)``) with per-actor setup done
once in ``__init__``.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from oplogtoredis_ray.config import PipelineConfig
from oplogtoredis_ray.functions.sharding import partition_ids_for_array

VALID_OPS = ("i", "u", "d")


def _changed_fields_list(
    table: pa.Table, op: np.ndarray, payload_cols: tuple[str, ...]
) -> pa.ListArray:
    """Vectorized list<string> of changed field names per row: the non-null
    payload columns for i/u, empty for d (the "f" array of the message
    contract, processor.go:25-32)."""
    n = len(table)
    masks = np.zeros((n, len(payload_cols)), dtype=bool)
    iu = (op == "i") | (op == "u")
    for k, c in enumerate(payload_cols):
        if c in table.column_names:
            valid = pc.is_valid(table[c]).to_numpy(zero_copy_only=False)
            masks[:, k] = valid & iu
    rows, cols = np.nonzero(masks)  # row-major → values already row-grouped
    counts = masks.sum(axis=1)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    names = np.array(payload_cols, dtype=object)
    values = pa.array(names[cols], type=pa.string())
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), values)


class ParseStage:
    """Vectorized parse/normalize; emits the parsed-event schema plus
    ``changed_fields`` and ``partition_id``; bad rows go to the dead-letter
    directory as Parquet with a ``reason`` column."""

    def __init__(
        self,
        cfg: PipelineConfig,
        deadletter_dir: str | None = None,
        emit_changed_fields: bool = True,
        deny_counter=None,
    ):
        self.cfg = cfg
        self.deadletter_dir = deadletter_dir
        self.deny: frozenset[str] = cfg.denylist
        # optional counter-actor handle (state/counters.py): per-database
        # denylist-filtered counts ≙ tail.go:109-114.  Fire-and-forget, one
        # call per batch that dropped rows.
        self.deny_counter = deny_counter
        self.payload_cols = tuple(cfg.payload_cols)
        # the lake-apply path derives set-fields from the non-null pattern
        # directly, so the ingest pipeline skips building/shuffling the
        # changed_fields list column (the message contract still gets it)
        self.emit_changed_fields = emit_changed_fields
        # per-actor partition-hash memo: conv ids recur across batches, so the
        # sha256 is paid once per conv per actor, not once per conv per batch
        self._pid_cache: dict[str, int] = {}
        # (a route_actors presort hook lived here through round 4; it
        # measured NEUTRAL — the accept-side serialization copies the slice
        # regardless — and no shipped path used it, so it was dropped.
        # Rationale recorded in DESIGN.md "measured and rejected".)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return self._finalize(batch)

        op_valid = pc.is_in(batch["op"], value_set=pa.array(VALID_OPS))
        key_valid = pc.and_(
            pc.is_valid(batch["conv_id"]),
            # non-null AND non-negative: the merge packs turn_idx into the
            # low 32 bits of the key code
            pc.fill_null(pc.greater_equal(batch["turn_idx"], 0), False),
        )
        ts_valid = pc.is_valid(batch["ts"])
        ok = pc.and_(pc.and_(pc.fill_null(op_valid, False), key_valid), ts_valid)
        ok_np = ok.to_numpy(zero_copy_only=False)

        if not ok_np.all():
            bad = batch.filter(pc.invert(ok))
            self._dead_letter(bad)
            batch = batch.filter(ok)

        if self.deny:
            denied = pc.is_in(
                batch["conv_id"], value_set=pa.array(sorted(self.deny))
            )
            keep = pc.invert(pc.fill_null(denied, False))
            if self.deny_counter is not None:
                dropped = batch.filter(pc.fill_null(denied, False))
                if len(dropped):
                    vc = pc.value_counts(dropped["conv_id"].combine_chunks()
                                         if isinstance(dropped["conv_id"], pa.ChunkedArray)
                                         else dropped["conv_id"])
                    import ray as _ray

                    # blocking get: when this parse task completes, its
                    # increments are durable in the actor — the driver's
                    # end-of-run snapshot (which waits on all tasks) then
                    # can't race in-flight adds.  Paid only on batches that
                    # actually dropped rows.
                    _ray.get(
                        self.deny_counter.add.remote(
                            {
                                str(v["values"]): int(v["counts"])
                                for v in vc.to_pylist()
                            }
                        )
                    )
            batch = batch.filter(keep)

        return self._finalize(batch)

    def _spec_fields(self, batch: pa.Table) -> pa.ListArray | None:
        """Optional M7/M8 path: when the log carries a raw ``update_spec``
        JSON column (a Mongo-style update document — ``$set``/``$unset`` v1
        or ``{$v:2, diff:{...}}`` v2), changed fields come from the golden
        kernel (mode ≙ OTR_OPLOG_V2_EXTRACT_SUBFIELD_CHANGES).  Rows without
        a spec fall back to the non-null payload pattern.  Per-row Python by
        nature — exactly as in the reference (processor.go:73-117)."""
        if "update_spec" not in batch.column_names:
            return None
        import json as _json

        from oplogtoredis_ray.functions.changed_fields import (
            ChangedFieldsError,
            changed_fields,
        )

        ops = batch["op"].to_pylist()
        specs = batch["update_spec"].to_pylist()
        out: list[list[str] | None] = []
        for op, spec in zip(ops, specs):
            if spec is None:
                out.append(None)
                continue
            try:
                out.append(changed_fields(op, _json.loads(spec), v2_deep=self.cfg.v2_deep))
            except (ChangedFieldsError, ValueError):
                out.append([])  # unprocessable spec → empty fields + metric
        return out

    def _finalize(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        for c in self.payload_cols:
            if c not in batch.column_names:
                batch = batch.append_column(c, pa.nulls(n, pa.string()))
        if n == 0:
            if self.emit_changed_fields:
                batch = batch.append_column(
                    "changed_fields", pa.array([], type=pa.list_(pa.string()))
                )
            batch = batch.append_column("partition_id", pa.array([], type=pa.int32()))
        else:
            if self.emit_changed_fields:
                op = batch["op"].to_numpy(zero_copy_only=False)
                cf = _changed_fields_list(batch, op, self.payload_cols)
                spec_fields = self._spec_fields(batch)
                if spec_fields is not None:
                    merged = [
                        sf if sf is not None else pat
                        for sf, pat in zip(spec_fields, cf.to_pylist())
                    ]
                    cf = pa.array(merged, type=pa.list_(pa.string()))
                batch = batch.append_column("changed_fields", cf)
            pids = self._partition_ids(batch["conv_id"])
            batch = batch.append_column("partition_id", pa.array(pids, type=pa.int32()))
        # canonical column order so unioned mixed-schema fragments line up
        order = [
            c
            for c in ("ts", "seq", "tx_idx", "op", "conv_id", "turn_idx")
            if c in batch.column_names
        ]
        order += [c for c in self.payload_cols if c in batch.column_names]
        if self.emit_changed_fields:
            order.append("changed_fields")
        order.append("partition_id")
        batch = batch.select(order)
        return batch

    def _partition_ids(self, conv: pa.ChunkedArray | pa.Array) -> np.ndarray:
        """Vectorized partition assignment; poly64 operates on the Arrow
        string buffers directly, sha256 (reference parity) is memoized per
        unique conv id."""
        import pyarrow.compute as _pc

        from oplogtoredis_ray.functions.sharding import (
            partition_id_for,
            poly_partition_ids,
        )

        if self.cfg.hash_algo == "poly64":
            return poly_partition_ids(conv, self.cfg.num_partitions)

        dict_arr = _pc.dictionary_encode(conv)
        if isinstance(dict_arr, pa.ChunkedArray):
            dict_arr = dict_arr.combine_chunks()
        uniques = dict_arr.dictionary.to_pylist()
        cache = self._pid_cache
        P = self.cfg.num_partitions
        lut = np.empty(len(uniques), dtype=np.int32)
        for i, u in enumerate(uniques):
            pid = cache.get(u)
            if pid is None:
                pid = partition_id_for(u, P) if u is not None else -1
                cache[u] = pid
            lut[i] = pid
        codes = dict_arr.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        out = np.full(codes.shape, -1, dtype=np.int32)
        valid = codes >= 0
        out[valid] = lut[codes[valid]]
        return out

    def _dead_letter(self, bad: pa.Table) -> None:
        if self.deadletter_dir is None or len(bad) == 0:
            return
        reasons = []
        op = bad["op"].to_pylist()
        conv = bad["conv_id"].to_pylist()
        turn = bad["turn_idx"].to_pylist()
        ts = bad["ts"].to_pylist()
        for o, c, t, s in zip(op, conv, turn, ts):
            if o not in VALID_OPS:
                reasons.append(f"invalid op: {o!r}")
            elif c is None or t is None:
                reasons.append("missing key column")
            elif s is None:
                reasons.append("missing ts")
            else:
                reasons.append("malformed")
        bad = bad.append_column("reason", pa.array(reasons, type=pa.string()))
        os.makedirs(self.deadletter_dir, exist_ok=True)
        import pyarrow.parquet as pq

        pq.write_table(
            bad, os.path.join(self.deadletter_dir, f"dl-{uuid.uuid4().hex}.parquet")
        )


def to_change_records(batch: pa.Table, num_partitions: int = 32) -> pa.Table:
    """Project parsed events to the canonical change-record contract (≙
    Publication, F3 in FIXTURES.md): channel = conv_id, second channel
    conv_id::turn_idx derivable; event name maps d→r (processor.go:119-124);
    doc_id is the stringified row key."""
    event = pc.replace_substring_regex(batch["op"], "^d$", "r")
    doc_id = pc.cast(batch["turn_idx"], pa.string())
    channel2 = pc.binary_join_element_wise(batch["conv_id"], doc_id, "::")
    out = pa.table(
        {
            "channel": batch["conv_id"],
            "channel_doc": channel2,
            "event": event,
            "doc_id": doc_id,
            "fields": batch["changed_fields"],
            "ts": batch["ts"],
            "seq": batch["seq"],
            "tx_idx": batch["tx_idx"],
            "partition_id": batch["partition_id"],
        }
    )
    return out

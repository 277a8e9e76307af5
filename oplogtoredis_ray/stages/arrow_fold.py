"""Arrow-native fold + state merge — the hot path of the apply stage.

Same semantics as stages/fold.py (the pandas reference implementation,
cross-checked in tests), but event-scale data never leaves Arrow/NumPy:

- ordering/dedup/watermark work on int64 views of (ts, seq, tx_idx)
- per-key grouping via dictionary codes (strings are hashed once by Arrow's
  dictionary encoder, never boxed into Python objects)
- folded values are *take indices* into the original Arrow columns; only the
  partition state (orders of magnitude smaller than the window's events)
  round-trips through NumPy object arrays during the merge.

This matters: Ray's block→pandas conversion boxes every string, which
profiled at ~3-4× the cost of the fold itself on transcript payloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PAYLOAD = ("role", "text", "tool")
_NEG = np.int64(-1)


def _int64(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def order_dedup_filter(
    t: pa.Table, watermark: tuple[int, int, int]
) -> tuple[pa.Table, int, int]:
    """Sort by (ts, seq, tx_idx), drop exact duplicate *replays* (same
    identity AND same key, keep first) and identities ≤ watermark.
    Returns (table, dupes, below).

    A distinct key sharing an identity triple (corrupt upstream sequencing)
    is kept, not silently swallowed — the reference's Lua dedup would have
    dropped it; we deviate on the side of not losing data, and the sort
    includes the key code so the outcome is deterministic regardless of
    file/block arrival order."""
    ts = _int64(t["ts"])
    seq = _int64(t["seq"])
    tx = _int64(t["tx_idx"])
    kid, _ = _key_codes(t)
    order = np.lexsort((kid, tx, seq, ts))
    ts, seq, tx, kid_s = ts[order], seq[order], tx[order], kid[order]
    same = np.zeros(len(ts), dtype=bool)
    if len(ts) > 1:
        same[1:] = (
            (np.diff(ts) == 0)
            & (np.diff(seq) == 0)
            & (np.diff(tx) == 0)
            & (np.diff(kid_s) == 0)
        )
    dupes = int(same.sum())
    wts, wseq, wtx = watermark
    above = (ts > wts) | ((ts == wts) & ((seq > wseq) | ((seq == wseq) & (tx > wtx))))
    keep = ~same & above
    below = int(len(ts) - dupes - keep.sum())
    idx = order[keep]
    return t.take(pa.array(idx, type=pa.int64())), dupes, below


def _key_codes(t: pa.Table) -> tuple[np.ndarray, int]:
    """Dense combined key ids for (conv_id, turn_idx) without boxing."""
    conv = t["conv_id"]
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    dict_arr = pc.dictionary_encode(conv)
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    conv_codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    turn = _int64(t["turn_idx"])
    combined = conv_codes * (np.int64(1) << 32) | (turn & 0xFFFFFFFF)
    return combined, len(dict_arr.dictionary)


class FoldResult:
    """Columnar fold output: one entry per key, all NumPy/Arrow."""

    __slots__ = (
        "table", "outcome", "last_pos", "value_pos", "row_ts", "keys",
        "n_deletes", "n_upserts", "n_patches",
    )

    def __init__(self, table, outcome, last_pos, value_pos, row_ts, keys):
        self.table = table            # deduped sorted events (arrow)
        self.outcome = outcome        # int8: 0=delete 1=upsert 2=patch
        self.last_pos = last_pos      # per-key last event row index
        self.value_pos = value_pos    # {col: int64 row index or -1}
        self.row_ts = row_ts
        self.keys = keys              # combined int64 key codes (per key)
        self.n_deletes = int((outcome == 0).sum())
        self.n_upserts = int((outcome == 1).sum())
        self.n_patches = int((outcome == 2).sum())

    def take_col(self, col: str) -> pa.Array:
        """Folded values for a payload column (null where not set)."""
        idx = self.value_pos[col]
        indices = pa.array(
            np.where(idx >= 0, idx, 0), type=pa.int64(), mask=idx < 0
        )
        source = self.table[col]
        if isinstance(source, pa.ChunkedArray):
            source = source.combine_chunks()
        return source.take(indices)

    def key_col(self, name: str) -> pa.Array:
        source = self.table[name]
        if isinstance(source, pa.ChunkedArray):
            source = source.combine_chunks()
        return source.take(pa.array(self.last_pos, type=pa.int64()))


def fold_arrow(t: pa.Table, payload_cols: tuple[str, ...] = PAYLOAD) -> FoldResult:
    """Fold a sorted/deduped event table to per-key outcomes (arrow-native).

    Semantics identical to stages.fold.fold_events (tested against it):
    delete if the last lifecycle op is d; upsert if an insert opens the
    final generation; else patch.  Values = last set (non-null i/u) at
    position ≥ the final generation start.
    """
    n = len(t)
    kid, _ = _key_codes(t)
    order = np.argsort(kid, kind="stable")
    kid_sorted = kid[order]
    seg_starts = np.flatnonzero(
        np.concatenate([[True], kid_sorted[1:] != kid_sorted[:-1]])
    )
    rep_counts = np.diff(np.concatenate([seg_starts, [n]]))
    pos = np.arange(n, dtype=np.int64)

    op = t["op"]
    if isinstance(op, pa.ChunkedArray):
        op = op.combine_chunks()
    is_i = pc.equal(op, "i").to_numpy(zero_copy_only=False)
    is_d = pc.equal(op, "d").to_numpy(zero_copy_only=False)
    is_iu = is_i | pc.equal(op, "u").to_numpy(zero_copy_only=False)

    def seg_max(values: np.ndarray) -> np.ndarray:
        return np.maximum.reduceat(values[order], seg_starts)

    li = seg_max(np.where(is_i, pos, _NEG))
    ld = seg_max(np.where(is_d, pos, _NEG))
    start = np.maximum(li, ld)
    inv = np.empty(n, dtype=np.int64)
    inv[order] = np.arange(n)
    start_r = np.repeat(start, rep_counts)[inv]

    outcome = np.where(ld > li, np.int8(0), np.where(li >= 0, np.int8(1), np.int8(2)))

    eligible = is_iu & (pos >= start_r)
    value_pos: dict[str, np.ndarray] = {}
    for c in payload_cols:
        if c in t.column_names:
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            present = pc.is_valid(col).to_numpy(zero_copy_only=False)
        else:
            present = np.zeros(n, dtype=bool)
        value_pos[c] = seg_max(np.where(eligible & present, pos, _NEG))

    last_pos = seg_max(pos)
    ts = _int64(t["ts"])
    last_applied = seg_max(np.where(eligible, pos, _NEG))
    row_ts = np.where(last_applied >= 0, ts[np.maximum(last_applied, 0)], np.int64(0))
    row_ts = np.where(outcome == 0, ts[last_pos], row_ts)
    keys = kid_sorted[seg_starts]
    return FoldResult(t, outcome, last_pos, value_pos, row_ts, keys)


def fold_arrow_chunked(
    t: pa.Table,
    payload_cols: tuple[str, ...] = PAYLOAD,
    num_chunks: int = 16,
) -> FoldResult:
    """Deterministic salted fold: fold ts-contiguous slices, re-fold their
    pseudo-events in salt order (fold is associative over ordered chunks)."""
    n = len(t)
    if num_chunks <= 1 or n == 0:
        return fold_arrow(t, payload_cols)
    bounds = np.linspace(0, n, num_chunks + 1, dtype=np.int64)
    pseudo_parts = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        if b > a:
            part = fold_arrow(t.slice(a, b - a), payload_cols)
            pseudo_parts.append(_pseudo_events(part, payload_cols))
    pseudo = pa.concat_tables(pseudo_parts, promote_options="permissive")
    # chunks are position-ordered → per-key pseudo rows are already in order;
    # a global stable identity sort restores the triple ordering
    pseudo, _, _ = order_dedup_filter(pseudo, (-1 << 62, -1, -1))
    return fold_arrow(pseudo, payload_cols)


def pseudo_events_table(
    fr: FoldResult, payload_cols: tuple[str, ...] = PAYLOAD
) -> pa.Table:
    """Public alias: a fold result as replayable pseudo-events — also the
    delta-file format of the ``state_mode="delta"`` lake layout."""
    return _pseudo_events(fr, payload_cols)


def state_rows_to_pseudo(
    state: pa.Table, payload_cols: tuple[str, ...] = PAYLOAD
) -> pa.Table:
    """A compacted state table as pseudo insert events ordered BEFORE any
    later delta: identity (row_ts, -1, -1) sorts under every real event of
    the same key (real seq/tx are ≥ 0 and delta triples exceed the
    compaction watermark)."""
    n = len(state)
    cols = {
        "ts": pa.array(_int64(state["ts"]), type=pa.int64()),
        "seq": pa.array(np.full(n, -1, dtype=np.int64)),
        "tx_idx": pa.array(np.full(n, -1, dtype=np.int64)),
        "op": pa.array(np.full(n, "i", dtype=object), type=pa.string()),
        "conv_id": state["conv_id"].combine_chunks()
        if isinstance(state["conv_id"], pa.ChunkedArray)
        else state["conv_id"],
        "turn_idx": state["turn_idx"].combine_chunks()
        if isinstance(state["turn_idx"], pa.ChunkedArray)
        else state["turn_idx"],
    }
    for c in payload_cols:
        col = state[c]
        cols[c] = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return pa.table(cols)


def merge_chain(
    tables: list[pa.Table], payload_cols: tuple[str, ...] = PAYLOAD
) -> pa.Table:
    """Merge-on-read of a state-file chain (compacted bases are tables
    without an ``op`` column; deltas are pseudo-event tables).  The fold
    algebra makes this exact: refold the concatenated pseudo events."""
    from oplogtoredis_ray.state.lake import empty_state_table

    if not tables:
        return empty_state_table(payload_cols)
    parts = []
    for t in tables:
        if "op" not in t.column_names:
            t = state_rows_to_pseudo(t, payload_cols)
        # uniform identity types across bases (int64) and deltas (source types)
        cols = {"ts": pc.cast(t["ts"], pa.int64()),
                "seq": pc.cast(t["seq"], pa.int64()),
                "tx_idx": pc.cast(t["tx_idx"], pa.int64())}
        for name in t.column_names:
            if name not in cols:
                cols[name] = t[name]
        parts.append(pa.table(cols))
    evs = pa.concat_tables(parts, promote_options="permissive")
    if len(evs) == 0:
        return empty_state_table(payload_cols)
    g, _, _ = order_dedup_filter(evs, (-(1 << 62), -(1 << 31), -(1 << 31)))
    fr = fold_arrow(g, payload_cols)
    state, _ = merge_into_state(empty_state_table(payload_cols), fr, payload_cols)
    return state


def merge_deltas(
    tables: list[pa.Table], payload_cols: tuple[str, ...] = PAYLOAD
) -> pa.Table:
    """Fold a CONTIGUOUS run of delta (pseudo-event) tables into ONE
    equivalent delta — the leveled-compaction kernel.  Sound by the fold's
    chunk associativity (stages/fold.py module docstring): re-folding the
    concatenated pseudo-events of ordered chunks equals folding the whole
    slice, so replacing ``[d_i..d_j]`` with ``merge_deltas([d_i..d_j])``
    anywhere inside a chain leaves ``merge_chain`` of that chain unchanged.
    Unlike ``merge_chain`` this keeps the result AS pseudo-events (patches
    stay patches — they can only resolve against the base at read time)."""
    parts = []
    for t in tables:
        if "op" not in t.column_names:
            raise ValueError(
                "merge_deltas merges delta links only; a base/state link "
                "must stay at the chain head (use merge_chain for a full "
                "rewrite)"
            )
        cols = {
            "ts": pc.cast(t["ts"], pa.int64()),
            "seq": pc.cast(t["seq"], pa.int64()),
            "tx_idx": pc.cast(t["tx_idx"], pa.int64()),
        }
        for name in t.column_names:
            if name not in cols:
                cols[name] = t[name]
        # null-fill configured payload columns a pre-evolution link lacks
        # (same per-link rule merge_partition_chain applies): the fold
        # kernels index table[c] directly
        for c in payload_cols:
            if c not in cols:
                cols[c] = pa.nulls(len(t), pa.string())
        parts.append(pa.table(cols))
    evs = pa.concat_tables(parts, promote_options="permissive")
    if len(evs) == 0:
        return evs
    g, _, _ = order_dedup_filter(evs, (-(1 << 62), -(1 << 31), -(1 << 31)))
    fr = fold_arrow(g, payload_cols)
    return _pseudo_events(fr, payload_cols)


def _pseudo_events(fr: FoldResult, payload_cols: tuple[str, ...]) -> pa.Table:
    op = np.full(len(fr.outcome), "u", dtype=object)
    op[fr.outcome == 0] = "d"
    op[fr.outcome == 1] = "i"
    cols = {
        "ts": pa.array(
            _int64(fr.key_col("ts")), type=fr.table.schema.field("ts").type
        ),
        "seq": fr.key_col("seq"),
        "tx_idx": fr.key_col("tx_idx"),
        "op": pa.array(op, type=pa.string()),
        "conv_id": fr.key_col("conv_id"),
        "turn_idx": fr.key_col("turn_idx"),
    }
    for c in payload_cols:
        cols[c] = fr.take_col(c)
    return pa.table(cols)


def merge_into_state(
    state: pa.Table,
    fr: FoldResult,
    payload_cols: tuple[str, ...] = PAYLOAD,
) -> tuple[pa.Table, dict]:
    """Apply a fold result to the partition state table.

    Returns (new_state sorted by key, stats).  Patch on a missing key is a
    counted no-op.  Only state-sized data is materialized to NumPy.
    """
    stats = {
        "deletes": fr.n_deletes,
        "upserts": fr.n_upserts,
        "patches": 0,
        "patch_misses": 0,
    }
    ns = len(state)

    # align key domains: dictionary-encode conv ids over state ∪ folded
    folded_conv = fr.key_col("conv_id")
    folded_turn = _int64(fr.key_col("turn_idx"))
    state_conv = state["conv_id"].combine_chunks() if isinstance(state["conv_id"], pa.ChunkedArray) else state["conv_id"]
    all_conv = pa.concat_arrays([state_conv.cast(pa.string()), folded_conv.cast(pa.string())])
    codes_all = pc.dictionary_encode(all_conv)
    codes_np = codes_all.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    state_keys = (codes_np[:ns] << 32) | (_int64(state["turn_idx"]) & 0xFFFFFFFF) if ns else np.empty(0, np.int64)
    folded_keys = (codes_np[ns:] << 32) | (folded_turn & 0xFFFFFFFF)

    del_up = folded_keys[fr.outcome != 2]
    keep_mask = ~np.isin(state_keys, del_up) if ns else np.zeros(0, dtype=bool)

    patch_sel = fr.outcome == 2
    patch_keys = folded_keys[patch_sel]
    # positions of patch keys among kept state rows
    kept_idx = np.flatnonzero(keep_mask)
    kept_keys = state_keys[keep_mask]
    sorter = np.argsort(kept_keys, kind="stable")
    pos_in_sorted = np.searchsorted(kept_keys[sorter], patch_keys)
    pos_in_sorted = np.clip(pos_in_sorted, 0, max(len(kept_keys) - 1, 0))
    matched = (
        kept_keys[sorter][pos_in_sorted] == patch_keys
        if len(kept_keys)
        else np.zeros(len(patch_keys), dtype=bool)
    )
    stats["patches"] = int(matched.sum())
    stats["patch_misses"] = int((~matched).sum())

    # build kept-state columns (numpy, state-sized) and patch in place
    patch_state_rows = kept_idx[sorter[pos_in_sorted[matched]]] if len(kept_keys) else np.empty(0, np.int64)
    patch_fold_rows = np.flatnonzero(patch_sel)[matched]

    out_cols: dict[str, pa.Array] = {}
    kept_state = state.take(pa.array(kept_idx, type=pa.int64())) if ns else state
    # map patch positions from original state rows to kept-state rows
    remap = np.full(ns, -1, dtype=np.int64)
    remap[kept_idx] = np.arange(len(kept_idx))
    patch_rows_kept = remap[patch_state_rows] if ns else patch_state_rows

    ups_sel = fr.outcome == 1
    ups_idx = np.flatnonzero(ups_sel)

    for c in payload_cols:
        kept_np = (
            kept_state[c].to_numpy(zero_copy_only=False)
            if len(kept_state)
            else np.empty(0, dtype=object)
        )
        kept_np = np.asarray(kept_np, dtype=object)
        if len(patch_rows_kept):
            folded_vals = fr.take_col(c).to_numpy(zero_copy_only=False)
            set_mask = fr.value_pos[c][patch_fold_rows] >= 0
            rows = patch_rows_kept[set_mask]
            kept_np[rows] = folded_vals[patch_fold_rows[set_mask]]
        ups_vals = fr.take_col(c).to_numpy(zero_copy_only=False)[ups_idx]
        out_cols[c] = pa.array(
            np.concatenate([kept_np, np.asarray(ups_vals, dtype=object)]),
            type=pa.string(),
        )

    # ts column (int64 µs)
    kept_ts = _int64(kept_state["ts"]) if len(kept_state) else np.empty(0, np.int64)
    if len(patch_rows_kept):
        kept_ts = kept_ts.copy()
        kept_ts[patch_rows_kept] = fr.row_ts[patch_fold_rows]
    new_ts = np.concatenate([kept_ts, fr.row_ts[ups_idx]])

    kept_conv = (
        np.asarray(kept_state["conv_id"].to_numpy(zero_copy_only=False), dtype=object)
        if len(kept_state)
        else np.empty(0, dtype=object)
    )
    ups_conv = fr.key_col("conv_id").to_numpy(zero_copy_only=False)[ups_idx]
    kept_turn = _int64(kept_state["turn_idx"]) if len(kept_state) else np.empty(0, np.int64)
    ups_turn = folded_turn[ups_idx]

    conv_all = np.concatenate([kept_conv, np.asarray(ups_conv, dtype=object)])
    turn_all = np.concatenate([kept_turn, ups_turn])
    order = np.lexsort((turn_all, conv_all))
    order_arr = pa.array(order, type=pa.int64())

    cols: dict[str, pa.Array] = {
        "conv_id": pa.array(conv_all[order], type=pa.string()),
        "turn_idx": pa.array(turn_all[order], type=pa.int32()),
    }
    for c in payload_cols:
        cols[c] = out_cols[c].take(order_arr)
    cols["ts"] = pa.array(new_ts[order], type=pa.timestamp("us"))
    return pa.table(cols), stats

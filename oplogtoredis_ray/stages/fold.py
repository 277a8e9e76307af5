"""Vectorized per-key event folding — the merge kernel.

Semantics (≙ the reference's *changed-fields + id* contract applied as state:
insert=replace whole row, update=set exactly the changed fields,
delete=remove — /root/reference/lib/oplog/processor.go:25-32, 119-124;
README.md:40-50):

``fold_events`` reduces a *sorted, deduplicated* slice of one partition's
events to one row per ``(conv_id, turn_idx)`` with an outcome:

- ``delete``  — the key's last lifecycle op is a delete
- ``upsert``  — the window contains an insert; folded full row (fields the
  last insert didn't define and no later update set stay null)
- ``patch``   — updates only; folded set-fields to overlay on existing state

The fold is **associative over ts-contiguous chunks**: folding a chunk
yields pseudo-events (delete→``d``, upsert→``i``, patch→``u``) carrying the
chunk's last ``(ts, seq, tx_idx)`` per key, and re-folding the concatenated
pseudo-events of ordered chunks equals folding the whole slice.  That is the
deterministic salt-merge used for hot partitions (north_rule skew
requirement): a huge group is folded in S ts-ordered sub-chunks (possibly in
parallel) and the S results are combined in salt order.

Convention: a non-null payload value on an ``i``/``u`` event means "field
set"; explicit set-to-null updates are not representable (the reference's
contract only names changed fields, it never ships values — we additionally
carry values, with null = unchanged).  All kernels are pandas/numpy
vectorized; no per-row Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DEFAULT_PAYLOAD = ("role", "text", "tool")
KEY_COLS = ["conv_id", "turn_idx"]
ORDER_COLS = ["ts", "seq", "tx_idx"]


def sort_and_dedup(events: pd.DataFrame) -> pd.DataFrame:
    """Order by the event identity triple and drop exact replays (keep
    first — ≙ Lua GET-before-SETEX, lib/redispub/publisher.go:41-62).

    Dedup is on triple AND key: two distinct keys sharing a triple (corrupt
    upstream sequencing) are both kept — the same documented deviation the
    Arrow hot path (arrow_fold.order_dedup_filter) implements, so the two
    implementations agree on that edge."""
    out = events.sort_values(ORDER_COLS, kind="mergesort")
    return out.drop_duplicates(subset=ORDER_COLS + KEY_COLS, keep="first")


def drop_below_watermark(events: pd.DataFrame, watermark: tuple[int, int, int]) -> pd.DataFrame:
    """Drop events whose identity triple ≤ the applied watermark (TTL-free
    replay dedup; generalizes the 150 s dedup window)."""
    wts, wseq, wtx = watermark
    ts = events["ts"].to_numpy().astype("int64")
    seq = events["seq"].to_numpy().astype("int64")
    tx = events["tx_idx"].to_numpy().astype("int64")
    keep = (ts > wts) | ((ts == wts) & ((seq > wseq) | ((seq == wseq) & (tx > wtx))))
    return events.loc[keep]


def fold_events(
    events: pd.DataFrame, payload_cols: tuple[str, ...] = DEFAULT_PAYLOAD
) -> pd.DataFrame:
    """Fold sorted/deduped events to one outcome row per key.

    Returns columns: conv_id, turn_idx, outcome, <payload cols>,
    set_<payload cols>, ts, seq, tx_idx (last applied identity per key).
    """
    g = events.reset_index(drop=True)
    n = len(g)
    if n == 0:
        cols = (
            KEY_COLS
            + ["outcome"]
            + list(payload_cols)
            + [f"set_{c}" for c in payload_cols]
            + ORDER_COLS
        )
        return pd.DataFrame(columns=cols)

    pos = np.arange(n, dtype=np.int64)
    op = g["op"].to_numpy()
    kid = _key_ids(g)

    # segment layout: rows sorted (stably) by key, keeping event order inside
    order = np.argsort(kid, kind="stable")
    kid_sorted = kid[order]
    seg_starts = np.flatnonzero(np.concatenate([[True], kid_sorted[1:] != kid_sorted[:-1]]))
    rep_counts = np.diff(np.concatenate([seg_starts, [n]]))

    is_i = op == "i"
    is_d = op == "d"
    is_iu = is_i | (op == "u")

    def seg_max(values: np.ndarray) -> np.ndarray:
        return np.maximum.reduceat(values[order], seg_starts)

    li = seg_max(np.where(is_i, pos, -1))
    ld = seg_max(np.where(is_d, pos, -1))
    start = np.maximum(li, ld)  # per-key fold start
    start_r = np.repeat(start, rep_counts)[_inverse(order, n)]  # back to row order

    outcome = np.where(ld > li, "delete", np.where(li >= 0, "upsert", "patch"))

    eligible = is_iu & (pos >= start_r)
    folded: dict[str, np.ndarray] = {}
    set_masks: dict[str, np.ndarray] = {}
    for c in payload_cols:
        if c in g.columns:
            col = g[c].to_numpy()
            present = pd.notna(g[c]).to_numpy()
        else:
            col = np.full(n, None, dtype=object)
            present = np.zeros(n, bool)
        m = eligible & present
        last_set = seg_max(np.where(m, pos, -1))
        vals = np.full(len(last_set), None, dtype=object)
        hit = last_set >= 0
        vals[hit] = col[last_set[hit]]
        folded[c] = vals
        set_masks[c] = hit

    last_pos = seg_max(pos)
    ts_num = g["ts"].to_numpy().astype("int64")
    last_applied = seg_max(np.where(eligible, pos, -1))
    row_ts = np.where(last_applied >= 0, ts_num[np.maximum(last_applied, 0)], np.int64(0))
    # for delete outcomes keep last event ts for bookkeeping
    row_ts = np.where(outcome == "delete", ts_num[last_pos], row_ts)

    out = pd.DataFrame(
        {
            "conv_id": g["conv_id"].to_numpy()[last_pos],
            "turn_idx": g["turn_idx"].to_numpy()[last_pos],
            "outcome": outcome,
        }
    )
    for c in payload_cols:
        out[c] = folded[c]
        out[f"set_{c}"] = set_masks[c]
    out["ts"] = row_ts
    out["seq"] = g["seq"].to_numpy()[last_pos].astype("int64")
    out["tx_idx"] = g["tx_idx"].to_numpy()[last_pos].astype("int64")
    return out


def _inverse(order: np.ndarray, n: int) -> np.ndarray:
    inv = np.empty(n, dtype=np.int64)
    inv[order] = np.arange(n)
    return inv


def _key_ids(g: pd.DataFrame) -> np.ndarray:
    """Dense int ids for (conv_id, turn_idx) pairs without pandas groupby:
    factorize each column, combine, factorize the combination.

    Precondition: key columns are non-null (the parse stage dead-letters
    null keys); factorize encodes NaN as -1 which would alias another key.
    """
    c1, _ = pd.factorize(g["conv_id"], sort=False)
    c2, _ = pd.factorize(g["turn_idx"], sort=False)
    if (c1 < 0).any() or (c2 < 0).any():
        raise ValueError("fold_events requires non-null conv_id/turn_idx")
    combined = c1.astype(np.int64) * (int(c2.max()) + 1 if len(c2) else 1) + c2
    kid, _ = pd.factorize(combined, sort=False)
    return kid.astype(np.int64)


def folded_to_pseudo_events(
    folded: pd.DataFrame, payload_cols: tuple[str, ...] = DEFAULT_PAYLOAD
) -> pd.DataFrame:
    """Represent a fold result as events so chunks combine by re-folding."""
    op = np.where(
        folded["outcome"].to_numpy() == "delete",
        "d",
        np.where(folded["outcome"].to_numpy() == "upsert", "i", "u"),
    )
    out = pd.DataFrame(
        {
            "ts": folded["ts"].to_numpy().astype("int64"),
            "seq": folded["seq"].to_numpy().astype("int64"),
            "tx_idx": folded["tx_idx"].to_numpy().astype("int64"),
            "op": op,
            "conv_id": folded["conv_id"].to_numpy(),
            "turn_idx": folded["turn_idx"].to_numpy(),
        }
    )
    for c in payload_cols:
        # null = not set; upsert rows keep their (possibly null) full values —
        # a later fold treats insert nulls correctly because 'i' replaces the row
        out[c] = folded[c].to_numpy()
    return out


def fold_events_chunked(
    events: pd.DataFrame,
    payload_cols: tuple[str, ...] = DEFAULT_PAYLOAD,
    num_chunks: int = 16,
) -> pd.DataFrame:
    """Salted fold for hot partitions: fold ts-contiguous sub-chunks, then
    re-fold the pseudo-events in deterministic salt (ts) order.

    Pseudo-events keep each key's last identity triple, and chunks are
    ts-contiguous, so concatenation in chunk order is already sorted per key.
    """
    n = len(events)
    if n == 0 or num_chunks <= 1:
        return fold_events(events, payload_cols)
    bounds = np.linspace(0, n, num_chunks + 1, dtype=np.int64)
    partials = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        if b > a:
            partials.append(
                folded_to_pseudo_events(
                    fold_events(events.iloc[a:b], payload_cols), payload_cols
                )
            )
    pseudo = pd.concat(partials, ignore_index=True)
    pseudo = pseudo.sort_values(ORDER_COLS, kind="mergesort")
    return fold_events(pseudo, payload_cols)


def apply_folded(
    state: pd.DataFrame,
    folded: pd.DataFrame,
    payload_cols: tuple[str, ...] = DEFAULT_PAYLOAD,
) -> tuple[pd.DataFrame, dict]:
    """Merge a fold result into the partition state.

    Returns ``(new_state, stats)``.  Patch on a missing key is a counted
    no-op (updates can only land on rows an earlier insert created — the
    reference equivalently never upserts on update).
    """
    stats = {"deletes": 0, "upserts": 0, "patches": 0, "patch_misses": 0}
    if len(folded) == 0:
        return state, stats
    st = state.set_index(KEY_COLS)

    fidx = folded.set_index(KEY_COLS)
    del_keys = fidx.index[fidx["outcome"] == "delete"]
    ups = fidx[fidx["outcome"] == "upsert"]
    pat = fidx[fidx["outcome"] == "patch"]

    stats["deletes"] = int(len(del_keys))
    stats["upserts"] = int(len(ups))

    drop = st.index.intersection(del_keys.union(ups.index))
    st = st.drop(drop)

    if len(ups):
        new_rows = ups[list(payload_cols)].copy()
        new_rows["ts"] = ups["ts"]
        st = pd.concat([st, new_rows])

    if len(pat):
        common = st.index.intersection(pat.index)
        stats["patches"] = int(len(common))
        stats["patch_misses"] = int(len(pat) - len(common))
        if len(common):
            sub = pat.loc[common]
            for c in payload_cols:
                mask = sub[f"set_{c}"].to_numpy().astype(bool)
                if mask.any():
                    target = sub.index[mask]
                    st.loc[target, c] = sub.loc[target, c]
            st.loc[common, "ts"] = sub["ts"]

    out = st.reset_index()
    return out, stats

"""Property-based fold testing: for arbitrary small event logs, the
Arrow-native fold, the pandas fold, the chunked (salted) folds and the
sequential oracle must all agree — including under duplicate injection and
window splits at arbitrary cut points."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from oplogtoredis_ray.sources.synthetic import oracle_apply
from oplogtoredis_ray.stages.arrow_fold import (
    fold_arrow,
    fold_arrow_chunked,
    merge_into_state,
    order_dedup_filter,
)
from oplogtoredis_ray.stages.fold import (
    apply_folded,
    fold_events,
    sort_and_dedup,
)
from oplogtoredis_ray.state.lake import empty_state_table

COLS = ["ts", "seq", "tx_idx", "op", "conv_id", "turn_idx", "role", "text", "tool"]


@st.composite
def event_logs(draw):
    """Causally-valid op sequences over a handful of keys, with optional
    duplicates, shared-(ts,seq) transaction runs and shuffled file order."""
    n_keys = draw(st.integers(1, 5))
    keys = [(f"c{k % 3}", k) for k in range(n_keys)]
    events = []
    clock = 0
    for conv, turn in keys:
        alive = False
        n_ops = draw(st.integers(1, 8))
        j = 0
        for _ in range(n_ops):
            clock += draw(st.integers(0, 3))
            seq = draw(st.integers(0, 2))
            if not alive:
                op = "i"
                alive = True
            else:
                op = draw(st.sampled_from(["u", "u", "d"]))
                if op == "d":
                    alive = False
            role = draw(st.sampled_from([None, "user", "assistant"])) if op != "d" else None
            text = f"t{conv}{turn}v{j}" if op != "d" else None
            if op == "i" and text is None:
                text = f"t{conv}{turn}v{j}"
            tool = draw(st.sampled_from([None, None, "toolA"])) if op == "u" else None
            events.append((clock, seq, 0, op, conv, turn, role, text, tool))
            j += 1
    df = pd.DataFrame(events, columns=COLS)
    # make identities unique: re-rank (ts,seq) pairs by occurrence
    df = df.sort_values(["ts", "seq"], kind="mergesort").reset_index(drop=True)
    df["seq"] = np.arange(len(df))
    # inject duplicates of random rows
    n_dup = draw(st.integers(0, 3))
    if n_dup and len(df):
        idx = draw(
            st.lists(st.integers(0, len(df) - 1), min_size=n_dup, max_size=n_dup)
        )
        df = pd.concat([df, df.iloc[idx]], ignore_index=True)
    # shuffle file order
    perm = draw(st.permutations(range(len(df))))
    return df.iloc[list(perm)].reset_index(drop=True)


def _to_table(df: pd.DataFrame) -> pa.Table:
    return pa.table(
        {
            "ts": pa.array(df["ts"].astype("int64"), type=pa.int64()),
            "seq": pa.array(df["seq"].astype("int64"), type=pa.int64()),
            "tx_idx": pa.array(df["tx_idx"].astype("int64"), type=pa.int64()),
            "op": pa.array(df["op"], type=pa.string()),
            "conv_id": pa.array(df["conv_id"], type=pa.string()),
            "turn_idx": pa.array(df["turn_idx"].astype("int32"), type=pa.int32()),
            "role": pa.array(df["role"], type=pa.string()),
            "text": pa.array(df["text"], type=pa.string()),
            "tool": pa.array(df["tool"], type=pa.string()),
        }
    )


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    if len(df):
        df["ts"] = df["ts"].astype("int64")
    for c in ["role", "text", "tool"]:
        df[c] = df[c].where(pd.notna(df[c]), None)
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _arrow_final(df, chunks=1, cuts=None):
    state = empty_state_table()
    parts = [df]
    if cuts:
        ts = df["ts"].to_numpy()
        parts = []
        prev = -1
        for cut in sorted(cuts) + [ts.max() + 1]:
            sel = (ts > prev) & (ts <= cut)
            if sel.any():
                parts.append(df[sel])
            prev = cut
    wm = (-1, -1, -1)
    for part in parts:
        g, _, _ = order_dedup_filter(_to_table(part), wm)
        if len(g) == 0:
            continue
        fr = fold_arrow_chunked(g, num_chunks=chunks) if chunks > 1 else fold_arrow(g)
        state, _ = merge_into_state(state, fr)
    out = state.to_pandas()
    return _normalize(out)


@settings(max_examples=120, deadline=None)
@given(event_logs())
def test_arrow_equals_oracle(df):
    want = _normalize(oracle_apply(df))
    got = _arrow_final(df)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(max_examples=60, deadline=None)
@given(event_logs(), st.integers(2, 5))
def test_chunked_equals_oracle(df, chunks):
    want = _normalize(oracle_apply(df))
    got = _arrow_final(df, chunks=chunks)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(max_examples=60, deadline=None)
@given(event_logs(), st.data())
def test_windowed_equals_oracle(df, data):
    ts = sorted(df["ts"].unique())
    cuts = data.draw(
        st.lists(st.sampled_from(ts), max_size=3, unique=True)
    ) if len(ts) > 1 else []
    want = _normalize(oracle_apply(df))
    got = _arrow_final(df, cuts=cuts)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(max_examples=60, deadline=None)
@given(event_logs())
def test_pandas_fold_equals_oracle(df):
    g = sort_and_dedup(df)
    folded = fold_events(g)
    state = pd.DataFrame(
        {c: pd.Series(dtype="object") for c in ["conv_id", "turn_idx", "role", "text", "tool", "ts"]}
    )
    out, _ = apply_folded(state, folded)
    want = _normalize(oracle_apply(df))
    got = _normalize(out)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

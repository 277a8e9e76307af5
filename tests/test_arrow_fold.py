"""Arrow-native fold/merge cross-checked against the pandas reference
implementation and the sequential oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from oplogtoredis_ray.sources.synthetic import GeneratorSpec, generate_event_log, oracle_apply
from oplogtoredis_ray.stages.arrow_fold import (
    fold_arrow,
    fold_arrow_chunked,
    merge_into_state,
    order_dedup_filter,
)
from oplogtoredis_ray.state.lake import empty_state_table

COLS = ["ts", "seq", "tx_idx", "op", "conv_id", "turn_idx", "role", "text", "tool"]


def _to_table(df: pd.DataFrame) -> pa.Table:
    return pa.table(
        {
            "ts": pa.array(df["ts"].to_numpy().astype("int64"), type=pa.int64()),
            "seq": pa.array(df["seq"].to_numpy().astype("int64"), type=pa.int64()),
            "tx_idx": pa.array(df["tx_idx"].to_numpy().astype("int64"), type=pa.int64()),
            "op": pa.array(df["op"], type=pa.string()),
            "conv_id": pa.array(df["conv_id"], type=pa.string()),
            "turn_idx": pa.array(df["turn_idx"].to_numpy().astype("int32"), type=pa.int32()),
            "role": pa.array(df["role"], type=pa.string()),
            "text": pa.array(df["text"], type=pa.string()),
            "tool": pa.array(df["tool"], type=pa.string()),
        }
    )


def _arrow_apply(df: pd.DataFrame, chunks: int = 1) -> pd.DataFrame:
    t = _to_table(df)
    g, dupes, below = order_dedup_filter(t, (-1, -1, -1))
    fr = fold_arrow_chunked(g, num_chunks=chunks) if chunks > 1 else fold_arrow(g)
    state, stats = merge_into_state(empty_state_table(), fr)
    out = state.to_pandas()
    out["ts"] = out["ts"].astype("int64")
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def log():
    return generate_event_log(
        GeneratorSpec(seed=19, n_conversations=70, duplicate_rate=0.05, txn_rate=0.08)
    )


def test_arrow_matches_oracle(log):
    got = _arrow_apply(log[COLS])
    want = oracle_apply(log)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("chunks", [2, 5, 16])
def test_arrow_chunked_matches_oracle(log, chunks):
    got = _arrow_apply(log[COLS], chunks=chunks)
    want = oracle_apply(log)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_arrow_dedup_and_watermark_counts(log):
    t = _to_table(log[COLS])
    g, dupes, below = order_dedup_filter(t, (-1, -1, -1))
    n_dups_expected = int(log.duplicated(["ts", "seq", "tx_idx"]).sum())
    assert dupes == n_dups_expected
    assert below == 0
    # watermark in the middle drops roughly half
    mid = int(np.median(log["ts"]))
    g2, _, below2 = order_dedup_filter(t, (mid, 1 << 40, 1 << 40))
    assert below2 > 0 and len(g2) < len(g)


def test_arrow_incremental_windows_match_oracle(log):
    """Apply the log in 3 ts-windows against evolving state — must equal the
    single-shot apply and the oracle."""
    df = log[COLS].copy()
    ts = df["ts"].to_numpy()
    cuts = np.quantile(ts, [0.34, 0.67])
    state = empty_state_table()
    for sel in [ts <= cuts[0], (ts > cuts[0]) & (ts <= cuts[1]), ts > cuts[1]]:
        part = df[sel]
        if not len(part):
            continue
        g, _, _ = order_dedup_filter(_to_table(part), (-1, -1, -1))
        fr = fold_arrow(g)
        state, _ = merge_into_state(state, fr)
    got = state.to_pandas()
    got["ts"] = got["ts"].astype("int64")
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = oracle_apply(log)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

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


def test_custom_payload_cols_survive_merge():
    """Regression: merge_into_state must emit exactly the configured payload
    columns, not a hardcoded set."""
    cols = ("role", "text", "summary")
    t = pa.table(
        {
            "ts": pa.array([1, 2], type=pa.int64()),
            "seq": pa.array([0, 1], type=pa.int64()),
            "tx_idx": pa.array([0, 0], type=pa.int64()),
            "op": pa.array(["i", "u"]),
            "conv_id": pa.array(["c", "c"]),
            "turn_idx": pa.array([0, 0], type=pa.int32()),
            "role": pa.array(["user", None]),
            "text": pa.array(["a", "b"]),
            "summary": pa.array([None, "S"]),
        }
    )
    g, _, _ = order_dedup_filter(t, (-1, -1, -1))
    fr = fold_arrow(g, payload_cols=cols)
    state, _ = merge_into_state(empty_state_table(cols), fr, payload_cols=cols)
    rec = state.to_pandas().to_dict("records")[0]
    assert rec["summary"] == "S" and rec["text"] == "b" and rec["role"] == "user"
    assert list(state.column_names) == ["conv_id", "turn_idx", "role", "text", "summary", "ts"]


def test_merge_deltas_leveled_equivalence():
    """The leveled-compaction kernel: replacing a chain's delta suffix with
    merge_deltas(suffix) must leave merge_chain unchanged (chunk
    associativity of the fold).  Dup-free spec: the real pipeline's
    watermark guarantees deltas never carry cross-window replays, the
    invariant this kernel inherits."""
    from oplogtoredis_ray.stages.arrow_fold import (
        fold_arrow,
        merge_chain,
        merge_deltas,
        pseudo_events_table,
    )

    log = generate_event_log(
        GeneratorSpec(seed=23, n_conversations=50, duplicate_rate=0.0, txn_rate=0.1)
    )
    df = log[COLS].sort_values(["ts", "seq", "tx_idx"], kind="mergesort")
    deltas = []
    for c in np.array_split(df, 5):
        t = _to_table(c.reset_index(drop=True))
        g, _, _ = order_dedup_filter(t, (-1, -1, -1))
        deltas.append(pseudo_events_table(fold_arrow(g)))
    base_state = merge_chain([deltas[0]])
    suffix = deltas[1:]

    def canon(t: pa.Table) -> pd.DataFrame:
        out = t.to_pandas()
        out["ts"] = out["ts"].astype("int64")
        return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    whole = canon(merge_chain([base_state] + suffix))
    leveled = canon(merge_chain([base_state, merge_deltas(suffix)]))
    pd.testing.assert_frame_equal(leveled, whole, check_dtype=False)
    # and it equals the straight-line oracle
    pd.testing.assert_frame_equal(whole, oracle_apply(log), check_dtype=False)
    # merging only part of the suffix is equally sound (mid-level shapes)
    part = canon(
        merge_chain([base_state, merge_deltas(suffix[:2])] + suffix[2:])
    )
    pd.testing.assert_frame_equal(part, whole, check_dtype=False)
    # a base (state) link must be rejected — patches cannot resolve here
    with pytest.raises(ValueError, match="delta links only"):
        merge_deltas([base_state])


def test_merge_deltas_schema_evolution_null_fills():
    """A pre-evolution delta link lacking a configured payload column must
    be null-filled before the suffix fold (same per-link rule as
    merge_partition_chain) — the fold kernels index table[c] directly."""
    from oplogtoredis_ray.stages.arrow_fold import merge_chain, merge_deltas

    d_old = pa.table({  # pre-evolution: no `tool`
        "ts": pa.array([1, 2], type=pa.int64()),
        "seq": pa.array([0, 1], type=pa.int64()),
        "tx_idx": pa.array([0, 0], type=pa.int64()),
        "op": pa.array(["i", "u"]),
        "conv_id": pa.array(["c", "c"]),
        "turn_idx": pa.array([0, 0], type=pa.int32()),
        "role": pa.array(["user", None]),
        "text": pa.array(["a", "b"]),
    })
    d_new = pa.table({
        "ts": pa.array([3], type=pa.int64()),
        "seq": pa.array([2], type=pa.int64()),
        "tx_idx": pa.array([0], type=pa.int64()),
        "op": pa.array(["u"]),
        "conv_id": pa.array(["c"]),
        "turn_idx": pa.array([0], type=pa.int32()),
        "role": pa.array([None], type=pa.string()),
        "text": pa.array([None], type=pa.string()),
        "tool": pa.array(["T"]),
    })
    lev = merge_chain([merge_deltas([d_old, d_new])]).to_pandas()
    assert merge_chain([d_old, d_new]).to_pandas().equals(lev)
    rec = lev.to_dict("records")[0]
    assert rec["text"] == "b" and rec["tool"] == "T" and rec["role"] == "user"


def test_identity_collision_across_keys_not_swallowed():
    """Two DIFFERENT keys sharing an identity triple are both kept (counted
    replays are same-key only)."""
    t = pa.table(
        {
            "ts": pa.array([5, 5, 5], type=pa.int64()),
            "seq": pa.array([0, 0, 0], type=pa.int64()),
            "tx_idx": pa.array([0, 0, 0], type=pa.int64()),
            "op": pa.array(["i", "i", "i"]),
            "conv_id": pa.array(["a", "b", "a"]),
            "turn_idx": pa.array([0, 0, 0], type=pa.int32()),
            "role": pa.array(["user"] * 3),
            "text": pa.array(["x", "y", "x"]),
            "tool": pa.array([None, None, None], type=pa.string()),
        }
    )
    g, dupes, below = order_dedup_filter(t, (-1, -1, -1))
    assert dupes == 1  # only the true same-key replay dropped
    assert len(g) == 2
    assert sorted(g["conv_id"].to_pylist()) == ["a", "b"]


def test_empty_string_partition_hash_batch_independent():
    from oplogtoredis_ray.functions.sharding import poly_partition_ids

    alone = poly_partition_ids(pa.array([""]), 32)[0]
    mixed = poly_partition_ids(pa.array(["", "x", ""]), 32)
    assert mixed[0] == alone and mixed[2] == alone

"""Unit tests for the vectorized fold/merge kernel (no Ray): semantics vs the
naive oracle, chunked-fold associativity, watermark dedup."""

import numpy as np
import pandas as pd
import pytest

from oplogtoredis_ray.sources.synthetic import GeneratorSpec, generate_event_log, oracle_apply
from oplogtoredis_ray.stages.fold import (
    apply_folded,
    drop_below_watermark,
    fold_events,
    fold_events_chunked,
    folded_to_pseudo_events,
    sort_and_dedup,
)

COLS = ["ts", "seq", "tx_idx", "op", "conv_id", "turn_idx", "role", "text", "tool"]


def _ev(ts, seq, tx, op, conv, turn, role=None, text=None, tool=None):
    return (ts, seq, tx, op, conv, turn, role, text, tool)


def _empty_state():
    return pd.DataFrame(
        {c: pd.Series(dtype="object") for c in ["conv_id", "turn_idx", "role", "text", "tool", "ts"]}
    )


def _engine_apply(df, state=None):
    g = sort_and_dedup(df)
    folded = fold_events(g)
    st = state if state is not None else _empty_state()
    out, stats = apply_folded(st, folded)
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True), stats


def test_fold_basic_lifecycle():
    df = pd.DataFrame(
        [
            _ev(1, 0, 0, "i", "c0", 0, role="user", text="v0"),
            _ev(2, 0, 0, "u", "c0", 0, text="v1"),
            _ev(3, 0, 0, "u", "c0", 0, role="tool"),
            _ev(4, 0, 0, "i", "c1", 1, role="user", text="w0"),
            _ev(5, 0, 0, "d", "c1", 1),
        ],
        columns=COLS,
    )
    out, stats = _engine_apply(df)
    assert out.to_dict("records") == [
        {"conv_id": "c0", "turn_idx": 0, "role": "tool", "text": "v1", "tool": None, "ts": 3}
    ]
    assert stats["upserts"] == 1 and stats["deletes"] == 1


def test_fold_reinsert_resets_fields():
    df = pd.DataFrame(
        [
            _ev(1, 0, 0, "i", "c0", 0, role="user", text="v0", tool="T"),
            _ev(2, 0, 0, "d", "c0", 0),
            _ev(3, 0, 0, "i", "c0", 0, role="assistant", text="v2"),  # no tool
        ],
        columns=COLS,
    )
    out, _ = _engine_apply(df)
    assert out.iloc[0]["tool"] is None  # insert replaced whole row
    assert out.iloc[0]["text"] == "v2"


def test_fold_patch_onto_existing_state():
    state = pd.DataFrame(
        [{"conv_id": "c0", "turn_idx": 0, "role": "user", "text": "old", "tool": "T", "ts": 1}]
    )
    df = pd.DataFrame([_ev(5, 0, 0, "u", "c0", 0, text="new")], columns=COLS)
    out, stats = _engine_apply(df, state)
    rec = out.to_dict("records")[0]
    assert rec["text"] == "new" and rec["role"] == "user" and rec["tool"] == "T"
    assert rec["ts"] == 5
    assert stats["patches"] == 1


def test_fold_patch_missing_row_is_noop():
    df = pd.DataFrame([_ev(5, 0, 0, "u", "cX", 9, text="orphan")], columns=COLS)
    out, stats = _engine_apply(df)
    assert len(out) == 0
    assert stats["patch_misses"] == 1


def test_fold_delete_missing_row_is_noop():
    df = pd.DataFrame([_ev(5, 0, 0, "d", "cX", 9)], columns=COLS)
    out, stats = _engine_apply(df)
    assert len(out) == 0


def test_fold_tx_order_within_same_ts_seq():
    df = pd.DataFrame(
        [
            _ev(1, 0, 1, "u", "c0", 0, text="second"),
            _ev(1, 0, 0, "i", "c0", 0, role="user", text="first"),
            _ev(1, 0, 2, "u", "c0", 0, text="third"),
        ],
        columns=COLS,
    )
    out, _ = _engine_apply(df)
    assert out.iloc[0]["text"] == "third"


def test_exact_duplicate_dropped():
    df = pd.DataFrame(
        [
            _ev(1, 0, 0, "i", "c0", 0, role="user", text="good"),
            _ev(1, 0, 0, "i", "c0", 0, role="user", text="good"),
        ],
        columns=COLS,
    )
    g = sort_and_dedup(df)
    assert len(g) == 1


def test_watermark_filter():
    df = pd.DataFrame(
        [
            _ev(1, 0, 0, "i", "a", 0),
            _ev(2, 3, 0, "i", "b", 0),
            _ev(2, 3, 1, "i", "c", 0),
            _ev(2, 4, 0, "i", "d", 0),
            _ev(3, 0, 0, "i", "e", 0),
        ],
        columns=COLS,
    )
    kept = drop_below_watermark(df, (2, 3, 0))
    assert kept["conv_id"].tolist() == ["c", "d", "e"]


def test_fold_matches_oracle_on_generated_log():
    spec = GeneratorSpec(seed=11, n_conversations=60, duplicate_rate=0.05, txn_rate=0.08)
    log = generate_event_log(spec)
    df = log[COLS].copy()
    engine, _ = _engine_apply(df)
    oracle = oracle_apply(log)
    engine["ts"] = engine["ts"].astype("int64")
    oracle_cmp = oracle.copy()
    pd.testing.assert_frame_equal(
        engine.reset_index(drop=True),
        oracle_cmp.reset_index(drop=True),
        check_dtype=False,
    )


@pytest.mark.parametrize("chunks", [2, 3, 7, 16])
def test_chunked_fold_equals_whole_fold(chunks):
    spec = GeneratorSpec(seed=23, n_conversations=30, duplicate_rate=0.0)
    log = generate_event_log(spec)
    g = sort_and_dedup(log[COLS])
    whole = fold_events(g).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    chunked = (
        fold_events_chunked(g, num_chunks=chunks)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        whole[["conv_id", "turn_idx", "outcome", "role", "text", "tool", "ts"]],
        chunked[["conv_id", "turn_idx", "outcome", "role", "text", "tool", "ts"]],
        check_dtype=False,
    )


def test_pseudo_events_round_trip():
    df = pd.DataFrame(
        [
            _ev(1, 0, 0, "i", "c0", 0, role="user", text="v0"),
            _ev(2, 0, 0, "u", "c0", 0, text="v1"),
        ],
        columns=COLS,
    )
    folded = fold_events(sort_and_dedup(df))
    pseudo = folded_to_pseudo_events(folded)
    refolded = fold_events(sort_and_dedup(pseudo))
    pd.testing.assert_frame_equal(
        folded[["conv_id", "turn_idx", "outcome", "text"]],
        refolded[["conv_id", "turn_idx", "outcome", "text"]],
        check_dtype=False,
    )

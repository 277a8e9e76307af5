"""Generator + oracle invariants: determinism, per-key causality, duplicate /
transaction / evolution knobs, and oracle sanity."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from oplogtoredis_ray.sources.synthetic import (
    EPOCH_US,
    GeneratorSpec,
    generate_event_log,
    oracle_apply,
    write_event_log,
)

SPEC = GeneratorSpec(seed=7, n_conversations=40, mean_turns=3, duplicate_rate=0.05)


@pytest.fixture(scope="module")
def log():
    return generate_event_log(SPEC)


def test_deterministic(log):
    again = generate_event_log(SPEC)
    pd.testing.assert_frame_equal(
        log.reset_index(drop=True), again.reset_index(drop=True)
    )


def test_identity_and_order(log):
    base = log.drop_duplicates(subset=["ts", "seq", "tx_idx"])
    # identity triple unique after dedup; ts nondecreasing in applied order
    ordered = base.sort_values(["ts", "seq", "tx_idx"])
    assert (np.diff(ordered["ts"].to_numpy()) >= 0).all()
    # duplicates exist and are exact copies of their originals
    dups = log[log.duplicated(subset=["ts", "seq", "tx_idx"], keep="first")]
    assert len(dups) > 0
    merged = dups.merge(base, on=["ts", "seq", "tx_idx"], suffixes=("_d", ""))
    for col in ["op", "conv_id", "turn_idx", "text"]:
        assert (
            merged[f"{col}_d"].fillna("§") == merged[col].fillna("§")
        ).all()


def test_per_key_causality(log):
    ordered = log.drop_duplicates(subset=["ts", "seq", "tx_idx"]).sort_values(
        ["ts", "seq", "tx_idx"]
    )
    for (conv, turn), grp in ordered.groupby(["conv_id", "turn_idx"]):
        ops = "".join(grp["op"])
        # first touch of a key is an insert; u/d only after i; reinsert after d
        assert ops[0] == "i"
        alive = False
        for o in ops:
            if o == "i":
                alive = True
            elif o == "u":
                assert alive, f"update on dead key {conv}/{turn}: {ops}"
            elif o == "d":
                assert alive, f"delete on dead key {conv}/{turn}: {ops}"
                alive = False


def test_transactions_share_identity(log):
    base = log.drop_duplicates(subset=["ts", "seq", "tx_idx"])
    tx = base[base["tx_idx"] > 0]
    assert len(tx) > 0
    for (ts, seq), grp in base[base.duplicated(["ts", "seq"], keep=False)].groupby(
        ["ts", "seq"]
    ):
        idxs = sorted(grp["tx_idx"].tolist())
        assert idxs == list(range(len(idxs)))  # tx_idx 0..k contiguous


def test_evolution_point(log):
    evo = log.attrs["evo_ts"]
    pre = log[log["ts"] < evo]
    post = log[log["ts"] >= evo]
    assert pre["tool"].isna().all()
    assert post["tool"].notna().any()


def test_write_files_schema_evolution(tmp_path, log):
    paths = write_event_log(log, str(tmp_path / "events"))
    assert len(paths) == SPEC.n_files
    schemas = [pq.read_schema(p) for p in paths]
    has_tool = ["tool" in s.names for s in schemas]
    assert not has_tool[0]  # first file pre-evolution → no tool column
    assert has_tool[-1]
    total = sum(pq.read_metadata(p).num_rows for p in paths)
    assert total == len(log)


def test_oracle_semantics_small():
    # hand-built mini log: insert, patch, delete, reinsert, dup, late update
    rows = [
        # ts, seq, tx, op, conv, turn, role, text, tool
        (1, 0, 0, "i", "c0", 0, "user", "v0", None),
        (2, 0, 0, "u", "c0", 0, None, "v1", None),
        (2, 0, 0, "u", "c0", 0, None, "IGNORED-DUP", None),  # duplicate identity
        (3, 0, 0, "d", "c0", 0, None, None, None),
        (4, 0, 0, "i", "c0", 0, "tool", "v2", "toolX"),
        (5, 0, 0, "u", "c9", 9, None, "orphan", None),  # update on missing row
        (6, 0, 0, "i", "c1", 1, "user", "w0", None),
        (6, 0, 1, "u", "c1", 1, None, "w1", None),  # same (ts,seq), tx order
    ]
    df = pd.DataFrame(
        rows,
        columns=["ts", "seq", "tx_idx", "op", "conv_id", "turn_idx", "role", "text", "tool"],
    )
    out = oracle_apply(df)
    assert out.to_dict("records") == [
        {"conv_id": "c0", "turn_idx": 0, "role": "tool", "text": "v2", "tool": "toolX", "ts": 4},
        {"conv_id": "c1", "turn_idx": 1, "role": "user", "text": "w1", "tool": None, "ts": 6},
    ]


def test_oracle_denylist():
    df = pd.DataFrame(
        [
            (1, 0, 0, "i", "bad", 0, "user", "x", None),
            (2, 0, 0, "i", "good", 0, "user", "y", None),
        ],
        columns=["ts", "seq", "tx_idx", "op", "conv_id", "turn_idx", "role", "text", "tool"],
    )
    out = oracle_apply(df, denylist=frozenset(["bad"]))
    assert out["conv_id"].tolist() == ["good"]


def test_oracle_full_log_plausible(log):
    final = oracle_apply(log)
    assert len(final) > 0
    assert final.duplicated(["conv_id", "turn_idx"]).sum() == 0
    # text versions monotone: last writer wins means version suffix from latest op
    assert final["text"].str.startswith("t").all()
    assert (final["ts"] >= EPOCH_US).all()


def test_skew_exists(log):
    counts = log["conv_id"].value_counts()
    assert counts.iloc[0] > 5 * counts.median()


@pytest.mark.usefixtures("ray_session")
def test_sharded_generation_identity_and_oracle(tmp_path):
    """Sharded parallel generation: unique (ts,seq,tx_idx) across shards,
    conv namespaces disjoint, oracle applies cleanly."""
    import glob

    from oplogtoredis_ray.sources.synthetic import generate_event_log_sharded

    spec = GeneratorSpec(seed=9, n_conversations=40, n_files=8, duplicate_rate=0.03)
    out = str(tmp_path / "sharded")
    n = generate_event_log_sharded(spec, out, shards=4)
    files = sorted(glob.glob(out + "/*.parquet"))
    assert len(files) == 8  # 4 shards x 2 files
    frames = [pq.read_table(f).to_pandas() for f in files]
    for df in frames:
        if "tool" not in df.columns:
            df["tool"] = None
    log = pd.concat(frames, ignore_index=True)
    assert len(log) == n
    base = log.drop_duplicates(["ts", "seq", "tx_idx"])
    # duplicates exist but identities are unique across shards after striping
    assert len(base) < len(log)
    dups = log[log.duplicated(["ts", "seq", "tx_idx"], keep="first")]
    merged = dups.merge(base, on=["ts", "seq", "tx_idx"], suffixes=("_d", ""))
    assert (merged["conv_id_d"] == merged["conv_id"]).all()  # only true replays collide
    # shard-prefixed conv namespaces
    prefixes = {c[:8] for c in log["conv_id"]}
    assert len(prefixes) == 4
    log["ts"] = log["ts"].astype("int64")
    final = oracle_apply(log)
    assert len(final) > 0
    assert final.duplicated(["conv_id", "turn_idx"]).sum() == 0


def test_log_ts_bounds_integer_exact(tmp_path):
    """Regression: statistics-datetime → µs conversion must use integer
    field arithmetic; float total_seconds()*1e6 truncated 1004 µs to 1003,
    and at 2024-scale timestamps shaved 1 µs off the log max — silently
    excluding the final event(s) from the last window."""
    import pandas as pd

    from oplogtoredis_ray.sources.event_log import _to_us, log_ts_bounds
    from oplogtoredis_ray.sources.synthetic import write_event_log

    rows = [
        dict(ts=ts, seq=i, tx_idx=-1, op="i", conv_id="c", turn_idx=i,
             role="user", text="x", tool=None, _file=0)
        for i, ts in enumerate([1000, 1004, 1_705_000_000_000_007])
    ]
    d = str(tmp_path / "ev")
    write_event_log(pd.DataFrame(rows), d, evo_ts=0)
    lo, hi = log_ts_bounds(d)
    assert (lo, hi) == (1000, 1_705_000_000_000_007)

    import datetime

    assert _to_us(datetime.datetime(1970, 1, 1, 0, 0, 0, 1004)) == 1004
    assert _to_us(datetime.datetime(2024, 1, 11, 18, 26, 40, 7)) == (
        int(datetime.datetime(2024, 1, 11, 18, 26, 40, 7)
            .replace(tzinfo=datetime.timezone.utc).timestamp()) * 1_000_000 + 7
    )

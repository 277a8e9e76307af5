"""Delta state layout: append-only windows + merge-on-read + compaction must
produce byte-identical final state to the rewrite layout and the oracle."""

import glob
import os

import pandas as pd
import pytest

from oplogtoredis_ray.config import PipelineConfig
from oplogtoredis_ray.pipelines.ingest import run_ingest
from oplogtoredis_ray.sources.event_log import log_ts_bounds
from oplogtoredis_ray.sources.synthetic import (
    GeneratorSpec,
    generate_event_log,
    oracle_apply,
    write_event_log,
)
from oplogtoredis_ray.state.gc import collect_garbage, export_snapshot
from oplogtoredis_ray.state.lake import read_lake
from oplogtoredis_ray.state.manifest import read_all_manifests

SPEC = GeneratorSpec(seed=17, n_conversations=60, duplicate_rate=0.04, txn_rate=0.05)


@pytest.fixture(scope="module")
def log_df():
    return generate_event_log(SPEC)


@pytest.fixture()
def log_dir(tmp_path, log_df):
    d = tmp_path / "events"
    write_event_log(log_df, str(d))
    return str(d)


def _final(lake):
    df = read_lake(lake).to_pandas()
    df["ts"] = df["ts"].astype("int64")
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _cfg(log_dir, n_windows, **kw):
    lo, hi = log_ts_bounds(log_dir)
    return PipelineConfig(
        num_partitions=4,
        window_us=(hi - lo) // n_windows + 1,
        state_mode="delta",
        **kw,
    )


@pytest.mark.usefixtures("ray_session")
class TestDeltaMode:
    def test_delta_matches_oracle_no_compaction(self, log_dir, log_df, tmp_lake):
        cfg = _cfg(log_dir, 3, compact_threshold=10)  # length cap never reached
        run_ingest(log_dir, tmp_lake, cfg)
        deltas = glob.glob(f"{tmp_lake}/lake/p=*/delta-*.parquet")
        assert len(deltas) > 0
        assert not glob.glob(f"{tmp_lake}/lake/p=*/state-*.parquet")
        pd.testing.assert_frame_equal(
            _final(tmp_lake), oracle_apply(log_df), check_dtype=False
        )

    def test_delta_compaction_collapses_chain(self, log_dir, log_df, tmp_lake):
        cfg = _cfg(log_dir, 6, compact_threshold=2)  # compacts repeatedly
        run_ingest(log_dir, tmp_lake, cfg)
        for m in read_all_manifests(tmp_lake):
            assert len(m.chain()) <= 3  # threshold+1 at most
        # at least one partition holds a compacted base
        assert glob.glob(f"{tmp_lake}/lake/p=*/state-*.parquet")
        pd.testing.assert_frame_equal(
            _final(tmp_lake), oracle_apply(log_df), check_dtype=False
        )

    def test_delta_equals_rewrite(self, log_dir, log_df, tmp_path):
        lake_d, lake_r = str(tmp_path / "d"), str(tmp_path / "r")
        run_ingest(log_dir, lake_d, _cfg(log_dir, 4, compact_threshold=3))
        lo, hi = log_ts_bounds(log_dir)
        run_ingest(
            log_dir,
            lake_r,
            PipelineConfig(num_partitions=4, window_us=(hi - lo) // 4 + 1),
        )
        pd.testing.assert_frame_equal(_final(lake_d), _final(lake_r))

    def test_delta_resume_and_idempotence(self, log_dir, log_df, tmp_lake):
        cfg = _cfg(log_dir, 4, compact_threshold=2)
        run_ingest(log_dir, tmp_lake, cfg, max_windows=2)
        res2 = run_ingest(log_dir, tmp_lake, cfg)  # resume rest
        assert res2.windows_run == 2
        before = _final(tmp_lake)
        res3 = run_ingest(log_dir, tmp_lake, cfg)  # no-op
        assert res3.windows_run == 0
        pd.testing.assert_frame_equal(before, _final(tmp_lake))
        pd.testing.assert_frame_equal(before, oracle_apply(log_df), check_dtype=False)

    def test_delta_gc_and_export(self, log_dir, log_df, tmp_lake, tmp_path):
        cfg = _cfg(log_dir, 5, compact_threshold=2)
        run_ingest(log_dir, tmp_lake, cfg)
        # GC removes superseded deltas/bases but never chain members
        collect_garbage(tmp_lake, grace_seconds=0)
        pd.testing.assert_frame_equal(
            _final(tmp_lake), oracle_apply(log_df), check_dtype=False
        )
        dest = str(tmp_path / "exp")
        stats = export_snapshot(tmp_lake, [dest])
        import pyarrow.parquet as pq

        total = sum(
            pq.read_metadata(f).num_rows for f in glob.glob(f"{dest}/state-*.parquet")
        )
        assert total == stats["rows"] == len(oracle_apply(log_df))


@pytest.mark.usefixtures("ray_session")
def test_delta_custom_payload_cols_roundtrip(tmp_path):
    """Regression: delta chains must preserve non-default payload columns
    through apply, merge-on-read, read_lake and export."""
    import numpy as np
    import pyarrow as pa

    from oplogtoredis_ray.stages.apply import make_apply_fn
    from oplogtoredis_ray.state.lake import read_partition_state, read_partition_state_arrow
    from oplogtoredis_ray.state.manifest import read_manifest

    cols = ("role", "text", "meta")
    lake = str(tmp_path / "lake")
    cfg = PipelineConfig(
        num_partitions=1, payload_cols=cols, state_mode="delta", compact_threshold=10
    )

    def _batch(ts, op, text, meta):
        return pa.table(
            {
                "ts": pa.array([ts], type=pa.timestamp("us")),
                "seq": pa.array([0], type=pa.int32()),
                "tx_idx": pa.array([0], type=pa.int32()),
                "op": pa.array([op]),
                "conv_id": pa.array(["c"]),
                "turn_idx": pa.array([0], type=pa.int32()),
                "role": pa.array(["user"]),
                "text": pa.array([text]),
                "meta": pa.array([meta]),
                "partition_id": pa.array([0], type=pa.int32()),
            }
        )

    make_apply_fn(lake, "w1", cfg)(_batch(1, "i", "a", "M1"))
    make_apply_fn(lake, "w2", cfg)(_batch(2, "u", "b", None))
    m = read_manifest(lake, 0)
    assert len(m.chain()) == 2
    st = read_partition_state_arrow(lake, m, cols).to_pandas()
    assert st.iloc[0]["meta"] == "M1" and st.iloc[0]["text"] == "b"
    # pandas variant merges chains too
    st2 = read_partition_state(lake, m, cols)
    assert st2.iloc[0]["meta"] == "M1"
    # export preserves custom payload
    from oplogtoredis_ray.state.gc import export_snapshot

    dest = str(tmp_path / "exp")
    export_snapshot(lake, [dest], payload_cols=cols)
    import glob as _glob

    import pyarrow.parquet as pq

    f = _glob.glob(f"{dest}/state-snapshot-*.parquet")[0]
    exp = pq.read_table(f).to_pandas()
    assert exp.iloc[0]["meta"] == "M1"
    # re-export after another window refreshes the snapshot (watermark name)
    make_apply_fn(lake, "w3", cfg)(_batch(3, "u", "c", "M2"))
    export_snapshot(lake, [dest], payload_cols=cols)
    files = sorted(_glob.glob(f"{dest}/state-snapshot-*.parquet"))
    assert len(files) == 2  # new watermark → new content-identified file
    import json as _json

    snap = _json.load(open(f"{dest}/_snapshot.json"))
    latest = snap["partitions"][0]["file"]
    got = pq.read_table(f"{dest}/{latest}").to_pandas()
    assert got.iloc[0]["meta"] == "M2" and got.iloc[0]["text"] == "c"


@pytest.mark.usefixtures("ray_session")
def test_gc_concurrent_with_delta_ingest_preserves_correctness(tmp_path):
    """GC running WHILE a multi-window delta ingest commits must never
    delete a live chain link: final state equals the sequential oracle and
    every manifest chain file still exists (bench runs this shape for
    timing; this is the correctness assertion behind it)."""
    import os
    import threading

    from oplogtoredis_ray.sources.event_log import log_ts_bounds
    from oplogtoredis_ray.state.gc import collect_garbage
    from oplogtoredis_ray.state.manifest import read_all_manifests

    spec = GeneratorSpec(seed=21, n_conversations=80, mean_turns=4, duplicate_rate=0.03)
    log = generate_event_log(spec)
    log_dir = str(tmp_path / "events")
    write_event_log(log, log_dir)
    lake = str(tmp_path / "lake")
    lo, hi = log_ts_bounds(log_dir)
    cfg = PipelineConfig(
        num_partitions=4,
        window_us=(hi - lo) // 6 + 1,
        state_mode="delta",
        compact_threshold=2,  # force compactions mid-run
    )
    stop = threading.Event()
    removed = []

    def gc_loop():
        while not stop.wait(0.2):
            removed.extend(collect_garbage(lake, grace_seconds=0.5))

    t = threading.Thread(target=gc_loop, daemon=True)
    t.start()
    res = run_ingest(log_dir, lake, cfg)
    stop.set()
    t.join()
    assert res.windows_run >= 6
    # every live chain link survived the concurrent GC
    for m in read_all_manifests(lake):
        for rel in m.chain():
            assert os.path.exists(os.path.join(lake, rel)), rel
    got = read_lake(lake).to_pandas()
    got["ts"] = got["ts"].astype("int64")
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = oracle_apply(log)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

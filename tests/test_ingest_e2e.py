"""End-to-end windowed ingest over Ray Data vs the sequential oracle.

Scenario matrix mirrors the reference's fault-injection suite (F5 in
FIXTURES.md): clean replay (baseline_test.go), duplicate injection +
double-run (HA_test.go), kill-and-resume mid-window (resume_test.go /
restart_test.go), denylist (denylist_oplog_test.go), schema evolution and
hot-key skew (north_rule).
"""

import numpy as np
import pandas as pd
import pytest

from oplogtoredis_ray.config import PipelineConfig
from oplogtoredis_ray.pipelines.ingest import run_ingest, run_window, window_id_for
from oplogtoredis_ray.sources.event_log import log_ts_bounds
from oplogtoredis_ray.sources.synthetic import (
    GeneratorSpec,
    generate_event_log,
    oracle_apply,
    write_event_log,
)
from oplogtoredis_ray.state.lake import read_lake
from oplogtoredis_ray.state.manifest import (
    read_all_manifests,
    read_completed_windows,
)

SPEC = GeneratorSpec(
    seed=5, n_conversations=80, mean_turns=3, duplicate_rate=0.04, txn_rate=0.06
)


def _cfg(**kw):
    defaults = dict(num_partitions=8, window_us=0)  # window set per test
    defaults.update(kw)
    return PipelineConfig(**defaults)


@pytest.fixture(scope="module")
def log_df():
    return generate_event_log(SPEC)


@pytest.fixture()
def log_dir(tmp_path, log_df):
    d = tmp_path / "events"
    write_event_log(log_df, str(d))
    return str(d)


def _final_lake(lake_root) -> pd.DataFrame:
    df = read_lake(lake_root).to_pandas()
    df["ts"] = df["ts"].astype("int64")
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _assert_matches_oracle(lake_root, log_df, denylist=frozenset()):
    got = _final_lake(lake_root)
    want = oracle_apply(log_df, denylist=denylist)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _window_cfg(log_dir, n_windows, **kw):
    lo, hi = log_ts_bounds(log_dir)
    width = max((hi - lo) // n_windows + 1, 1)
    return _cfg(window_us=width, **kw)


@pytest.mark.usefixtures("ray_session")
class TestIngest:
    def test_clean_replay_matches_oracle(self, log_dir, log_df, tmp_lake):
        cfg = _window_cfg(log_dir, 4)
        res = run_ingest(log_dir, tmp_lake, cfg)
        assert res.windows_run == 4
        assert res.dupes_dropped > 0  # generator injects same-window replays
        _assert_matches_oracle(tmp_lake, log_df)

    def test_single_window_whole_log(self, log_dir, log_df, tmp_lake):
        cfg = _window_cfg(log_dir, 1)
        res = run_ingest(log_dir, tmp_lake, cfg)
        assert res.windows_run == 1
        _assert_matches_oracle(tmp_lake, log_df)

    def test_double_run_is_idempotent(self, log_dir, log_df, tmp_lake):
        # ≙ HA: the same log replayed twice must not double-apply anything
        cfg = _window_cfg(log_dir, 3)
        run_ingest(log_dir, tmp_lake, cfg)
        before = _final_lake(tmp_lake)
        res2 = run_ingest(log_dir, tmp_lake, cfg)
        assert res2.windows_run == 0  # resume point is already at log end
        pd.testing.assert_frame_equal(before, _final_lake(tmp_lake))
        _assert_matches_oracle(tmp_lake, log_df)

    def test_rerun_window_skips_committed_partitions(self, log_dir, log_df, tmp_lake):
        cfg = _window_cfg(log_dir, 2)
        lo, hi = log_ts_bounds(log_dir)
        start = lo - 1
        end = min(start + cfg.window_us, hi)
        stats1 = run_window(log_dir, tmp_lake, cfg, start, end)
        assert not stats1["skipped"].any()
        # re-execute the SAME window (simulates a retried/duplicate task set)
        stats2 = run_window(log_dir, tmp_lake, cfg, start, end)
        assert stats2["skipped"].all()
        assert stats2["rows_out"].sum() == 0

    def test_kill_and_resume_mid_window(self, log_dir, log_df, tmp_lake):
        """Crash after some partitions committed but before the window's
        lineage commit: rerun replays the window; committed partitions skip,
        the rest apply; final state == oracle."""
        cfg = _window_cfg(log_dir, 3)
        lo, hi = log_ts_bounds(log_dir)
        # window 1 completes normally
        res = run_ingest(log_dir, tmp_lake, cfg, max_windows=1)
        assert res.windows_run == 1
        # window 2 "crashes": apply only some partitions, never commit lineage
        w2_start = res.window_stats[0]["end_us"]
        w2_end = min(w2_start + cfg.window_us, hi)
        wid = window_id_for(w2_start, w2_end)
        import glob

        import pyarrow.dataset as pads

        from oplogtoredis_ray.stages.apply import make_apply_fn
        from oplogtoredis_ray.stages.parse import ParseStage
        from oplogtoredis_ray.sources.event_log import unified_schema, window_filter

        table = pads.dataset(
            sorted(glob.glob(f"{log_dir}/*.parquet")), schema=unified_schema(log_dir)
        ).to_table(filter=window_filter(w2_start, w2_end))
        import pyarrow.compute as pc

        parsed = ParseStage(cfg)(table)
        apply_fn = make_apply_fn(tmp_lake, wid, cfg)
        touched = sorted(pc.unique(parsed["partition_id"]).to_pylist())
        crashed_after = touched[: len(touched) // 2]
        for pid in crashed_after:
            apply_fn(parsed.filter(pc.equal(parsed["partition_id"], pid)))
        # now resume from checkpoints: window 2 is not in lineage → replayed
        res2 = run_ingest(log_dir, tmp_lake, cfg)
        assert res2.windows_run == 2  # windows 2 (replayed) and 3
        # the crashed partitions' events were replayed but skipped via lineage
        assert res2.window_stats[0]["events_in"] > 0
        _assert_matches_oracle(tmp_lake, log_df)

    def test_denylist(self, log_dir, log_df, tmp_lake):
        denied = frozenset(["conv-000000", "conv-000003"])
        cfg = _window_cfg(log_dir, 2).with_denylist(set(denied))
        run_ingest(log_dir, tmp_lake, cfg)
        got = _final_lake(tmp_lake)
        assert not got["conv_id"].isin(denied).any()
        _assert_matches_oracle(tmp_lake, log_df, denylist=denied)

    def test_schema_evolution_nulls_before_tool(self, log_dir, log_df, tmp_lake):
        cfg = _window_cfg(log_dir, 3)
        run_ingest(log_dir, tmp_lake, cfg)
        got = _final_lake(tmp_lake)
        assert "tool" in got.columns
        assert got["tool"].notna().any()

    def test_skewed_hot_partition_salted(self, tmp_path):
        spec = GeneratorSpec(
            seed=31, n_conversations=12, zipf_a=1.05, max_turns=500, duplicate_rate=0.02
        )
        log = generate_event_log(spec)
        d = tmp_path / "hot"
        write_event_log(log, str(d))
        lake = str(tmp_path / "hotlake")
        # tiny salt threshold → hot partitions take the chunked-fold path
        lo, hi = log_ts_bounds(str(d))
        cfg = _cfg(
            window_us=(hi - lo) + 1, num_partitions=4, salt_rows_threshold=200, salt_chunks=8
        )
        run_ingest(str(d), lake, cfg)
        got = _final_lake(lake)
        want = oracle_apply(log)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_manifests_and_lineage(self, log_dir, log_df, tmp_lake):
        cfg = _window_cfg(log_dir, 2)
        run_ingest(log_dir, tmp_lake, cfg)
        manifests = read_all_manifests(tmp_lake)
        assert len(manifests) > 0
        for m in manifests:
            assert m.watermark > (-1, -1, -1)
            assert m.state_file is not None
            assert len(m.lineage) >= 1
            assert m.metrics["events_applied"] > 0
        windows = read_completed_windows(tmp_lake)
        assert len(windows) == 2
        assert windows[0]["stats"]["events_in"] > 0


@pytest.mark.usefixtures("ray_session")
def test_corrupt_manifest_fails_closed(tmp_path):
    """≙ fail-closed resume policy (tail.go:543-570): a present-but-
    unreadable checkpoint aborts the run rather than silently skipping."""
    from oplogtoredis_ray.state.manifest import ManifestReadError

    spec = GeneratorSpec(seed=3, n_conversations=10)
    log = generate_event_log(spec)
    d = str(tmp_path / "ev")
    lake = str(tmp_path / "lake")
    write_event_log(log, d)
    lo, hi = log_ts_bounds(d)
    cfg = _cfg(window_us=hi - lo + 1, num_partitions=4)
    run_ingest(d, lake, cfg)
    mpath = tmp_path / "lake" / "manifests" / "p-00000.json"
    assert mpath.exists()
    mpath.write_text("{corrupt")
    with pytest.raises(ManifestReadError):
        run_ingest(d, lake, cfg)


@pytest.mark.usefixtures("ray_session")
def test_follow_growing_log(tmp_path):
    """Continuous tail: new files appended after the first catch-up are
    ingested by subsequent rounds; final state equals the full-log oracle."""
    from oplogtoredis_ray.pipelines.ingest import run_follow

    spec = GeneratorSpec(seed=21, n_conversations=30, n_files=4)
    log = generate_event_log(spec)
    evo = log.attrs["evo_ts"]
    d = tmp_path / "growing"
    lake = str(tmp_path / "lake")
    # first half of the files appear...
    d.mkdir()
    from oplogtoredis_ray.sources.synthetic import _arrow_table
    import pyarrow.parquet as _pq

    chunks = dict(tuple(log.groupby("_file", sort=True)))
    ts_split = {fid: c for fid, c in chunks.items()}
    first = [0, 1]
    for fid in first:
        c = chunks[fid]
        _pq.write_table(_arrow_table(c, bool((c["ts"] >= evo).any())), str(d / f"events-{fid:04d}.parquet"))
    lo, hi = log_ts_bounds(str(d))
    cfg = _cfg(window_us=(hi - lo) // 2 + 1, num_partitions=4)
    res1 = run_follow(str(d), lake, cfg)
    assert res1.windows_run >= 1
    # ...then the rest arrive
    for fid in sorted(chunks):
        if fid in first:
            continue
        c = chunks[fid]
        _pq.write_table(_arrow_table(c, bool((c["ts"] >= evo).any())), str(d / f"events-{fid:04d}.parquet"))
    res2 = run_follow(str(d), lake, cfg)
    assert res2.windows_run >= 1
    _assert_matches_oracle(lake, log)


@pytest.mark.usefixtures("ray_session")
def test_distributed_salt_fold_matches_oracle(tmp_path):
    """Two-stage salted fold: pre-fold per (partition, ts-salt) then apply
    pseudo-events per partition — must equal the oracle (hot-key log)."""
    spec = GeneratorSpec(
        seed=41, n_conversations=12, zipf_a=1.05, max_turns=400, duplicate_rate=0.03,
        txn_rate=0.05,
    )
    log = generate_event_log(spec)
    d = tmp_path / "hot"
    write_event_log(log, str(d))
    lo, hi = log_ts_bounds(str(d))
    for n_windows in (1, 3):
        lake = str(tmp_path / f"lake{n_windows}")
        cfg = _cfg(
            window_us=(hi - lo) // n_windows + 1,
            num_partitions=4,
            distributed_salt_buckets=6,
        )
        run_ingest(str(d), lake, cfg)
        got = _final_lake(lake)
        want = oracle_apply(log)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize(
    "mode_kw",
    [
        dict(state_mode="delta", compact_threshold=2),
        dict(distributed_salt_buckets=5),
        dict(state_mode="delta", compact_threshold=2, distributed_salt_buckets=5),
        dict(state_mode="delta", compact_threshold=2, salt_rows_threshold=100),
        dict(window_lookahead=True),
        dict(
            state_mode="delta",
            compact_threshold=2,
            distributed_salt_buckets=5,
            window_lookahead=True,
        ),
    ],
    ids=[
        "delta",
        "dist-salt",
        "delta+dist-salt",
        "delta+chunked",
        "lookahead",
        "delta+dist-salt+lookahead",
    ],
)
def test_mode_matrix_matches_oracle(log_dir, log_df, tmp_lake, mode_kw):
    """All layout/skew mode combinations must produce the oracle state."""
    cfg = _window_cfg(log_dir, 3, num_partitions=4, **mode_kw)
    run_ingest(log_dir, tmp_lake, cfg)
    _assert_matches_oracle(tmp_lake, log_df)


@pytest.mark.usefixtures("ray_session")
def test_lookahead_resume_and_idempotence(log_dir, log_df, tmp_lake):
    """Lookahead keeps apply order sequential: killing after max_windows=2
    then resuming (still with lookahead) replays nothing and converges."""
    cfg = _window_cfg(log_dir, 4, window_lookahead=True)
    r1 = run_ingest(log_dir, tmp_lake, cfg, max_windows=2)
    assert r1.windows_run == 2
    r2 = run_ingest(log_dir, tmp_lake, cfg)
    assert r2.windows_run == 2  # resumes past the two committed windows
    _assert_matches_oracle(tmp_lake, log_df)


@pytest.mark.usefixtures("ray_session")
def test_follow_growing_log_with_lookahead(tmp_path):
    """Continuous tail with window lookahead: appended files between rounds
    still converge to the full-log oracle (the prefetch is per-run, so new
    files are picked up by the next round's fresh window enumeration)."""
    import pyarrow.parquet as _pq

    from oplogtoredis_ray.pipelines.ingest import run_follow
    from oplogtoredis_ray.sources.synthetic import _arrow_table

    spec = GeneratorSpec(seed=23, n_conversations=30, n_files=4)
    log = generate_event_log(spec)
    evo = log.attrs["evo_ts"]
    d = tmp_path / "growing"
    lake = str(tmp_path / "lake")
    d.mkdir()
    chunks = dict(tuple(log.groupby("_file", sort=True)))
    for fid in (0, 1):
        c = chunks[fid]
        _pq.write_table(
            _arrow_table(c, bool((c["ts"] >= evo).any())),
            str(d / f"events-{fid:04d}.parquet"),
        )
    lo, hi = log_ts_bounds(str(d))
    cfg = _cfg(window_us=(hi - lo) // 3 + 1, num_partitions=4, window_lookahead=True)
    res1 = run_follow(str(d), lake, cfg)
    assert res1.windows_run >= 2
    for fid in sorted(chunks):
        if fid in (0, 1):
            continue
        c = chunks[fid]
        _pq.write_table(
            _arrow_table(c, bool((c["ts"] >= evo).any())),
            str(d / f"events-{fid:04d}.parquet"),
        )
    res2 = run_follow(str(d), lake, cfg)
    assert res2.windows_run >= 1
    _assert_matches_oracle(lake, log)

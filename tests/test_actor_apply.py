"""Persistent-actor apply exchange (stages/actor_apply.py) vs the oracle.

The standing pool replaces the per-window groupby sort-shuffle; these tests
pin (a) end-to-end equivalence with the sequential oracle across window
counts and state layouts, (b) exactly-once under double-runs, duplicate
feeds and actor death mid-run (≙ HA_test.go / restart_test.go semantics),
and (c) the epoch protocol that invalidates prefed windows after a pool
restart.
"""

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
from oplogtoredis_ray.state.manifest import read_all_manifests

SPEC = GeneratorSpec(
    seed=11, n_conversations=60, mean_turns=3, duplicate_rate=0.05, txn_rate=0.05
)


@pytest.fixture(scope="module")
def log_df():
    return generate_event_log(SPEC)


@pytest.fixture()
def log_dir(tmp_path, log_df):
    d = tmp_path / "events"
    write_event_log(log_df, str(d))
    return str(d)


def _cfg(log_dir, n_windows, **kw):
    lo, hi = log_ts_bounds(log_dir)
    width = max((hi - lo) // n_windows + 1, 1)
    defaults = dict(num_partitions=8, window_us=width, apply_mode="actors")
    defaults.update(kw)
    return PipelineConfig(**defaults)


def _assert_matches_oracle(lake_root, log_df):
    got = read_lake(lake_root).to_pandas()
    got["ts"] = got["ts"].astype("int64")
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = oracle_apply(log_df)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
class TestActorApply:
    def test_matches_oracle_rewrite(self, log_dir, log_df, tmp_lake):
        res = run_ingest(log_dir, tmp_lake, _cfg(log_dir, 4))
        assert res.windows_run == 4
        assert res.dupes_dropped > 0
        _assert_matches_oracle(tmp_lake, log_df)

    def test_matches_oracle_delta_lookahead(self, log_dir, log_df, tmp_lake):
        # delta layout + deep lookahead (prefeed of window N+1 into the
        # standing exchange while window N folds)
        cfg = _cfg(
            log_dir, 4, state_mode="delta", compact_threshold=2,
            window_lookahead=True,
        )
        res = run_ingest(log_dir, tmp_lake, cfg)
        assert res.windows_run == 4
        _assert_matches_oracle(tmp_lake, log_df)

    def test_double_run_is_idempotent(self, log_dir, log_df, tmp_lake):
        cfg = _cfg(log_dir, 3)
        run_ingest(log_dir, tmp_lake, cfg)
        res2 = run_ingest(log_dir, tmp_lake, cfg)
        assert res2.windows_run == 0  # resume = end of last committed window
        _assert_matches_oracle(tmp_lake, log_df)

    def test_duplicate_feed_is_deduped(self, log_dir, log_df, tmp_lake):
        """A replayed feed wave (retried task / prefeed + re-feed race)
        buffers every event twice; the fold's identity dedup must drop the
        second copy — the lake is unchanged vs the oracle."""
        from oplogtoredis_ray.pipelines.ingest import build_window_dataset
        from oplogtoredis_ray.stages.actor_apply import ActorApplyPool

        cfg = _cfg(log_dir, 1)
        lo, hi = log_ts_bounds(log_dir)
        from oplogtoredis_ray.state.lake_config import write_or_check_lake_config

        write_or_check_lake_config(tmp_lake, cfg)
        pool = ActorApplyPool(tmp_lake, cfg, num_actors=3)
        try:
            wid = window_id_for(lo - 1, hi)
            ds = build_window_dataset(log_dir, tmp_lake, cfg, lo - 1, hi).materialize()
            n1 = pool.feed_dataset(ds, wid)
            n2 = pool.feed_dataset(ds, wid)  # duplicate wave
            assert n1 == n2 == len(log_df)
            stats = pool.finish_window(wid)
            # every original event arrived twice; at least half the input is
            # dropped as exact identity replays
            assert int(stats["dupes_dropped"].sum()) >= len(log_df) // 2
        finally:
            pool.shutdown()
        _assert_matches_oracle(tmp_lake, log_df)

    def test_actor_death_replays_window(self, log_dir, log_df, tmp_lake):
        """Killing a pool member makes the feed/finish wave fail; run_window
        must recreate the pool (epoch bump) and replay the window to a
        correct lake — ≙ restart_test.go:50-64 bounded re-processing."""
        import ray

        from oplogtoredis_ray.stages.actor_apply import ActorApplyPool
        from oplogtoredis_ray.state.lake_config import write_or_check_lake_config

        cfg = _cfg(log_dir, 1)
        write_or_check_lake_config(tmp_lake, cfg)
        lo, hi = log_ts_bounds(log_dir)
        pool = ActorApplyPool(tmp_lake, cfg, num_actors=3)
        try:
            epoch0 = pool.epoch
            ray.kill(pool.actors[1], no_restart=True)
            stats = run_window(
                log_dir, tmp_lake, cfg, lo - 1, hi, actor_pool=pool
            )
            assert pool.epoch > epoch0  # the pool was recreated
            assert int(stats["events_in"].sum()) == len(log_df)
        finally:
            pool.shutdown()
        _assert_matches_oracle(tmp_lake, log_df)
        wid = window_id_for(lo - 1, hi)
        for m in read_all_manifests(tmp_lake):
            assert m.lineage == [wid]

    def test_manifest_cache_warm_across_windows(self, log_dir, log_df, tmp_lake):
        """The same pool applies consecutive windows; cached manifests must
        carry the lineage forward (no stale-watermark double-apply)."""
        from oplogtoredis_ray.pipelines.ingest import build_window_dataset
        from oplogtoredis_ray.stages.actor_apply import ActorApplyPool
        from oplogtoredis_ray.state.lake_config import write_or_check_lake_config

        cfg = _cfg(log_dir, 2)
        write_or_check_lake_config(tmp_lake, cfg)
        lo, hi = log_ts_bounds(log_dir)
        mid = lo - 1 + cfg.window_us
        pool = ActorApplyPool(tmp_lake, cfg, num_actors=2)
        try:
            for s, e in [(lo - 1, mid), (mid, hi)]:
                wid = window_id_for(s, e)
                ds = build_window_dataset(log_dir, tmp_lake, cfg, s, e)
                pool.feed_dataset(ds, wid)
                pool.finish_window(wid)
        finally:
            pool.shutdown()
        _assert_matches_oracle(tmp_lake, log_df)
        lineages = {tuple(m.lineage) for m in read_all_manifests(tmp_lake)}
        # every touched partition saw the two windows in order
        for lin in lineages:
            assert list(lin) == [
                w for w in
                [window_id_for(lo - 1, mid), window_id_for(mid, hi)]
                if w in lin
            ]

    def test_finish_fault_poisons_actor_no_silent_loss(
        self, log_dir, log_df, tmp_lake, tmp_path
    ):
        """An APPLICATION error mid-finish (actor survives, unlike
        ray.kill) must poison the actor so its already-queued finish for
        the NEXT window raises before committing.  Without the poison, the
        pipelined driver — which submits finish(N+1) while finish(N) folds
        — would let the surviving actor advance watermarks past the failed
        window N; the replay of N would then drop all its events as
        below-watermark: permanent silent loss.  The flag file is consumed
        exactly once (it does not re-arm across the pool recreate)."""
        flag = tmp_path / "fail_finish.flag"
        flag.write_text("")
        cfg = _cfg(
            log_dir, 4, state_mode="delta", compact_threshold=2,
            window_lookahead=True, lookahead_depth=2,
            test_fail_finish_flag=str(flag),
        )
        res = run_ingest(log_dir, tmp_lake, cfg)
        assert not flag.exists()  # the fault actually fired
        assert res.windows_run == 4
        # every event of every window is in the lake — nothing was dropped
        # below a prematurely-advanced watermark
        _assert_matches_oracle(tmp_lake, log_df)
        # all four windows are committed in lineage order on every partition
        from oplogtoredis_ray.state.manifest import read_completed_windows

        wids = [w["window_id"] for w in read_completed_windows(tmp_lake)]
        assert len(wids) == 4
        for m in read_all_manifests(tmp_lake):
            assert list(m.lineage) == [w for w in wids if w in m.lineage]

    def test_actor_killed_mid_grouped_ingest(self, log_dir, log_df, tmp_lake):
        """ray.kill one pool member while the grouped run_ingest is between
        window commits: subsequent finishes/feeds on the dead actor fail,
        the driver flushes the stale in-flight windows, recreates the pool
        and replays — the lake must still match the oracle row-for-row."""
        import ray

        from oplogtoredis_ray.pipelines import ingest as I

        killed = {"done": False}

        def kill_one(agg):
            if not killed["done"]:
                pool = _live_pools[-1]
                if pool.actors:
                    ray.kill(pool.actors[0], no_restart=True)
                    killed["done"] = True

        # capture pool handles as run_ingest creates them
        from oplogtoredis_ray.stages.actor_apply import ActorApplyPool

        _live_pools = []
        orig_init = ActorApplyPool.__init__

        def spy_init(self, *a, **k):
            orig_init(self, *a, **k)
            _live_pools.append(self)

        ActorApplyPool.__init__ = spy_init
        try:
            cfg = _cfg(
                log_dir, 6, state_mode="delta", compact_threshold=3,
                window_lookahead=True,
            )
            res = I.run_ingest(log_dir, tmp_lake, cfg, on_window=kill_one)
        finally:
            ActorApplyPool.__init__ = orig_init
        assert killed["done"]
        assert res.windows_run == 6
        _assert_matches_oracle(tmp_lake, log_df)

    def test_poisoned_actor_refuses_next_finish(self, log_dir, tmp_lake):
        """Unit-level pin of the poison semantics: after a finish raises,
        the next finish on the same actor raises BEFORE committing."""
        import ray

        from oplogtoredis_ray.pipelines.ingest import build_window_dataset
        from oplogtoredis_ray.stages.actor_apply import ActorApplyPool
        from oplogtoredis_ray.state.lake_config import write_or_check_lake_config
        from oplogtoredis_ray.state.manifest import read_all_manifests as _ram

        import os
        flag = os.path.join(tmp_lake + "-flags", "once")
        os.makedirs(os.path.dirname(flag), exist_ok=True)
        open(flag, "w").close()
        cfg = _cfg(log_dir, 2, test_fail_finish_flag=flag)
        write_or_check_lake_config(tmp_lake, cfg)
        lo, hi = log_ts_bounds(log_dir)
        mid = lo - 1 + cfg.window_us
        pool = ActorApplyPool(tmp_lake, cfg, num_actors=1)
        try:
            w1, w2 = window_id_for(lo - 1, mid), window_id_for(mid, hi)
            pool.feed_dataset(
                build_window_dataset(log_dir, tmp_lake, cfg, lo - 1, mid), w1
            )
            pool.feed_dataset(
                build_window_dataset(log_dir, tmp_lake, cfg, mid, hi), w2
            )
            f1 = pool.submit_finish(w1)
            f2 = pool.submit_finish(w2)  # queued behind the failing finish
            with pytest.raises(ray.exceptions.RayTaskError, match="injected"):
                ray.get(f1)
            with pytest.raises(ray.exceptions.RayTaskError, match="poisoned"):
                ray.get(f2)
            # window 2 must NOT have committed anywhere: no partition's
            # lineage may contain w2 without w1 (i.e. no watermark ran ahead)
            for m in _ram(tmp_lake):
                assert w2 not in m.lineage
        finally:
            pool.shutdown()


@pytest.mark.usefixtures("ray_session")
class TestAsyncCompaction:
    """Background chain compaction (compact concurrency group): folds only
    ever APPEND deltas; the compactor merges the chain off the fold path
    and swaps it in with a prefix-CAS (`commit_chain_rewrite`)."""

    def test_delta_ingest_compacts_async_and_matches_oracle(
        self, log_dir, log_df, tmp_lake
    ):
        cfg = _cfg(
            log_dir, 6, state_mode="delta", compact_threshold=2,
            window_lookahead=True, lookahead_depth=3,
        )
        res = run_ingest(log_dir, tmp_lake, cfg)
        assert res.windows_run == 6
        _assert_matches_oracle(tmp_lake, log_df)
        # run_ingest drains the compact group on clean completion: no
        # partition may end deeper than one append past the threshold
        chains = [len(m.chain()) for m in read_all_manifests(tmp_lake)]
        assert max(chains) <= cfg.compact_threshold + 1, chains

    def test_chain_rewrite_prefix_cas(self, tmp_path):
        """commit_chain_rewrite succeeds when folds appended past the
        snapshot (prefix intact) and fails when the prefix changed."""
        from oplogtoredis_ray.state.manifest import (
            Manifest,
            commit_chain_rewrite,
            commit_manifest,
            read_manifest,
        )

        lake = str(tmp_path / "lake")
        m = Manifest(
            partition_id=0, watermark=(10, 0, 0),
            state_files=["lake/p=00000/d1", "lake/p=00000/d2"],
            rows=-1, lineage=["w1", "w2"],
        )
        assert commit_manifest(lake, m)
        # concurrent fold appends d3 after the compactor snapshot [d1, d2]
        m2 = Manifest(
            partition_id=0, watermark=(20, 0, 0),
            state_files=["lake/p=00000/d1", "lake/p=00000/d2", "lake/p=00000/d3"],
            rows=-1, lineage=["w1", "w2", "w3"],
        )
        assert commit_manifest(lake, m2)
        committed = commit_chain_rewrite(
            lake, 0, ["lake/p=00000/d1", "lake/p=00000/d2"], "lake/p=00000/base", 5
        )
        assert committed is not None
        assert committed.chain() == ["lake/p=00000/base", "lake/p=00000/d3"]
        assert committed.lineage == ["w1", "w2", "w3"]  # untouched
        assert committed.watermark == (20, 0, 0)
        # a second CAS against the now-stale prefix must fail
        assert commit_chain_rewrite(
            lake, 0, ["lake/p=00000/d1", "lake/p=00000/d2"], "lake/p=00000/b2", 5
        ) is None
        assert read_manifest(lake, 0).chain()[0] == "lake/p=00000/base"

    def test_chain_rewrite_keep_head_partial(self, tmp_path):
        """keep=1 (leveled merge): the base stays, the snapshot's delta
        suffix collapses to one mid file, later appends survive, and the
        metrics_update lands atomically with the CAS."""
        from oplogtoredis_ray.state.manifest import (
            Manifest,
            commit_chain_rewrite,
            commit_manifest,
        )

        lake = str(tmp_path / "lake")
        pfx = "lake/p=00001/"
        m = Manifest(
            partition_id=1, watermark=(10, 0, 0),
            state_files=[pfx + "base", pfx + "d1", pfx + "d2", pfx + "d3"],
            rows=-1, lineage=["w1", "w2", "w3"],
        )
        assert commit_manifest(lake, m)
        # a fold appends d4 after the compactor snapshot
        m2 = Manifest(
            partition_id=1, watermark=(20, 0, 0),
            state_files=m.state_files + [pfx + "d4"],
            rows=-1, lineage=m.lineage + ["w4"],
        )
        assert commit_manifest(lake, m2)
        committed = commit_chain_rewrite(
            lake, 1, m.state_files, pfx + "mid", -1, keep=1,
            metrics_update={"partials_since_full": 1},
        )
        assert committed is not None
        assert committed.chain() == [pfx + "base", pfx + "mid", pfx + "d4"]
        assert committed.metrics["partials_since_full"] == 1
        assert committed.lineage == ["w1", "w2", "w3", "w4"]
        # keep must lie inside the expected prefix
        with pytest.raises(ValueError, match="keep"):
            commit_chain_rewrite(lake, 1, [pfx + "base"], pfx + "x", -1, keep=1)

    def test_window_commit_carries_partial_cycle_counter(self, tmp_path):
        """Window commits rebuild metrics fresh; the compactor's
        partials_since_full counter must survive them or compact_full_every
        can never see a consecutive-partials streak."""
        from oplogtoredis_ray.state.manifest import (
            Manifest,
            commit_chain_rewrite,
            commit_delta_append,
            commit_manifest,
        )

        lake = str(tmp_path / "lake")
        pfx = "lake/p=00002/"
        m = Manifest(
            partition_id=2, watermark=(10, 0, 0),
            state_files=[pfx + "base", pfx + "d1", pfx + "d2"],
            rows=-1, lineage=["w1", "w2"],
        )
        assert commit_manifest(lake, m)
        assert commit_chain_rewrite(
            lake, 2, m.state_files, pfx + "mid", -1, keep=1,
            metrics_update={"partials_since_full": 2},
        ) is not None
        # a later window commits with a freshly-built metrics dict
        fold_view = Manifest(
            partition_id=2, watermark=(30, 0, 0),
            state_files=[pfx + "base", pfx + "mid"],
            rows=-1, lineage=["w1", "w2", "w3"],
            metrics={"last_window": "w3", "events_applied": 5},
        )
        committed = commit_delta_append(lake, fold_view, pfx + "d3")
        assert committed is not None
        assert committed.metrics["partials_since_full"] == 2
        assert committed.metrics["last_window"] == "w3"
        # lineage-only (empty window) commits carry it too
        empty_view = Manifest(
            partition_id=2, watermark=(30, 0, 0),
            state_files=committed.state_files, rows=-1,
            lineage=committed.lineage + ["w4"],
            metrics={"last_window": "w4"},
        )
        committed2 = commit_delta_append(lake, empty_view, None)
        assert committed2 is not None
        assert committed2.metrics["partials_since_full"] == 2

    def test_leveled_compaction_ingest_matches_oracle(
        self, log_dir, log_df, tmp_lake
    ):
        """e2e: force the leveled path (ratio 0 → every post-base compaction
        is a suffix merge; full_every=2 forces a periodic re-level) across
        10 windows — the lake must still equal the sequential oracle and
        the chain cap must hold after the drain sweep."""
        cfg = _cfg(
            log_dir, 10, state_mode="delta", compact_threshold=2,
            window_lookahead=True, lookahead_depth=3,
            compact_partial_base_ratio=0.0, compact_full_every=2,
        )
        res = run_ingest(log_dir, tmp_lake, cfg)
        assert res.windows_run == 10
        _assert_matches_oracle(tmp_lake, log_df)
        chains = [len(m.chain()) for m in read_all_manifests(tmp_lake)]
        assert max(chains) <= cfg.compact_threshold + 1, chains
        # the leveled path really ran: some partition carries the partial
        # cycle counter and/or a mid-level delta in its chain
        ms = read_all_manifests(tmp_lake)
        assert any("partials_since_full" in m.metrics for m in ms)
        assert any(
            "-mid-" in f for m in ms for f in m.chain()
        ) or any(
            int(m.metrics.get("partials_since_full", 0)) > 0 for m in ms
        )

    def test_delta_append_composes_with_rewrite(self, tmp_path):
        """commit_delta_append appends to the INCUMBENT chain — a fold
        whose cached view predates a background compaction must not
        resurrect the pre-compaction chain."""
        from oplogtoredis_ray.state.manifest import (
            Manifest,
            commit_delta_append,
            commit_manifest,
        )

        lake = str(tmp_path / "lake")
        pre = Manifest(
            partition_id=3, watermark=(10, 0, 0),
            state_files=["lake/p=00003/d1", "lake/p=00003/d2"],
            rows=-1, lineage=["w1", "w2"],
        )
        assert commit_manifest(lake, pre)
        # background compactor collapses [d1, d2] -> [base]
        from oplogtoredis_ray.state.manifest import commit_chain_rewrite

        assert commit_chain_rewrite(
            lake, 3, ["lake/p=00003/d1", "lake/p=00003/d2"], "lake/p=00003/base", 7
        ) is not None
        # fold commits window w3 from its STALE cached view (chain [d1,d2])
        fold_view = Manifest(
            partition_id=3, watermark=(30, 1, 0),
            state_files=["lake/p=00003/d1", "lake/p=00003/d2", "lake/p=00003/d3"],
            rows=-1, lineage=["w1", "w2", "w3"],
        )
        committed = commit_delta_append(lake, fold_view, "lake/p=00003/d3")
        assert committed is not None
        # the append composed with the rewrite instead of clobbering it
        assert committed.chain() == ["lake/p=00003/base", "lake/p=00003/d3"]
        assert committed.watermark == (30, 1, 0)
        assert committed.lineage == ["w1", "w2", "w3"]
        # replaying the same window is superseded (exactly-once)
        assert commit_delta_append(lake, fold_view, "lake/p=00003/d3-r") is None

"""Runtime-mutable denylist + lake-config guard + metrics export.

≙ the reference's denylist control plane (lib/denylist/http.go:22-144 CRUD,
lib/denylist/pg.go:32-79 persistence) and its runtime-toggle acceptance test
(integration-tests/acceptance/denylist_oplog_test.go:12-75): the filter must
flip while one ingest session is running, without a restart.
"""

import json
import subprocess
import sys

import pandas as pd
import pytest

from oplogtoredis_ray.config import PipelineConfig
from oplogtoredis_ray.pipelines.ingest import run_ingest
from oplogtoredis_ray.sources.synthetic import write_event_log
from oplogtoredis_ray.state.denylist import DenylistStore, load_denylist
from oplogtoredis_ray.state.lake import read_lake
from oplogtoredis_ray.state.lake_config import LakeConfigError
from oplogtoredis_ray.state.metrics import read_metrics


def _toggle_log(tmp_path) -> str:
    """Inserts for convs 'keep' and 'flip' in each of three 1ms windows."""
    rows = []
    seq = 0
    for w, ts in enumerate([1000, 2000, 3000]):
        for conv in ["keep", "flip"]:
            rows.append(
                dict(
                    ts=ts,
                    seq=seq,
                    tx_idx=-1,
                    op="i",
                    conv_id=conv,
                    turn_idx=w,
                    role="user",
                    text=f"{conv}-{w}",
                    tool=None,
                    _file=0,
                )
            )
            seq += 1
    df = pd.DataFrame(rows)
    d = tmp_path / "events"
    write_event_log(df, str(d), evo_ts=0)
    return str(d)


class TestDenylistStore:
    def test_crud_semantics(self, tmp_path):
        store = DenylistStore(str(tmp_path / "lake"))
        assert store.entries() == []
        assert store.add("db1") is True
        assert store.add("db1") is False  # idempotent PUT
        assert store.add("db2") is True
        assert store.entries() == ["db1", "db2"]
        assert store.contains("db1")
        assert store.remove("db1") is True
        assert store.remove("db1") is False  # DELETE absent → 404 analogue
        assert store.entries() == ["db2"]

    def test_persists_across_instances(self, tmp_path):
        root = str(tmp_path / "lake")
        DenylistStore(root).add("sticky")
        assert load_denylist(root) == frozenset({"sticky"})
        assert DenylistStore(root).entries() == ["sticky"]

    def test_cli_crud(self, tmp_path):
        root = str(tmp_path / "lake")

        def run(*args):
            out = subprocess.run(
                [sys.executable, "-m", "oplogtoredis_ray", "denylist", *args,
                 "--lake", root],
                capture_output=True, text=True, cwd="/root/repo", check=True,
            )
            return json.loads(out.stdout)

        assert run("add", "a", "b")["added"] == ["a", "b"]
        assert run("list")["denylist"] == ["a", "b"]
        res = run("remove", "a", "zz")
        assert res["removed"] == ["a"] and res["missing"] == ["zz"]
        assert run("list")["denylist"] == ["b"]


@pytest.mark.usefixtures("ray_session")
class TestRuntimeToggle:
    def test_filter_flips_between_windows_of_one_session(self, tmp_path):
        """One run_ingest session, three windows.  After window 1 the conv
        'flip' is denied; after window 2 it is un-denied.  Its window-2
        insert must be filtered; windows 1 and 3 must apply — the mirror of
        the reference's runtime-toggle acceptance flow."""
        log_dir = _toggle_log(tmp_path)
        lake = str(tmp_path / "lake")
        store = DenylistStore(lake)
        calls = []

        def on_window(agg):
            calls.append(agg["window_id"])
            if len(calls) == 1:
                store.add("flip")
            elif len(calls) == 2:
                store.remove("flip")

        cfg = PipelineConfig(num_partitions=4, window_us=1000)
        run_ingest(log_dir, lake, cfg, on_window=on_window)
        assert len(calls) == 3

        got = read_lake(lake).to_pandas()
        by_conv = {
            c: sorted(g["turn_idx"]) for c, g in got.groupby("conv_id")
        }
        assert by_conv["keep"] == [0, 1, 2]
        assert by_conv["flip"] == [0, 2]  # window-2 insert was denied

    def test_static_and_durable_denylists_union(self, tmp_path):
        log_dir = _toggle_log(tmp_path)
        lake = str(tmp_path / "lake")
        DenylistStore(lake).add("flip")
        cfg = PipelineConfig(
            num_partitions=4, window_us=1000, denylist=frozenset({"keep"})
        )
        run_ingest(log_dir, lake, cfg)
        assert len(read_lake(lake).to_pandas()) == 0  # both convs denied


@pytest.mark.usefixtures("ray_session")
class TestLakeConfigGuard:
    def test_layout_mismatch_fails_fast(self, tmp_path):
        log_dir = _toggle_log(tmp_path)
        lake = str(tmp_path / "lake")
        run_ingest(log_dir, lake, PipelineConfig(num_partitions=4, window_us=1000))
        with pytest.raises(LakeConfigError, match="num_partitions"):
            run_ingest(log_dir, lake, PipelineConfig(num_partitions=8, window_us=1000))
        with pytest.raises(LakeConfigError, match="hash_algo"):
            run_ingest(
                log_dir,
                lake,
                PipelineConfig(num_partitions=4, window_us=1000, hash_algo="sha256"),
            )

    def test_non_layout_knobs_may_differ(self, tmp_path):
        log_dir = _toggle_log(tmp_path)
        lake = str(tmp_path / "lake")
        run_ingest(log_dir, lake, PipelineConfig(num_partitions=4, window_us=1000))
        # window width / batch sizing are execution knobs, not layout — OK
        res = run_ingest(
            log_dir, lake, PipelineConfig(num_partitions=4, window_us=5000)
        )
        assert res.windows_run == 0  # nothing new; no error


@pytest.mark.usefixtures("ray_session")
class TestMetricsExport:
    def test_metrics_written_and_lag_zero_after_full_run(self, tmp_path):
        log_dir = _toggle_log(tmp_path)
        lake = str(tmp_path / "lake")
        run_ingest(log_dir, lake, PipelineConfig(num_partitions=4, window_us=1000))
        m = read_metrics(lake)
        assert m is not None
        assert m["windows_run"] == 3
        assert m["events"]["in"] == 6
        assert m["events"]["upserts"] == 6
        assert m["watermark_lag_us"] == 0  # fully caught up
        assert m["resume_gap_us"] is not None
        assert len(m["window_stats"]) == 3
        assert m["wall_s"] > 0

    def test_metrics_show_lag_when_run_stops_early(self, tmp_path):
        log_dir = _toggle_log(tmp_path)
        lake = str(tmp_path / "lake")
        run_ingest(
            log_dir, lake,
            PipelineConfig(num_partitions=4, window_us=1000),
            max_windows=1,
        )
        m = read_metrics(lake)
        assert m["windows_run"] == 1
        assert m["watermark_lag_us"] > 0  # unapplied tail is visible

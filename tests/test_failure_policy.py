"""Explicit failure policy: bounded transient retries, permanent-failure
cutoff.

≙ the reference's redisStopStart acceptance test
(integration-tests/acceptance/redisStopStart_test.go:16-80: sink down →
retries → recovers, zero loss) and its 30×1s retry-then-counted-drop
(lib/redispub/publisher.go:228-253).  Here the transient fault is injected
into the parse stage via a cross-process file counter: the first N
executions of the poisoned batch raise, later retries succeed — asserting
bounded retries, zero loss, zero double-apply.
"""

import os

import pandas as pd
import pytest

import oplogtoredis_ray.pipelines.ingest as ingest_mod
from oplogtoredis_ray.config import PipelineConfig
from oplogtoredis_ray.pipelines.ingest import run_ingest
from oplogtoredis_ray.sources.event_log import log_ts_bounds
from oplogtoredis_ray.sources.synthetic import (
    GeneratorSpec,
    generate_event_log,
    oracle_apply,
    write_event_log,
)
from oplogtoredis_ray.stages.parse import ParseStage
from oplogtoredis_ray.state.lake import read_lake

SPEC = GeneratorSpec(seed=9, n_conversations=60, mean_turns=3, duplicate_rate=0.03)


class TransientParseError(RuntimeError):
    pass


class FlakyParseStage(ParseStage):
    """Raises on the first ``fail_times`` executions (counted across worker
    processes via an O_EXCL-created marker file per attempt), then behaves
    normally — the transient-sink-outage analogue."""

    def __init__(self, cfg, deadletter_dir, counter_dir: str, fail_times: int, **kw):
        super().__init__(cfg, deadletter_dir, **kw)
        self.counter_dir = counter_dir
        self.fail_times = fail_times

    def __call__(self, batch):
        for i in range(self.fail_times):
            marker = os.path.join(self.counter_dir, f"attempt-{i}")
            try:
                fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                raise TransientParseError(f"injected transient failure #{i}")
            except FileExistsError:
                continue
        return super().__call__(batch)


class AlwaysFailingParseStage(ParseStage):
    def __call__(self, batch):
        raise TransientParseError("permanent injected failure")


@pytest.fixture()
def log(tmp_path):
    df = generate_event_log(SPEC)
    d = tmp_path / "events"
    write_event_log(df, str(d))
    return str(d), df


def _one_window_cfg(log_dir, **kw):
    lo, hi = log_ts_bounds(log_dir)
    return PipelineConfig(num_partitions=4, window_us=hi - lo + 2, **kw)


@pytest.mark.usefixtures("ray_session")
class TestFailurePolicy:
    def test_transient_failures_retried_zero_loss(self, tmp_path, log, monkeypatch):
        log_dir, df = log
        lake = str(tmp_path / "lake")
        counter = str(tmp_path / "attempts")
        os.makedirs(counter)
        cfg = _one_window_cfg(log_dir, task_max_retries=4)
        monkeypatch.setattr(
            ingest_mod,
            "ParseStage",
            lambda c, dl, **kw: FlakyParseStage(c, dl, counter, fail_times=3, **kw),
        )
        res = run_ingest(log_dir, lake, cfg)
        assert res.windows_run == 1
        # all three injected failures were consumed by retries
        assert len(os.listdir(counter)) == 3
        got = read_lake(lake).to_pandas()
        got["ts"] = got["ts"].astype("int64")
        got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        want = oracle_apply(df)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_retry_budget_exhaustion_fails_closed(self, tmp_path, log, monkeypatch):
        log_dir, _ = log
        lake = str(tmp_path / "lake")
        cfg = _one_window_cfg(log_dir, task_max_retries=1)
        monkeypatch.setattr(
            ingest_mod,
            "ParseStage",
            lambda c, dl, **kw: AlwaysFailingParseStage(c, dl, **kw),
        )
        with pytest.raises(Exception):  # RayTaskError wrapping the injected error
            run_ingest(log_dir, lake, cfg)
        # fail-closed: nothing was committed, a later clean run starts over
        from oplogtoredis_ray.state.manifest import read_completed_windows

        assert read_completed_windows(lake) == []

    def test_errored_block_tolerance_drops_and_continues(
        self, tmp_path, log, monkeypatch
    ):
        """max_errored_blocks > 0 = the counted permanent-failure drop: the
        poisoned block is abandoned after retries, everything else applies."""
        log_dir, df = log
        lake = str(tmp_path / "lake")
        counter = str(tmp_path / "attempts")
        os.makedirs(counter)
        cfg = _one_window_cfg(log_dir, task_max_retries=1, max_errored_blocks=-1)

        class PoisonOneBatch(ParseStage):
            def __call__(self, batch):
                # poison exactly one batch (the first one any worker sees),
                # permanently — retries also fail
                marker = os.path.join(counter, "poisoned")
                try:
                    fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    os.close(fd)
                except FileExistsError:
                    pass
                first = open(marker).read() or None
                if first is None:
                    with open(marker, "w") as f:
                        f.write(batch["conv_id"][0].as_py())
                    raise TransientParseError("poisoned block (first write)")
                if batch.num_rows and batch["conv_id"][0].as_py() == first:
                    raise TransientParseError("poisoned block")
                return super().__call__(batch)

        monkeypatch.setattr(
            ingest_mod, "ParseStage", lambda c, dl, **kw: PoisonOneBatch(c, dl, **kw)
        )
        res = run_ingest(log_dir, lake, cfg)
        assert res.windows_run == 1
        got = read_lake(lake).to_pandas()
        want = oracle_apply(df)
        # the dropped block's events are missing — counted, not silent-lost-all
        assert 0 < len(got) <= len(want)


@pytest.mark.usefixtures("ray_session")
class TestResumeEscapeHatch:
    """≙ OTR_RESUME_FROM_END_ON_FAILURE (lib/config/main.go:191-219):
    default fail-closed on an unreadable resume point; the explicit escape
    hatch starts from the log end instead of staying down."""

    def _corrupt(self, lake):
        mdir = os.path.join(lake, "manifests")
        os.makedirs(mdir, exist_ok=True)
        with open(os.path.join(mdir, "p-00000.json"), "w") as f:
            f.write("{broken")

    def test_default_fails_closed_after_retries(self, tmp_path, log):
        from oplogtoredis_ray.state.manifest import ManifestReadError

        log_dir, _ = log
        lake = str(tmp_path / "lake")
        self._corrupt(lake)
        cfg = _one_window_cfg(
            log_dir, resume_read_retries=2, resume_read_retry_delay_s=0.01
        )
        with pytest.raises(ManifestReadError):
            run_ingest(log_dir, lake, cfg)

    def test_escape_hatch_resumes_from_end(self, tmp_path, log):
        log_dir, _ = log
        lake = str(tmp_path / "lake")
        self._corrupt(lake)
        cfg = _one_window_cfg(
            log_dir,
            resume_read_retries=2,
            resume_read_retry_delay_s=0.01,
            resume_from_end_on_failure=True,
        )
        res = run_ingest(log_dir, lake, cfg)  # no raise: skipped to log end
        assert res.windows_run == 0
        assert res.events_in == 0

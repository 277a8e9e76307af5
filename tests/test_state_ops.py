"""Lake GC, snapshot export, max-catch-up policy, CLI."""

import glob
import json
import os
import subprocess
import sys

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


@pytest.fixture(scope="module")
def small_log(tmp_path_factory):
    d = tmp_path_factory.mktemp("log")
    log = generate_event_log(GeneratorSpec(seed=13, n_conversations=30))
    write_event_log(log, str(d))
    return str(d), log


@pytest.mark.usefixtures("ray_session")
def test_gc_removes_only_superseded(small_log, tmp_path):
    log_dir, log = small_log
    lake = str(tmp_path / "lake")
    lo, hi = log_ts_bounds(log_dir)
    cfg = PipelineConfig(num_partitions=4, window_us=(hi - lo) // 3 + 1)
    run_ingest(log_dir, lake, cfg)  # 3 windows → up to 3 state files per partition
    all_files = glob.glob(f"{lake}/lake/p=*/state-*.parquet")
    referenced = {m.state_file for m in read_all_manifests(lake)}
    assert len(all_files) > len(referenced)  # superseded files exist

    removed = collect_garbage(lake, dry_run=True, grace_seconds=0)
    assert len(removed) == len(all_files) - len(referenced)
    assert len(glob.glob(f"{lake}/lake/p=*/state-*.parquet")) == len(all_files)

    collect_garbage(lake, grace_seconds=0)
    left = glob.glob(f"{lake}/lake/p=*/state-*.parquet")
    assert len(left) == len(referenced)
    # lake still reads correctly and matches the oracle
    got = read_lake(lake).to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    got["ts"] = got["ts"].astype("int64")
    pd.testing.assert_frame_equal(got, oracle_apply(log), check_dtype=False)
    # idempotent
    assert collect_garbage(lake, grace_seconds=0) == []


@pytest.mark.usefixtures("ray_session")
def test_export_snapshot_fanout(small_log, tmp_path):
    log_dir, log = small_log
    lake = str(tmp_path / "lake")
    lo, hi = log_ts_bounds(log_dir)
    run_ingest(log_dir, lake, PipelineConfig(num_partitions=4, window_us=(hi - lo) + 1))
    d1, d2 = str(tmp_path / "dest1"), str(tmp_path / "dest2")
    stats = export_snapshot(lake, [d1, d2])
    assert stats["partitions"] == len(read_all_manifests(lake))
    for d in (d1, d2):
        snap = json.load(open(os.path.join(d, "_snapshot.json")))
        files = glob.glob(f"{d}/state-*.parquet")
        assert len(files) == len(snap["partitions"])
        import pyarrow.parquet as pq

        total = sum(pq.read_metadata(f).num_rows for f in files)
        assert total == stats["rows"]
    # idempotent re-export copies nothing new
    again = export_snapshot(lake, [d1])
    assert again["destinations"][0]["files_copied"] == 0


@pytest.mark.usefixtures("ray_session")
def test_max_catch_up_skips_to_recent(small_log, tmp_path):
    """≙ MaxCatchUp (tail.go:528-540): a resume gap beyond the policy skips
    to the recent window instead of replaying everything — a deliberate,
    counted data skip."""
    log_dir, log = small_log
    lake = str(tmp_path / "lake")
    lo, hi = log_ts_bounds(log_dir)
    catch = (hi - lo) // 4
    cfg = PipelineConfig(
        num_partitions=4, window_us=(hi - lo) + 1, max_catch_up_us=catch
    )
    res = run_ingest(log_dir, lake, cfg)
    # only events from the catch-up region were applied
    assert res.events_in < len(log)
    got = read_lake(lake).to_pandas()
    assert len(got) > 0
    got["ts"] = got["ts"].astype("int64")
    assert got["ts"].min() >= hi - catch - 1


@pytest.mark.usefixtures("ray_session")
def test_cli_end_to_end(small_log, tmp_path):
    log_dir, log = small_log
    lake = str(tmp_path / "clilake")
    env = dict(os.environ, PYTHONPATH="/root/repo")

    def run(*args):
        out = subprocess.run(
            [sys.executable, "-m", "oplogtoredis_ray", *args],
            capture_output=True,
            text=True,
            env=env,
            cwd="/root/repo",
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    res = run("ingest", "--log", log_dir, "--lake", lake, "--partitions", "4", "--num-cpus", "4")
    assert res["events_in"] == len(log)
    status = run("status", "--lake", lake)
    assert status["partitions"] == 4 and status["completed_windows"] >= 1
    gc = run("gc", "--lake", lake, "--dry-run")
    assert gc["dry_run"] is True
    dest = str(tmp_path / "cliexport")
    exp = run("export", "--lake", lake, "--dest", dest)
    assert exp["partitions"] == 4


def test_commit_manifest_is_monotonic(tmp_path):
    """HA arbiter: a commit may only move a partition manifest forward — a
    straggling competing consumer's older commit is refused, never rolled
    back over (≙ the reference's atomic GET-before-SETEX dedup)."""
    from oplogtoredis_ray.state.manifest import Manifest, commit_manifest, read_manifest

    lake = str(tmp_path / "lake")

    def man(lineage, wm):
        return Manifest(
            partition_id=0, watermark=wm, state_file=f"lake/p=00000/s-{len(lineage)}.parquet",
            rows=1, lineage=list(lineage),
        )

    assert commit_manifest(lake, man(["w1"], (1, 0, 0))) is True
    assert commit_manifest(lake, man(["w1", "w2"], (2, 0, 0))) is True
    # a slower process finishing w1 (or re-finishing w2) must NOT regress
    assert commit_manifest(lake, man(["w1"], (1, 0, 0))) is False
    assert commit_manifest(lake, man(["w1", "w2"], (2, 0, 0))) is False
    cur = read_manifest(lake, 0)
    assert cur.lineage == ["w1", "w2"] and cur.watermark == (2, 0, 0)
    # moving forward still works
    assert commit_manifest(lake, man(["w1", "w2", "w3"], (3, 0, 0))) is True
    assert read_manifest(lake, 0).lineage == ["w1", "w2", "w3"]


def test_chain_link_missing_payload_column_null_fills(tmp_path):
    """A chain link written before a payload_cols evolution (or a compacted
    base) lacks the new column; every link must be null-filled BEFORE the
    merge, not only the merged output (regression: KeyError in
    state_rows_to_pseudo / fold when 'tool' was added between runs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from oplogtoredis_ray.state.lake import merge_partition_chain

    lake = str(tmp_path / "lake")
    pdir = os.path.join(lake, "lake", "p=00000")
    os.makedirs(pdir)
    # old compacted base: no 'tool' column, no 'op' column
    base = pa.table(
        {
            "conv_id": pa.array(["a", "b"]),
            "turn_idx": pa.array([0, 0], type=pa.int32()),
            "role": pa.array(["user", "user"]),
            "text": pa.array(["old-a", "old-b"]),
            "ts": pa.array([100, 100], type=pa.timestamp("us")),
        }
    )
    pq.write_table(base, os.path.join(pdir, "state-w1-x.parquet"))
    # newer delta (pseudo-events), written after 'tool' was added
    delta = pa.table(
        {
            "ts": pa.array([200], type=pa.int64()),
            "seq": pa.array([0], type=pa.int64()),
            "tx_idx": pa.array([0], type=pa.int64()),
            "op": pa.array(["u"]),
            "conv_id": pa.array(["a"]),
            "turn_idx": pa.array([0], type=pa.int32()),
            "role": pa.array([None], type=pa.string()),
            "text": pa.array(["new-a"]),
            "tool": pa.array(["t1"]),
        }
    )
    pq.write_table(delta, os.path.join(pdir, "delta-w2-y.parquet"))
    chain = [
        os.path.join("lake", "p=00000", "state-w1-x.parquet"),
        os.path.join("lake", "p=00000", "delta-w2-y.parquet"),
    ]
    out = merge_partition_chain(lake, chain, payload_cols=("role", "text", "tool"))
    df = out.to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert list(df["conv_id"]) == ["a", "b"]
    assert list(df["text"]) == ["new-a", "old-b"]
    assert df.loc[0, "tool"] == "t1"
    assert pd.isna(df.loc[1, "tool"])  # null-filled, not KeyError
    assert df.loc[0, "role"] == "user"  # patch kept prior role

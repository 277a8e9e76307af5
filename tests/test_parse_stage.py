"""ParseStage unit tests: validation → dead-letter side output (M10),
denylist, changed-fields (pattern + raw update-spec kernel paths),
partition assignment, empty batches."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from oplogtoredis_ray.config import PipelineConfig
from oplogtoredis_ray.functions.sharding import partition_id_for
from oplogtoredis_ray.stages.parse import ParseStage


def _batch(rows, with_tool=True, extra_cols=None):
    cols = {
        "ts": pa.array([r.get("ts", 1) for r in rows], type=pa.timestamp("us")),
        "seq": pa.array([r.get("seq", 0) for r in rows], type=pa.int32()),
        "tx_idx": pa.array([r.get("tx", 0) for r in rows], type=pa.int32()),
        "op": pa.array([r.get("op") for r in rows], type=pa.string()),
        "conv_id": pa.array([r.get("conv") for r in rows], type=pa.string()),
        "turn_idx": pa.array([r.get("turn") for r in rows], type=pa.int32()),
        "role": pa.array([r.get("role") for r in rows], type=pa.string()),
        "text": pa.array([r.get("text") for r in rows], type=pa.string()),
    }
    if with_tool:
        cols["tool"] = pa.array([r.get("tool") for r in rows], type=pa.string())
    if extra_cols:
        cols.update(extra_cols)
    return pa.table(cols)


def test_valid_rows_pass_and_partition(tmp_path):
    cfg = PipelineConfig(num_partitions=8)
    out = ParseStage(cfg)(
        _batch(
            [
                {"op": "i", "conv": "c1", "turn": 0, "role": "user", "text": "a"},
                {"op": "u", "conv": "c2", "turn": 1, "text": "b", "tool": "T"},
                {"op": "d", "conv": "c1", "turn": 0},
            ]
        )
    )
    assert len(out) == 3
    assert out["changed_fields"].to_pylist() == [["role", "text"], ["text", "tool"], []]
    # poly64 default partitioner: stable and in range
    pids = out["partition_id"].to_pylist()
    assert all(0 <= p < 8 for p in pids)
    assert pids[0] == pids[2]  # same conv → same partition
    # sha256 mode matches the scalar reference function
    cfg2 = PipelineConfig(num_partitions=8, hash_algo="sha256")
    out2 = ParseStage(cfg2)(
        _batch([{"op": "i", "conv": "c1", "turn": 0, "text": "a"}])
    )
    assert out2["partition_id"][0].as_py() == partition_id_for("c1", 8)


def test_dead_letter_side_output(tmp_path):
    dl = str(tmp_path / "errors")
    cfg = PipelineConfig(num_partitions=4)
    stage = ParseStage(cfg, deadletter_dir=dl)
    out = stage(
        _batch(
            [
                {"op": "i", "conv": "c1", "turn": 0, "text": "ok"},
                {"op": "x", "conv": "c1", "turn": 1, "text": "bad-op"},
                {"op": "u", "conv": None, "turn": 2, "text": "no-key"},
                {"op": "u", "conv": "c2", "turn": None, "text": "no-turn"},
            ]
        )
    )
    assert len(out) == 1  # only the valid row survives
    files = glob.glob(f"{dl}/dl-*.parquet")
    assert len(files) == 1
    dead = pq.read_table(files[0])
    assert len(dead) == 3
    reasons = dead["reason"].to_pylist()
    assert "invalid op: 'x'" in reasons
    assert reasons.count("missing key column") == 2


def test_denylist_filter():
    cfg = PipelineConfig(num_partitions=4).with_denylist({"deny-me"})
    out = ParseStage(cfg)(
        _batch(
            [
                {"op": "i", "conv": "deny-me", "turn": 0, "text": "x"},
                {"op": "i", "conv": "keep", "turn": 0, "text": "y"},
            ]
        )
    )
    assert out["conv_id"].to_pylist() == ["keep"]


def test_update_spec_kernel_path():
    """Raw Mongo update-spec documents drive M7/M8 through the golden
    kernel; rows without a spec keep the non-null-pattern fields."""
    specs = pa.array(
        [
            None,  # insert without spec → pattern path
            json.dumps({"$v": "1.0", "$set": {"foo": 1, "baz.qux": 2}, "$unset": {"q": True}}),
            json.dumps({"$v": 2, "diff": {"u": {"c": 1}, "sg": 10}}),
            json.dumps({"$v": 2, "diff": {"sasd": {"a": True, "u3": 2}}}),
        ],
        type=pa.string(),
    )
    rows = [
        {"op": "i", "conv": "c", "turn": 0, "role": "user", "text": "a"},
        {"op": "u", "conv": "c", "turn": 1, "text": "b"},
        {"op": "u", "conv": "c", "turn": 2, "text": "b"},
        {"op": "u", "conv": "c", "turn": 3, "text": "b"},
    ]
    cfg = PipelineConfig(num_partitions=4)
    out = ParseStage(cfg)(_batch(rows, extra_cols={"update_spec": specs}))
    got = out["changed_fields"].to_pylist()
    assert got[0] == ["role", "text"]
    assert sorted(got[1]) == ["baz.qux", "foo", "q"]
    assert sorted(got[2]) == ["c", "g"]  # v2 shallow
    assert "update_spec" not in out.column_names

    deep_cfg = PipelineConfig(num_partitions=4, v2_deep=True)
    out2 = ParseStage(deep_cfg)(_batch(rows, extra_cols={"update_spec": specs}))
    assert out2["changed_fields"].to_pylist()[3] == ["asd.3"]  # array operator


def test_empty_batch():
    cfg = PipelineConfig(num_partitions=4)
    out = ParseStage(cfg)(_batch([], with_tool=False))
    assert len(out) == 0
    assert "changed_fields" in out.column_names and "partition_id" in out.column_names


@pytest.mark.usefixtures("ray_session")
def test_empty_window_run(tmp_path):
    """A window with zero events must complete and record lineage."""
    from oplogtoredis_ray.pipelines.ingest import run_window
    from oplogtoredis_ray.sources.synthetic import (
        GeneratorSpec,
        generate_event_log,
        write_event_log,
    )
    from oplogtoredis_ray.sources.event_log import log_ts_bounds

    d = str(tmp_path / "log")
    write_event_log(generate_event_log(GeneratorSpec(seed=2, n_conversations=5)), d)
    lo, hi = log_ts_bounds(d)
    cfg = PipelineConfig(num_partitions=2, window_us=1)
    stats = run_window(d, str(tmp_path / "lake"), cfg, hi + 10, hi + 11)
    assert len(stats) == 0

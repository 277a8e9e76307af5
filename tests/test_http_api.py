"""HTTP control plane (http_api.py) vs the reference's exact semantics.

≙ /root/reference/lib/denylist/http.go:22-144 (CRUD status codes incl. the
deliberate 204-on-absent DELETE), main.go:301-359 (/healthz JSON flags,
/metrics Prometheus text) and the runtime-toggle flow of
denylist_oplog_test.go:12-75 (HTTP mutation observed by a running ingest).
"""

import json
import threading
import urllib.error
import urllib.request

import pandas as pd
import pytest

from oplogtoredis_ray.http_api import make_server, render_prometheus


@pytest.fixture()
def server(tmp_path):
    lake = str(tmp_path / "lake")
    srv = make_server(lake, log_dir=None, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, lake
    srv.shutdown()


def _req(base, path, method="GET"):
    req = urllib.request.Request(base + path, method=method)
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


class TestDenylistHTTP:
    def test_crud_status_codes_match_reference(self, server):
        base, _ = server
        code, body = _req(base, "/denylist")
        assert code == 200 and json.loads(body) == []
        assert _req(base, "/denylist/db1", "PUT")[0] == 201  # created
        assert _req(base, "/denylist/db1", "PUT")[0] == 204  # already present
        code, body = _req(base, "/denylist/db1")
        assert code == 200 and json.loads(body) == "db1"
        assert _req(base, "/denylist/nope")[0] == 404
        code, body = _req(base, "/denylist")
        assert json.loads(body) == ["db1"]
        assert _req(base, "/denylist/db1", "DELETE")[0] == 204
        # reference deliberately returns success for absent entries
        assert _req(base, "/denylist/db1", "DELETE")[0] == 204
        assert json.loads(_req(base, "/denylist")[1]) == []

    def test_ids_with_slash_are_404(self, server):
        base, _ = server
        assert _req(base, "/denylist/a/b", "PUT")[0] == 404
        assert _req(base, "/denylist/a/b", "DELETE")[0] == 404
        assert _req(base, "/denylist/a/b")[0] == 404

    def test_mutations_are_durable(self, server):
        from oplogtoredis_ray.state.denylist import load_denylist

        base, lake = server
        _req(base, "/denylist/sticky", "PUT")
        assert load_denylist(lake) == frozenset({"sticky"})


class TestHealthAndMetrics:
    def test_healthz_ok_and_fail_closed(self, tmp_path):
        import os

        lake = str(tmp_path / "lake")
        srv = make_server(lake, log_dir=str(tmp_path), port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        code, body = _req(base, "/healthz")
        assert code == 200 and json.loads(body) == {"logOK": True, "lakeOK": True}
        # corrupt a manifest → healthz flips to 500 with lakeOK false
        os.makedirs(os.path.join(lake, "manifests"), exist_ok=True)
        with open(os.path.join(lake, "manifests", "p-00000.json"), "w") as f:
            f.write("{broken")
        code, body = _req(base, "/healthz")
        assert code == 500 and json.loads(body)["lakeOK"] is False
        srv.shutdown()

    @pytest.mark.usefixtures("ray_session")
    def test_metrics_exposition_after_ingest(self, tmp_path, server):
        from oplogtoredis_ray.config import PipelineConfig
        from oplogtoredis_ray.pipelines.ingest import run_ingest
        from oplogtoredis_ray.sources.synthetic import write_event_log

        base, lake = server
        rows = [
            dict(ts=1000 + i, seq=i, tx_idx=-1, op="i", conv_id=f"c{i}",
                 turn_idx=0, role="user", text="x", tool=None, _file=0)
            for i in range(5)
        ]
        log_dir = str(tmp_path / "events")
        write_event_log(pd.DataFrame(rows), log_dir, evo_ts=0)
        run_ingest(log_dir, lake, PipelineConfig(num_partitions=2, window_us=10))
        _req(base, "/denylist/blocked_db", "PUT")
        code, body = _req(base, "/metrics")
        assert code == 200
        text = body.decode()
        assert "otr_events_in 5" in text
        assert "otr_events_upserts 5" in text
        assert "otr_watermark_lag_us 0" in text
        assert 'otr_denylist_filter_enabled{db="blocked_db"} 1' in text
        assert "# TYPE otr_events_in gauge" in text

    def test_render_prometheus_empty_lake(self, tmp_path):
        # no metrics file yet: only denylist gauges (none) → empty-ish doc
        out = render_prometheus(str(tmp_path / "lake"))
        assert "otr_events_in" not in out

    def test_type_line_once_per_metric_name(self, tmp_path):
        """The Prometheus text format allows ONE TYPE line per metric name;
        ≥2 denylisted entries must share a single header (the official
        scraper rejects the whole exposition otherwise)."""
        from oplogtoredis_ray.state.denylist import DenylistStore

        lake = str(tmp_path / "lake")
        store = DenylistStore(lake)
        store.add("db_a")
        store.add("db_b")
        text = render_prometheus(lake)
        assert text.count("# TYPE otr_denylist_filter_enabled gauge") == 1
        assert 'otr_denylist_filter_enabled{db="db_a"} 1' in text
        assert 'otr_denylist_filter_enabled{db="db_b"} 1' in text
        for line in text.splitlines():
            if line.startswith("# TYPE "):
                name = line.split()[2]
                assert (
                    sum(
                        1
                        for l in text.splitlines()
                        if l.startswith(f"# TYPE {name} ")
                    )
                    == 1
                )

    @pytest.mark.usefixtures("ray_session")
    def test_per_db_deny_counts_and_histograms(self, tmp_path, server):
        """≙ tail.go:88-114 + publisher.go:78-92: per-database filtered
        counts and per-window wall-time / events distributions, in
        metrics.json and as Prometheus counter/histogram text."""
        from oplogtoredis_ray.config import PipelineConfig
        from oplogtoredis_ray.pipelines.ingest import run_ingest
        from oplogtoredis_ray.sources.synthetic import write_event_log
        from oplogtoredis_ray.state.denylist import DenylistStore
        from oplogtoredis_ray.state.metrics import read_metrics

        base, lake = server
        rows = []
        for w, ts in enumerate([1000, 2000]):
            for conv, k in [("keep", 1), ("bad_a", 2), ("bad_b", 1)]:
                for i in range(k):
                    rows.append(
                        dict(ts=ts + i, seq=len(rows), tx_idx=-1, op="i",
                             conv_id=conv, turn_idx=w, role="user", text="x",
                             tool=None, _file=0)
                    )
        log_dir = str(tmp_path / "events")
        write_event_log(pd.DataFrame(rows), log_dir, evo_ts=0)
        store = DenylistStore(lake)
        store.add("bad_a")
        store.add("bad_b")
        run_ingest(log_dir, lake, PipelineConfig(num_partitions=2, window_us=1000))

        m = read_metrics(lake)
        assert m["denied_by_db"] == {"bad_a": 4, "bad_b": 2}
        hist = m["window_wall_seconds_hist"]
        assert hist["count"] == 2 and hist["sum"] > 0
        ev_hist = m["window_events_hist"]
        assert ev_hist["count"] == 2
        # every window had ≤1000 events → the first cumulative bucket is full
        assert ev_hist["buckets"]["1000"] == 2

        code, body = _req(base, "/metrics")
        text = body.decode()
        assert code == 200
        assert 'otr_denylist_filtered_total{db="bad_a"} 4' in text
        assert 'otr_denylist_filtered_total{db="bad_b"} 2' in text
        assert text.count("# TYPE otr_denylist_filtered_total counter") == 1
        assert "# TYPE otr_window_wall_seconds histogram" in text
        assert 'otr_window_wall_seconds_bucket{le="+Inf"} 2' in text
        assert "otr_window_wall_seconds_count 2" in text
        assert 'otr_window_events_bucket{le="1000"} 2' in text


@pytest.mark.usefixtures("ray_session")
def test_http_mutation_flips_running_ingest(tmp_path):
    """The acceptance flow: a PUT against the HTTP API mid-session causes
    the NEXT window of the same run_ingest to filter the denied conv."""
    from oplogtoredis_ray.config import PipelineConfig
    from oplogtoredis_ray.pipelines.ingest import run_ingest
    from oplogtoredis_ray.sources.synthetic import write_event_log
    from oplogtoredis_ray.state.lake import read_lake

    rows = []
    for w, ts in enumerate([1000, 2000]):
        for conv in ["keep", "flip"]:
            rows.append(
                dict(ts=ts, seq=len(rows), tx_idx=-1, op="i", conv_id=conv,
                     turn_idx=w, role="user", text="x", tool=None, _file=0)
            )
    log_dir = str(tmp_path / "events")
    write_event_log(pd.DataFrame(rows), log_dir, evo_ts=0)
    lake = str(tmp_path / "lake")
    srv = make_server(lake, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    def on_window(agg):
        if agg["window_id"].startswith("w999"):
            assert _req(base, "/denylist/flip", "PUT")[0] == 201

    run_ingest(log_dir, lake, PipelineConfig(num_partitions=2, window_us=1000),
               on_window=on_window)
    got = read_lake(lake).to_pandas()
    by_conv = {c: sorted(g["turn_idx"]) for c, g in got.groupby("conv_id")}
    assert by_conv["keep"] == [0, 1]
    assert by_conv["flip"] == [0]  # second window filtered via HTTP
    srv.shutdown()


def test_serve_cli_smoke(tmp_path):
    """`python -m oplogtoredis_ray serve` binds, reports its address, and
    answers the control-plane routes (no Ray session needed)."""
    import socket
    import subprocess
    import sys
    import time

    lake = str(tmp_path / "lake")
    with socket.socket() as s:  # pick a free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [sys.executable, "-m", "oplogtoredis_ray", "serve", "--lake", lake,
         "--port", str(port)],
        cwd="/root/repo", stdout=subprocess.PIPE, text=True,
    )
    try:
        line = proc.stdout.readline()
        assert json.loads(line)["listening"][1] == port
        base = f"http://127.0.0.1:{port}"
        for _ in range(50):
            try:
                code, _ = _req(base, "/healthz")
                break
            except OSError:
                time.sleep(0.1)
        assert code == 200
        assert _req(base, "/denylist/x", "PUT")[0] == 201
        assert json.loads(_req(base, "/denylist")[1]) == ["x"]
    finally:
        proc.terminate()
        proc.wait(timeout=10)

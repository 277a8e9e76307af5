"""Windowed event-log reader (≙ S1, the oplog tail query —
/root/reference/lib/oplog/tail.go:414-425).

The reference issues a tailable cursor ``{ts: {$gt: startTime}}`` in
``$natural`` order; here a resumable timestamp window becomes a Parquet
predicate-pushdown read: only row groups overlapping ``(start, end]`` leave
storage, and only the requested columns are materialized.

Schema evolution: files written before the evolution point lack the ``tool``
column; we unify all fragment schemas (metadata-only scan) and pass the
unified schema to ``read_parquet`` so early fragments are null-filled —
Arrow's ``unify_schemas`` at the read boundary (north_rule requirement).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq


EVENT_COLUMNS = [
    "ts",
    "seq",
    "tx_idx",
    "op",
    "conv_id",
    "turn_idx",
    "role",
    "text",
    "tool",
]


def _log_files(log_dir: str) -> list[str]:
    files = sorted(glob.glob(os.path.join(log_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {log_dir}")
    return files


# per-window schema probing is driver-side serial footer IO; a windowed run
# re-reads the SAME immutable files every window, so cache the per-file
# schema keyed on (path, mtime_ns, size) — appended/rewritten files (follow
# mode) miss the cache and re-probe
_SCHEMA_CACHE: dict[tuple[str, int, int], tuple[str, ...]] = {}


def _file_schema_names(f: str) -> tuple[str, ...]:
    st = os.stat(f)
    key = (f, st.st_mtime_ns, st.st_size)
    names = _SCHEMA_CACHE.get(key)
    if names is None:
        names = tuple(pq.read_schema(f).names)
        _SCHEMA_CACHE[key] = names
        if len(_SCHEMA_CACHE) > 65536:  # bound for long follow sessions
            _SCHEMA_CACHE.clear()
    return names


# file-level ts pruning: CDC logs are written roughly time-ordered, so most
# files lie entirely outside any given window.  Without this, Ray packs ALL
# files into the read tasks and only the handful of tasks holding the
# window's files do real decode work — per-window read wall time stops
# scaling with cluster size (measured: 1.3 s/window at 32 cpus on a
# 128-file log where 16 files overlap each window; 0.3 s after pruning).
# At 100 TB this is the manifest/statistics file-skipping every production
# lake reader performs.  Cached like the schema probe; a file with any
# stats-less row group returns None and survives every window (fail-open).
_TS_RANGE_CACHE: dict[tuple[str, int, int], tuple[int, int] | None] = {}


def _file_ts_range(f: str) -> tuple[int, int] | None:
    st = os.stat(f)
    key = (f, st.st_mtime_ns, st.st_size)
    if key in _TS_RANGE_CACHE:
        return _TS_RANGE_CACHE[key]
    md = pq.read_metadata(f)
    names = md.schema.to_arrow_schema().names
    rng = None
    if "ts" in names:
        ts_idx = names.index("ts")
        lo = hi = None
        ok = True
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(ts_idx).statistics
            if stats is None or not stats.has_min_max:
                ok = False
                break
            smin, smax = _to_us(stats.min), _to_us(stats.max)
            lo = smin if lo is None else min(lo, smin)
            hi = smax if hi is None else max(hi, smax)
        if ok and lo is not None:
            rng = (lo, hi)
    _TS_RANGE_CACHE[key] = rng
    if len(_TS_RANGE_CACHE) > 65536:  # bound for long follow sessions
        _TS_RANGE_CACHE.clear()
    return rng


_HEAP_STATS_CACHE: dict[tuple[str, int, int], tuple[int, int]] = {}


def log_heap_stats(log_dir: str) -> tuple[int, int]:
    """(total_rows, total_uncompressed_bytes) from parquet footers — the
    density input for memory-budget sizing (auto feed-group width).  Footer
    reads are cached per (path, mtime, size) like the schema probe."""
    rows = 0
    ubytes = 0
    for f in _log_files(log_dir):
        st = os.stat(f)
        key = (f, st.st_mtime_ns, st.st_size)
        v = _HEAP_STATS_CACHE.get(key)
        if v is None:
            md = pq.read_metadata(f)
            v = (
                md.num_rows,
                sum(
                    md.row_group(i).total_byte_size
                    for i in range(md.num_row_groups)
                ),
            )
            _HEAP_STATS_CACHE[key] = v
            if len(_HEAP_STATS_CACHE) > 65536:
                _HEAP_STATS_CACHE.clear()
        rows += v[0]
        ubytes += v[1]
    return rows, ubytes


def unified_schema(log_dir: str) -> pa.Schema:
    """Metadata-only scan: unify all fragment schemas (missing columns become
    nullable)."""
    schemas = [pq.read_schema(f) for f in _log_files(log_dir)]
    return pa.unify_schemas(schemas, promote_options="permissive")


def log_ts_bounds(log_dir: str) -> tuple[int, int]:
    """(min_ts_us, max_ts_us) over the log from Parquet row-group statistics —
    no data read.  ≙ the end-of-oplog probe (``$natural:-1`` findOne,
    tail.go:222-250).  Layered on the cached per-file probe
    (`_file_ts_range`), so follow-mode re-polls only stat unchanged files;
    a file with stats-less row groups falls back to reading just its ts
    column."""
    lo, hi = None, None
    for f in _log_files(log_dir):
        rng = _file_ts_range(f)
        if rng is None:
            col = pq.read_table(f, columns=["ts"])["ts"]
            import pyarrow.compute as pc

            if col.length():
                # TimestampScalar.value is already int64 microseconds
                rng = (int(pc.min(col).value), int(pc.max(col).value))
            else:
                continue
        lo = rng[0] if lo is None else min(lo, rng[0])
        hi = rng[1] if hi is None else max(hi, rng[1])
    if lo is None:
        raise ValueError(f"event log at {log_dir} has no ts statistics")
    return lo, hi


def _to_us(value) -> int:
    import datetime

    if isinstance(value, datetime.datetime):
        # integer field arithmetic, NOT total_seconds()*1e6: the float
        # rounds (e.g. 1004 µs → 1003.999... → 1003) and at 2024-scale
        # timestamps can shave 1 µs off the log's max ts — silently
        # excluding the final event(s) from the last ingest window
        epoch = datetime.datetime(1970, 1, 1, tzinfo=value.tzinfo)
        delta = value - epoch
        return (
            delta.days * 86_400_000_000
            + delta.seconds * 1_000_000
            + delta.microseconds
        )
    return int(value)


def window_filter(start_us: int, end_us: int) -> pads.Expression:
    """``ts > start AND ts <= end`` — half-open window keyed on the resume
    watermark, matching the tail predicate ``{ts: {$gt: startTime}}``."""
    ts_field = pads.field("ts")
    lo = pa.scalar(start_us, type=pa.timestamp("us"))
    hi = pa.scalar(end_us, type=pa.timestamp("us"))
    return (ts_field > lo) & (ts_field <= hi)


def read_event_window(
    log_dir: str,
    start_us: int,
    end_us: int,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
):
    """Ray Dataset over the window ``(start_us, end_us]`` with predicate
    pushdown, column pruning and schema unification.

    Mixed-schema logs (the evolution fixture) are read as one dataset per
    distinct physical schema, then unioned — Ray's parquet reader cannot
    null-fill missing fragment columns itself; the downstream parse stage
    adds the missing evolution columns and enforces a canonical layout.
    """
    import ray.data as rd

    # file-level ts pruning first (cached footer stats): a window keeps only
    # files whose [min,max] ts overlaps (start, end] — the rest never reach
    # the read tasks, so the surviving files spread across ALL read slots
    # instead of hiding inside a few multi-file tasks (see _file_ts_range)
    all_files = _log_files(log_dir)
    files_kept = []
    for f in all_files:
        rng = _file_ts_range(f)
        if rng is not None and (rng[1] <= start_us or rng[0] > end_us):
            continue
        files_kept.append(f)
    if not files_kept:
        # window beyond every file's range: keep one file so read_parquet
        # has a schema — the row filter yields the correct 0 rows
        files_kept = all_files[:1]

    # one cached footer probe per file gives both the schema groups and the
    # unified column-name set (types unify downstream in the parse stage)
    groups: dict[tuple[str, ...], list[str]] = {}
    all_names: set[str] = set()
    for f in files_kept:
        names = _file_schema_names(f)
        all_names.update(names)
        groups.setdefault(names, []).append(f)
    want = columns or [c for c in EVENT_COLUMNS if c in all_names]

    flt = window_filter(start_us, end_us)
    total_files = sum(len(f) for f in groups.values())
    datasets = []
    for names, files in groups.items():
        cols = [c for c in want if c in names]
        kwargs = {}
        if override_num_blocks is not None:
            share = max(1, round(override_num_blocks * len(files) / total_files))
            kwargs["override_num_blocks"] = share
        datasets.append(rd.read_parquet(files, columns=cols, filter=flt, **kwargs))
    ds = datasets[0]
    for other in datasets[1:]:
        ds = ds.union(other)
    return ds

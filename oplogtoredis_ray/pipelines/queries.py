"""Operator-level query suite + matching DuckDB oracle SQL.

One entry per implemented operator/pipeline from SURVEY.md §2, expressed
over the driver's shared tables (events / documents / embeddings /
lineitem) where SQL-expressible, plus the full CDC apply over the synthetic
transcript log (whose oracle SQL reads the same log files directly).

Column names are kept identical between the Ray implementation and the SQL
so the driver's order-insensitive value-hash comparison matches; float
outputs are either pass-through values (no arithmetic) or converted to
exact integers to avoid cross-engine summation-order drift.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from oplogtoredis_ray.config import PipelineConfig
from oplogtoredis_ray.functions.changed_fields import changed_fields
from oplogtoredis_ray.functions.sharding import partition_ids_for_array

NUM_PARTITIONS = 64
SHARDS = 8

# --- synthetic transcript log management -------------------------------------

SYNTH_ROOT = "/tmp/otr_synth"
ORACLE_ROOT = "/tmp/otr_oracle"  # deterministic pipeline intermediates (sketch
# signatures, IVF index) exported as parquet so the driver's DuckDB oracle can
# replay the non-SQL-expressible sketch computations' downstream derivations
_SF_EVENTS = {"sf0.001": 20_000, "sf0.01": 200_000, "sf0.1": 48_000_000}
_SHARDED_MIN = 1_000_000  # above this, generate with parallel Ray shards


def _sf_name(sf_dir: str) -> str:
    name = os.path.basename(os.path.normpath(sf_dir))
    return name if name in _SF_EVENTS else "sf0.01"


def synth_spec_for(sf_name: str):
    from oplogtoredis_ray.sources.synthetic import GeneratorSpec

    target = _SF_EVENTS.get(sf_name, 50_000)
    # zipf(1.4) turns capped at 60 → ≈55 events per conversation (measured);
    # hot conversations are ~15× the median turn count (skew stays real)
    return GeneratorSpec(
        seed=42,
        n_conversations=max(target // 55, 20),
        mean_turns=3.0,
        max_turns=60,
        mean_updates=2.0,
        duplicate_rate=0.02,
        txn_rate=0.05,
        n_files=128 if target >= _SHARDED_MIN else 8,
    )


def ensure_synth_log(sf_dir: str) -> str:
    """Deterministically generate (once) the transcript event log for this
    scale factor; returns the log directory."""
    from oplogtoredis_ray.sources.synthetic import generate_event_log, write_event_log

    name = _sf_name(sf_dir)
    log_dir = os.path.join(SYNTH_ROOT, name, "events")
    marker = os.path.join(SYNTH_ROOT, name, "_complete.json")
    spec = synth_spec_for(name)
    spec_key = json.dumps(spec.__dict__, sort_keys=True, default=str)
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f).get("spec") == spec_key:
                    return log_dir
        except (json.JSONDecodeError, OSError):
            pass
    import shutil

    shutil.rmtree(log_dir, ignore_errors=True)
    target = _SF_EVENTS.get(name, 50_000)
    if target >= _SHARDED_MIN:
        from oplogtoredis_ray.sources.synthetic import generate_event_log_sharded

        n = generate_event_log_sharded(spec, log_dir, shards=16)
    else:
        log = generate_event_log(spec)
        write_event_log(log, log_dir)
        n = len(log)
    with open(marker + ".tmp", "w") as f:
        json.dump({"spec": spec_key, "events": n}, f)
    os.replace(marker + ".tmp", marker)
    return log_dir


# --- readers -----------------------------------------------------------------


def _read(sf_dir: str, table: str, columns=None, filter=None):
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns, filter=filter
    )


def _oracle_dir(sf_dir: str) -> str:
    return os.path.join(ORACLE_ROOT, _sf_name(sf_dir))


def ensure_oracle_intermediates(sf_dir: str) -> None:
    """Run the sketch pipelines that export deterministic intermediates
    (minhash/simhash signatures, IVF index) so the oracle SQL can read them
    even if the driver evaluates oracles before the matching queries.
    No-op unless Ray is already initialised (the library never inits Ray)."""
    import ray

    if not ray.is_initialized():
        return
    q_minhash_dedup(sf_dir).materialize()
    q_simhash_pairs(sf_dir)
    q_ivf_topk(sf_dir)
    q_neardup_lsh(sf_dir).materialize()
    q_curate_corpus(sf_dir).materialize()
    q_media_features(sf_dir).materialize()


# --- query implementations ---------------------------------------------------


def q_window_read(sf_dir: str):
    """S1: timestamp-window read with predicate pushdown + column pruning."""
    lo = pa.scalar(pd.Timestamp("2024-01-10").value // 1000, type=pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("2024-01-20").value // 1000, type=pa.timestamp("us"))
    flt = (pads.field("ts") > lo) & (pads.field("ts") <= hi)
    return _read(sf_dir, "events", columns=["event_id", "ts", "user_id"], filter=flt)


def q_envelope_project(sf_dir: str):
    """M1: raw-envelope projection + malformed-row filter."""
    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])
    return ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.is_valid(t["event_type"]), pc.is_valid(t["value"]))
        ),
        batch_format="pyarrow",
    )


def q_denylist_filter(sf_dir: str):
    """M2: broadcast denylist anti-semi-join on the ordering key."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id"])
    # control-plane denylist: every user_id ≡ 3 (mod 7); built driver-side
    # from a tiny distinct scan, shipped once inside the closure
    uniq = ds.unique("user_id")
    deny = pa.array(sorted(u for u in uniq if u % 7 == 3), type=pa.int64())
    return ds.map_batches(
        lambda t: t.filter(
            pc.invert(pc.fill_null(pc.is_in(t["user_id"], value_set=deny), False))
        ),
        batch_format="pyarrow",
    )


def q_props_extract(sf_dir: str):
    """M1 analog: raw field lookup without full deserialization — regex
    extraction of one JSON key (≙ bson raw lookups, tail.go:603-606)."""
    ds = _read(sf_dir, "events", columns=["event_id", "props"])

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_id": t["event_id"], "k": k})

    return ds.map_batches(extract, batch_format="pyarrow")


def q_tx_flatten(sf_dir: str):
    """M4: transaction flattening as a vectorized flat_map — each event
    explodes into tx children 0..(event_id mod 3) with monotone tx_idx."""
    ds = _read(sf_dir, "events", columns=["event_id"])

    def explode(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        counts = (eid % 3) + 1
        rep = np.repeat(eid, counts)
        offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
        tx = np.arange(counts.sum()) - np.repeat(offs, counts)
        return pa.table(
            {
                "event_id": pa.array(rep, type=pa.int64()),
                "tx_idx": pa.array(tx, type=pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def q_partition_assign(sf_dir: str):
    """P1/P2: stable sha256 partition key mod P over the ordering key."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id"])

    def assign(t: pa.Table) -> pa.Table:
        names = pc.cast(t["user_id"], pa.string())
        pid = partition_ids_for_array(names, NUM_PARTITIONS)
        return pa.table(
            {
                "event_id": t["event_id"],
                "partition_id": pa.array(pid.astype(np.int64)),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


_KEY_GOLD = np.uint64(0x9E3779B97F4A7C15)
NUM_KEY_BUCKETS = 64


def _add_key_bucket(col: str, num: int = NUM_KEY_BUCKETS):
    """Append a deterministic coarse exchange bucket derived from an int64
    key column (golden-ratio mix so the bucket draws on all bits).  The
    scale-safe shape for keyed window work: groupby(bucket) dispatches
    ~`num` tasks regardless of key cardinality, and the per-key semantics
    are recreated INSIDE the task by a vectorized sort + segment pass —
    grouping directly on the key makes Ray dispatch one UDF per (corpus-
    sized) group, the repo's measured 60 s/190k-groups anti-pattern."""

    def add(t: pa.Table) -> pa.Table:
        k = t[col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        with np.errstate(over="ignore"):
            mixed = k.view(np.uint64) * _KEY_GOLD
        return t.append_column(
            "bucket", pa.array((mixed % np.uint64(num)).astype(np.int64))
        )

    return add


def q_dedup_exact(sf_dir: str):
    """K3: exact dedup — first event per (user_id, event_type) in
    (ts, event_id) order.  Coarse-bucket exchange + vectorized in-task
    drop_duplicates (64 task dispatches, not one per key)."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def first_per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "event_type", "ts", "event_id"], kind="mergesort"
        ).drop_duplicates(["user_id", "event_type"], keep="first")
        return g.rename(columns={"ts": "first_ts", "event_id": "first_event_id"})[
            ["user_id", "event_type", "first_ts", "first_event_id"]
        ]

    return (
        ds.map_batches(_add_key_bucket("user_id"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(first_per_key, batch_format="pandas")
    )


def q_shard_watermarks(sf_dir: str):
    """K5/K7: per-shard watermark aggregates."""
    from ray.data.aggregate import Count, Max, Min

    ds = _read(sf_dir, "events", columns=["ts", "user_id"])
    ds = ds.map_batches(
        lambda t: t.append_column(
            "shard", pc.cast(pc.bit_wise_and(t["user_id"], SHARDS - 1), pa.int64())
        ),
        batch_format="pyarrow",
    )
    return ds.groupby("shard").aggregate(
        Min("ts", alias_name="min_ts"),
        Max("ts", alias_name="max_ts"),
        Count(alias_name="n"),
    )


def q_resume_point(sf_dir: str):
    """S3: resume = min over per-shard max watermarks (the reference's
    min-across-ordinals rule, lastProcessedTime.go:38-53)."""
    per_shard = q_shard_watermarks(sf_dir).to_pandas()
    return pd.DataFrame(
        {
            # pin µs so every harness (not just the driver's normalizing
            # compare) sees the parquet/oracle timestamp resolution
            "resume_ts": pd.Series([per_shard["max_ts"].min()]).astype(
                "datetime64[us]"
            ),
            "num_shards": [np.int64(len(per_shard))],
        }
    )


def q_ordered_rank(sf_dir: str):
    """Explicit per-partition ordering: rank within user_id by (ts, event_id)
    — the order the reference assumes from $natural and we must create.
    Coarse-bucket exchange; ranks recreated in-task with one sort + a
    segment-boundary subtraction (no per-key dispatch)."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        n = len(g)
        idx = np.arange(n, dtype=np.int64)
        new = np.ones(n, dtype=bool)
        new[1:] = uid[1:] != uid[:-1]
        seg_start = np.maximum.accumulate(np.where(new, idx, 0))
        return pd.DataFrame(
            {"event_id": g["event_id"].to_numpy(), "rank": idx - seg_start + 1}
        )

    return (
        ds.map_batches(_add_key_bucket("user_id"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rank_bucket, batch_format="pandas")
    )


def q_cdc_last_state(sf_dir: str):
    """Flagship fold semantics over the shared events table: ops derived
    deterministically from event_id; per (user_id, event_type) the engine's
    insert/patch/delete fold must equal the SQL li/ld/arg_max construction.
    Coarse-bucket exchange on conv_id (64 task dispatches regardless of key
    cardinality); the per-key fold is recreated INSIDE the task by
    `fold_events`' vectorized key segmentation — grouping directly on
    (conv_id, turn_idx) dispatched one pandas UDF per distinct key, the
    repo's measured 60 s/190k-groups anti-pattern (≙ the reference's
    per-SHARD ordered fold, publisher.go:160-226, never per key)."""
    from oplogtoredis_ray.stages.fold import fold_events, sort_and_dedup

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])

    def tag(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        op = np.where(eid % 17 == 0, "d", np.where(eid % 5 == 0, "i", "u"))
        return pa.table(
            {
                "ts": pc.cast(t["ts"], pa.int64()),
                "seq": t["event_id"],
                "tx_idx": pa.array(np.zeros(len(t), dtype=np.int64)),
                "op": pa.array(op, type=pa.string()),
                "conv_id": t["user_id"],       # ordering unit (int key is fine)
                "turn_idx": t["event_type"],   # row key within unit
                "value": t["value"],
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow").map_batches(
        _add_key_bucket("conv_id"), batch_format="pyarrow"
    )

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # fold_events segments by (conv_id, turn_idx) internally, so one
        # task folds ALL keys of its bucket in one vectorized pass
        folded = fold_events(sort_and_dedup(g), payload_cols=("value",))
        live = folded[folded["outcome"] == "upsert"]  # patch-only keys have no state
        return pd.DataFrame(
            {
                "user_id": live["conv_id"].astype("int64"),
                "event_type": live["turn_idx"],
                "last_value": live["value"].astype("float64"),
                # pin µs resolution (pd.to_datetime yields ns) so the Arrow
                # block schema matches the parquet/oracle timestamp[us]
                "last_ts": pd.to_datetime(
                    live["ts"].astype("int64"), unit="us"
                ).astype("datetime64[us]"),
            }
        )

    return tagged.groupby("bucket").map_groups(fold_bucket, batch_format="pandas")


def q_interval_max(sf_dir: str):
    """K7: IntervalMaxMetric — max value per hour bucket."""
    from ray.data.aggregate import Count, Max

    ds = _read(sf_dir, "events", columns=["ts", "value"])
    ds = ds.map_batches(
        lambda t: t.append_column(
            "bucket", pc.floor_temporal(t["ts"], unit="hour")
        ),
        batch_format="pyarrow",
    )
    agg = ds.groupby("bucket").aggregate(
        Max("value", alias_name="max_value"), Count(alias_name="n")
    )
    # Ray's sort-aggregate re-infers the hour-floored key as timestamp[s];
    # cast back so the result schema is the parquet/oracle timestamp[us]
    return agg.map_batches(
        lambda t: t.set_column(
            t.column_names.index("bucket"),
            "bucket",
            pc.cast(t["bucket"], pa.timestamp("us")),
        ),
        batch_format="pyarrow",
    )


def q_changed_fields_json(sf_dir: str):
    """M7: the changed-fields kernel applied to JSON payload docs (top-level
    keys, insert semantics).  Vectorized: the whole batch's props column is
    parsed in ONE C++ `pyarrow.json.read_json` call (newline-delimited view
    of the column, zero per-row Python on the fast path); per-row fallback
    to the exact `changed_fields` kernel only when the batch is not a
    uniform envelope (heterogeneous key sets / JSON-null values / key order
    differing from schema order), where the struct view can't reproduce
    per-document key order."""
    import io

    import pyarrow.json as pj

    ds = _read(sf_dir, "events", columns=["event_id", "props"])

    def cf(t: pa.Table) -> pa.Table:
        props = t["props"].combine_chunks()
        # one buffer, one parse: join the column into NDJSON without a
        # Python loop (binary_join over a single whole-column list)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array([0, len(props)], type=pa.int32()), props
            ),
            "\n",
        )
        parsed = pj.read_json(io.BytesIO(joined[0].as_py().encode()))
        names = parsed.column_names
        # fast path is exact iff every row has every key, no JSON nulls
        # (read_json can't distinguish null from absent), and document key
        # order == schema order in every row (json_keys is document-order)
        fast = bool(names) and all(parsed[c].null_count == 0 for c in names)
        if fast:
            prev = None
            for name in names:
                pos = pc.find_substring(props, f'"{name}"').to_numpy(
                    zero_copy_only=False
                )
                if (pos < 0).any() or (prev is not None and not (pos > prev).all()):
                    fast = False
                    break
                prev = pos
        if fast:
            fields = pa.array(
                np.full(len(t), ",".join(names), dtype=object), type=pa.string()
            )
        else:
            fields = pa.array(
                [
                    ",".join(changed_fields("i", json.loads(p)))
                    for p in props.to_pylist()
                ],
                type=pa.string(),
            )
        return pa.table({"event_id": t["event_id"], "changed_fields": fields})

    return ds.map_batches(cf, batch_format="pyarrow")


def q_agg_pricing(sf_dir: str):
    """Partial aggregation (combiner) before the shuffle: per-batch partials
    → small groupby — the pre-aggregation pattern for wide groupbys."""
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df["sum_qty"] = df["l_quantity"]
        # exact integer cents so summation order can't drift across engines
        df["sum_base_price_cents"] = np.rint(df["l_extendedprice"] * 100).astype("int64")
        df["count_order"] = np.int64(1)
        return (
            df.groupby(["l_returnflag", "l_linestatus"], as_index=False)[
                ["sum_qty", "sum_base_price_cents", "count_order"]
            ]
            .sum()
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price_cents", alias_name="sum_base_price_cents"),
        Sum("count_order", alias_name="count_order"),
    )

    def cast_types(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": pc.cast(t["sum_qty"], pa.int64()),
                "sum_base_price_cents": pc.cast(t["sum_base_price_cents"], pa.int64()),
                "count_order": pc.cast(t["count_order"], pa.int64()),
            }
        )

    return out.map_batches(cast_types, batch_format="pyarrow")


def q_text_stats(sf_dir: str):
    """Text analysis: token/char/alpha counts, quality bucket, lang-ID,
    fingerprint — one vectorized actor-pool stage."""
    from oplogtoredis_ray.stages.text import TextStats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(TextStats(), batch_format="pyarrow", concurrency=2)


# --- training-batch construction ops -----------------------------------------

# sequence packing: fixed token budget per training sequence, 32-way
# distribution (a production packer derives the bucket from the shard id;
# doc_id % B is that key for the synthetic corpus)
PACK_TOKEN_BUDGET = 512
NUM_PACK_BUCKETS = 32


def q_pack_sequences(sf_dir: str):
    """Training-sequence packing: deterministically bin documents into
    fixed token-budget sequences.

    A sequential greedy packer is inherently stateful; the distributed
    re-expression is FLOOR BINNING — within a bucket, docs are taken in
    doc_id order and a doc belongs to sequence ``tokens_before // budget``
    (one vectorized cumulative sum, no packer state), so every bucket
    packs independently and the operator scales with buckets.  Output is
    one row per packed sequence: doc count, token total, id span.

    Partitioning assumption (the knob that carries this to 100 TB): the
    per-bucket prefix sum needs one bucket per task, so NUM_PACK_BUCKETS
    must be sized to ``corpus_tokens / per-task memory`` — at web scale
    that is thousands of buckets, not 32; packing quality is unaffected
    because sequences never cross buckets by construction."""
    from oplogtoredis_ray.stages.text import token_counts

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def tokens(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "bucket": pa.array(ids % NUM_PACK_BUCKETS, type=pa.int64()),
                "n_tokens": pc.cast(token_counts(t["text"]), pa.int64()),
            }
        )

    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        before = g["n_tokens"].cumsum() - g["n_tokens"]
        seq = (before // PACK_TOKEN_BUDGET).astype("int64")
        out = (
            g.assign(seq_idx=seq)
            .groupby("seq_idx", sort=True)
            .agg(
                n_docs=("doc_id", "size"),
                seq_tokens=("n_tokens", "sum"),
                first_doc=("doc_id", "min"),
                last_doc=("doc_id", "max"),
            )
            .reset_index()
        )
        out.insert(0, "bucket", int(g["bucket"].iloc[0]))
        return out.astype("int64")

    return (
        ds.map_batches(tokens, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pack_bucket, batch_format="pandas")
    )


# stratified sampling: per-stratum keep rates in per-mille, deterministic
# multiplicative-hash gate (single source of truth for Ray AND the SQL
# oracle).  The pre-mod keeps doc_id * KNUTH inside int64 on BOTH engines
# (numpy would wrap silently, DuckDB would raise).
STRATA_RATES = {"en": 500, "zh": 1000, "es": 1000, "de": 1000, "fr": 1000}
STRATA_DEFAULT_RATE = 100
_SAMPLE_KNUTH = 2654435761
_SAMPLE_PREMOD = 86028121


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling by the ``lang`` column: rebalance
    the corpus by downsampling the dominant stratum (en → 50%) and the
    long tail (unknown langs → 10%) while keeping the rest.  The keep
    decision is a pure function of (doc_id, lang) — reproducible across
    runs and engines, no RNG state to coordinate; the rate map broadcasts
    into the batch closure (tiny), the gate is vectorized per batch."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def sample(df: pd.DataFrame) -> pd.DataFrame:
        rates = (
            df["lang"].map(STRATA_RATES).fillna(STRATA_DEFAULT_RATE).astype("int64")
        )
        ids = df["doc_id"].astype("int64")
        gate = ((ids % _SAMPLE_PREMOD) * _SAMPLE_KNUTH) % 1000
        out = df.loc[gate < rates, ["doc_id", "lang"]].copy()
        out["doc_id"] = out["doc_id"].astype("int64")
        return out

    return ds.map_batches(sample, batch_format="pandas")


def q_dedup_exact_docs(sf_dir: str):
    """Exact document dedup: survivor (min doc_id) + count per content hash."""
    from oplogtoredis_ray.pipelines.dedup import exact_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = exact_dedup(ds)
    return out.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "dup_count": pc.cast(t["dup_count"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_knn_brute(sf_dir: str):
    """ANN baseline: brute-force cosine top-10 for 4 fixed query vectors,
    broadcast query matrix + distributed partial top-k."""
    import pyarrow.parquet as pq

    from oplogtoredis_ray.pipelines.similarity import knn_brute

    # query-vector extraction with the predicate pushed INTO the read:
    # only matching row groups/rows reach the driver, never the full table
    qtbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", 4)],
    )
    queries = {
        int(i): np.array(v, dtype=np.float64)
        for i, v in zip(qtbl["vec_id"].to_pylist(), qtbl["embedding"].to_pylist())
    }
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return knn_brute(ds, queries, k=10)


def q_neardup_embeddings(sf_dir: str):
    """Embedding near-dup pairs (cosine ≥ τ) on a filtered subset via a
    broadcast side matrix.  The side matrix is built by streaming ONLY the
    already-filtered rows to the driver through the distributed scan — the
    modulo predicate can't prune parquet row groups, so the filter runs in
    the read tasks, never as a driver-side full-table materialization.
    (The broadcast side is O(corpus/4) by design; the documented scale path
    for corpus-sized inputs is `neardup_lsh`.)"""
    import ray

    from oplogtoredis_ray.pipelines.similarity import PairsAboveThreshold

    def quarter(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(pc.bit_wise_and(t["vec_id"], 4 - 1), 0))

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
        quarter, batch_format="pyarrow"
    )
    side = pa.concat_tables(
        ds.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    ids = side["vec_id"].to_numpy(zero_copy_only=False)
    M = np.array(side["embedding"].to_pylist(), dtype=np.float64)
    ref = ray.put((ids, M))
    return ds.map_batches(
        PairsAboveThreshold,
        batch_format="pyarrow",
        fn_constructor_args=(ref, 0.35),
        concurrency=2,
    )


def q_ivf_topk(sf_dir: str):
    """IVF approximate top-k (the ANN scale path).  The trained index
    (centroids + coarse assignments) is exported as parquet, so the oracle
    SQL replays the exact probe-set search over the same index — the
    approximation itself becomes hash-verifiable."""
    import pyarrow.parquet as pq

    from oplogtoredis_ray.pipelines.similarity import ivf_topk

    qtbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", 4)],
    )
    queries = {
        int(i): np.array(v, dtype=np.float64)
        for i, v in zip(qtbl["vec_id"].to_pylist(), qtbl["embedding"].to_pylist())
    }
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ivf_topk(
        ds, queries, k=10, nlist=16, nprobe=4, materialize_dir=_oracle_dir(sf_dir)
    )


def q_ngram_jaccard(sf_dir: str):
    """Exact word-bigram Jaccard pairs (≥5%) on a filtered subset, as a
    DISTRIBUTED gram-bucket join (mirrors the oracle SQL): explode distinct
    (doc_id, gram) rows → per-gram upper-triangle pairs → pair-count
    aggregation → threshold filter via two bucketed size joins (a_id then
    b_id) — nothing key-sized ever lands on the driver, so the verified-
    candidate set can be arbitrarily large at corpus scale.  The driver
    only ever sees the final pair list (at scale MinHash-LSH prunes
    candidates first and this exact measure is the verifier).  Integer
    threshold arithmetic keeps the SQL oracle bit-exact."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def subset(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 10 == 0))

    ds = ds.map_batches(subset, batch_format="pyarrow")

    def grams(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out_id, out_g = [], []
        for i, txt in zip(ids, texts):
            words = txt.strip().lower().split()
            gs = {f"{a} {b}" for a, b in zip(words, words[1:])}
            out_id.extend([i] * len(gs))
            out_g.extend(gs)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "gram": pa.array(out_g, type=pa.string()),
            }
        )

    gram_rows = ds.map_batches(grams, batch_format="pyarrow")

    def gram_sizes(t: pa.Table) -> pa.Table:
        # each doc's text lives in exactly one row, so per-doc distinct gram
        # counts need NO exchange — one output row per input doc
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        ns = [
            len({f"{a} {b}" for a, b in zip(w, w[1:])})
            for w in (txt.strip().lower().split() for txt in texts)
        ]
        return pa.table(
            {
                "doc_id": pa.array([int(i) for i in ids], type=pa.int64()),
                "n": pa.array(ns, type=pa.int64()),
            }
        )

    # one row per candidate doc; materialize so the two join exchanges
    # below don't re-execute the documents read + gram pass (blocks live
    # in the OBJECT STORE, not on the driver — scale-safe)
    sizes = ds.map_batches(gram_sizes, batch_format="pyarrow").materialize()

    # two-level grouping: the distributed exchange groups on a coarse
    # deterministic gram-hash bucket; the task segments its block by exact
    # gram and pairs within segments — same pair multiset, ~1000× fewer
    # per-group UDF dispatches than groupby("gram") over tiny groups
    NUM_GRAM_BUCKETS = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            pd.Series(t["gram"].to_pylist()), index=False
        ).to_numpy()  # fixed-key siphash: deterministic across processes
        return t.append_column(
            "bucket",
            pa.array((h % NUM_GRAM_BUCKETS).astype(np.int64), type=pa.int64()),
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["gram", "doc_id"], kind="mergesort")
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        grams = df["gram"].to_numpy()
        change = np.nonzero(grams[1:] != grams[:-1])[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(ids)]])
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            ai, bi = np.triu_indices(e - s, k=1)
            a_out.append(ids[s:e][ai])
            b_out.append(ids[s:e][bi])
        a = np.concatenate(a_out) if a_out else np.array([], dtype=np.int64)
        b = np.concatenate(b_out) if b_out else np.array([], dtype=np.int64)
        # pair-coarse key for the count exchange: mix BOTH ids before the
        # mod (`((a<<32)|b) % 64` would reduce to `b % 64` since 2^32 is
        # divisible by 64 — one-sided keying skews buckets under a hot b_id)
        with np.errstate(over="ignore"):
            mixed = (
                a.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ) ^ b.view(np.uint64)
        return pd.DataFrame(
            {
                "a_id": a,
                "b_id": b,
                "pair_bucket": (mixed % np.uint64(NUM_GRAM_BUCKETS)).astype(np.int64),
            }
        )

    def count_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # per-coarse-bucket pair counting via np.unique — Ray's groupby
        # AGGREGATE over high-cardinality keys does per-group work
        # (measured 60s for 190k groups); a 64-way coarse exchange with
        # vectorized in-task counting is the scalable shape.
        # PRECONDITION: doc ids fit 31 bits so (a<<32)|b packs losslessly
        # into int64 — enforced, not assumed (corrupt counts otherwise)
        a_np = g["a_id"].to_numpy(dtype=np.int64)
        b_np = g["b_id"].to_numpy(dtype=np.int64)
        if len(a_np) and max(int(a_np.max()), int(b_np.max())) >= (1 << 31):
            raise ValueError(
                "ngram_jaccard pair packing requires doc_id < 2^31; "
                "remap ids or widen the pack"
            )
        packed = (a_np << 32) | b_np
        keys, counts = np.unique(packed, return_counts=True)
        return pd.DataFrame(
            {
                "a_id": keys >> 32,
                "b_id": keys & 0xFFFFFFFF,
                "inter": counts.astype(np.int64),
            }
        )

    pair_counts = (
        gram_rows.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .groupby("pair_bucket")
        .map_groups(count_pairs, batch_format="pandas")
    )

    # ---- threshold filter via two bucketed size joins (union-cogroup) ----
    # the per-doc gram sizes stay a DATASET end to end: join them onto the
    # pair counts keyed on a_id, then on b_id — the order_revenue
    # partitioned-join shape — instead of assembling a doc->size dict on
    # the driver (O(candidate set) driver memory at corpus scale)
    PCT = 5

    def _mix_bucket(col) -> pa.Array:
        k = col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        with np.errstate(over="ignore"):
            mixed = k.view(np.uint64) * _KEY_GOLD
        return pa.array((mixed % np.uint64(NUM_GRAM_BUCKETS)).astype(np.int64))

    def tag_sizes_a(t: pa.Table) -> pa.Table:
        n = len(t)
        out = pa.table(
            {
                "key": pc.cast(t["doc_id"], pa.int64()),
                "other": pa.nulls(n, pa.int64()),
                "inter": pa.nulls(n, pa.int64()),
                "sz": pc.cast(t["n"], pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )
        return out.append_column("jbucket", _mix_bucket(out["key"]))

    def tag_pairs_a(t: pa.Table) -> pa.Table:
        n = len(t)
        out = pa.table(
            {
                "key": pc.cast(t["a_id"], pa.int64()),
                "other": pc.cast(t["b_id"], pa.int64()),
                "inter": pc.cast(t["inter"], pa.int64()),
                "sz": pa.nulls(n, pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
            }
        )
        return out.append_column("jbucket", _mix_bucket(out["key"]))

    def join_a(g: pd.DataFrame) -> pd.DataFrame:
        s = g.loc[g["side"] == 0, ["key", "sz"]]
        p = g.loc[g["side"] == 1, ["key", "other", "inter"]]
        out = p.merge(s, on="key", how="inner")
        return pd.DataFrame(
            {
                "a_id": out["key"].astype("int64"),
                "b_id": out["other"].astype("int64"),
                "inter": out["inter"].astype("int64"),
                "na": out["sz"].astype("int64"),
            }
        )

    with_na = (
        sizes.map_batches(tag_sizes_a, batch_format="pyarrow")
        .union(pair_counts.map_batches(tag_pairs_a, batch_format="pyarrow"))
        .groupby("jbucket")
        .map_groups(join_a, batch_format="pandas")
    )

    def tag_sizes_b(t: pa.Table) -> pa.Table:
        n = len(t)
        out = pa.table(
            {
                "key": pc.cast(t["doc_id"], pa.int64()),
                "other": pa.nulls(n, pa.int64()),
                "inter": pa.nulls(n, pa.int64()),
                "na": pa.nulls(n, pa.int64()),
                "sz": pc.cast(t["n"], pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )
        return out.append_column("jbucket", _mix_bucket(out["key"]))

    def tag_pairs_b(t: pa.Table) -> pa.Table:
        n = len(t)
        out = pa.table(
            {
                "key": pc.cast(t["b_id"], pa.int64()),
                "other": pc.cast(t["a_id"], pa.int64()),
                "inter": pc.cast(t["inter"], pa.int64()),
                "na": pc.cast(t["na"], pa.int64()),
                "sz": pa.nulls(n, pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
            }
        )
        return out.append_column("jbucket", _mix_bucket(out["key"]))

    def join_b_filter(g: pd.DataFrame) -> pd.DataFrame:
        s = g.loc[g["side"] == 0, ["key", "sz"]]
        p = g.loc[g["side"] == 1, ["key", "other", "inter", "na"]]
        out = p.merge(s, on="key", how="inner")
        inter = out["inter"].to_numpy(dtype=np.int64)
        na = out["na"].to_numpy(dtype=np.int64)
        nb = out["sz"].to_numpy(dtype=np.int64)
        keep = inter * 100 >= PCT * (na + nb - inter)
        return pd.DataFrame(
            {
                "a_id": out["other"].to_numpy(dtype=np.int64)[keep],
                "b_id": out["key"].to_numpy(dtype=np.int64)[keep],
            }
        )

    return (
        sizes.map_batches(tag_sizes_b, batch_format="pyarrow")
        .union(with_na.map_batches(tag_pairs_b, batch_format="pyarrow"))
        .groupby("jbucket")
        .map_groups(join_b_filter, batch_format="pandas")
    )


def q_neardup_lsh(sf_dir: str):
    """Bucketed embedding near-dup pairs (the cosine-threshold scale path):
    random-hyperplane buckets → per-bucket pair compare.  The (vec_id,
    bucket) assignment is exported as parquet, so the oracle SQL derives
    the identical pair set — the LSH approximation is hash-verifiable."""
    from oplogtoredis_ray.pipelines.similarity import lsh_neardup_pairs

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return lsh_neardup_pairs(
        ds, num_planes=6, threshold=0.3, materialize_dir=_oracle_dir(sf_dir)
    )


def q_curate_corpus(sf_dir: str):
    """The training-data curation composite (pipelines/curate.py): enrich →
    quality/lang filter → exact dedup → materialized survivors → MinHash
    near-dup drop → (doc_id, n_tokens).  Every stage SQL-verified; the
    near-dup derivation replays from the run's own MinHash exports."""
    from oplogtoredis_ray.pipelines.curate import curate_corpus

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return curate_corpus(ds, work_dir=_oracle_dir(sf_dir))


def q_minhash_dedup(sf_dir: str):
    """MinHash+LSH near-dup clustering.  The band-bucket signature rows and
    per-doc shingle-hash sets are exported as parquet, so the oracle SQL
    replays candidate generation, exact-Jaccard verification and connected
    components over identical hash values — hash-verifiable end to end."""
    from oplogtoredis_ray.pipelines.dedup import minhash_lsh_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_lsh_dedup(ds, materialize_dir=_oracle_dir(sf_dir))


def q_simhash_pairs(sf_dir: str):
    """SimHash bucketing near-dup pairs.  Signatures are exported as
    parquet, so the oracle SQL replays the bucket join + Hamming filter
    (DuckDB ``bit_count(xor(...))``) over identical signatures."""
    from oplogtoredis_ray.pipelines.dedup import simhash_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_dedup(ds, materialize_dir=_oracle_dir(sf_dir))


def q_change_records(sf_dir: str):
    """M9: the canonical change-record (Publication) contract over the
    synthetic transcript log."""
    from oplogtoredis_ray.sources.event_log import read_event_window, log_ts_bounds
    from oplogtoredis_ray.stages.parse import ParseStage

    from oplogtoredis_ray.stages.parse import to_change_records

    log_dir = ensure_synth_log(sf_dir)
    lo, hi = log_ts_bounds(log_dir)
    cfg = PipelineConfig(num_partitions=NUM_PARTITIONS)
    ds = read_event_window(log_dir, lo - 1, hi)
    ds = ds.map_batches(ParseStage(cfg), batch_format="pyarrow")

    def project(t: pa.Table) -> pa.Table:
        cr = to_change_records(t)  # the shipped M9 kernel
        return pa.table(
            {
                "channel": cr["channel"],
                "channel_doc": cr["channel_doc"],
                "event": cr["event"],
                "doc_id": cr["doc_id"],
                # join the list for SQL-comparable output
                "fields": pc.binary_join(cr["fields"].combine_chunks(), ","),
                "ts": cr["ts"],
                "seq": pc.cast(cr["seq"], pa.int64()),
                "tx_idx": pc.cast(cr["tx_idx"], pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def q_sessionize(sf_dir: str):
    """Session windows (streaming-shaped): per-user sessions split at >30 min
    gaps — coarse-bucket exchange + in-task vectorized boundary detection
    (Ray Data has no event-time windows; this is the documented, scale-safe
    composition)."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    GAP_US = 30 * 60 * 1_000_000

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one sort for the whole bucket; session boundaries found with a
        # single vectorized pass over user-change OR gap-exceeded marks,
        # then ONE pandas (C-level) groupby over global session ids —
        # per-key Ray dispatch is gone, in-task work is key-cardinality-free
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = g["ts"].astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        n = len(g)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = (uid[1:] != uid[:-1]) | (np.diff(ts) > GAP_US)
        sid = np.cumsum(new)
        cents = np.floor(g["value"].to_numpy() * 100).astype("int64")
        out = (
            pd.DataFrame(
                {
                    "session": sid,
                    "user_id": uid,
                    "ts": g["ts"].to_numpy(),
                    "cents": cents,
                }
            )
            .groupby("session", as_index=False)
            .agg(
                user_id=("user_id", "first"),
                session_start=("ts", "min"),
                session_end=("ts", "max"),
                n_events=("ts", "count"),
                value_cents=("cents", "sum"),
            )
        )
        out["n_events"] = out["n_events"].astype("int64")
        out["value_cents"] = out["value_cents"].astype("int64")
        return out[
            ["user_id", "session_start", "session_end", "n_events", "value_cents"]
        ]

    return (
        ds.map_batches(_add_key_bucket("user_id"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sessions_bucket, batch_format="pandas")
    )


def q_asof_view_click(sf_dir: str):
    """As-of join: for each click, the latest view of the same user at or
    before it.  Coarse-bucket exchange; inside the task ONE
    ``pd.merge_asof(..., by="user_id")`` handles every key in the bucket —
    the segment-boundary-vectorized as-of (no per-key dispatch)."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # merge_asof requires the on-key globally sorted; the stable
        # (ts, event_id) sort also fixes tie order among equal-ts views
        # (backward asof takes the LAST right row ≤ ts within the by-group)
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        clicks = g[g["event_type"] == "click"][["event_id", "ts", "user_id"]]
        views = g[g["event_type"] == "view"][["event_id", "ts", "user_id"]].rename(
            columns={"event_id": "view_event_id", "ts": "view_ts"}
        )
        if clicks.empty or views.empty:
            return pd.DataFrame(
                columns=["event_id", "user_id", "ts", "view_event_id", "view_ts"]
            )
        merged = pd.merge_asof(
            clicks,
            views,
            left_on="ts",
            right_on="view_ts",
            by="user_id",
            direction="backward",
        )
        merged = merged.dropna(subset=["view_event_id"])
        merged["view_event_id"] = merged["view_event_id"].astype("int64")
        return merged[["event_id", "user_id", "ts", "view_event_id", "view_ts"]]

    return (
        ds.map_batches(_add_key_bucket("user_id"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(asof_bucket, batch_format="pandas")
    )


def q_customer_region(sf_dir: str):
    """Broadcast dimension join: customer ⋈ nation ⋈ region with the small
    side shipped once via ray.put and merged per batch — no shuffle."""
    import pyarrow.parquet as pq
    import ray

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    region = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")[
        ["n_nationkey", "n_name", "r_name"]
    ]
    ref = ray.put(dim)

    class JoinDim:
        def __init__(self, dim_ref):
            self.dim = ray.get(dim_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.merge(
                self.dim, left_on="c_nationkey", right_on="n_nationkey"
            )
            return out[["c_custkey", "c_name", "n_name", "r_name"]].rename(
                columns={"n_name": "nation", "r_name": "region"}
            )

    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"])
    return ds.map_batches(
        JoinDim, fn_constructor_args=(ref,), batch_format="pandas", concurrency=2
    )


def q_order_revenue(sf_dir: str):
    """Partitioned hash join (both sides large): bucket both sides by
    hash(orderkey) % B, co-group, join within bucket — the explicit
    partitioned-join pattern."""
    B = 16

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    items = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def tag_orders(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["o_orderkey"], B - 1), pa.int32())
        return t.append_column("bucket", b).append_column(
            "side", pa.array(np.zeros(len(t), dtype=np.int8))
        )

    def tag_items(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(
                pc.multiply(
                    pc.multiply(
                        t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])
                    ),
                    100.0,
                )
            ),
            pa.int64(),
        )
        out = pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "o_custkey": pa.nulls(len(t), pa.int64()),
                "revenue_cents": cents,
            }
        )
        b = pc.cast(pc.bit_wise_and(out["o_orderkey"], B - 1), pa.int32())
        return out.append_column("bucket", b).append_column(
            "side", pa.array(np.ones(len(t), dtype=np.int8))
        )

    left = orders.map_batches(tag_orders, batch_format="pyarrow").map_batches(
        lambda t: t.append_column("revenue_cents", pa.nulls(len(t), pa.int64())),
        batch_format="pyarrow",
    )
    right = items.map_batches(tag_items, batch_format="pyarrow")
    both = left.union(right)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][["o_orderkey", "o_custkey"]]
        i = g[g["side"] == 1].groupby("o_orderkey", as_index=False)["revenue_cents"].sum()
        out = o.merge(i, on="o_orderkey", how="inner")
        out["revenue_cents"] = out["revenue_cents"].astype("int64")
        out["o_custkey"] = out["o_custkey"].astype("int64")
        return out

    return both.groupby("bucket").map_groups(join_bucket, batch_format="pandas")


def q_top_spenders(sf_dir: str):
    """Top-k: total spend per user (exact integer cents) → global top 10,
    deterministic ties by user_id."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "spend_cents": pc.cast(pc.floor(pc.multiply(t["value"], 100.0)), pa.int64()),
            }
        )

    agg = ds.map_batches(cents, batch_format="pyarrow").groupby("user_id").aggregate(
        Sum("spend_cents", alias_name="spend_cents")
    )

    def local_top(t: pa.Table) -> pa.Table:
        # per-block partial top-k: the driver merges only blocks × 10 rows,
        # never the full per-user aggregate
        idx = pc.sort_indices(
            t,
            sort_keys=[("spend_cents", "descending"), ("user_id", "ascending")],
        )
        return t.take(idx[:10])

    top = (
        agg.map_batches(local_top, batch_format="pyarrow")
        .to_pandas()
        .sort_values(
            ["spend_cents", "user_id"], ascending=[False, True], kind="mergesort"
        )
        .head(10)
    )
    top["spend_cents"] = top["spend_cents"].astype("int64")
    return top.reset_index(drop=True)


def q_distinct_event_types(sf_dir: str):
    """Set op: distinct values of one column (a shuffle)."""
    ds = _read(sf_dir, "events", columns=["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pd.DataFrame({"event_type": vals})


def q_hash_sample(sf_dir: str):
    """Deterministic ~5% sample: hash-bucket membership instead of RNG so
    the sample is reproducible across engines, runs and cluster sizes (the
    production-correct way to sample for eval sets).  The gate hash is a
    64-bit golden-ratio multiply (mod 2^64) with the top bits selecting the
    percentile — fully vectorized in numpy AND expressible in plain SQL via
    HUGEINT modular arithmetic (no per-row hashlib, no SQL UDF)."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def sample(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        with np.errstate(over="ignore"):
            h = ids.view(np.uint64) * _KEY_GOLD
        keep = (h >> np.uint64(33)) % np.uint64(100) < np.uint64(5)
        return t.filter(pa.array(keep))

    return ds.map_batches(sample, batch_format="pyarrow")


def q_running_total(sf_dir: str):
    """Ordered window aggregate: per-user running total of integer cents in
    (ts, event_id) order — coarse-bucket exchange + in-task segmented
    cumsum (Ray Data has no window functions; this is the scale-safe
    composition)."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def running_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # segmented cumsum: one global cumsum, then subtract each user
        # segment's starting offset — sign-safe (no maximum.accumulate on
        # the sums themselves), one sort per bucket, zero per-key dispatch
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        cents = np.floor(g["value"].to_numpy() * 100).astype("int64")
        cs = np.cumsum(cents)
        n = len(g)
        new = np.ones(n, dtype=bool)
        new[1:] = uid[1:] != uid[:-1]
        seg_id = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        prior = cs[starts] - cents[starts]  # cumsum just before each segment
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": uid,
                "running_cents": cs - prior[seg_id],
            }
        )

    return (
        ds.map_batches(_add_key_bucket("user_id"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(running_bucket, batch_format="pandas")
    )


def q_anti_join_users(sf_dir: str):
    """Broadcast anti-semi-join: event users outside the first 100 customer
    keys (the denylist pattern generalized — small side shipped once as a
    set)."""
    import pyarrow.parquet as pq

    keys = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    )["c_custkey"]
    key_set = pa.array(
        sorted({int(k) for k in keys.to_pylist() if int(k) < 100}), type=pa.int64()
    )
    ds = _read(sf_dir, "events", columns=["user_id"])

    def anti(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.fill_null(pc.is_in(t["user_id"], value_set=key_set), False))
        return t.filter(keep)

    out = ds.map_batches(anti, batch_format="pyarrow")
    vals = sorted(out.unique("user_id") or [])
    return pd.DataFrame({"user_id": pd.array(vals, dtype="int64")})


def q_cdc_apply(sf_dir: str):
    """The flagship pipeline: full windowed exactly-once CDC replay of the
    synthetic transcript log into a fresh lake; returns the final table."""
    import tempfile

    from oplogtoredis_ray.pipelines.ingest import run_ingest
    from oplogtoredis_ray.sources.event_log import log_ts_bounds
    from oplogtoredis_ray.state.lake import read_lake

    log_dir = ensure_synth_log(sf_dir)
    lake_root = tempfile.mkdtemp(prefix="otr_lake_")
    lo, hi = log_ts_bounds(log_dir)
    cfg = PipelineConfig(
        num_partitions=32, window_us=max((hi - lo) // 4, 1) + 1
    )
    run_ingest(log_dir, lake_root, cfg)
    return read_lake(lake_root)


# --- registry ----------------------------------------------------------------

MEDIA_N = 240  # deterministic synthetic media corpus size (seeded)
MEDIA_FEATURE_DIM = 16
MEDIA_FRAMES = 4


def _ensure_media_table(sf_dir: str) -> str:
    """Write the deterministic decodable media table (PPM/BMP/WAV) under
    the oracle dir once; both the engine queries and the DuckDB oracle read
    the SAME parquet file."""
    import pyarrow.parquet as pq

    od = _oracle_dir(sf_dir)
    os.makedirs(od, exist_ok=True)
    media_path = os.path.join(od, "media.parquet")
    stale = True
    if os.path.exists(media_path):
        # regenerate a cache written by an older synth version (round 5
        # added PNG rows); engine + oracle always read the SAME file either
        # way, this only refreshes coverage
        meta = pq.read_table(media_path, columns=["mime"])
        stale = "image/png" not in set(meta["mime"].to_pylist())
    if stale:
        from oplogtoredis_ray.stages.multimodal import (
            synthesize_decodable_media_table,
        )

        pq.write_table(
            synthesize_decodable_media_table(MEDIA_N, seed=7), media_path
        )
    return media_path


def q_frame_sample(sf_dir: str):
    """Multimodal frame sampling under the oracle gate: media payloads →
    actor-pool `FrameSampleStage` (K deterministic stub frames per payload,
    stages/multimodal.py) → one row per (media_id, frame_idx) with the
    frame's byte length and an md5 over its hex encoding.  The oracle
    replays the slicing in pure SQL — DuckDB has no blob substring, so both
    engines hash ``substring(hex(payload))``, which is byte-exact."""
    import hashlib

    import ray.data as rd

    from oplogtoredis_ray.stages.multimodal import FrameSampleStage

    media_path = _ensure_media_table(sf_dir)
    frames = rd.read_parquet(media_path).map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"k_frames": MEDIA_FRAMES},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
    )

    def digest(t: pa.Table) -> pa.Table:
        blobs = t["frame"].to_pylist()
        return pa.table(
            {
                "media_id": t["media_id"],
                "frame_idx": pc.cast(t["frame_idx"], pa.int64()),
                "frame_len": pa.array(
                    [len(b) for b in blobs], type=pa.int64()
                ),
                "frame_md5": pa.array(
                    [
                        hashlib.md5(b.hex().upper().encode()).hexdigest()
                        for b in blobs
                    ],
                    type=pa.string(),
                ),
            }
        )

    return frames.map_batches(digest, batch_format="pyarrow")


def q_media_features(sf_dir: str):
    """Multimodal feature pipeline under the oracle gate: deterministic
    decodable media table (PPM/BMP/WAV, stages/multimodal.py) → actor-pool
    `MediaFeatureStage` → flattened per-chunk integer sums/counts.  The
    decode itself is exported as (media_id, chunk_idx, value) parquet via
    `MediaDecodeExplode` so the oracle SQL recomputes payload_bytes + the
    pooled chunks from the same decode (the sketch-export pattern; decode
    correctness is pinned separately by the codec round-trip pytests).
    Integer sums instead of float means keep the comparison exact across
    engines.  ≙ reference acceptance harness style
    (/root/reference/integration-tests/acceptance/harness_test.go:32-147)."""
    import shutil

    import ray.data as rd

    from oplogtoredis_ray.stages.multimodal import (
        MediaDecodeExplode,
        MediaFeatureStage,
    )

    od = _oracle_dir(sf_dir)
    media_path = _ensure_media_table(sf_dir)
    decoded_dir = os.path.join(od, "media_decoded")
    if os.path.isdir(decoded_dir):
        shutil.rmtree(decoded_dir)
    os.makedirs(decoded_dir, exist_ok=True)
    rd.read_parquet(media_path).map_batches(
        MediaDecodeExplode,
        fn_constructor_kwargs={"feature_dim": MEDIA_FEATURE_DIM},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
    ).write_parquet(decoded_dir)

    feats = rd.read_parquet(media_path).map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={"feature_dim": MEDIA_FEATURE_DIM},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
    )

    def flatten(t: pa.Table) -> pa.Table:
        n = len(t)
        dim = MEDIA_FEATURE_DIM
        idx = np.repeat(np.arange(n, dtype=np.int64), dim)
        take = pa.array(idx, type=pa.int64())
        out = pa.table(
            {
                "media_id": pc.take(t["media_id"], take),
                "kind": pc.take(t["kind"], take),
                "payload_bytes": pc.take(t["payload_bytes"], take),
                "chunk_idx": pa.array(
                    np.tile(np.arange(dim, dtype=np.int64), n), type=pa.int64()
                ),
                "chunk_sum": t["chunk_sums"].combine_chunks().flatten(),
                "chunk_n": pc.cast(
                    t["chunk_lens"].combine_chunks().flatten(), pa.int64()
                ),
            }
        )
        # a payload decoding to fewer than feature_dim values yields empty
        # trailing chunks; the oracle's GROUP BY over the exploded decode
        # cannot produce those rows — agree by construction
        return out.filter(pc.greater(out["chunk_n"], 0))

    return feats.map_batches(flatten, batch_format="pyarrow")


QUERIES = {
    "window_read": q_window_read,
    "envelope_project": q_envelope_project,
    "denylist_filter": q_denylist_filter,
    "props_extract": q_props_extract,
    "tx_flatten": q_tx_flatten,
    "partition_assign": q_partition_assign,
    "dedup_exact": q_dedup_exact,
    "shard_watermarks": q_shard_watermarks,
    "resume_point": q_resume_point,
    "ordered_rank": q_ordered_rank,
    "cdc_last_state": q_cdc_last_state,
    "interval_max": q_interval_max,
    "changed_fields_json": q_changed_fields_json,
    "agg_pricing": q_agg_pricing,
    "text_stats": q_text_stats,
    "pack_sequences": q_pack_sequences,
    "stratified_sample": q_stratified_sample,
    "dedup_exact_docs": q_dedup_exact_docs,
    "knn_brute": q_knn_brute,
    "ivf_topk": q_ivf_topk,
    "ngram_jaccard": q_ngram_jaccard,
    "neardup_embeddings": q_neardup_embeddings,
    "neardup_lsh": q_neardup_lsh,
    "curate_corpus": q_curate_corpus,
    "minhash_dedup": q_minhash_dedup,
    "simhash_pairs": q_simhash_pairs,
    "change_records": q_change_records,
    "cdc_apply": q_cdc_apply,
    "sessionize": q_sessionize,
    "asof_view_click": q_asof_view_click,
    "customer_region": q_customer_region,
    "order_revenue": q_order_revenue,
    "top_spenders": q_top_spenders,
    "distinct_event_types": q_distinct_event_types,
    "hash_sample": q_hash_sample,
    "running_total": q_running_total,
    "anti_join_users": q_anti_join_users,
    "media_features": q_media_features,
    "frame_sample": q_frame_sample,
}


def _synth_glob_sql(sf_name: str) -> str:
    return os.path.join(SYNTH_ROOT, sf_name, "events", "*.parquet")


def _bpe_sql_pattern() -> str:
    from oplogtoredis_ray.stages.text import BPE_ISH_PATTERN

    return BPE_ISH_PATTERN.replace("'", "''")


def _sql_wordlist(words) -> str:
    return ", ".join("'" + w + "'" for w in sorted(words))


def _minhash_ctes(base: str) -> str:
    """The MinHash-LSH derivation as a reusable CTE chain reading the
    exported intermediates under ``base``: capped candidate pairs per band
    bucket → exact-Jaccard verification on identical shingle hashes →
    undirected edge list (feeds a recursive connected-components walk)."""
    return f"""sig AS (SELECT DISTINCT band_id, band_bucket, doc_id
                    FROM read_parquet('{base}/minhash_sigs/*.parquet')),
            ranked AS (
              SELECT band_id, band_bucket, doc_id,
                     ROW_NUMBER() OVER (PARTITION BY band_id, band_bucket
                                        ORDER BY doc_id) AS rn
              FROM sig),
            capped AS (SELECT * FROM ranked WHERE rn <= 50),
            pairs AS (
              SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
              FROM capped a JOIN capped b
                ON a.band_id = b.band_id AND a.band_bucket = b.band_bucket
               AND a.doc_id < b.doc_id),
            sh AS (SELECT DISTINCT doc_id, h
                   FROM read_parquet('{base}/minhash_shingles/*.parquet')),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
            inter AS (
              SELECT p.a_id, p.b_id, COUNT(*) AS i
              FROM pairs p
              JOIN sh a ON a.doc_id = p.a_id
              JOIN sh b ON b.doc_id = p.b_id AND b.h = a.h
              GROUP BY 1, 2),
            verified AS (
              SELECT i.a_id, i.b_id
              FROM inter i
              JOIN sizes sa ON sa.doc_id = i.a_id
              JOIN sizes sb ON sb.doc_id = i.b_id
              WHERE i.i * 10 >= 8 * (sa.n + sb.n - i.i)),
            edges AS (SELECT a_id AS s, b_id AS d FROM verified
                      UNION ALL
                      SELECT b_id, a_id FROM verified)"""


def _curate_sql(od: str) -> str:
    """curate_corpus oracle: enrich (generated from the same text-kernel
    constants) → quality/lang filter → exact dedup → near-dup drop replayed
    from the curate run's own MinHash exports → (doc_id, n_tokens)."""
    from oplogtoredis_ray.stages.text import LANG_PROFILES

    score_cols = ",\n                   ".join(
        f"len(list_filter(arr, x -> x IN ({_sql_wordlist(words)}))) AS s_{name}"
        for name, words in LANG_PROFILES
    )
    names = [name for name, _ in LANG_PROFILES]
    branches = []
    for i, name in enumerate(names):
        geq = " AND ".join(f"s_{name} >= s_{other}" for other in names[i + 1 :])
        cond = f"s_{name} > 0" + (f" AND {geq}" if geq else "")
        branches.append(f"WHEN {cond} THEN '{name}'")
    lang_case = "CASE " + " ".join(branches) + " ELSE 'other' END"
    return f"""
            WITH RECURSIVE
            t AS (SELECT doc_id, text,
                         regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
                  FROM documents),
            s AS (SELECT doc_id, text, arr,
                   len(arr) AS n_tokens,
                   length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
                   length(text) AS n_chars,
                   md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS content_hash,
                   {score_cols}
                  FROM t),
            q AS (SELECT doc_id, n_tokens, content_hash,
                   (10 * n_alpha) // GREATEST(n_chars, 1) AS quality_bucket,
                   {lang_case} AS lang_pred
                  FROM s),
            f AS (SELECT * FROM q WHERE quality_bucket >= 5 AND lang_pred = 'en'),
            surv AS (SELECT doc_id, n_tokens FROM f
                     QUALIFY ROW_NUMBER() OVER (PARTITION BY content_hash
                                                ORDER BY doc_id) = 1),
            {_minhash_ctes(od + "/curate")},
            walk(id, comp) AS (
              SELECT doc_id, doc_id FROM surv
              UNION
              SELECT e.d, w.comp FROM walk w JOIN edges e ON e.s = w.id),
            cl AS (SELECT id AS doc_id, MIN(comp) AS cluster_id
                   FROM walk GROUP BY id)
            SELECT surv.doc_id, CAST(surv.n_tokens AS BIGINT) AS n_tokens
            FROM surv JOIN cl ON cl.doc_id = surv.doc_id
            WHERE cl.cluster_id = cl.doc_id
        """


def _text_stats_sql() -> str:
    """text_stats oracle generated from the SAME word-profile constants the
    Ray stage uses (single source of truth): token counts, punctuation and
    stopword quality signals, profile-scored language ID with the stage's
    exact tie-break order."""
    from oplogtoredis_ray.stages.text import LANG_PROFILES, STOPWORDS

    score_cols = ",\n                   ".join(
        f"len(list_filter(arr, x -> x IN ({_sql_wordlist(words)}))) AS s_{name}"
        for name, words in LANG_PROFILES
    )
    names = [name for name, _ in LANG_PROFILES]
    # argmax with first-max-wins tie-break, all-zero → 'other'
    branches = []
    for i, name in enumerate(names):
        geq = " AND ".join(f"s_{name} >= s_{other}" for other in names[i + 1 :])
        cond = f"s_{name} > 0" + (f" AND {geq}" if geq else "")
        branches.append(f"WHEN {cond} THEN '{name}'")
    lang_case = "CASE " + " ".join(branches) + " ELSE 'other' END"
    return f"""
            WITH t AS (
              SELECT doc_id, text,
                     regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
              FROM documents),
            s AS (
              SELECT doc_id, text, arr,
                   len(list_filter(arr, x -> x IN ({_sql_wordlist(STOPWORDS)}))) AS n_stop,
                   {score_cols}
              FROM t)
            SELECT doc_id,
                   CAST(len(arr) AS BIGINT) AS n_tokens,
                   CAST(len(regexp_extract_all(text, '{_bpe_sql_pattern()}')) AS BIGINT) AS n_tokens_bpe,
                   CAST(length(text) AS BIGINT) AS n_chars_txt,
                   CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
                   CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS n_punct,
                   CAST(n_stop AS BIGINT) AS n_stopwords,
                   CAST((10 * n_stop) // GREATEST(len(arr), 1) AS BIGINT) AS stopword_bucket,
                   CAST((10 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g')))
                        // GREATEST(length(text), 1) AS BIGINT) AS quality_bucket,
                   {lang_case} AS lang_pred,
                   substr(md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))), 1, 16) AS fp
            FROM s
        """


def oracle_sql_map(sf_name: str = "sf0.01") -> dict[str, str]:
    synth = _synth_glob_sql(sf_name)
    od = os.path.join(ORACLE_ROOT, sf_name)
    cf_fields = (
        "TRIM(TRAILING ',' FROM "
        "(CASE WHEN op IN ('i','u') AND role IS NOT NULL THEN 'role,' ELSE '' END ||"
        " CASE WHEN op IN ('i','u') AND text IS NOT NULL THEN 'text,' ELSE '' END ||"
        " CASE WHEN op IN ('i','u') AND tool IS NOT NULL THEN 'tool,' ELSE '' END))"
    )
    return {
        "window_read": """
            SELECT event_id, ts, user_id FROM events
            WHERE ts > TIMESTAMP '2024-01-10' AND ts <= TIMESTAMP '2024-01-20'
        """,
        "envelope_project": """
            SELECT event_id, event_type, value FROM events
            WHERE event_type IS NOT NULL AND value IS NOT NULL
        """,
        "denylist_filter": """
            SELECT event_id, user_id FROM events WHERE user_id % 7 <> 3
        """,
        "props_extract": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        """,
        "tx_flatten": """
            SELECT event_id,
                   UNNEST(generate_series(0, event_id % 3)) AS tx_idx
            FROM events
        """,
        "partition_assign": f"""
            SELECT event_id,
                   CAST(('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT
                        % {NUM_PARTITIONS} AS BIGINT) AS partition_id
            FROM events
        """,
        "dedup_exact": """
            SELECT user_id, event_type, ts AS first_ts, event_id AS first_event_id
            FROM events
            QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id) = 1
        """,
        "shard_watermarks": f"""
            SELECT CAST(user_id % {SHARDS} AS BIGINT) AS shard,
                   MIN(ts) AS min_ts, MAX(ts) AS max_ts,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY shard
        """,
        "resume_point": f"""
            SELECT MIN(max_ts) AS resume_ts, CAST(COUNT(*) AS BIGINT) AS num_shards
            FROM (SELECT user_id % {SHARDS} AS shard, MAX(ts) AS max_ts
                  FROM events GROUP BY 1)
        """,
        "ordered_rank": """
            SELECT event_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rank
            FROM events
        """,
        "cdc_last_state": """
            WITH tagged AS (
              SELECT *, CASE WHEN event_id % 17 = 0 THEN 'd'
                             WHEN event_id % 5 = 0 THEN 'i'
                             ELSE 'u' END AS op
              FROM events),
            pos AS (
              SELECT *, ROW_NUMBER() OVER (ORDER BY ts, event_id) AS pos FROM tagged),
            life AS (
              SELECT user_id, event_type,
                     MAX(CASE WHEN op = 'i' THEN pos END) AS li,
                     MAX(CASE WHEN op = 'd' THEN pos END) AS ld
              FROM pos GROUP BY 1, 2)
            SELECT p.user_id, p.event_type,
                   arg_max(p.value, p.pos) FILTER (WHERE p.op IN ('i','u') AND p.pos >= l.li) AS last_value,
                   arg_max(p.ts, p.pos) FILTER (WHERE p.op IN ('i','u') AND p.pos >= l.li) AS last_ts
            FROM pos p JOIN life l
              ON p.user_id = l.user_id AND p.event_type = l.event_type
            WHERE l.li IS NOT NULL AND (l.ld IS NULL OR l.li > l.ld)
            GROUP BY p.user_id, p.event_type
        """,
        "interval_max": """
            SELECT date_trunc('hour', ts) AS bucket, MAX(value) AS max_value,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY bucket
        """,
        "changed_fields_json": """
            SELECT event_id, array_to_string(json_keys(props), ',') AS changed_fields
            FROM events
        """,
        "agg_pricing": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
                   CAST(COUNT(*) AS BIGINT) AS count_order
            FROM lineitem GROUP BY 1, 2
        """,
        "text_stats": _text_stats_sql(),
        "pack_sequences": f"""
            WITH tk AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     CAST(doc_id % {NUM_PACK_BUCKETS} AS BIGINT) AS bucket,
                     CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                          AS BIGINT) AS n_tokens
              FROM documents),
            c AS (
              SELECT *,
                     COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY bucket ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS before_toks
              FROM tk)
            SELECT bucket,
                   CAST(before_toks // {PACK_TOKEN_BUDGET} AS BIGINT) AS seq_idx,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
                   CAST(MIN(doc_id) AS BIGINT) AS first_doc,
                   CAST(MAX(doc_id) AS BIGINT) AS last_doc
            FROM c
            GROUP BY bucket, seq_idx
        """,
        "stratified_sample": (
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, lang FROM documents "
            f"WHERE ((doc_id % {_SAMPLE_PREMOD}) * {_SAMPLE_KNUTH}) % 1000 < "
            "CASE lang "
            + " ".join(
                f"WHEN '{k}' THEN {v}" for k, v in sorted(STRATA_RATES.items())
            )
            + f" ELSE {STRATA_DEFAULT_RATE} END"
        ),
        "dedup_exact_docs": """
            SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
                   CAST(COUNT(*) AS BIGINT) AS dup_count
            FROM (SELECT doc_id,
                         md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS h
                  FROM documents)
            GROUP BY h
        """,
        "knn_brute": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                       FROM embeddings WHERE vec_id < 4)
            SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id FROM (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                       CAST(q.qe AS DOUBLE[])) DESC,
                                e.vec_id) AS rnk
              FROM embeddings e, q)
            WHERE rnk <= 10
        """,
        "sessionize": """
            WITH e AS (
              SELECT user_id, event_id, ts, value,
                     CASE WHEN LAG(ts) OVER w IS NULL
                            OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
              SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session
              FROM e)
            SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
            FROM s GROUP BY user_id, session
        """,
        "asof_view_click": """
            SELECT c.event_id, c.user_id, c.ts,
                   v.event_id AS view_event_id, v.ts AS view_ts
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
              ON c.user_id = v.user_id AND c.ts >= v.ts
        """,
        "customer_region": """
            SELECT c_custkey, c_name, n_name AS nation, r_name AS region
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
        """,
        "order_revenue": """
            SELECT o.o_orderkey, o.o_custkey,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY 1, 2
        """,
        "top_spenders": """
            SELECT user_id,
                   CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS spend_cents
            FROM events GROUP BY user_id
            ORDER BY spend_cents DESC, user_id LIMIT 10
        """,
        "distinct_event_types": """
            SELECT DISTINCT event_type FROM events
        """,
        "hash_sample": """
            -- same 64-bit golden-ratio gate as the engine, replayed with
            -- HUGEINT modular arithmetic: (id * K mod 2^64) >> 33, % 100
            SELECT event_id, user_id, value FROM events
            WHERE CAST(
                ((CAST(event_id AS HUGEINT) * 11400714819323198485)
                  % 18446744073709551616) // 8589934592 % 100
              AS BIGINT) < 5
        """,
        "running_total": """
            SELECT event_id, user_id,
                   CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
            FROM events
        """,
        "anti_join_users": """
            SELECT DISTINCT user_id FROM events
            WHERE user_id NOT IN (SELECT c_custkey FROM customer WHERE c_custkey < 100)
        """,
        "ngram_jaccard": """
            WITH t AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
              FROM documents WHERE doc_id % 10 = 0),
            g AS (
              SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] AS gram
              FROM t, UNNEST(generate_series(1, len(arr) - 1)) s(i)),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY 1),
            pairs AS (
              SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
              FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT p.a_id, p.b_id
            FROM pairs p
            JOIN sizes sa ON sa.doc_id = p.a_id
            JOIN sizes sb ON sb.doc_id = p.b_id
            WHERE p.inter * 100 >= 5 * (sa.n + sb.n - p.inter)
        """,
        # sketch pipelines: the Ray queries export their deterministic
        # intermediates (signatures / IVF index) as parquet under {od}; the
        # SQL replays every downstream derivation from those identical values
        "minhash_dedup": f"""
            WITH RECURSIVE
            {_minhash_ctes(od)},
            walk(id, comp) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT e.d, w.comp FROM walk w JOIN edges e ON e.s = w.id)
            SELECT id AS doc_id, CAST(MIN(comp) AS BIGINT) AS cluster_id
            FROM walk GROUP BY id
        """,
        "curate_corpus": _curate_sql(od),
        "media_features": f"""
            -- replay the pooled media features from the exported decode:
            -- integer chunk sums/counts, exact across engines
            SELECT media_id, kind, payload_bytes, chunk_idx,
                   CAST(SUM(value) AS BIGINT) AS chunk_sum,
                   CAST(COUNT(*) AS BIGINT) AS chunk_n
            FROM read_parquet('{od}/media_decoded/*.parquet')
            GROUP BY 1, 2, 3, 4
        """,
        "frame_sample": f"""
            -- replay the deterministic frame slicing in SQL: DuckDB has no
            -- blob substring, so both engines hash substring(hex(payload))
            WITH m AS (
              SELECT media_id, payload,
                     GREATEST(octet_length(payload) // {MEDIA_FRAMES}, 1) AS step
              FROM read_parquet('{od}/media.parquet')),
            f AS (
              SELECT media_id, payload, step,
                     UNNEST(range({MEDIA_FRAMES})) AS frame_idx
              FROM m)
            SELECT media_id,
                   CAST(frame_idx AS BIGINT) AS frame_idx,
                   CAST(LEAST(step, GREATEST(octet_length(payload) - frame_idx*step, 0)) AS BIGINT) AS frame_len,
                   md5(substring(hex(payload), CAST(frame_idx*step*2 + 1 AS BIGINT), CAST(step*2 AS BIGINT))) AS frame_md5
            FROM f
        """,
        "simhash_pairs": f"""
            WITH s AS (SELECT doc_id, simhash, bucket
                       FROM read_parquet('{od}/simhash_sigs/*.parquet'))
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
            FROM s a JOIN s b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        "ivf_topk": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                       FROM embeddings WHERE vec_id < 4),
            cent AS (SELECT cluster, centroid
                     FROM read_parquet('{od}/ivf_centroids/*.parquet')),
            probe AS (
              SELECT query_id, cluster FROM (
                SELECT q.query_id, c.cluster,
                       ROW_NUMBER() OVER (
                         PARTITION BY q.query_id
                         ORDER BY list_cosine_similarity(CAST(c.centroid AS DOUBLE[]),
                                                         CAST(q.qe AS DOUBLE[])) DESC,
                                  c.cluster) AS rn
                FROM q, cent c)
              WHERE rn <= 4),
            asn AS (SELECT vec_id, cluster
                    FROM read_parquet('{od}/ivf_assign/*.parquet')),
            cand AS (SELECT p.query_id, a.vec_id
                     FROM probe p JOIN asn a ON a.cluster = p.cluster)
            SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id FROM (
              SELECT c.query_id, e.vec_id AS neighbor_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY c.query_id
                       ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                       CAST(q.qe AS DOUBLE[])) DESC,
                                e.vec_id) AS rnk
              FROM cand c
              JOIN embeddings e ON e.vec_id = c.vec_id
              JOIN q ON q.query_id = c.query_id)
            WHERE rnk <= 10
        """,
        "neardup_lsh": f"""
            WITH asn AS (SELECT vec_id, bucket
                         FROM read_parquet('{od}/lsh_assign/*.parquet'))
            SELECT a.vec_id AS a_id, b.vec_id AS b_id
            FROM asn a
            JOIN asn b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            JOIN embeddings ea ON ea.vec_id = a.vec_id
            JOIN embeddings eb ON eb.vec_id = b.vec_id
            WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                         CAST(eb.embedding AS DOUBLE[])) >= 0.3
        """,
        "neardup_embeddings": """
            SELECT a.vec_id AS a_id, b.vec_id AS b_id
            FROM embeddings a, embeddings b
            WHERE a.vec_id % 4 = 0 AND b.vec_id % 4 = 0 AND a.vec_id < b.vec_id
              AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.35
        """,
        "change_records": f"""
            SELECT conv_id AS channel,
                   conv_id || '::' || CAST(turn_idx AS VARCHAR) AS channel_doc,
                   CASE WHEN op = 'd' THEN 'r' ELSE op END AS event,
                   CAST(turn_idx AS VARCHAR) AS doc_id,
                   {cf_fields} AS fields,
                   ts, CAST(seq AS BIGINT) AS seq, CAST(tx_idx AS BIGINT) AS tx_idx
            FROM read_parquet('{synth}', union_by_name=true)
            WHERE op IN ('i','u','d') AND conv_id IS NOT NULL AND turn_idx IS NOT NULL
        """,
        "cdc_apply": f"""
            WITH raw AS (
              SELECT ts, seq, tx_idx, op, conv_id, turn_idx, role, text, tool
              FROM read_parquet('{synth}', union_by_name=true)),
            dedup AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY ts, seq, tx_idx ORDER BY ts) AS rn
                FROM raw) WHERE rn = 1),
            pos AS (
              SELECT *, ROW_NUMBER() OVER (ORDER BY ts, seq, tx_idx) AS pos FROM dedup),
            life AS (
              SELECT conv_id, turn_idx,
                     MAX(CASE WHEN op = 'i' THEN pos END) AS li,
                     MAX(CASE WHEN op = 'd' THEN pos END) AS ld
              FROM pos GROUP BY 1, 2)
            SELECT p.conv_id, CAST(p.turn_idx AS INT) AS turn_idx,
                   arg_max(p.role, p.pos) FILTER (WHERE p.role IS NOT NULL AND p.op IN ('i','u') AND p.pos >= l.li) AS role,
                   arg_max(p.text, p.pos) FILTER (WHERE p.text IS NOT NULL AND p.op IN ('i','u') AND p.pos >= l.li) AS text,
                   arg_max(p.tool, p.pos) FILTER (WHERE p.tool IS NOT NULL AND p.op IN ('i','u') AND p.pos >= l.li) AS tool,
                   arg_max(p.ts, p.pos) FILTER (WHERE p.op IN ('i','u') AND p.pos >= l.li) AS ts
            FROM pos p JOIN life l
              ON p.conv_id = l.conv_id AND p.turn_idx = l.turn_idx
            WHERE l.li IS NOT NULL AND (l.ld IS NULL OR l.li > l.ld)
            GROUP BY 1, 2
        """,
    }

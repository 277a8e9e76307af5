"""Deterministic synthetic change-event log generator + sequential oracle.

The generator produces the F2 event-log schema of FIXTURES.md over the
transcript payload (conv_id, turn_idx, role, text, tool, ts) with all the
fault/scale knobs the reference's test harnesses exercise:

- duplicate re-emission of identical ``(ts, seq, tx_idx)`` rows
  (≙ HA replay — /root/reference/integration-tests/fault-injection/HA_test.go:12-41)
- transaction groups sharing ``(ts, seq)`` with ``tx_idx`` 0..k
  (≙ applyOps flattening — lib/oplog/tail.go:680-766,
  transaction_test.go:19-96)
- bounded within-window disorder of the *file* order (the pipeline must
  create order, not trust it — SURVEY §2.5)
- zipf-skewed turns-per-conversation (hot conv_ids — north_rule skew)
- a schema-evolution point: files written before it lack the ``tool``
  column entirely
- delete + reinsert lifecycles

Everything is seeded NumPy; **no wall clock, no global RNG** — identical
spec → identical bytes.

The oracle is an intentionally naive sequential dict apply (independent of
the vectorized engine) mirroring the reference's semantics: sort by
``(ts, seq, tx_idx)``, drop exact duplicate keys, then insert=replace /
update=set-changed-fields / delete=remove (lib/oplog/processor.go:119-124;
README.md:40-50).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

EPOCH_US = 1_700_000_000_000_000  # fixed epoch, no wall clock
ROLES = np.array(["user", "assistant", "tool"])
PAYLOAD_COLS = ("role", "text", "tool")


@dataclass(frozen=True)
class GeneratorSpec:
    seed: int = 42
    n_conversations: int = 200
    conv_prefix: str = "conv-"
    mean_turns: float = 4.0
    zipf_a: float = 1.4           # turns-per-conv tail (hot conversations)
    max_turns: int = 2000
    mean_updates: float = 2.0     # updates per turn (geometric)
    delete_frac: float = 0.15
    reinsert_frac: float = 0.4    # of deleted turns
    duplicate_rate: float = 0.02  # same-(ts,seq,tx_idx) re-emission
    txn_rate: float = 0.05        # fraction of events that start a txn group
    disorder_window: int = 50     # file-order shuffle radius (rows)
    evolution_frac: float = 0.5   # fraction of log after which `tool` exists
    mean_gap_us: int = 1_000_000
    same_ts_frac: float = 0.2     # events sharing the previous ts value
    n_files: int = 4


def _build_key_layout(spec: GeneratorSpec, rng: np.random.Generator):
    """Vectorized per-(conv,turn) op layout: [i, u*U, d?, i_re?]."""
    C = spec.n_conversations
    turns = np.minimum(rng.zipf(spec.zipf_a, C), spec.max_turns)
    turns = np.maximum(
        turns, rng.poisson(max(spec.mean_turns - 1.0, 0.0), C) + 1
    ).astype(np.int64)
    conv_of_key = np.repeat(np.arange(C), turns)
    K = len(conv_of_key)
    turn_of_key = np.concatenate([np.arange(t) for t in turns]) if K else np.array([], dtype=np.int64)

    U = rng.geometric(1.0 / (1.0 + spec.mean_updates), K) - 1
    D = (rng.random(K) < spec.delete_frac).astype(np.int64)
    R = ((rng.random(K) < spec.reinsert_frac) & (D == 1)).astype(np.int64)
    n_k = 1 + U + D + R
    return conv_of_key, turn_of_key, U, D, R, n_k


def generate_event_log(spec: GeneratorSpec) -> pd.DataFrame:
    """Returns the event log in *file order* with columns
    ts(int64 us), seq, tx_idx, op, conv_id, turn_idx, role, text, tool,
    plus the file-layout helper column ``_file``.
    """
    rng = np.random.default_rng(spec.seed)
    conv_of_key, turn_of_key, U, D, R, n_k = _build_key_layout(spec, rng)
    K = len(n_k)
    N = int(n_k.sum())

    key_id = np.repeat(np.arange(K), n_k)
    starts = np.concatenate([[0], np.cumsum(n_k)[:-1]])
    j = np.arange(N) - np.repeat(starts, n_k)  # within-key ordinal

    U_r = np.repeat(U, n_k)
    D_r = np.repeat(D, n_k)
    R_r = np.repeat(R, n_k)

    op = np.full(N, "u", dtype=object)
    op[j == 0] = "i"
    op[(D_r == 1) & (j == 1 + U_r)] = "d"
    op[(R_r == 1) & (j == 2 + U_r)] = "i"

    # --- global interleave preserving per-key order --------------------------
    # Draw one random slot per event, rank the slots globally, then hand each
    # key its ranks in ascending order (events are key-contiguous and
    # j-ordered in construction order) — per-key causality is preserved while
    # keys interleave uniformly.
    slots = rng.random(N)
    order = np.argsort(slots, kind="stable")
    ranks = np.empty(N, dtype=np.int64)
    ranks[order] = np.arange(N)
    rank_order = np.lexsort((ranks, key_id))  # key blocks, ranks ascending
    global_pos = np.empty(N, dtype=np.int64)
    global_pos[np.lexsort((j, key_id))] = ranks[rank_order]
    gorder = np.argsort(global_pos, kind="stable")

    key_id = key_id[gorder]
    j = j[gorder]
    op = op[gorder]

    # --- (ts, seq) assignment (nondecreasing ts, unique pair) ----------------
    gaps = rng.integers(1, max(2 * spec.mean_gap_us, 2), N)
    gaps[rng.random(N) < spec.same_ts_frac] = 0
    gaps[0] = 0
    ts = EPOCH_US + np.cumsum(gaps)
    new_ts = np.concatenate([[True], np.diff(ts) > 0])
    seq = np.arange(N) - np.maximum.accumulate(np.where(new_ts, np.arange(N), 0))

    tx_idx = np.zeros(N, dtype=np.int64)

    # --- transaction groups: consecutive events share (ts, seq), tx_idx=0..k -
    if spec.txn_rate > 0 and N >= 10:
        anchor = np.arange(0, N - 5, 5)
        starts_tx = anchor[rng.random(len(anchor)) < spec.txn_rate * 5]
        sizes = rng.integers(2, 5, len(starts_tx))
        for s, size in zip(starts_tx, sizes):  # few groups; python loop OK
            e = min(s + size, N)
            ts[s:e] = ts[s]
            seq[s:e] = seq[s]
            tx_idx[s:e] = np.arange(e - s)

    conv_idx = conv_of_key[key_id]
    turn_idx = turn_of_key[key_id]

    # --- payload values ------------------------------------------------------
    import pyarrow as pa
    import pyarrow.compute as pc

    conv_names = np.array(
        [f"{spec.conv_prefix}{c:06d}" for c in range(spec.n_conversations)],
        dtype=object,
    )
    conv_id = conv_names[conv_idx]
    # Arrow kernels for the value strings — pandas .astype(str) + concat
    # builds every intermediate as a Python object and is ~10× slower at
    # tens of millions of rows
    key_str = pc.cast(pa.array(key_id), pa.string())
    j_str = pc.cast(pa.array(j), pa.string())
    text = pc.binary_join_element_wise(
        "t", key_str, "v", j_str, ""
    ).to_numpy(zero_copy_only=False)
    text[op == "d"] = None

    evo_ts = int(np.quantile(ts, spec.evolution_frac)) if N else EPOCH_US
    post_evo = ts >= evo_ts

    role = np.full(N, None, dtype=object)
    is_insert = op == "i"
    role[is_insert] = ROLES[(turn_idx[is_insert] % 3)]
    role_change = (op == "u") & (rng.random(N) < 0.1)
    role[role_change] = ROLES[(turn_idx[role_change] + j[role_change]) % 3]

    tool = np.full(N, None, dtype=object)
    tool_set = post_evo & (
        (is_insert & (rng.random(N) < 0.5)) | ((op == "u") & (rng.random(N) < 0.3))
    )
    tool_vals = pc.binary_join_element_wise(
        "tool", pc.cast(pa.array(j % 7), pa.string()), ""
    ).to_numpy(zero_copy_only=False)
    tool[tool_set] = tool_vals[tool_set]

    base = pd.DataFrame(
        {
            "ts": ts,
            "seq": seq.astype(np.int32),
            "tx_idx": tx_idx.astype(np.int32),
            "op": op,
            "conv_id": conv_id,
            "turn_idx": turn_idx.astype(np.int32),
            "role": role,
            "text": text,
            "tool": tool,
        }
    )

    # --- file order: bounded disorder + duplicates placed after originals ----
    pos = np.arange(N) + rng.uniform(0, spec.disorder_window, N)
    base["_pos"] = pos

    # --- duplicates (HA replay) ---------------------------------------------
    n_dup = int(N * spec.duplicate_rate)
    if n_dup:
        dup_rows = base.iloc[rng.choice(N, n_dup, replace=False)].copy()
    else:
        dup_rows = base.iloc[0:0]
    if n_dup:
        dup_rows["_pos"] = dup_rows["_pos"] + rng.uniform(
            1, max(spec.disorder_window, 2), n_dup
        )
    out = pd.concat([base, dup_rows], ignore_index=True)
    out = out.sort_values("_pos", kind="mergesort").reset_index(drop=True)

    # --- file assignment: pre-evolution files lack `tool` --------------------
    pre = out["ts"] < evo_ts
    n_pre = max(1, spec.n_files // 2)
    n_post = max(1, spec.n_files - n_pre)
    fidx = np.zeros(len(out), dtype=np.int64)
    pre_positions = np.flatnonzero(pre.to_numpy())
    post_positions = np.flatnonzero(~pre.to_numpy())
    if len(pre_positions):
        fidx[pre_positions] = np.minimum(
            np.arange(len(pre_positions)) * n_pre // max(len(pre_positions), 1), n_pre - 1
        )
    if len(post_positions):
        fidx[post_positions] = n_pre + np.minimum(
            np.arange(len(post_positions)) * n_post // max(len(post_positions), 1),
            n_post - 1,
        )
    out["_file"] = fidx
    out.attrs["evo_ts"] = evo_ts
    return out.drop(columns=["_pos"])


def _arrow_table(df: pd.DataFrame, with_tool: bool) -> pa.Table:
    cols: dict[str, pa.Array] = {
        "ts": pa.array(df["ts"].to_numpy(), type=pa.timestamp("us")),
        "seq": pa.array(df["seq"].to_numpy(), type=pa.int32()),
        "tx_idx": pa.array(df["tx_idx"].to_numpy(), type=pa.int32()),
        "op": pa.array(df["op"], type=pa.string()),
        "conv_id": pa.array(df["conv_id"], type=pa.string()),
        "turn_idx": pa.array(df["turn_idx"].to_numpy(), type=pa.int32()),
        "role": pa.array(df["role"], type=pa.string()),
        "text": pa.array(df["text"], type=pa.string()),
    }
    if with_tool:
        cols["tool"] = pa.array(df["tool"], type=pa.string())
    return pa.table(cols)


def write_event_log(df: pd.DataFrame, out_dir: str, evo_ts: int | None = None) -> list[str]:
    """Write the log as one parquet file per ``_file`` chunk; chunks whose
    rows all predate the evolution point omit the ``tool`` column (the
    schema-evolution fixture)."""
    os.makedirs(out_dir, exist_ok=True)
    if evo_ts is None:
        evo_ts = df.attrs.get("evo_ts", EPOCH_US)
    paths = []
    for fid, chunk in df.groupby("_file", sort=True):
        with_tool = bool((chunk["ts"] >= evo_ts).any())
        table = _arrow_table(chunk, with_tool)
        path = os.path.join(out_dir, f"events-{int(fid):04d}.parquet")
        pq.write_table(table, path, row_group_size=64 * 1024)
        paths.append(path)
    return paths


def generate_event_log_sharded(
    spec: GeneratorSpec, out_dir: str, shards: int = 16
) -> int:
    """Parallel deterministic generation via Ray tasks, for bench-scale logs.

    Each shard generates an independent log over its own conversations
    (distinct ``conv_prefix``), then stripes ``seq`` (``seq*shards + i``) so
    the global ``(ts, seq, tx_idx)`` identity stays unique across shards
    while shard event-time ranges interleave.  Transaction groups (shared
    (ts, seq)) survive the striping because it is applied uniformly.
    Deterministic: shard seeds derive from ``spec.seed``.  Returns total
    events written.
    """
    import ray

    from dataclasses import replace

    per = max(spec.n_conversations // shards, 1)
    files_per = max(spec.n_files // shards, 2)

    @ray.remote
    def _gen(i: int) -> int:
        s = replace(
            spec,
            n_conversations=per,
            seed=spec.seed * 1000 + i,
            conv_prefix=f"{spec.conv_prefix}{i:02d}-",
            n_files=files_per,
        )
        log = generate_event_log(s)
        log["seq"] = (log["seq"].astype(np.int64) * shards + i).astype(np.int32)
        evo = log.attrs.get("evo_ts", EPOCH_US)
        os.makedirs(out_dir, exist_ok=True)
        for fid, chunk in log.groupby("_file", sort=True):
            with_tool = bool((chunk["ts"] >= evo).any())
            table = _arrow_table(chunk, with_tool)
            pq.write_table(
                table,
                os.path.join(out_dir, f"events-{i:02d}-{int(fid):04d}.parquet"),
                row_group_size=256 * 1024,
            )
        return len(log)

    counts = ray.get([_gen.remote(i) for i in range(shards)])
    return int(sum(counts))


def oracle_apply(df: pd.DataFrame, denylist: frozenset[str] = frozenset()) -> pd.DataFrame:
    """Naive sequential oracle: the ground truth the engine must reproduce.

    Sort by (ts, seq, tx_idx); drop exact duplicate identities (keep first —
    ≙ the Lua GET-before-SETEX dedup, lib/redispub/publisher.go:41-62);
    apply i=replace / u=set-changed / d=delete; updates to missing rows are
    no-ops.  Returns final state sorted by (conv_id, turn_idx).
    """
    work = df.sort_values(["ts", "seq", "tx_idx"], kind="mergesort")
    work = work.drop_duplicates(subset=["ts", "seq", "tx_idx"], keep="first")
    state: dict[tuple[str, int], dict] = {}
    for row in work.itertuples(index=False):
        if row.conv_id in denylist:
            continue
        key = (row.conv_id, int(row.turn_idx))
        if row.op == "i":
            state[key] = {
                "role": row.role,
                "text": row.text,
                "tool": getattr(row, "tool", None),
                "ts": int(row.ts),
            }
        elif row.op == "u":
            cur = state.get(key)
            if cur is None:
                continue
            for col in PAYLOAD_COLS:
                val = getattr(row, col, None)
                if val is not None and not (isinstance(val, float) and np.isnan(val)):
                    cur[col] = val
            cur["ts"] = int(row.ts)
        elif row.op == "d":
            state.pop(key, None)
    rows = [
        {"conv_id": k[0], "turn_idx": k[1], **v} for k, v in state.items()
    ]
    out = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

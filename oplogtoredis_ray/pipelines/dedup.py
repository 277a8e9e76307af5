"""Deduplication pipelines for training-data curation.

- exact: 128-bit vectorized content hash of normalized text (a grouping
  key ≡ the normalized text itself; the SQL oracle groups by md5 of the
  same normalization) → hash-partitioned groupby → keep min doc_id per
  hash.  The shuffle moves only (hash, doc_id) pairs, never the text.
- MinHash + LSH near-dup: shingle → minhash signature (vectorized
  universal hashing) → banded bucketing → groupby(band, bucket) → candidate
  pairs → DISTRIBUTED exact shingle-Jaccard verification (shingle explode
  over candidate docs → broadcast pair membership → bucketed vectorized
  intersection counts) → connected components.  Union-find runs on the
  driver over the *verified edge list only* — that set is sized by true
  near-dup density, not the corpus (documented assumption; at 100 TB the
  edge list is the thing that must fit, and band thresholds + the
  per-bucket candidate cap keep it sparse).  The final cluster assignment
  broadcasts the (small) resolved parent map via ``ray.put`` and labels doc
  ids in a vectorized ``map_batches`` stage — neither the corpus nor any
  candidate text ever reaches the driver.
- SimHash: 64-bit signed-projection sketch; near-dups share bucket prefixes
  within small Hamming distance.

With ``materialize_dir`` set, the deterministic intermediates (minhash band
buckets, per-doc shingle-hash sets, simhash signatures) are exported as
parquet so the downstream pair/cluster derivation can be verified by an
external SQL engine (the driver's DuckDB oracle) — and so other pipelines
can reuse the fingerprints without recomputing them.
"""

from __future__ import annotations

import logging
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from oplogtoredis_ray.functions.fingerprint import shingle_hashes

_MERSENNE = np.uint64((1 << 61) - 1)

logger = logging.getLogger(__name__)


def _rewrite_parquet(ds, path: str) -> None:
    """Replace-write a Dataset to a parquet dir (no stale files linger)."""
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    ds.write_parquet(path)


_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def coarse_bucket_from_h64(h_int64: np.ndarray) -> np.ndarray:
    """64-way exchange bucket from a 64-bit hash column: golden-ratio mix
    then mod so the bucket draws on all bits, not just the low ones."""
    with np.errstate(over="ignore"):
        mixed = h_int64.view(np.uint64) * _GOLDEN
    return (mixed % np.uint64(NUM_COARSE_BUCKETS)).astype(np.int64)


class ContentHash:
    """Batch stage: append the 128-bit vectorized content hash (two int64
    columns) of the normalized text.  A grouping KEY, not a digest anyone
    compares — the SQL oracle groups by md5(normalized text), and grouping
    by any collision-free function of the normalized text is identical, so
    the per-row ``hashlib`` loop is replaced by the buffer-level polynomial
    hash (functions/fingerprint.poly_hash_batch)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from oplogtoredis_ray.functions.fingerprint import content_hash128

        h1, h2 = content_hash128(batch[self.text_col])
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "content_h1": pa.array(h1.view(np.int64), type=pa.int64()),
                "content_h2": pa.array(h2.view(np.int64), type=pa.int64()),
            }
        )


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Survivor (min id) + duplicate count per distinct content.

    Coarse-bucket exchange + vectorized in-task aggregation: Ray's groupby
    AGGREGATE over a corpus-cardinality key does per-group work (measured
    60 s for 190k groups), so the distributed key is hash-bucket and the
    per-hash min/count is a vectorized pandas groupby inside the task."""
    hashed = ds.map_batches(
        ContentHash(text_col, id_col), batch_format="pyarrow"
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        hb = coarse_bucket_from_h64(
            t["content_h1"].to_numpy(zero_copy_only=False)
        )
        return t.append_column("hash_bucket", pa.array(hb, type=pa.int64()))

    def agg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby(["content_h1", "content_h2"], sort=False)[id_col]
        return pd.DataFrame(
            {id_col: gg.min().to_numpy(), "dup_count": gg.size().to_numpy()}
        )

    return (
        hashed.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("hash_bucket")
        .map_groups(agg_bucket, batch_format="pandas")
    )


# --- MinHash + LSH -----------------------------------------------------------


def _minhash_params(num_perm: int, seed: int = 13):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized (a*x + b) mod M universal-hash minima: (P,) uint64."""
    if len(shingles) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        hx = (shingles[:, None] * a[None, :] + b[None, :]) % _MERSENNE
    return hx.min(axis=0)


class MinHashStage:
    """Batch stage: doc → (band_id, band_bucket, doc_id) rows for the LSH
    groupby.  Signature params are built once per actor."""

    def __init__(
        self,
        num_perm: int = 64,
        bands: int = 16,
        shingle_k: int = 5,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        assert num_perm % bands == 0
        self.a, self.b = _minhash_params(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        n = len(texts)
        sigs = np.empty((n, len(self.a)), dtype=np.uint64)
        for i, t in enumerate(texts):  # inner shingle/minhash work vectorized
            sigs[i] = minhash_signature(shingle_hashes(t, self.k), self.a, self.b)
        bands = sigs.reshape(n, self.bands, self.rows_per_band)
        # bucket = hash of each band's row-slice
        with np.errstate(over="ignore"):
            weights = np.arange(1, self.rows_per_band + 1, dtype=np.uint64) * np.uint64(
                0x9E3779B97F4A7C15
            )
            buckets = (bands * weights[None, None, :]).sum(axis=2)
        band_ids = np.tile(np.arange(self.bands), n)
        return pa.table(
            {
                "band_id": pa.array(band_ids, type=pa.int32()),
                "band_bucket": pa.array(buckets.reshape(-1).astype(np.int64)),
                self.id_col: pa.array(np.repeat(ids, self.bands), type=pa.int64()),
            }
        )


_EMPTY_PAIRS = pd.DataFrame(
    {"a_id": pd.array([], dtype="int64"), "b_id": pd.array([], dtype="int64")}
)

# truncation stats of the most recent minhash_lsh_dedup run in this process
# (observability for lost recall — also exported to
# ``materialize_dir/minhash_metrics.json`` when materializing)
LAST_TRUNCATION_STATS: dict = {"truncated_buckets": 0, "dropped_ids": 0}

# Two-level grouping: LSH buckets are numerous and tiny (most are
# singletons), and Ray's per-group map_groups UDF dispatch dominates when
# groups outnumber rows-per-group.  The distributed exchange groups on a
# COARSE key (fine bucket mod NUM_COARSE_BUCKETS); the task then segments
# its block by the fine key vectorizedly — same pair sets, ~1000× fewer UDF
# invocations.  NUM_COARSE_BUCKETS bounds the reduce width independently of
# corpus size (tune toward cluster cores).
NUM_COARSE_BUCKETS = 64


def _segment_bounds(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) of equal-key runs in a sorted key array."""
    change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(keys)]])
    return starts, ends


def _pairs_in_segments(
    ids: np.ndarray, starts: np.ndarray, ends: np.ndarray, cap: int = 50
) -> tuple[list[np.ndarray], list[np.ndarray], int, int]:
    """Upper-triangle pairs per segment of an id array already sorted
    within segments; hot segments truncated at ``cap`` ids.  Returns
    (a_chunks, b_chunks, truncated_segments, dropped_ids)."""
    a_out: list[np.ndarray] = []
    b_out: list[np.ndarray] = []
    truncated = 0
    dropped = 0
    for s, e in zip(starts, ends):
        n = e - s
        if n < 2:
            continue
        if n > cap:
            truncated += 1
            dropped += n - cap
            e = s + cap
        ai, bi = np.triu_indices(e - s, k=1)
        seg = ids[s:e]
        a_out.append(seg[ai])
        b_out.append(seg[bi])
    return a_out, b_out, truncated, dropped


def _candidate_pairs_from_coarse_group(
    group: pd.DataFrame, id_col: str, cap: int = 50
) -> pd.DataFrame:
    """Candidate pairs for every fine (band_id, band_bucket) bucket inside
    one coarse group.  Truncation of hot buckets is surfaced as a sentinel
    row ``(a_id=-1, b_id=<n_dropped>)`` so the driver can count and log
    lost recall instead of dropping it silently (doc ids are >= 0)."""
    df = group.sort_values(["band_id", "band_bucket", id_col], kind="mergesort")
    ids = df[id_col].to_numpy(dtype=np.int64)
    band = df["band_id"].to_numpy(dtype=np.int64)
    bucket = df["band_bucket"].to_numpy(dtype=np.int64)
    # exact two-column run boundaries (no combined-key collisions)
    change = np.nonzero((band[1:] != band[:-1]) | (bucket[1:] != bucket[:-1]))[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(ids)]])
    a_out, b_out, truncated, dropped = _pairs_in_segments(ids, starts, ends, cap)
    if not a_out and not dropped:
        return _EMPTY_PAIRS
    out = pd.DataFrame(
        {
            "a_id": np.concatenate(a_out) if a_out else np.array([], dtype=np.int64),
            "b_id": np.concatenate(b_out) if b_out else np.array([], dtype=np.int64),
        }
    )
    if dropped:
        out = pd.concat(
            [out, pd.DataFrame({"a_id": [-1], "b_id": [dropped]})], ignore_index=True
        )
    return out


class ShingleExplode:
    """Batch stage: explode CANDIDATE docs into (doc_id, shingle-hash) rows.

    The candidate id set (sized by near-dup density, not the corpus) is
    broadcast once per actor via ``ray.put``; non-candidate rows are
    filtered vectorizedly, so the corpus text never leaves the workers."""

    def __init__(self, ids_ref, shingle_k: int, text_col: str, id_col: str):
        import ray

        ids = ray.get(ids_ref) if not isinstance(ids_ref, np.ndarray) else ids_ref
        self.ids = pa.array(ids, type=pa.int64())
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.fill_null(pc.is_in(batch[self.id_col], value_set=self.ids), False)
        )
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch[self.text_col].to_pylist()
        id_out: list[np.ndarray] = []
        h_out: list[np.ndarray] = []
        for i, t in zip(ids, texts):  # inner shingle work vectorized
            hs = shingle_hashes(t, self.k)
            id_out.append(np.full(len(hs), i, dtype=np.int64))
            h_out.append(hs)
        return pa.table(
            {
                self.id_col: pa.array(
                    np.concatenate(id_out) if id_out else np.array([], dtype=np.int64)
                ),
                "h": pa.array(
                    np.concatenate(h_out) if h_out else np.array([], dtype=np.uint64),
                    type=pa.uint64(),
                ),
            }
        )


class PairMembership:
    """Batch stage over shingle rows: replicate each doc's shingles into the
    candidate pairs it participates in — (pair_id, h, side, coarse) rows for
    the bucketed verification exchange.  The membership frame (2 rows per
    candidate pair) is broadcast once per actor."""

    def __init__(self, membership_ref, id_col: str):
        import ray

        self.mem = (
            ray.get(membership_ref)
            if not isinstance(membership_ref, pd.DataFrame)
            else membership_ref
        )
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                self.id_col: batch[self.id_col].to_numpy(zero_copy_only=False),
                "h": batch["h"].to_numpy(zero_copy_only=False),
            }
        )
        j = df.merge(self.mem, on=self.id_col, how="inner")
        pair_id = j["pair_id"].to_numpy(dtype=np.int64)
        return pa.table(
            {
                "pair_id": pa.array(pair_id),
                "h": pa.array(j["h"].to_numpy(), type=pa.uint64()),
                "coarse": pa.array(pair_id % NUM_COARSE_BUCKETS),
            }
        )


_EMPTY_VERIFIED = pd.DataFrame({"pair_id": pd.array([], dtype="int64")})


def _make_verify_group(jaccard_threshold: float):
    """Per-coarse-bucket exact-Jaccard verdicts, fully vectorized.  Each
    (pair_id, h) occurs at most twice (per-doc shingle sets are unique and
    sides are distinct docs), so intersection = count of adjacent (pair, h)
    duplicates after a lexsort; |sa|+|sb| = rows per pair."""

    def verify_group(g: pd.DataFrame) -> pd.DataFrame:
        pid = g["pair_id"].to_numpy(dtype=np.int64)
        h = g["h"].to_numpy()
        order = np.lexsort((h, pid))
        pid, h = pid[order], h[order]
        upair, sizes = np.unique(pid, return_counts=True)  # |sa| + |sb|
        inter = np.zeros(len(upair), dtype=np.int64)
        if len(pid) > 1:
            dup = (pid[1:] == pid[:-1]) & (h[1:] == h[:-1])
            if dup.any():
                np.add.at(inter, np.searchsorted(upair, pid[1:][dup]), 1)
        union = sizes - inter
        ok = (union > 0) & (inter / np.maximum(union, 1) >= jaccard_threshold)
        if not ok.any():
            return _EMPTY_VERIFIED
        return pd.DataFrame({"pair_id": upair[ok]})

    return verify_group


def _verify_pairs_distributed(
    ds,
    pairs: pd.DataFrame,
    shingle_k: int,
    jaccard_threshold: float,
    text_col: str,
    id_col: str,
    materialize_dir: str | None,
) -> list[tuple[int, int]]:
    """Exact shingle-Jaccard verification of candidate pairs WITHOUT the
    driver ever touching candidate texts or shingle sets (the round-2
    driver funnel): shingles of candidate docs are exploded distributed,
    joined to the (broadcast, pair-density-sized) pair membership, and
    verified per pair-bucket — mirroring the oracle SQL's
    pairs ⋈ shingles ⋈ shingles join.  The driver receives verified pair
    ids only (edge-density-sized by construction).

    At 100 TB the shingle-row volume is Σ(|sa|+|sb|) over candidate pairs —
    it scales with candidate density (already capped per bucket), never
    with the corpus; the exchange is the usual 64-way coarse bucket."""
    import ray
    import ray.data as rd

    if len(pairs) == 0:
        if materialize_dir:
            # the oracle globs this dir; it must exist (empty) even when no
            # candidates survive
            shingle_dir = os.path.join(materialize_dir, "minhash_shingles")
            if os.path.isdir(shingle_dir):
                shutil.rmtree(shingle_dir)
            os.makedirs(shingle_dir, exist_ok=True)
            import pyarrow.parquet as _pq

            _pq.write_table(
                pa.table(
                    {
                        id_col: pa.array([], type=pa.int64()),
                        "h": pa.array([], type=pa.uint64()),
                    }
                ),
                os.path.join(shingle_dir, "shingles.parquet"),
            )
        return []

    all_ids = np.sort(
        pd.unique(pd.concat([pairs["a_id"], pairs["b_id"]])).astype(np.int64)
    )
    ids_ref = ray.put(all_ids)
    shingle_rows = ds.map_batches(
        ShingleExplode,
        fn_constructor_args=(ids_ref, shingle_k, text_col, id_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    if materialize_dir:
        shingle_dir = os.path.join(materialize_dir, "minhash_shingles")
        _rewrite_parquet(shingle_rows, shingle_dir)
        # downstream consumes the export (lazy Datasets recompute per use)
        shingle_rows = rd.read_parquet(shingle_dir)

    # pair membership: 2 rows per candidate pair, broadcast once
    n = len(pairs)
    membership = pd.DataFrame(
        {
            id_col: np.concatenate(
                [pairs["a_id"].to_numpy(np.int64), pairs["b_id"].to_numpy(np.int64)]
            ),
            "pair_id": np.concatenate(
                [np.arange(n, dtype=np.int64), np.arange(n, dtype=np.int64)]
            ),
        }
    )
    mem_ref = ray.put(membership)
    verified_ids = (
        shingle_rows.map_batches(
            PairMembership,
            fn_constructor_args=(mem_ref, id_col),
            batch_format="pyarrow",
            concurrency=(1, 8),
        )
        .groupby("coarse")
        .map_groups(_make_verify_group(jaccard_threshold), batch_format="pandas")
        .to_pandas()  # verified EDGES only — near-dup-density-sized
    )
    a = pairs["a_id"].to_numpy(np.int64)
    b = pairs["b_id"].to_numpy(np.int64)
    return [
        (int(a[p]), int(b[p]))
        for p in verified_ids["pair_id"].to_numpy(dtype=np.int64)
    ]


class AssignCluster:
    """Batch stage: label each doc id with its component root from the
    broadcast (small, near-dup-density-sized) resolved union-find map.
    Docs absent from the map are singletons (cluster_id = doc_id)."""

    def __init__(self, roots_ref, id_col: str = "doc_id"):
        import ray

        self.roots = ray.get(roots_ref) if not isinstance(roots_ref, dict) else roots_ref
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = pd.Series(ids)
        cluster = s.map(self.roots).fillna(s).astype("int64").to_numpy()
        return pa.table(
            {
                self.id_col: pa.array(ids, type=pa.int64()),
                "cluster_id": pa.array(cluster, type=pa.int64()),
            }
        )


def minhash_lsh_dedup(
    ds,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize_dir: str | None = None,
    candidate_cap: int = 50,
):
    """Near-dup clusters: returns a Dataset of (doc_id, cluster_id[min id in
    component]).  Docs with no near-dup form singleton clusters
    (cluster_id = doc_id).

    ``materialize_dir`` exports the deterministic intermediates
    (``minhash_sigs``: band buckets; ``minhash_shingles``: per-doc shingle
    hash sets) as parquet for external verification / reuse.

    ``candidate_cap`` bounds the ids paired per hot LSH bucket (lost recall
    is counted, logged and exported — see LAST_TRUNCATION_STATS /
    ``minhash_metrics.json``); the oracle SQL must cap with the same value.
    """
    import ray

    sig_rows = ds.map_batches(
        MinHashStage(num_perm, bands, shingle_k, text_col, id_col),
        batch_format="pyarrow",
    )
    if materialize_dir:
        sig_dir = os.path.join(materialize_dir, "minhash_sigs")
        _rewrite_parquet(sig_rows, sig_dir)
        # downstream consumes the exported parquet instead of recomputing
        # the signature stage (lazy Datasets re-execute per consumer)
        import ray.data as rd

        sig_rows = rd.read_parquet(sig_dir)
    def add_coarse(t: pa.Table) -> pa.Table:
        b = t["band_bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "coarse", pa.array(b % NUM_COARSE_BUCKETS, type=pa.int64())
        )

    pairs = (
        sig_rows.map_batches(add_coarse, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(
            lambda g: _candidate_pairs_from_coarse_group(g, id_col, cap=candidate_cap),
            batch_format="pandas",
        )
        .to_pandas()
    )
    # surface truncated hot buckets (sentinel rows a_id == -1) before dedup:
    # the GLOBAL truncation count (not just per-bucket) is kept for
    # observability — at 100 TB a hot shingle's lost recall must be visible
    global LAST_TRUNCATION_STATS
    trunc = {"truncated_buckets": 0, "dropped_ids": 0, "candidate_cap": candidate_cap}
    if len(pairs):
        sentinels = pairs["a_id"] == -1
        trunc["truncated_buckets"] = int(sentinels.sum())
        trunc["dropped_ids"] = int(pairs.loc[sentinels, "b_id"].sum())
        if trunc["dropped_ids"]:
            logger.warning(
                "minhash_lsh_dedup: %d hot LSH bucket(s) truncated at cap=%d, "
                "%d doc ids dropped from candidate generation (lost recall)",
                trunc["truncated_buckets"],
                candidate_cap,
                trunc["dropped_ids"],
            )
        pairs = pairs[~sentinels]
    LAST_TRUNCATION_STATS = trunc
    if materialize_dir:
        import json as _json

        os.makedirs(materialize_dir, exist_ok=True)
        with open(os.path.join(materialize_dir, "minhash_metrics.json"), "w") as f:
            _json.dump(trunc, f)
    pairs = pairs.drop_duplicates()

    # exact verification runs DISTRIBUTED (shingle explode → broadcast pair
    # membership → bucketed vectorized Jaccard); the driver receives only
    # the verified edges, never candidate texts or shingle sets
    verified = _verify_pairs_distributed(
        ds, pairs, shingle_k, jaccard_threshold, text_col, id_col, materialize_dir
    )

    # union-find over verified pairs (small by construction)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    # distributed assignment: broadcast the fully-resolved root map (sized by
    # near-dup density, not the corpus) and label ids in a vectorized stage —
    # the corpus never materializes on the driver
    roots = {x: find(x) for x in parent}
    roots_ref = ray.put(roots)
    return ds.select_columns([id_col]).map_batches(
        AssignCluster,
        fn_constructor_args=(roots_ref, id_col),
        batch_format="pyarrow",
        concurrency=2,
    )


# --- SimHash -----------------------------------------------------------------


class SimHashStage:
    """64-bit SimHash per doc from word-hash bit votes (vectorized)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id", prefix_bits: int = 16):
        self.text_col = text_col
        self.id_col = id_col
        self.prefix_bits = prefix_bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        from oplogtoredis_ray.functions.fingerprint import simhash_batch

        # whole-batch vectorized signatures (bit-identical to the per-doc
        # unique-word-hash majority vote; parity pinned in test_functions)
        out = simhash_batch(batch[self.text_col])
        signed = out.view(np.int64)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "simhash": pa.array(signed, type=pa.int64()),
                "bucket": pa.array(
                    (out >> np.uint64(64 - self.prefix_bits)).astype(np.int64)
                ),
            }
        )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount via byte-table lookup (no per-row Python)."""
    bytes_view = x.astype(np.uint64).view(np.uint8).reshape(len(x), 8)
    return np.unpackbits(bytes_view, axis=1).sum(axis=1).astype(np.int64)


_EMPTY_HAMMING = pd.DataFrame(
    {
        "a_id": pd.array([], dtype="int64"),
        "b_id": pd.array([], dtype="int64"),
        "hamming": pd.array([], dtype="int64"),
    }
)


def simhash_dedup(
    ds,
    hamming_max: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize_dir: str | None = None,
):
    """Near-dup pairs within shared prefix buckets at Hamming ≤ max,
    returned as a DATASET (the pair list is bucket-bounded but still
    corpus-scaled — it must never be forced onto the driver by the
    operator itself).

    Pairs are canonical (``a_id < b_id``).  ``materialize_dir`` exports the
    (doc_id, simhash, bucket) signature table as parquet for external
    verification / reuse."""
    sigs = ds.map_batches(SimHashStage(text_col, id_col), batch_format="pyarrow")
    if materialize_dir:
        sig_dir = os.path.join(materialize_dir, "simhash_sigs")
        _rewrite_parquet(sigs, sig_dir)
        # downstream consumes the export instead of recomputing signatures
        import ray.data as rd

        sigs = rd.read_parquet(sig_dir)

    def add_coarse(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "coarse", pa.array(b % NUM_COARSE_BUCKETS, type=pa.int64())
        )

    def pairs_in_coarse(g: pd.DataFrame) -> pd.DataFrame:
        # many tiny prefix buckets per coarse group: sort once, segment by
        # the exact bucket, pair within segments (canonical a_id < b_id)
        df = g.sort_values(["bucket", id_col], kind="mergesort")
        ids = df[id_col].to_numpy(dtype=np.int64)
        h = df["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        starts, ends = _segment_bounds(df["bucket"].to_numpy(dtype=np.int64))
        a_out, b_out, d_out = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            ai, bi = np.triu_indices(e - s, k=1)
            dist = _popcount64(h[s:e][ai] ^ h[s:e][bi])
            keep = dist <= hamming_max
            a_out.append(ids[s:e][ai[keep]])
            b_out.append(ids[s:e][bi[keep]])
            d_out.append(dist[keep])
        if not a_out:
            return _EMPTY_HAMMING
        return pd.DataFrame(
            {
                "a_id": np.concatenate(a_out),
                "b_id": np.concatenate(b_out),
                "hamming": np.concatenate(d_out),
            }
        )

    return (
        sigs.map_batches(add_coarse, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(pairs_in_coarse, batch_format="pandas")
    )

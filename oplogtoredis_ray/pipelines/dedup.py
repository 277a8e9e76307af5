"""Deduplication pipelines for training-data curation.

- exact: content-hash (md5 of normalized text) → hash-partitioned groupby →
  keep min doc_id per hash.  The shuffle moves only (hash, doc_id) pairs,
  never the text.
- MinHash + LSH near-dup: shingle → minhash signature (vectorized
  universal hashing) → banded bucketing → groupby(band, bucket) → candidate
  pairs → exact shingle-Jaccard verification → connected components.
  Union-find runs on the driver over the *candidate pair list only* — that
  set is sized by true near-dup density, not the corpus (documented
  assumption; at 100 TB the pair list is the thing that must fit, and band
  thresholds keep it sparse).
- SimHash: 64-bit signed-projection sketch; near-dups share bucket prefixes
  within small Hamming distance.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from oplogtoredis_ray.functions.fingerprint import normalize_text, shingle_hashes

_MERSENNE = np.uint64((1 << 61) - 1)


class ContentHash:
    """Batch stage: append md5-based content hash of normalized text."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        hashes = [hashlib.md5(normalize_text(t).encode()).hexdigest() for t in texts]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "content_hash": pa.array(hashes, type=pa.string()),
            }
        )


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Survivor (min id) + duplicate count per distinct content."""
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(
        ContentHash(text_col, id_col), batch_format="pyarrow"
    )
    agg = hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="dup_count")
    )
    return agg.select_columns([id_col, "dup_count"])


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


def _candidate_pairs_from_bucket(group: pd.DataFrame, id_col: str, cap: int = 50) -> pd.DataFrame:
    ids = np.sort(group[id_col].unique())
    if len(ids) < 2:
        return pd.DataFrame({"a_id": [], "b_id": []})
    ids = ids[:cap]  # a bucket this hot is a degenerate band — cap + log
    a, b = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"a_id": ids[a], "b_id": ids[b]})


def minhash_lsh_dedup(
    ds,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """Near-dup clusters: returns (doc_id, cluster_id[min id in component]).

    Docs with no near-dup form singleton clusters (cluster_id = doc_id).
    """
    import ray

    sig_rows = ds.map_batches(
        MinHashStage(num_perm, bands, shingle_k, text_col, id_col),
        batch_format="pyarrow",
    )
    pairs = (
        sig_rows.groupby(["band_id", "band_bucket"])
        .map_groups(
            lambda g: _candidate_pairs_from_bucket(g, id_col), batch_format="pandas"
        )
        .to_pandas()
        .drop_duplicates()
    )

    # exact verification on the candidate pairs only: fetch candidate docs
    # with a DISTRIBUTED filter (broadcast id set) — the driver receives
    # only candidate-density-many rows, never scans the corpus itself
    verified = []
    if len(pairs):
        all_ids = pd.unique(pd.concat([pairs["a_id"], pairs["b_id"]]))
        id_arr = pa.array(np.sort(all_ids.astype(np.int64)))
        cand_docs = (
            ds.map_batches(
                lambda t: t.filter(
                    pc.is_in(t[id_col], value_set=id_arr)
                ),
                batch_format="pyarrow",
            )
            .to_pandas()
        )
        texts = dict(zip(cand_docs[id_col].astype(int), cand_docs[text_col]))
        sh = {i: shingle_hashes(t, shingle_k) for i, t in texts.items()}
        for a, b in pairs.itertuples(index=False):
            sa, sb = sh.get(int(a)), sh.get(int(b))
            if sa is None or sb is None:
                continue
            inter = len(np.intersect1d(sa, sb))
            union = len(sa) + len(sb) - inter
            if union and inter / union >= jaccard_threshold:
                verified.append((int(a), int(b)))

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

    ids_ds = ds.select_columns([id_col]).to_pandas()
    cluster = ids_ds[id_col].map(lambda i: find(int(i))).astype("int64")
    return pd.DataFrame({id_col: ids_ds[id_col], "cluster_id": cluster})


# --- SimHash -----------------------------------------------------------------


class SimHashStage:
    """64-bit SimHash per doc from word-hash bit votes (vectorized)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id", prefix_bits: int = 16):
        self.text_col = text_col
        self.id_col = id_col
        self.prefix_bits = prefix_bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        out = np.empty(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            hs = shingle_hashes(t, 1)  # word-level hashes
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int64
            )
            votes = (2 * bits - 1).sum(axis=0)
            bitvec = (votes >= 0).astype(np.uint64)
            out[i] = (bitvec << np.arange(64, dtype=np.uint64)).sum()
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


def simhash_dedup(ds, hamming_max: int = 3, text_col: str = "text", id_col: str = "doc_id") -> pd.DataFrame:
    """Near-dup pairs within shared prefix buckets at Hamming ≤ max."""
    sigs = ds.map_batches(SimHashStage(text_col, id_col), batch_format="pyarrow")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a_id": [], "b_id": [], "hamming": []})
        ids = g[id_col].to_numpy()
        h = g["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        a, b = np.triu_indices(len(ids), k=1)
        x = h[a] ^ h[b]
        dist = np.array([bin(v).count("1") for v in x])
        keep = dist <= hamming_max
        return pd.DataFrame(
            {"a_id": ids[a][keep], "b_id": ids[b][keep], "hamming": dist[keep]}
        )

    return (
        sigs.groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .to_pandas()
    )

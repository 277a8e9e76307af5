"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k — the query matrix is broadcast ONCE via
``ray.put`` and fetched once per actor in ``__init__`` (never re-shipped per
batch); each batch computes a float64 matmul and emits only its local top-k
candidates, so the driver merges ``num_batches × q × k`` rows, never the
dataset.

Scale path: random-hyperplane LSH bucketing — vectors are signed against a
shared seeded hyperplane matrix, bucketed by signature prefix, and search
only touches matching buckets (recall < 1 by design; documented).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _matrix_from_list_column(col) -> np.ndarray:
    """(n, d) float64 view of a list<float> column without per-row Python."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """Actor-pool batch stage: local top-k cosine candidates per query."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id", vec_col: str = "embedding"):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, dict) else queries_ref
        self.query_ids = np.array(sorted(q.keys()))
        self.Q = _normalize(np.stack([q[i] for i in self.query_ids]).astype(np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        E = _matrix_from_list_column(batch[self.vec_col])
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = _normalize(E) @ self.Q.T  # (n, q) float64
        k = min(self.k, len(ids))
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            top = np.argpartition(-col, k - 1)[:k] if k < len(col) else np.arange(len(col))
            out_q.append(np.full(len(top), self.query_ids[qi]))
            out_id.append(ids[top])
            out_sim.append(col[top])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_id), type=pa.int64()),
                "sim": pa.array(np.concatenate(out_sim), type=pa.float64()),
            }
        )


def knn_brute(
    ds,
    queries: dict[int, np.ndarray],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Global top-k per query: distributed partial top-k + tiny driver merge.

    Returns (query_id, rank, neighbor_id) with deterministic ties
    (sim desc, neighbor_id asc).
    """
    import ray

    ref = ray.put(queries)
    kwargs = {
        "batch_format": "pyarrow",
        "fn_constructor_args": (ref, k, id_col, vec_col),
        "concurrency": concurrency or 2,  # callable class → actor pool
    }
    cand = ds.map_batches(BruteForceTopK, **kwargs).to_pandas()
    cand = cand.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True], kind="mergesort"
    )
    cand["rank"] = cand.groupby("query_id").cumcount() + 1
    out = cand[cand["rank"] <= k][["query_id", "rank", "neighbor_id"]]
    return out.reset_index(drop=True)


class PairsAboveThreshold:
    """All-pairs cosine ≥ τ of a batch against a broadcast candidate matrix
    (used on small filtered subsets; the scale path buckets first)."""

    def __init__(self, side_ref, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding"):
        import ray

        ids, M = ray.get(side_ref)
        self.side_ids = ids
        self.S = _normalize(M.astype(np.float64))
        self.tau = threshold
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        E = _normalize(_matrix_from_list_column(batch[self.vec_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = E @ self.S.T
        rows, cols = np.nonzero(sims >= self.tau)
        a = ids[rows]
        b = self.side_ids[cols]
        keep = a < b  # dedupe unordered pairs, drop self-pairs
        return pa.table(
            {
                "a_id": pa.array(a[keep], type=pa.int64()),
                "b_id": pa.array(b[keep], type=pa.int64()),
            }
        )


def kmeans_centroids(
    M: np.ndarray, k: int, iters: int = 10, seed: int = 11
) -> np.ndarray:
    """Seeded Lloyd's k-means on (already normalized) vectors — the IVF
    coarse quantizer.  Runs on a driver-side sample; at 100 TB the sample
    is a `random_sample` of the dataset, the loop stays the same."""
    rng = np.random.default_rng(seed)
    M = _normalize(M.astype(np.float64))
    C = M[rng.choice(len(M), size=min(k, len(M)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(M @ C.T, axis=1)
        for j in range(len(C)):
            members = M[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C = _normalize(C)
    return C


class IVFTopK:
    """Actor-pool IVF search stage: rows are coarse-quantized per batch and
    only rows falling in a query's ``nprobe`` nearest clusters are scored —
    the ANN scale path (recall < 1 by design, bounded by nprobe/nlist).

    Broadcast once: (centroids, query matrix, per-query probe lists).
    """

    def __init__(self, side_ref, k: int, id_col: str = "vec_id", vec_col: str = "embedding"):
        import ray

        C, query_ids, Q, probes = ray.get(side_ref)
        self.C = C
        self.query_ids = query_ids
        self.Q = Q
        self.probes = probes  # (q, nprobe) centroid ids per query
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        E = _normalize(_matrix_from_list_column(batch[self.vec_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        assign = np.argmax(E @ self.C.T, axis=1)
        out_q, out_id, out_sim = [], [], []
        for qi in range(len(self.query_ids)):
            mask = np.isin(assign, self.probes[qi])
            if not mask.any():
                continue
            sims = E[mask] @ self.Q[qi]
            cand_ids = ids[mask]
            kk = min(self.k, len(sims))
            top = np.argpartition(-sims, kk - 1)[:kk] if kk < len(sims) else np.arange(len(sims))
            out_q.append(np.full(len(top), self.query_ids[qi]))
            out_id.append(cand_ids[top])
            out_sim.append(sims[top])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_id), type=pa.int64()),
                "sim": pa.array(np.concatenate(out_sim), type=pa.float64()),
            }
        )


class IVFAssign:
    """Batch stage: coarse-quantize each row against the broadcast centroids
    — the deterministic (vec_id, cluster) assignment table, exportable so an
    external SQL oracle can replay the probe-set search exactly."""

    def __init__(self, cent_ref, id_col: str = "vec_id", vec_col: str = "embedding"):
        import ray

        self.C = ray.get(cent_ref) if not isinstance(cent_ref, np.ndarray) else cent_ref
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        E = _normalize(_matrix_from_list_column(batch[self.vec_col]))
        assign = np.argmax(E @ self.C.T, axis=1).astype(np.int64)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "cluster": pa.array(assign, type=pa.int64()),
            }
        )


def ivf_topk(
    ds,
    queries: dict[int, np.ndarray],
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    train_sample: int = 4096,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int | None = None,
    materialize_dir: str | None = None,
) -> pd.DataFrame:
    """IVF approximate top-k: train coarse centroids on a sample, broadcast
    (centroids + queries + probe lists) once, scan with cluster pruning,
    merge local top-k on the driver.  Deterministic for a fixed seed.

    ``materialize_dir`` exports the index itself — ``ivf_centroids``
    (cluster, centroid) and ``ivf_assign`` (vec_id, cluster) — as parquet so
    the probe-set search is externally verifiable and the index reusable."""
    import ray

    sample = ds.limit(train_sample).to_pandas()
    M = np.stack(sample[vec_col].to_numpy())
    C = kmeans_centroids(M, nlist, seed=seed)
    if materialize_dir:
        import os
        import shutil

        import pyarrow.parquet as pq

        cent_dir = os.path.join(materialize_dir, "ivf_centroids")
        if os.path.isdir(cent_dir):
            shutil.rmtree(cent_dir)
        os.makedirs(cent_dir, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "cluster": pa.array(np.arange(len(C)), type=pa.int64()),
                    "centroid": pa.array(
                        [row.tolist() for row in C], type=pa.list_(pa.float64())
                    ),
                }
            ),
            os.path.join(cent_dir, "centroids.parquet"),
        )
        assign_dir = os.path.join(materialize_dir, "ivf_assign")
        if os.path.isdir(assign_dir):
            shutil.rmtree(assign_dir)
        os.makedirs(assign_dir, exist_ok=True)
        cent_ref = ray.put(C)
        ds.map_batches(
            IVFAssign,
            fn_constructor_args=(cent_ref, id_col, vec_col),
            batch_format="pyarrow",
            concurrency=2,
        ).write_parquet(assign_dir)
    query_ids = np.array(sorted(queries.keys()))
    Q = _normalize(np.stack([queries[i] for i in query_ids]).astype(np.float64))
    qsims = Q @ C.T
    probes = np.argsort(-qsims, axis=1)[:, :nprobe]
    ref = ray.put((C, query_ids, Q, probes))
    cand = ds.map_batches(
        IVFTopK,
        fn_constructor_args=(ref, k, id_col, vec_col),
        batch_format="pyarrow",
        concurrency=concurrency or 2,
    ).to_pandas()
    cand = cand.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True], kind="mergesort"
    )
    cand["rank"] = cand.groupby("query_id").cumcount() + 1
    return cand[cand["rank"] <= k][["query_id", "rank", "neighbor_id"]].reset_index(
        drop=True
    )


def lsh_signatures(
    M: np.ndarray, num_planes: int = 16, seed: int = 7
) -> np.ndarray:
    """Random-hyperplane signatures (uint32 bucket ids) — the ANN scale path:
    candidate search only within matching buckets."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((M.shape[1], num_planes))
    bits = (M @ planes) >= 0
    weights = (1 << np.arange(num_planes)).astype(np.uint32)
    return (bits.astype(np.uint32) * weights).sum(axis=1).astype(np.uint32)


class LSHBucketStage:
    """Batch stage: random-hyperplane bucket id per vector from the
    broadcast seeded plane matrix (fetched once per actor)."""

    def __init__(self, planes_ref, id_col: str = "vec_id", vec_col: str = "embedding"):
        import ray

        P = ray.get(planes_ref) if not isinstance(planes_ref, np.ndarray) else planes_ref
        self.P = P
        self.weights = (1 << np.arange(P.shape[1])).astype(np.int64)
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        E = _matrix_from_list_column(batch[self.vec_col])
        bits = (E @ self.P) >= 0
        bucket = (bits.astype(np.int64) * self.weights).sum(axis=1)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "bucket": pa.array(bucket, type=pa.int64()),
                self.vec_col: batch[self.vec_col],
            }
        )


def lsh_neardup_pairs(
    ds,
    num_planes: int = 6,
    threshold: float = 0.3,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize_dir: str | None = None,
):
    """Bucketed embedding near-dup pairs — the scale path for cosine ≥ τ:
    vectors sharing a random-hyperplane bucket are compared pairwise INSIDE
    their bucket's group (groupby exchange moves each vector once; no
    all-pairs).  Recall < 1 by construction (cross-bucket pairs are
    unseen) — that approximation is exactly replayable: with
    ``materialize_dir`` the (vec_id, bucket) assignment is exported and an
    external engine can derive the identical pair set.

    Returns a Dataset of canonical (a_id, b_id) pairs."""
    import ray
    import pandas as pd

    # probe one row for the dimensionality; plane matrix is seeded + broadcast
    first = ds.limit(1).to_pandas()
    dim = len(first[vec_col].iloc[0])
    rng = np.random.default_rng(seed)
    planes_ref = ray.put(rng.standard_normal((dim, num_planes)))
    bucketed = ds.map_batches(
        LSHBucketStage,
        fn_constructor_args=(planes_ref, id_col, vec_col),
        batch_format="pyarrow",
        concurrency=2,
    )
    if materialize_dir:
        import os
        import shutil

        asn_dir = os.path.join(materialize_dir, "lsh_assign")
        if os.path.isdir(asn_dir):
            shutil.rmtree(asn_dir)
        os.makedirs(asn_dir, exist_ok=True)
        bucketed.drop_columns([vec_col]).write_parquet(asn_dir)

    tau = threshold

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(
                {"a_id": pd.array([], dtype="int64"), "b_id": pd.array([], dtype="int64")}
            )
        order = np.argsort(g[id_col].to_numpy())
        ids = g[id_col].to_numpy()[order].astype(np.int64)
        M = _normalize(np.stack(g[vec_col].to_numpy()[order]).astype(np.float64))
        sims = M @ M.T
        a, b = np.triu_indices(len(ids), k=1)
        keep = sims[a, b] >= tau
        return pd.DataFrame({"a_id": ids[a][keep], "b_id": ids[b][keep]})

    return bucketed.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pandas")

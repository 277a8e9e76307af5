"""End-to-end training-data curation: the composite pipeline a 100 TB
corpus actually runs, built from this repo's operators.

    documents
      → enrich        (one vectorized pass: token counts, quality bucket,
                       language ID, content hash — stages/text.py kernels)
      → filter        (quality_bucket ≥ q AND lang_pred == lang)
      → exact dedup   (groupby(content_hash) → keep min-doc_id row; the
                       shuffle moves enriched rows once, no broadcast of
                       corpus-sized sets)
      → materialize   (survivors written as partitioned parquet — the
                       resumable intermediate AND the input to near-dup)
      → near-dup drop (MinHash-LSH clusters on survivors; the resolved
                       union-find root map is near-dup-density-sized and
                       broadcast, so dropping non-survivor cluster members
                       is a vectorized filter, never a join of the corpus)
      → output        (doc_id, n_tokens) — the curated token inventory

Every stage is hash-verified by the driver's DuckDB oracle: the text
kernels are SQL-generated from shared constants, exact dedup is plain SQL,
and the near-dup derivation replays from the exported MinHash intermediates
(see queries.oracle_sql_map["curate_corpus"]).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class CurateEnrich:
    """Batch stage: doc → (doc_id, text, n_tokens, quality_bucket,
    lang_pred, content_h1/h2) in one vectorized pass.  The content hash is
    the 128-bit buffer-level polynomial hash (functions/fingerprint) — a
    dedup grouping key equivalent to grouping by the normalized text, which
    is what the SQL oracle does (via md5 of the same normalization); no
    per-row cryptographic hashing anywhere in the curation hot path."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from oplogtoredis_ray.functions.fingerprint import content_hash128
        from oplogtoredis_ray.stages.text import (
            _token_lists,
            alpha_counts,
            lang_id_ngram,
            token_counts,
        )

        text = batch[self.text_col]
        n_tok = pc.cast(token_counts(text), pa.int64())
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        n_alpha = alpha_counts(text).to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = np.where(n_chars > 0, (10 * n_alpha) // np.maximum(n_chars, 1), 0)
        flat, parents, n_docs = _token_lists(text)
        h1, h2 = content_hash128(text)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                self.text_col: text,
                "n_tokens": n_tok,
                "quality_bucket": pa.array(bucket, type=pa.int64()),
                "lang_pred": lang_id_ngram(flat, parents, n_docs),
                "content_h1": pa.array(h1.view(np.int64), type=pa.int64()),
                "content_h2": pa.array(h2.view(np.int64), type=pa.int64()),
            }
        )


def curate_corpus(
    ds,
    work_dir: str,
    quality_min: int = 5,
    lang: str = "en",
    jaccard_threshold: float = 0.8,
    shingle_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Run the curation composite; returns a Dataset of (doc_id, n_tokens)
    for the curated survivors.  ``work_dir`` holds the materialized
    survivor parquet (the resumable intermediate) and the MinHash oracle
    exports."""
    import pandas as pd
    import ray
    import ray.data as rd

    from oplogtoredis_ray.pipelines.dedup import minhash_lsh_dedup

    enriched = ds.map_batches(CurateEnrich(text_col, id_col), batch_format="pyarrow")

    def keep(t: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.greater_equal(t["quality_bucket"], quality_min),
            pc.equal(t["lang_pred"], lang),
        )
        return t.filter(ok)

    filtered = enriched.map_batches(keep, batch_format="pyarrow")

    # coarse-bucket exchange + vectorized in-task dedup: grouping directly
    # on the content hash would make Ray dispatch one UDF per (corpus-sized)
    # group — the exchange key is hash-bucket, the exact dedup is a
    # vectorized drop_duplicates inside the task
    from oplogtoredis_ray.pipelines.dedup import coarse_bucket_from_h64

    def add_hash_bucket(t: pa.Table) -> pa.Table:
        hb = coarse_bucket_from_h64(t["content_h1"].to_numpy(zero_copy_only=False))
        return t.append_column("hash_bucket", pa.array(hb, type=pa.int64()))

    def first_per_hash(g):
        return (
            g.sort_values(id_col, kind="mergesort")
            .drop_duplicates(["content_h1", "content_h2"], keep="first")
            .drop(columns=["hash_bucket"])
        )

    survivors = (
        filtered.map_batches(add_hash_bucket, batch_format="pyarrow")
        .groupby("hash_bucket")
        .map_groups(first_per_hash, batch_format="pandas")
    )

    surv_dir = os.path.join(work_dir, "curate_survivors")
    if os.path.isdir(surv_dir):
        shutil.rmtree(surv_dir)
    os.makedirs(surv_dir, exist_ok=True)
    survivors.select_columns([id_col, text_col, "n_tokens"]).write_parquet(surv_dir)
    surv = rd.read_parquet(surv_dir)

    # near-dup clusters on survivors; the cluster Dataset is survivor-sized,
    # but the DROP set (members whose root != self) is near-dup-density-sized
    clusters = minhash_lsh_dedup(
        surv.select_columns([id_col, text_col]),
        jaccard_threshold=jaccard_threshold,
        shingle_k=shingle_k,
        text_col=text_col,
        id_col=id_col,
        materialize_dir=os.path.join(work_dir, "curate"),
    )
    dropped = clusters.map_batches(
        lambda t: t.filter(pc.not_equal(t[id_col], t["cluster_id"])),
        batch_format="pyarrow",
    ).to_pandas()  # near-dup-density-sized by construction
    drop_set = pa.array(np.sort(dropped[id_col].to_numpy().astype(np.int64)))

    def drop_near_dups(t: pa.Table) -> pa.Table:
        if len(drop_set) == 0:
            return t.select([id_col, "n_tokens"])
        keep_mask = pc.invert(
            pc.fill_null(pc.is_in(t[id_col], value_set=drop_set), False)
        )
        return t.filter(keep_mask).select([id_col, "n_tokens"])

    return surv.map_batches(drop_near_dups, batch_format="pyarrow")

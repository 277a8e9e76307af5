"""Text-analysis stages for training-data pipelines (beyond the reference,
which has no document analytics): token counting, quality metrics, language
ID heuristic, document fingerprinting.

All are vectorized Arrow/pandas batch kernels designed for
``map_batches(TextStats, batch_format="pyarrow", concurrency=N)`` actor
pools (regexes compiled once per actor in ``__init__``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from oplogtoredis_ray.functions.fingerprint import normalize_text


def token_counts(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace tokens per document — vectorized split + list length."""
    trimmed = pc.utf8_trim_whitespace(text)
    return pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))


# BPE-ish pre-tokenizer (GPT-2-style word/number/symbol runs with leading
# spaces and English contractions), restricted to a syntax RE2 and Python
# `re` agree on so the DuckDB oracle can count identically
BPE_ISH_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


_BPE_RX = None


def bpe_ish_counts(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Sub-word-ish token counts via the BPE-style pre-tokenizer regex.

    Arrow has no findall kernel, so this is a per-doc pass with a
    module-cached compiled regex (≙ compile-once-per-actor)."""
    global _BPE_RX
    import re as _re

    if _BPE_RX is None:
        _BPE_RX = _re.compile(BPE_ISH_PATTERN)
    vals = text.to_pylist()
    out = np.fromiter(
        (len(_BPE_RX.findall(v)) if v is not None else 0 for v in vals),
        dtype=np.int64,
        count=len(vals),
    )
    return pa.array(out, type=pa.int64())


def alpha_counts(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Number of ASCII alphabetic characters per document."""
    stripped = pc.replace_substring_regex(text, "[^a-zA-Z]", "")
    return pc.utf8_length(stripped)


def lang_id_en(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Tiny language-ID heuristic: ``en`` iff the text contains the English
    function-word bigram `` the `` (stand-in for an n-gram classifier; the
    real models aren't in this container)."""
    has_the = pc.match_substring(text, " the ")
    return pc.if_else(has_the, pa.scalar("en"), pa.scalar("other"))


class TextStats:
    """Actor-pool stage: per-doc token/char/alpha counts, quality bucket,
    language guess, and a stable 64-bit-hex fingerprint of the normalized
    text (md5-based so it is SQL-verifiable; the rolling-hash variant lives
    in functions.fingerprint)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col]
        n_tok = token_counts(text)
        n_chars = pc.utf8_length(text)
        n_alpha = alpha_counts(text)
        # integer quality bucket 0..10: floor(10 * alpha / chars)
        chars_np = n_chars.to_numpy(zero_copy_only=False).astype(np.int64)
        alpha_np = n_alpha.to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = np.where(chars_np > 0, (10 * alpha_np) // np.maximum(chars_np, 1), 0)
        texts = text.to_pylist()
        fp = [hashlib.md5(normalize_text(t).encode()).hexdigest()[:16] for t in texts]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_tokens": pc.cast(n_tok, pa.int64()),
                "n_tokens_bpe": bpe_ish_counts(text),
                "n_chars_txt": pc.cast(n_chars, pa.int64()),
                "n_alpha": pc.cast(n_alpha, pa.int64()),
                "quality_bucket": pa.array(bucket, type=pa.int64()),
                "lang_pred": lang_id_en(text),
                "fp": pa.array(fp, type=pa.string()),
            }
        )

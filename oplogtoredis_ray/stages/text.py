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


# function-word (1-gram) profiles for the vectorized language-ID scorer —
# ordered: ties break toward the earlier language, zero hits → "other".
# Shared with the SQL oracle generator (single source of truth).
LANG_PROFILES: list[tuple[str, tuple[str, ...]]] = [
    ("en", ("the", "and", "of", "to", "in", "is", "you", "that", "it", "for")),
    ("de", ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den")),
    ("fr", ("le", "les", "et", "est", "que", "pour", "dans", "une", "vous", "je")),
    ("es", ("el", "los", "y", "es", "que", "para", "con", "una", "por", "como")),
]

# English stopword set for the quality-signal ratio (25 most common)
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "but", "of", "to", "in", "on", "at",
    "is", "are", "was", "be", "it", "that", "this", "for", "with", "as",
    "by", "from", "you", "i",
)


def _token_lists(text: pa.ChunkedArray | pa.Array):
    """(flat lowercase tokens, parent doc index per token, n_docs) — one
    split shared by the stopword and language scorers."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
    flat = pc.utf8_lower(pc.list_flatten(toks))
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    return flat, parents, len(text)


def _segment_count(mask: pa.Array, parents: np.ndarray, n_docs: int) -> np.ndarray:
    hits = mask.to_numpy(zero_copy_only=False)
    out = np.zeros(n_docs, dtype=np.int64)
    np.add.at(out, parents[hits], 1)
    return out


def stopword_counts(flat, parents, n_docs: int) -> np.ndarray:
    """Per-doc count of tokens in the English stopword set (vectorized
    flatten → is_in → segment-sum)."""
    mask = pc.is_in(flat, value_set=pa.array(sorted(STOPWORDS)))
    return _segment_count(mask, parents, n_docs)


def lang_scores(flat, parents, n_docs: int) -> np.ndarray:
    """(n_docs, n_langs) function-word hit counts per language profile."""
    out = np.empty((n_docs, len(LANG_PROFILES)), dtype=np.int64)
    for j, (_, words) in enumerate(LANG_PROFILES):
        mask = pc.is_in(flat, value_set=pa.array(sorted(words)))
        out[:, j] = _segment_count(mask, parents, n_docs)
    return out


def lang_id_ngram(flat, parents, n_docs: int) -> pa.Array:
    """Profile-scored language ID: argmax of function-word hits with
    fixed-order tie-break; zero hits everywhere → ``other``."""
    scores = lang_scores(flat, parents, n_docs)
    best = np.argmax(scores, axis=1)  # first max wins = profile order
    labels = np.array([name for name, _ in LANG_PROFILES], dtype=object)
    pred = labels[best]
    pred[scores.max(axis=1) == 0] = "other"
    return pa.array(pred, type=pa.string())


def punct_counts(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Characters that are neither alphanumeric nor whitespace per doc."""
    stripped = pc.replace_substring_regex(text, r"[A-Za-z0-9\s]", "")
    return pc.utf8_length(stripped)


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
        flat, parents, n_docs = _token_lists(text)
        n_stop = stopword_counts(flat, parents, n_docs)
        # integer stopword-ratio bucket 0..10 (quality signal: natural prose
        # sits around 3-6; keyword spam near 0)
        tok_np = pc.cast(n_tok, pa.int64()).to_numpy(zero_copy_only=False)
        stop_bucket = np.where(tok_np > 0, (10 * n_stop) // np.maximum(tok_np, 1), 0)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_tokens": pc.cast(n_tok, pa.int64()),
                "n_tokens_bpe": bpe_ish_counts(text),
                "n_chars_txt": pc.cast(n_chars, pa.int64()),
                "n_alpha": pc.cast(n_alpha, pa.int64()),
                "n_punct": pc.cast(punct_counts(text), pa.int64()),
                "n_stopwords": pa.array(n_stop, type=pa.int64()),
                "stopword_bucket": pa.array(stop_bucket, type=pa.int64()),
                "quality_bucket": pa.array(bucket, type=pa.int64()),
                "lang_pred": lang_id_ngram(flat, parents, n_docs),
                "fp": pa.array(fp, type=pa.string()),
            }
        )

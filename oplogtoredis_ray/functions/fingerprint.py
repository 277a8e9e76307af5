"""Document fingerprinting — rolling (Rabin-Karp-style) polynomial hash.

A training-data-pipeline primitive (not in the reference, which has no
document analytics): a deterministic 64-bit fingerprint of normalized text,
usable for exact dedup and as the shingle hash for MinHash.  All kernels are
NumPy-vectorized (uint64 wrap-around arithmetic = mod 2^64).
"""

from __future__ import annotations

import re

import numpy as np

_WS_RE = re.compile(r"\s+")

_BASE = np.uint64(1000003)
_SEED = np.uint64(1469598103934665603)  # FNV offset basis

# numpy intentionally wraps unsigned arithmetic; silence the warnings locally
_ERR = {"over": "ignore"}


def normalize_text(text: str) -> str:
    """Lowercase + collapse whitespace — canonical form for fingerprints."""
    return _WS_RE.sub(" ", text.strip().lower())


def _poly_hash(values: np.ndarray, base: np.uint64, seed: np.uint64) -> np.uint64:
    """seed*base^n + sum(values[i] * base^(n-1-i))  (mod 2^64), vectorized."""
    n = len(values)
    if n == 0:
        return seed
    with np.errstate(**_ERR):
        powers = np.full(n, base, dtype=np.uint64)
        powers[0] = np.uint64(1)
        powers = np.cumprod(powers)  # base^0 .. base^(n-1), wrapping
        h = seed * (powers[-1] * base) + np.dot(
            values.astype(np.uint64), powers[::-1]
        )
    return np.uint64(h)


def rolling_fingerprint(text: str) -> int:
    """64-bit polynomial hash of the normalized UTF-8 text."""
    data = np.frombuffer(normalize_text(text).encode("utf-8"), dtype=np.uint8)
    return int(_poly_hash(data, _BASE, _SEED))


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Hashes of all word k-shingles (unique, uint64), vectorized.

    Word hashes are computed per word, then k-windows are combined with a
    second polynomial pass over ``sliding_window_view`` — O(words · k) numpy
    work, no per-shingle string building.  A text with fewer than k words
    yields the whole-text fingerprint.
    """
    words = normalize_text(text).split(" ")
    if len(words) < k:
        return np.array([rolling_fingerprint(text)], dtype=np.uint64)
    wh = np.fromiter(
        (
            _poly_hash(np.frombuffer(w.encode("utf-8"), dtype=np.uint8), _BASE, _SEED)
            for w in words
        ),
        dtype=np.uint64,
        count=len(words),
    )
    win = np.lib.stride_tricks.sliding_window_view(wh, k)
    base2 = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(**_ERR):
        powers = np.full(k, base2, dtype=np.uint64)
        powers[0] = np.uint64(1)
        powers = np.cumprod(powers)[::-1]
        out = win @ powers
    return np.unique(out)

"""Multimodal column stages — image/audio/video as opaque ``binary``
columns with typed metadata.

Decoding: the default decoder (functions/codecs.py) really decodes the
stdlib-representable formats — PPM/PGM images, 24-bit BMP, 8-bit
non-interlaced PNG (zlib IDAT + full unfiltering), PCM WAV — using only
stdlib + NumPy.  Formats that need codec libraries absent from this
container (JPEG/MP4/...) raise ``NotImplementedError`` unless a decoder
is injected — that stub path is deliberate and documented.  The Ray-side
plumbing is real and tested either way: schemas, actor-pool signatures,
batch sizing for large binary payloads, and the output layout.

Design notes for 100 TB:
- binary payloads make rows wide: callers should size ``batch_size`` small
  (e.g. 64-256 rows) and keep ``batch_format="pyarrow"`` so payloads stay
  zero-copy buffers until the decoder touches them;
- decode stages are actor pools (model/codec loaded once per actor in
  ``__init__``), ``num_cpus`` sized to the codec's threading;
- outputs store derived features + metadata, never re-encode the payload
  unless asked — the lake keeps the original bytes column-pruned away from
  feature-only readers.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    {
        "media_id": pa.int64(),
        "kind": pa.string(),        # image | audio | video
        "payload": pa.binary(),
        "mime": pa.string(),
        "width": pa.int32(),        # nullable metadata
        "height": pa.int32(),
        "duration_ms": pa.int32(),
    }
)


def synthesize_media_table(n: int, seed: int = 0, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table for tests/benches (seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[np.arange(n) % 3]
    payloads = [rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(
                ["image/png" if k == "image" else f"{k}/raw" for k in kinds]
            ),
            "width": pa.array(
                [64 if k == "image" else None for k in kinds], type=pa.int32()
            ),
            "height": pa.array(
                [64 if k == "image" else None for k in kinds], type=pa.int32()
            ),
            "duration_ms": pa.array(
                [1000 if k != "image" else None for k in kinds], type=pa.int32()
            ),
        }
    )


def synthesize_decodable_media_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic media table whose payloads REALLY decode with the
    default decoder: PPM, BMP, PCM WAV, PNG-RGB and PNG-RGBA round-robin
    (the PNGs use the "mixed" per-row filter schedule so every unfilter
    path — None/Sub/Up/Average/Paeth — is exercised by the pipelines)."""
    from oplogtoredis_ray.functions.codecs import (
        encode_bmp,
        encode_png,
        encode_ppm,
        encode_wav,
    )

    rng = np.random.default_rng(seed)
    kinds, mimes, payloads, widths, heights, durations = [], [], [], [], [], []
    for i in range(n):
        mode = i % 5
        if mode == 0:
            img = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
            kinds.append("image")
            mimes.append("image/x-portable-pixmap")
            payloads.append(encode_ppm(img))
            widths.append(16); heights.append(12); durations.append(None)
        elif mode == 1:
            img = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
            kinds.append("image")
            mimes.append("image/bmp")
            payloads.append(encode_bmp(img))
            widths.append(11); heights.append(9); durations.append(None)
        elif mode == 2:
            img = rng.integers(0, 256, (10, 13, 3), dtype=np.uint8)
            kinds.append("image")
            mimes.append("image/png")
            payloads.append(encode_png(img, filter_type="mixed"))
            widths.append(13); heights.append(10); durations.append(None)
        elif mode == 3:
            img = rng.integers(0, 256, (8, 9, 4), dtype=np.uint8)
            kinds.append("image")
            mimes.append("image/png")
            payloads.append(encode_png(img, filter_type="mixed"))
            widths.append(9); heights.append(8); durations.append(None)
        else:
            clip = rng.integers(-20000, 20000, (800, 2)).astype(np.int16)
            kinds.append("audio")
            mimes.append("audio/wav")
            payloads.append(encode_wav(clip, rate=8000))
            widths.append(None); heights.append(None); durations.append(100)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(mimes, type=pa.string()),
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "duration_ms": pa.array(durations, type=pa.int32()),
        }
    )


class MediaFeatureStage:
    """Actor-pool stage: payload → fixed-size feature vector + basic stats.

    ``decoder(payload, mime) -> np.ndarray`` is injected; per-actor setup
    (codec/model load) happens once here in ``__init__``.  Use as::

        ds.map_batches(MediaFeatureStage, fn_constructor_kwargs={...},
                       batch_format="pyarrow", batch_size=128, concurrency=N)
    """

    def __init__(
        self,
        decoder: Callable[[bytes, str], np.ndarray] | None = None,
        feature_dim: int = 16,
    ):
        if decoder is None:
            # container-free real decoders (PPM/PGM/BMP/WAV); anything that
            # needs codec libs raises NotImplementedError per payload
            from oplogtoredis_ray.functions.codecs import default_decoder

            decoder = default_decoder
        self.decoder = decoder
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mimes = batch["mime"].to_pylist()
        feats = np.empty((len(payloads), self.feature_dim), dtype=np.float32)
        # exact integer view of the pooled chunks (sum + count instead of a
        # float mean): decoders emit integer samples (uint8 pixels / int16
        # PCM), so these are lossless and SQL-replayable — the oracle gate
        # for this stage compares them instead of float32 roundings
        sums = np.zeros((len(payloads), self.feature_dim), dtype=np.int64)
        lens = np.zeros((len(payloads), self.feature_dim), dtype=np.int32)
        sizes = np.empty(len(payloads), dtype=np.int64)
        for i, (p, m) in enumerate(zip(payloads, mimes)):
            raw = self.decoder(p, m)
            # deterministic pooling of whatever the decoder returns
            flat = np.asarray(raw, dtype=np.float32).ravel()
            chunks = np.array_split(flat, self.feature_dim)
            feats[i] = [c.mean() if len(c) else 0.0 for c in chunks]
            ichunks = np.array_split(
                np.asarray(raw).ravel().astype(np.int64), self.feature_dim
            )
            sums[i] = [int(c.sum()) for c in ichunks]
            lens[i] = [len(c) for c in ichunks]
            sizes[i] = len(p)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload_bytes": pa.array(sizes, type=pa.int64()),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), type=pa.float32()), self.feature_dim
                ),
                "chunk_sums": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.ravel(), type=pa.int64()), self.feature_dim
                ),
                "chunk_lens": pa.FixedSizeListArray.from_arrays(
                    pa.array(lens.ravel(), type=pa.int32()), self.feature_dim
                ),
            }
        )


class MediaDecodeExplode:
    """Actor-pool stage: explode each payload's decode into
    ``(media_id, kind, payload_bytes, chunk_idx, value)`` rows — the same
    decoder + ``np.array_split`` chunking as `MediaFeatureStage`, flattened
    so a SQL engine can replay the pooled features (``SUM(value)`` /
    ``COUNT(*)`` per chunk) over the exported decode.  This is the oracle
    export for the multimodal feature pipeline, mirroring the
    minhash-signature-export pattern."""

    def __init__(
        self,
        decoder: Callable[[bytes, str], np.ndarray] | None = None,
        feature_dim: int = 16,
    ):
        if decoder is None:
            from oplogtoredis_ray.functions.codecs import default_decoder

            decoder = default_decoder
        self.decoder = decoder
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        mimes = batch["mime"].to_pylist()
        out_id, out_kind, out_bytes, out_chunk, out_val = [], [], [], [], []
        for mid, kind, p, m in zip(ids, kinds, payloads, mimes):
            flat = np.asarray(self.decoder(p, m)).ravel().astype(np.int64)
            chunks = np.array_split(flat, self.feature_dim)
            chunk_idx = np.repeat(
                np.arange(self.feature_dim, dtype=np.int64),
                [len(c) for c in chunks],
            )
            n = len(flat)
            out_id.append(np.full(n, int(mid), dtype=np.int64))
            out_kind.extend([kind] * n)
            out_bytes.append(np.full(n, len(p), dtype=np.int64))
            out_chunk.append(chunk_idx)
            out_val.append(flat)
        cat = lambda parts: np.concatenate(parts) if parts else np.array([], dtype=np.int64)  # noqa: E731
        return pa.table(
            {
                "media_id": pa.array(cat(out_id), type=pa.int64()),
                "kind": pa.array(out_kind, type=pa.string()),
                "payload_bytes": pa.array(cat(out_bytes), type=pa.int64()),
                "chunk_idx": pa.array(cat(out_chunk), type=pa.int64()),
                "value": pa.array(cat(out_val), type=pa.int64()),
            }
        )


class FrameSampleStage:
    """Actor-pool stage: sample K pseudo-frames per video payload.

    Emits one row per (media_id, frame_idx) — a flat_map over binary rows.
    The frame extraction is the injected decoder's job; the stub slices the
    payload deterministically so plumbing is testable without codecs.
    """

    def __init__(self, k_frames: int = 4, frame_decoder=None):
        self.k = k_frames
        self.frame_decoder = frame_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        payloads = batch["payload"].to_pylist()
        out_ids, out_frames, out_blobs = [], [], []
        for mid, p in zip(ids, payloads):
            for f in range(self.k):
                if self.frame_decoder is not None:
                    blob = self.frame_decoder(p, f, self.k)
                else:
                    step = max(len(p) // self.k, 1)
                    blob = p[f * step : (f + 1) * step]  # deterministic stub slice
                out_ids.append(int(mid))
                out_frames.append(f)
                out_blobs.append(blob)
        return pa.table(
            {
                "media_id": pa.array(out_ids, type=pa.int64()),
                "frame_idx": pa.array(out_frames, type=pa.int32()),
                "frame": pa.array(out_blobs, type=pa.binary()),
            }
        )


def fake_decoder(payload: bytes, mime: str) -> np.ndarray:
    """Deterministic decoder fake: bytes → uint8 array (for tests)."""
    return np.frombuffer(payload, dtype=np.uint8)

"""Pure-stdlib/NumPy media codecs for the multimodal stages.

No image/audio libraries exist in this environment, so the formats a
container-free decoder can honestly support are the uncompressed classics:

- PPM (P6) / PGM (P5) binary netpbm images → (h, w, 3) / (h, w) uint8
- BMP, 24-bit uncompressed BI_RGB, bottom-up → (h, w, 3) uint8 (RGB)
- WAV, PCM 8/16/32-bit via the stdlib ``wave`` module → (n, channels)

``default_decoder`` sniffs magic bytes first, mime second, and raises
``NotImplementedError`` for anything else (JPEG/PNG/MP4 need real codec
libraries — that stub path is deliberate and documented).  Encoders for the
same formats exist so tests and the synthetic media generator can produce
REAL decodable payloads.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


class MediaDecodeError(ValueError):
    """Payload claims a supported format but is malformed."""


# --- netpbm (PPM P6 / PGM P5) ------------------------------------------------


def _read_pnm_header(payload: bytes) -> tuple[bytes, int, int, int, int]:
    """(magic, width, height, maxval, data_offset) — whitespace/comment-aware."""
    pos = 2
    fields: list[int] = []
    n = len(payload)
    while len(fields) < 3 and pos < n:
        c = payload[pos : pos + 1]
        if c == b"#":  # comment to end of line
            while pos < n and payload[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
        elif c.isspace():
            pos += 1
        elif c.isdigit():
            start = pos
            while pos < n and payload[pos : pos + 1].isdigit():
                pos += 1
            fields.append(int(payload[start:pos]))
        else:
            raise MediaDecodeError(f"bad netpbm header byte {c!r} at {pos}")
    if len(fields) < 3 or pos >= n:
        raise MediaDecodeError("truncated netpbm header")
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    return payload[:2], w, h, maxval, pos


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 → (h, w, 3) uint8; P5 → (h, w) uint8."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise MediaDecodeError(f"not a binary netpbm payload: {magic!r}")
    _, w, h, maxval, off = _read_pnm_header(payload)
    if maxval > 255:
        raise MediaDecodeError("16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    data = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    if len(data) < need:
        raise MediaDecodeError("truncated netpbm raster")
    return data.reshape((h, w, 3) if ch == 3 else (h, w))


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
        h, w = img.shape[:2]
    elif img.ndim == 2:
        magic = b"P5"
        h, w = img.shape
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {img.shape}")
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


# --- BMP (24-bit uncompressed) ----------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB bottom-up BMP → (h, w, 3) uint8 in RGB order."""
    if payload[:2] != b"BM":
        raise MediaDecodeError("not a BMP payload")
    if len(payload) < 54:
        raise MediaDecodeError("truncated BMP header")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise MediaDecodeError(f"unsupported BMP header size {hdr_size}")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise MediaDecodeError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    need = stride * h
    raw = np.frombuffer(payload, dtype=np.uint8, count=need, offset=data_off)
    if len(raw) < need:
        raise MediaDecodeError("truncated BMP raster")
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (h,w,3) uint8, got {img.shape}")
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), dtype=np.uint8)
    raster[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, bottom-up
    data = raster.tobytes()
    file_size = 54 + len(data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


# --- WAV (PCM via stdlib wave) ----------------------------------------------

_WAV_DTYPES = {1: np.uint8, 2: np.int16, 4: np.int32}


def decode_wav(payload: bytes) -> np.ndarray:
    """PCM WAV → (n_frames, channels) int array (uint8 for 8-bit)."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as f:
            width = f.getsampwidth()
            channels = f.getnchannels()
            frames = f.readframes(f.getnframes())
    except (wave.Error, EOFError) as e:
        raise MediaDecodeError(f"bad WAV payload: {e}") from e
    dtype = _WAV_DTYPES.get(width)
    if dtype is None:
        raise MediaDecodeError(f"unsupported WAV sample width {width}")
    data = np.frombuffer(frames, dtype=dtype)
    return data.reshape(-1, channels)


def wav_sample_rate(payload: bytes) -> int:
    with wave.open(io.BytesIO(payload), "rb") as f:
        return f.getframerate()


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype not in (np.uint8, np.int16, np.int32):
        samples = samples.astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(samples.dtype.itemsize)
        f.setframerate(rate)
        f.writeframes(np.ascontiguousarray(samples).tobytes())
    return buf.getvalue()


# --- dispatch ----------------------------------------------------------------


def default_decoder(payload: bytes, mime: str) -> np.ndarray:
    """Magic-bytes-first dispatch to the container-free decoders.

    Anything needing a real codec library (PNG/JPEG/MP4/...) raises
    ``NotImplementedError`` — inject a decoder for those."""
    head = payload[:12]
    if head[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if head[:2] == b"BM":
        return decode_bmp(payload)
    if head[:4] == b"RIFF" and head[8:12] == b"WAVE":
        return decode_wav(payload)
    raise NotImplementedError(
        f"no container-free decoder for mime={mime!r} (magic={head[:4]!r}); "
        "PNG/JPEG/MP4 etc. need codec libraries not present here — inject a "
        "decoder via the stage constructor"
    )

"""Pure-stdlib/NumPy media codecs for the multimodal stages.

No image/audio libraries exist in this environment, so the formats a
container-free decoder can honestly support are the classics whose
compression (if any) is stdlib:

- PPM (P6) / PGM (P5) binary netpbm images → (h, w, 3) / (h, w) uint8
- BMP, 24-bit uncompressed BI_RGB, bottom-up → (h, w, 3) uint8 (RGB)
- PNG, 8-bit gray / gray+alpha / RGB / RGBA, non-interlaced (IDAT is
  zlib-deflate = stdlib; CRC-checked chunk walk + numpy unfiltering of all
  five row filters) → (h, w[, ch]) uint8
- WAV, PCM 8/16/32-bit via the stdlib ``wave`` module → (n, channels)

``default_decoder`` sniffs magic bytes first, mime second, and raises
``NotImplementedError`` for anything else (JPEG/MP4/palette-or-16-bit PNG
need real codec libraries — that stub path is deliberate and documented).
Encoders for the same formats exist so tests and the synthetic media
generator can produce REAL decodable payloads.
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


# --- PNG (8-bit gray/RGB/RGBA, non-interlaced; stdlib zlib) -------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # colortype -> samples/pixel
_PNG_COLORTYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> colortype


def _png_chunks(payload: bytes):
    """Yield (type, data) for each CRC-verified chunk."""
    import zlib

    pos = 8
    n = len(payload)
    while pos + 12 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise MediaDecodeError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise MediaDecodeError(f"PNG {ctype!r} chunk CRC mismatch")
        yield ctype, data
        if ctype == b"IEND":
            return
        pos += 12 + length
    raise MediaDecodeError("PNG stream ended without IEND")


def _png_unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse the per-row PNG filters (None/Sub/Up/Average/Paeth).

    Row-sequential by necessity (each row's reconstruction feeds the next);
    within a row, None/Up are whole-row numpy ops and Sub is a per-pixel-lane
    cumsum; only Average/Paeth walk pixels (vectorized over the channel
    lane).  Fine for the actor-pool decode stage — the per-payload work is
    the decode itself."""
    stride = w * ch
    arr = np.frombuffer(raw, dtype=np.uint8)
    if len(arr) != h * (stride + 1):
        raise MediaDecodeError(
            f"PNG raster size mismatch: got {len(arr)}, want {h * (stride + 1)}"
        )
    arr = arr.reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(arr[y, 0])
        line = arr[y, 1:].astype(np.int32)
        if f == 0:  # None
            rec = line
        elif f == 1:  # Sub: per-lane prefix sum mod 256
            rec = (
                np.cumsum(line.reshape(w, ch).astype(np.int64), axis=0) % 256
            ).astype(np.int32).reshape(stride)
        elif f == 2:  # Up
            rec = (line + prev) % 256
        elif f == 3:  # Average
            rec = np.empty(stride, dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                s = x * ch
                cur = (line[s : s + ch] + ((left + prev[s : s + ch]) >> 1)) % 256
                rec[s : s + ch] = cur
                left = cur
        elif f == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            ul = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                s = x * ch
                up = prev[s : s + ch]
                p = left + up - ul
                pa_ = np.abs(p - left)
                pb = np.abs(p - up)
                pc_ = np.abs(p - ul)
                pred = np.where(
                    (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, up, ul)
                )
                cur = (line[s : s + ch] + pred) % 256
                rec[s : s + ch] = cur
                left = cur
                ul = up.copy()
        else:
            raise MediaDecodeError(f"bad PNG filter type {f} in row {y}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG → (h, w) gray / (h, w, 2) gray+alpha /
    (h, w, 3) RGB / (h, w, 4) RGBA uint8.  Pure stdlib: chunk walk + CRC,
    zlib-inflated IDAT, numpy unfiltering.  Palette (colortype 3), 16-bit
    and interlaced images are out of scope and raise MediaDecodeError."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise MediaDecodeError("not a PNG payload")
    ihdr = None
    idat: list[bytes] = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or len(ihdr) != 13:
        raise MediaDecodeError("missing/short IHDR")
    if not idat:
        raise MediaDecodeError("PNG has no IDAT data")
    w, h, depth, colortype, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8:
        raise MediaDecodeError(f"only 8-bit PNG supported (depth={depth})")
    ch = _PNG_CHANNELS.get(colortype)
    if ch is None:
        raise MediaDecodeError(f"unsupported PNG color type {colortype} (palette?)")
    if comp != 0 or filt != 0:
        raise MediaDecodeError("non-standard PNG compression/filter method")
    if interlace != 0:
        raise MediaDecodeError("interlaced PNG not supported")
    if w == 0 or h == 0:
        raise MediaDecodeError("zero-dimension PNG")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise MediaDecodeError(f"bad PNG IDAT stream: {e}") from e
    px = _png_unfilter(raw, h, w, ch)
    return px.reshape(h, w) if ch == 1 else px.reshape(h, w, ch)


def encode_png(img: np.ndarray, filter_type: int | str = 0) -> bytes:
    """Encode (h,w[,ch]) uint8 → 8-bit non-interlaced PNG.

    ``filter_type`` 0-4 applies that filter to every row; ``"mixed"``
    cycles 0,1,2,3,4 by row so round-trip tests exercise every unfilter
    path.  Forward filtering is fully vectorized (the reconstruction is
    known up front)."""
    import zlib

    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in _PNG_COLORTYPE:
        raise ValueError(f"expected (h,w) or (h,w,1..4) uint8, got {img.shape}")
    h, w, ch = img.shape
    rec = img.reshape(h, w * ch).astype(np.int32)
    up = np.vstack([np.zeros((1, w * ch), np.int32), rec[:-1]])
    left = np.zeros_like(rec)
    left[:, ch:] = rec[:, :-ch]
    ul = np.zeros_like(rec)
    ul[1:, ch:] = rec[:-1, :-ch]
    p = left + up - ul
    pa_, pb, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
    paeth = np.where((pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, up, ul))
    filtered_by_type = {
        0: rec,
        1: (rec - left) % 256,
        2: (rec - up) % 256,
        3: (rec - ((left + up) >> 1)) % 256,
        4: (rec - paeth) % 256,
    }
    if filter_type == "mixed":
        ftypes = np.arange(h, dtype=np.int64) % 5
    else:
        if filter_type not in filtered_by_type:
            raise ValueError(f"bad filter_type {filter_type!r}")
        ftypes = np.full(h, int(filter_type), dtype=np.int64)
    rows = np.empty((h, w * ch + 1), dtype=np.uint8)
    rows[:, 0] = ftypes
    for f in np.unique(ftypes):
        sel = ftypes == f
        rows[sel, 1:] = filtered_by_type[int(f)][sel].astype(np.uint8)
    raster = zlib.compress(rows.tobytes(), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, _PNG_COLORTYPE[ch], 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", raster)
        + chunk(b"IEND", b"")
    )


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
    if head[:8] == _PNG_SIG:
        return decode_png(payload)
    if head[:4] == b"RIFF" and head[8:12] == b"WAVE":
        return decode_wav(payload)
    raise NotImplementedError(
        f"no container-free decoder for mime={mime!r} (magic={head[:4]!r}); "
        "JPEG/MP4 etc. need codec libraries not present here — inject a "
        "decoder via the stage constructor"
    )

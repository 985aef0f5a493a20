"""Real, dependency-free media codecs for UNCOMPRESSED formats.

The container has no image/audio libraries, but uncompressed formats
need none: BMP (BITMAPINFOHEADER, 24/32-bit, no compression) and WAV
(RIFF PCM16) are plain struct layouts decodable with numpy. These give
the multimodal pipeline a REAL decode/resize path — the compressed
codecs (JPEG/PNG/MP3/...) remain honestly stubbed in
`operators/multimodal.py`.

Everything here is per-record Python/numpy executed inside Arrow
batches (`mapInPandas`) — never row-at-a-time UDFs.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ BMP


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit uncompressed BMP (bottom-up rows,
    4-byte padded, BGR order) — used to build test fixtures."""
    h, w, c = pixels.shape
    assert c == 3, "encode_bmp writes 24-bit RGB"
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    data_offset = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", data_offset + img_size, 0, 0, data_offset
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    body = bytearray()
    bgr = pixels[:, :, ::-1]  # BMP stores BGR
    pad = b"\x00" * (row_size - w * 3)
    for row in range(h - 1, -1, -1):  # bottom-up
        body += bgr[row].tobytes() + pad
    return header + info + bytes(body)


def decode_bmp(raw: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP → (H, W, 3) uint8 RGB array."""
    if raw[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", raw, 10)[0]
    hdr_size = struct.unpack_from("<I", raw, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", raw, 18)
    bpp = struct.unpack_from("<H", raw, 28)[0]
    compression = struct.unpack_from("<I", raw, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    nch = bpp // 8
    row_size = (w * nch + 3) & ~3
    buf = np.frombuffer(raw, dtype=np.uint8, offset=data_offset,
                        count=row_size * h)
    rows = buf.reshape(h, row_size)[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        rows = rows[::-1]
    rgb = rows[:, :, 2::-1] if nch >= 3 else rows  # BGR(A) → RGB
    return np.ascontiguousarray(rgb[:, :, :3])


def resize_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resample — pure index arithmetic, no libs."""
    h, w = pixels.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[rows][:, cols]


def letterbox_dims(w: int, h: int, tw: int, th: int) -> tuple[int, int]:
    scale = min(tw / w, th / h)
    return max(1, int(w * scale)), max(1, int(h * scale))


# ------------------------------------------------------------------ WAV


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(N,) or (N, C) int16 PCM → RIFF/WAVE bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def decode_wav(raw: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE PCM16 → (sample_rate, channels, (N, C) int16 array).
    Walks chunks, so extra chunks (LIST, fact) don't break parsing."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    sample_rate = channels = None
    data = None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        size = struct.unpack_from("<I", raw, pos + 4)[0]
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    arr = np.frombuffer(data, dtype="<i2")
    return sample_rate, channels, arr.reshape(-1, channels)

"""Dependency-free media codecs for the multimodal operators.

Real decode for the formats numpy + the stdlib can handle without codec
libraries (VERDICT r02 §2):

- **BMP** (24-bit uncompressed ``BI_RGB``) — ``struct`` header parse,
  bottom-up BGR rows, 4-byte row padding;
- **PPM** (binary ``P6``) — trivial self-describing header + raw RGB;
- **WAV** (PCM) — stdlib ``wave`` over ``io.BytesIO``;
- **PPM stream** (``video/ppm-stream``) — a video stand-in that is still a
  *real* self-describing byte format: concatenated P6 frames, each parsed
  from its own header (frame boundaries are derived from the headers, not
  assumed). Container formats that genuinely need ffmpeg/PIL (mp4, png,
  jpeg) remain gated with a clear error listing the supported formats.

All functions are pure bytes/numpy — safe to call inside Arrow-batched
``mapInPandas`` workers with zero extra imports shipped.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

#: formats the real decode paths accept, per media kind
SUPPORTED_IMAGE_FORMATS = ("image/bmp", "image/x-portable-pixmap")
SUPPORTED_AUDIO_FORMATS = ("audio/wav",)
SUPPORTED_VIDEO_FORMATS = ("video/ppm-stream",)


# ---------------------------------------------------------------------------
# PPM (binary P6)
# ---------------------------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 bytes."""
    h, w, c = arr.shape
    if c != 3:
        raise ValueError(f"PPM needs 3 channels, got {c}")
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        arr, dtype=np.uint8
    ).tobytes()


def _parse_ppm_header(b: bytes, offset: int = 0) -> tuple[int, int, int]:
    """Returns (width, height, pixel_data_offset) of the P6 frame at
    ``offset``; tolerates any whitespace between header tokens."""
    if b[offset : offset + 2] != b"P6":
        raise ValueError("not a binary P6 PPM payload")
    pos = offset + 2
    vals = []
    while len(vals) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported, maxval={maxval}")
    return w, h, pos


def decode_ppm(b: bytes) -> np.ndarray:
    """Binary P6 bytes -> (h, w, 3) uint8."""
    w, h, pos = _parse_ppm_header(b)
    px = np.frombuffer(b, dtype=np.uint8, count=3 * w * h, offset=pos)
    return px.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB BMP bytes (bottom-up, padded)."""
    h, w, c = arr.shape
    if c != 3:
        raise ValueError(f"BMP encoder needs 3 channels, got {c}")
    row_size = (3 * w + 3) & ~3
    img_size = row_size * h
    data_offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_offset + img_size, 0, 0, data_offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    bgr = np.ascontiguousarray(arr[:, :, ::-1], dtype=np.uint8)
    pad = b"\x00" * (row_size - 3 * w)
    rows = [bgr[y].tobytes() + pad for y in range(h - 1, -1, -1)]
    return header + info + b"".join(rows)


def decode_bmp(b: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (h, w, 3) uint8 RGB."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", b, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", b, 14)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24-bit uncompressed BMP supported (hdr={hdr_size}, "
            f"bpp={bpp}, compression={compression})"
        )
    flip = h > 0
    h = abs(h)
    row_size = (3 * w + 3) & ~3
    rows = np.frombuffer(
        b, dtype=np.uint8, count=row_size * h, offset=data_offset
    ).reshape(h, row_size)[:, : 3 * w].reshape(h, w, 3)
    bgr = rows[::-1] if flip else rows
    return np.ascontiguousarray(bgr[:, :, ::-1])


def decode_image(b: bytes, fmt: str) -> np.ndarray:
    if fmt == "image/bmp":
        return decode_bmp(b)
    if fmt == "image/x-portable-pixmap":
        return decode_ppm(b)
    raise NotImplementedError(
        f"real decode of {fmt!r} needs codec libraries not in this "
        f"environment; supported here: {SUPPORTED_IMAGE_FORMATS} "
        "(or pass fake=True for the byte-level stand-in)"
    )


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "image/bmp":
        return encode_bmp(arr)
    if fmt == "image/x-portable-pixmap":
        return encode_ppm(arr)
    raise NotImplementedError(f"no dependency-free encoder for {fmt!r}")


def nearest_resize(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample of (h, w, 3) to (out_h, out_w, 3)."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return arr[ys][:, xs]


# ---------------------------------------------------------------------------
# WAV (PCM, stdlib wave)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """1-D int16 PCM samples -> mono WAV bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(np.ascontiguousarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 PCM sample array [n, channels] squeezed, rate)."""
    with wave.open(io.BytesIO(b), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError(
                f"only 16-bit PCM WAV supported, width={wf.getsampwidth()}"
            )
        n = wf.getnframes()
        raw = wf.readframes(n)
        rate = wf.getframerate()
        ch = wf.getnchannels()
    samples = np.frombuffer(raw, dtype="<i2")
    if ch > 1:
        samples = samples.reshape(-1, ch)
    return samples, rate


# ---------------------------------------------------------------------------
# PPM stream ("video": concatenated self-describing P6 frames)
# ---------------------------------------------------------------------------


def encode_ppm_stream(frames: list[np.ndarray]) -> bytes:
    return b"".join(encode_ppm(f) for f in frames)


def decode_ppm_stream(b: bytes) -> list[np.ndarray]:
    """Concatenated P6 frames -> list of (h, w, 3) arrays. Frame boundaries
    come from each frame's own header — a malformed stream raises rather
    than silently mis-slicing."""
    frames = []
    pos = 0
    while pos < len(b):
        w, h, data = _parse_ppm_header(b, pos)
        end = data + 3 * w * h
        if end > len(b):
            raise ValueError("truncated PPM stream frame")
        frames.append(
            np.frombuffer(b, dtype=np.uint8, count=3 * w * h, offset=data).reshape(
                h, w, 3
            )
        )
        pos = end
    return frames

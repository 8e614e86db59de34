"""Pure-numpy media codecs: PNG (encode/decode) and WAV (stdlib wave).

The reference stores screenshots as PNG files and downloaded web objects as
typed binary blobs (``pkg/crawler/web.go:163-517``). This container has no
PIL/ffmpeg, but PNG needs only zlib (stdlib) + numpy, and WAV/PCM needs only
the stdlib ``wave`` module — so the image/audio halves of the multimodal
stages use REAL codecs; only JPEG/MP4 remain deterministic fakes.

Scope (documented, asserted): PNG bit depth 8, color types 0 (gray),
2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced. All five
scanline filters are decoded (Sub/Up vectorized; Average/Paeth per-pixel —
fine for screenshot-sized images). The encoder always emits the Up filter,
which vectorizes to one numpy subtraction for the whole image.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray, level: int = 6) -> bytes:
    """uint8 image array → PNG bytes. Shapes: (h,w) gray, (h,w,1) gray,
    (h,w,2) gray+alpha, (h,w,3) RGB, (h,w,4) RGBA."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    channels = arr.shape[2]
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise ValueError(f"unsupported channel count {channels}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    flat = arr.reshape(h, w * channels)
    up = flat.copy()
    up[1:] -= flat[:-1]  # uint8 wraparound == mod-256 difference
    raw = np.concatenate(
        [np.full((h, 1), 2, np.uint8), up], axis=1
    ).tobytes()
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, level))
        + _chunk(b"IEND", b"")
    )


_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _unfilter(filt: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering. ``filt`` is (h, 1+stride) uint8 with
    the filter byte in column 0."""
    out = np.empty((h, stride), np.uint8)
    zero = np.zeros(stride, np.uint8)
    for y in range(h):
        ft = int(filt[y, 0])
        row = filt[y, 1:]
        prev = out[y - 1] if y else zero
        if ft == 0:
            out[y] = row
        elif ft == 1:  # Sub: cumsum over bpp lanes
            out[y] = (
                np.cumsum(row.reshape(-1, bpp), axis=0, dtype=np.uint32)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif ft == 2:  # Up
            out[y] = row + prev
        elif ft == 3:  # Average (sequential in x)
            r = out[y]
            for x in range(stride):
                left = int(r[x - bpp]) if x >= bpp else 0
                r[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth (sequential in x)
            r = out[y]
            for x in range(stride):
                a = int(r[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                r[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {ft}")
    return out


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h,w) for gray or (h,w,c) otherwise.
    Palette images are expanded to RGB."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad magic)")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    if depth != 8 or comp != 0 or filt_method != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, interlace={interlace})"
        )
    channels = _CHANNELS.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported color type {color_type}")
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG data size mismatch")
    out = _unfilter(raw.reshape(h, stride + 1), h, stride, channels)
    img = out.reshape(h, w, channels)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        img = plte[img[:, :, 0]]
    return img[:, :, 0] if img.shape[2] == 1 else img


def png_info(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the IHDR without decompressing."""
    if data[:8] != PNG_MAGIC or data[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    w, h, _depth, color_type = struct.unpack(">IIBB", data[16:26])
    return w, h, _CHANNELS.get(color_type, 0)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure indexing — exact and fast)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // max(out_h, 1), h - 1)
    xs = np.minimum((np.arange(out_w) * w) // max(out_w, 1), w - 1)
    return img[ys][:, xs]


def resize_bilinear(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Bilinear resize, vectorized (align_corners=False convention)."""
    h, w = img.shape[:2]
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    fy = (np.arange(out_h) + 0.5) * h / max(out_h, 1) - 0.5
    fx = (np.arange(out_w) + 0.5) * w / max(out_w, 1) - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
    f = img.astype(np.float32)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


def luminance(img: np.ndarray) -> np.ndarray:
    """uint8 image → float32 (h,w) luminance (Rec. 601 weights)."""
    if img.ndim == 2:
        return img.astype(np.float32)
    if img.shape[2] == 1:
        return img[:, :, 0].astype(np.float32)
    f = img[:, :, :3].astype(np.float32)
    return f[:, :, 0] * 0.299 + f[:, :, 1] * 0.587 + f[:, :, 2] * 0.114


def image_feature(img: np.ndarray, bins: int = 16) -> np.ndarray:
    """Unit-norm luminance histogram — a real, deterministic image feature
    for the decode stage's feature column."""
    hist, _ = np.histogram(luminance(img), bins=bins, range=(0.0, 256.0))
    v = hist.astype(np.float32)
    n = float(np.linalg.norm(v)) or 1.0
    return v / n


def wav_encode(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """int16 mono/stereo PCM → WAV bytes. (h,) mono or (h,2) stereo."""
    samples = np.asarray(samples, dtype=np.int16)
    nch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(nch)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(np.ascontiguousarray(samples).tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples [(n,) or (n,ch)], sample rate)."""
    with wave.open(io.BytesIO(data), "rb") as wv:
        nch = wv.getnchannels()
        width = wv.getsampwidth()
        rate = wv.getframerate()
        frames = wv.readframes(wv.getnframes())
    if width != 2:
        raise ValueError(f"unsupported sample width {width}")
    arr = np.frombuffer(frames, np.int16)
    return (arr if nch == 1 else arr.reshape(-1, nch)), rate


def audio_feature(samples: np.ndarray, bins: int = 16) -> np.ndarray:
    """Unit-norm per-band RMS over `bins` equal time slices — a real,
    deterministic audio feature."""
    x = np.asarray(samples, dtype=np.float32)
    if x.ndim > 1:
        x = x.mean(axis=1)
    if x.size == 0:
        return np.zeros(bins, np.float32)
    pad = (-x.size) % bins
    if pad:
        x = np.pad(x, (0, pad))
    rms = np.sqrt((x.reshape(bins, -1) ** 2).mean(axis=1))
    n = float(np.linalg.norm(rms)) or 1.0
    return (rms / n).astype(np.float32)

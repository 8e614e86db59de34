"""Multimodal column stages (image / audio / video as opaque binary).

The reference stores media as screenshots / downloaded web objects
(``pkg/crawler/web.go:163-517``, ``types.go:295-307``) with typed metadata.
Here media are ``binary`` columns + a MIME column; decode / feature-extract /
resize / frame-sample are actor-pool ``map_batches`` stages.

All four battery mimes are decoded for REAL via the pure-numpy codecs:
PNG (``thecrowler_ray.codecs``, stdlib zlib), WAV (stdlib ``wave``),
baseline JPEG (``thecrowler_ray.codecs_jpeg``, built from public ITU-T
T.81 with the Annex K tables), and MP4 (``thecrowler_ray.codecs_mp4``,
ISO-BMFF box parsing with MJPEG samples). Unknown mimes under
``DecodeStage(real_codec=True)`` fall back to the deterministic fake
unless ``strict=True`` (then they raise ``NotImplementedError`` per
row). The default ``real_codec=False`` keeps the byte-derived fake for
all mimes — that variant is SQL-recomputable, which is what the
``q_media_decode`` DuckDB oracle checks; the real-codec path is gated by
``q_media_real`` (SQL recomputes the generator's dimension/duration
formulas, Ray measures them from the actual encoded bytes).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

from ..codecs import (
    audio_feature,
    image_feature,
    png_decode,
    png_encode,
    resize_bilinear,
    wav_decode,
    wav_encode,
)
from ..codecs_jpeg import jpeg_decode, jpeg_encode
from ..codecs_mp4 import mp4_encode_mjpeg, mp4_frame_sample, mp4_info
from ..content_type import media_kind

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("doc_id", pa.string()),
        ("mime", pa.string()),
        ("payload", pa.large_binary()),
    ]
)

DECODED_FIELDS = [
    ("media_id", pa.string()),
    ("doc_id", pa.string()),
    ("mime", pa.string()),
    ("kind", pa.string()),
    ("byte_len", pa.int64()),
    ("sha256", pa.string()),
    ("width", pa.int32()),        # images/video (fake-decoded)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),  # audio/video
    ("n_frames", pa.int32()),     # video sample count (1 for images)
    ("feature", pa.list_(pa.float32(), 16)),  # unit-norm feature vector
]


class DecodeStage:
    """Actor-pool media decode / feature-extract.

    Use small ``batch_size`` (payloads are large) and
    ``batch_format='pyarrow'`` (binary columns stay zero-copy;
    pandas would box them into Python objects).
    """

    def __init__(self, real_codec: bool = False, strict: bool = False):
        self.real_codec = real_codec
        self.strict = strict

    def _decode_real(self, payload: bytes, mime: str) -> dict | None:
        """Real decode: PNG, baseline JPEG, WAV, MP4 (MJPEG samples).
        Measurements come from the decoded bytes, not trusted metadata:
        image dims from the pixel array shape, audio duration from the
        sample count, video dims from decoding the first sampled frame.
        Returns None for mimes with no codec in this container."""
        digest = hashlib.sha256(payload).digest()
        base = {
            "kind": media_kind(mime),
            "byte_len": len(payload),
            "sha256": digest.hex(),
            "width": 0,
            "height": 0,
            "duration_ms": 0,
            "n_frames": 0,
        }
        if mime == "image/png":
            img = png_decode(payload)
            base.update(
                width=img.shape[1],
                height=img.shape[0],
                n_frames=1,
                feature=image_feature(img).tolist(),
            )
            return base
        if mime == "image/jpeg":
            img = jpeg_decode(payload)
            base.update(
                width=img.shape[1],
                height=img.shape[0],
                n_frames=1,
                feature=image_feature(img).tolist(),
            )
            return base
        if mime in ("audio/wav", "audio/x-wav", "audio/wave"):
            samples, rate = wav_decode(payload)
            base.update(
                duration_ms=int(len(samples) * 1000 / max(rate, 1)),
                feature=audio_feature(samples).tolist(),
            )
            return base
        if mime == "video/mp4":
            info = mp4_info(payload)
            frames = mp4_frame_sample(payload, fps=1000.0)  # all samples
            first = jpeg_decode(frames[0][1]) if (
                frames and info["codec"] == "jpeg") else None
            base.update(
                duration_ms=info["duration_ms"],
                n_frames=info["n_samples"],
                width=first.shape[1] if first is not None else info["width"],
                height=first.shape[0] if first is not None else info["height"],
                feature=(image_feature(first).tolist() if first is not None
                         else [0.0] * 16),
            )
            return base
        return None

    @staticmethod
    def _decode_fake(payload: bytes, mime: str) -> dict:
        """Deterministic fake decode: metadata derived from payload bytes."""
        digest = hashlib.sha256(payload).digest()
        h64 = int.from_bytes(digest[:8], "big")
        kind = media_kind(mime)
        feat = (
            np.frombuffer(digest[:16] + digest[16:32], dtype=np.uint8)
            .astype(np.float32)
            .reshape(2, 16)
            .mean(axis=0)
        )
        norm = float(np.linalg.norm(feat)) or 1.0
        return {
            "kind": kind,
            "byte_len": len(payload),
            "sha256": digest.hex(),
            "width": 160 + h64 % 1920 if kind in ("image", "video") else 0,
            "height": 120 + (h64 >> 16) % 1080 if kind in ("image", "video") else 0,
            "duration_ms": (h64 >> 32) % 600_000 if kind in ("audio", "video") else 0,
            "n_frames": 0,
            "feature": (feat / norm).tolist(),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {name: [] for name, _ in DECODED_FIELDS}
        payloads = batch["payload"].to_pylist()
        mimes = batch["mime"].to_pylist()
        for i in range(len(batch)):
            d = None
            if self.real_codec:
                try:
                    d = self._decode_real(payloads[i] or b"", mimes[i])
                except (ValueError, IndexError, struct.error):
                    # corrupt payload for a known mime: strict raises,
                    # non-strict degrades to the byte-derived fake (a
                    # 100 TB crawl WILL contain truncated media; one bad
                    # row must not kill the stage)
                    if self.strict:
                        raise
                    d = None
                if d is None and self.strict:
                    raise NotImplementedError(
                        f"no codec for {mimes[i]} in this container "
                        "(wire PIL/ffmpeg here on a real cluster)"
                    )
            if d is None:
                d = self._decode_fake(payloads[i] or b"", mimes[i])
            cols["media_id"].append(batch["media_id"][i].as_py())
            cols["doc_id"].append(batch["doc_id"][i].as_py())
            cols["mime"].append(mimes[i])
            for k in ("kind", "byte_len", "sha256", "width", "height",
                      "duration_ms", "n_frames", "feature"):
                cols[k].append(d[k])
        # id columns keep the caller's types (synth media uses strings, the
        # documents-derived path carries int64 doc_ids)
        schema = pa.schema(
            [(n, batch.schema.field(n).type) if n in ("media_id", "doc_id")
             else (n, t) for n, t in DECODED_FIELDS]
        )
        return pa.Table.from_pydict(cols, schema=schema)


def resize_plan_stage(batch: pa.Table, max_side: int = 512) -> pa.Table:
    """Pure-metadata resize planning (the real resample happens in the
    decode actor on a real cluster): target dims preserving aspect ratio."""
    import pyarrow.compute as pc

    w = batch["width"].to_numpy(zero_copy_only=False).astype(np.float64)
    h = batch["height"].to_numpy(zero_copy_only=False).astype(np.float64)
    scale = np.minimum(1.0, max_side / np.maximum(np.maximum(w, h), 1.0))
    return batch.append_column(
        "target_width", pa.array((w * scale).astype(np.int32))
    ).append_column("target_height", pa.array((h * scale).astype(np.int32)))


class ResizeStage:
    """Real image resize for PNG rows: decode → bilinear resample to at most
    ``max_side`` on the long edge (aspect preserved) → re-encode. Non-PNG
    rows pass through untouched (``resized=False``). Actor-pool stage —
    use small batches; payloads dominate block size."""

    def __init__(self, max_side: int = 128):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mimes = batch["mime"].to_pylist()
        out_payloads, widths, heights, resized = [], [], [], []
        for payload, mime in zip(payloads, mimes):
            payload = payload or b""
            if mime == "image/png":
                img = png_decode(payload)
                h, w = img.shape[:2]
                scale = min(1.0, self.max_side / max(h, w, 1))
                if scale < 1.0:
                    img = resize_bilinear(
                        img, max(1, int(w * scale)), max(1, int(h * scale))
                    )
                    payload = png_encode(img)
                out_payloads.append(payload)
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                resized.append(scale < 1.0)
            else:
                out_payloads.append(payload)
                widths.append(0)
                heights.append(0)
                resized.append(False)
        cols = {n: batch[n] for n in batch.column_names if n != "payload"}
        cols["payload"] = pa.array(out_payloads, pa.large_binary())
        cols["width"] = pa.array(widths, pa.int32())
        cols["height"] = pa.array(heights, pa.int32())
        cols["resized"] = pa.array(resized, pa.bool_())
        return pa.table(cols)


def real_media_from_documents(batch: pa.Table) -> pa.Table:
    """documents rows → REAL media payloads, one per doc, mime by
    ``doc_id % 4``. Every dimension/duration below is a pure formula of
    ``doc_id`` so a DuckDB twin can recompute the *expected* metadata
    while the Ray path *measures* it from the encoded bytes — a
    round-trip gate over all four codecs (``q_media_real``):

    - PNG:  w=16+(d%13)*4, h=16+(d%11)*4, gradient pixels seeded by d
    - JPEG: same dims, 4:2:0, quality 85
    - WAV:  8 kHz mono, n=800+(d%50)*80 samples → duration 100+(d%50)*10 ms
    - MP4:  2+((d//4)%4) MJPEG frames at 4 fps, w=16+(d%5)*8,
            h=16+(d%3)*8 → duration (2+((d//4)%4))*250 ms
    """
    doc_ids = batch["doc_id"].to_pylist()
    mimes, payloads = [], []
    for d in doc_ids:
        d = int(d)
        sel = d % 4
        if sel in (0, 1):
            w, h = 16 + (d % 13) * 4, 16 + (d % 11) * 4
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack([
                (xx * 3 + d) % 256, (yy * 5 + d * 7) % 256,
                (xx + yy + d * 13) % 256,
            ], axis=2).astype(np.uint8)
            if sel == 0:
                mimes.append("image/png")
                payloads.append(png_encode(img))
            else:
                mimes.append("image/jpeg")
                payloads.append(jpeg_encode(img, quality=85))
        elif sel == 2:
            n = 800 + (d % 50) * 80
            t = np.arange(n, dtype=np.float64)
            wave_f = 110.0 + (d % 20) * 55.0
            samples = (8000 * np.sin(2 * np.pi * wave_f * t / 8000.0)
                       ).astype(np.int16)
            mimes.append("audio/wav")
            payloads.append(wav_encode(samples, rate=8000))
        else:
            w, h = 16 + (d % 5) * 8, 16 + (d % 3) * 8
            frames = []
            for i in range(2 + (d // 4) % 4):
                yy, xx = np.mgrid[0:h, 0:w]
                img = np.stack([
                    (xx * 2 + i * 40 + d) % 256, (yy * 3 + i * 17) % 256,
                    np.full_like(xx, (i * 43 + d) % 256),
                ], axis=2).astype(np.uint8)
                frames.append(jpeg_encode(img, quality=85))
            mimes.append("video/mp4")
            payloads.append(mp4_encode_mjpeg(frames, fps=4, width=w, height=h))
    return pa.table(
        {
            "media_id": pa.array([f"m{d}" for d in doc_ids], pa.string()),
            "doc_id": batch["doc_id"],
            "mime": pa.array(mimes, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
        }
    )


class FrameSampleStage:
    """REAL video frame sampling: MP4 rows → one output row per sampled
    frame (``fps`` target), payload = the extracted sample bytes (JPEG),
    dims measured by decoding the frame. Non-video rows are dropped —
    compose with a union if the pipeline needs both. Actor-pool stage;
    output rows can flow straight back through ``DecodeStage``."""

    def __init__(self, fps: float = 1.0):
        self.fps = fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "doc_id": [], "frame_idx": [], "ts_ms": [],
               "width": [], "height": [], "payload": []}
        mimes = batch["mime"].to_pylist()
        payloads = batch["payload"].to_pylist()
        for i in range(len(batch)):
            if mimes[i] != "video/mp4":
                continue
            for idx, (ts, sample) in enumerate(
                    mp4_frame_sample(payloads[i] or b"", fps=self.fps)):
                img = jpeg_decode(sample)
                out["media_id"].append(batch["media_id"][i].as_py())
                out["doc_id"].append(batch["doc_id"][i].as_py())
                out["frame_idx"].append(idx)
                out["ts_ms"].append(ts)
                out["width"].append(img.shape[1])
                out["height"].append(img.shape[0])
                out["payload"].append(sample)
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.string()),
                "doc_id": pa.array(
                    out["doc_id"],
                    batch.schema.field("doc_id").type),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "ts_ms": pa.array(out["ts_ms"], pa.int64()),
                "width": pa.array(out["width"], pa.int32()),
                "height": pa.array(out["height"], pa.int32()),
                "payload": pa.array(out["payload"], pa.large_binary()),
            }
        )


def frame_sample_plan(batch: pa.Table, fps: float = 1.0) -> pa.Table:
    """Frame-sampling plan for video rows: list of timestamps (ms)."""
    durs = batch["duration_ms"].to_pylist()
    kinds = batch["kind"].to_pylist()
    stamps = [
        list(range(0, d, int(1000 / fps))) if k == "video" and d > 0 else []
        for d, k in zip(durs, kinds)
    ]
    return batch.append_column(
        "frame_ts_ms", pa.array(stamps, pa.list_(pa.int64()))
    )


_DOC_MIMES = ["image/png", "image/jpeg", "audio/wav", "video/mp4"]


def media_from_documents(batch: pa.Table) -> pa.Table:
    """documents rows → media rows: payload = the document's UTF-8 text
    bytes, mime round-robin by ``doc_id % 4``. Deterministic and
    SQL-recomputable (sha256/byte-length arithmetic), which lets the
    multimodal decode pipeline run under the DuckDB oracle gate while
    exercising the exact binary-column plumbing a real media corpus uses."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    return pa.table(
        {
            "media_id": pa.array([f"m{d}" for d in doc_ids], pa.string()),
            "doc_id": batch["doc_id"],
            "mime": pa.array([_DOC_MIMES[int(d) % 4] for d in doc_ids], pa.string()),
            "payload": pa.array([(t or "").encode("utf-8") for t in texts],
                                pa.large_binary()),
        }
    )


class ScreenshotStage:
    """Screenshot capture + storage plumbing (reference
    ``pkg/crawler/web.go:163-517``: viewport-slice stitch → PNG → store to
    file/HTTP/S3 under a deterministic name, recording path/size on the
    page). Only the browser *paint* is faked (a deterministic layout
    rasterizer); the full capture path — scroll scripts, viewport slices,
    stitch incl. the last-slice bottom-crop, real PNG encode, storage
    dispatch — is the real implementation in
    :mod:`thecrowler_ray.screenshot` (``take_screenshot``). Swap
    ``SyntheticDriver`` for the browser webdriver hook on a live cluster,
    and pass a ``FileStorageAPI`` with a host for the HTTP/S3 backends."""

    MAGIC = b"\x89PNG\r\n\x1a\n"
    WIDTH = 256
    VIEWPORT_H = 120

    def __init__(self, out_dir: str, url_col: str = "url",
                 html_col: str = "html", max_height: int = 0,
                 storage=None, driver_factory=None):
        import os

        from ..screenshot import FileStorageAPI

        self.out_dir = out_dir
        self.url_col = url_col
        self.html_col = html_col
        self.max_height = max_height
        self.storage = storage or FileStorageAPI(path=out_dir)
        # driver_factory(html) -> webdriver; defaults to the deterministic
        # layout rasterizer — swap for the real browser hook on a cluster
        self.driver_factory = driver_factory
        if not self.storage.host:
            os.makedirs(out_dir, exist_ok=True)

    def _driver(self, html: str):
        if self.driver_factory is not None:
            return self.driver_factory(html)
        from ..screenshot import SyntheticDriver

        return SyntheticDriver(html, viewport=(self.VIEWPORT_H, self.WIDTH))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..screenshot import take_screenshot

        urls = batch[self.url_col].to_pylist()
        htmls = batch[self.html_col].to_pylist()
        paths, sizes, hashes, widths, heights = [], [], [], [], []
        for u, h in zip(urls, htmls):
            name = hashlib.sha1((u or "").encode("utf-8")).hexdigest()
            ss = take_screenshot(self._driver(h or ""), f"{name}.png",
                                 max_height=self.max_height,
                                 storage=self.storage)
            paths.append(ss.screenshot_link)
            sizes.append(ss.byte_size)
            hashes.append(ss.content_hash)
            widths.append(ss.width)
            heights.append(ss.height)
        return pa.table(
            {
                "url": batch[self.url_col],
                "screenshot_path": pa.array(paths, pa.string()),
                "byte_len": pa.array(sizes, pa.int64()),
                "sha256": pa.array(hashes, pa.string()),
                "width": pa.array(widths, pa.int64()),
                "height": pa.array(heights, pa.int64()),
            }
        )


def synth_media_table(n: int, seed: int = 5) -> pa.Table:
    """Deterministic synthetic media rows for tests/benches."""
    rng = np.random.default_rng(seed)
    mimes = ["image/png", "image/jpeg", "audio/wav", "video/mp4"]
    rows = {name: [] for name, _ in zip(MEDIA_SCHEMA.names, MEDIA_SCHEMA.types)}
    for i in range(n):
        mime = mimes[i % len(mimes)]
        payload = rng.integers(0, 256, size=64 + (i % 512), dtype=np.uint8).tobytes()
        rows["media_id"].append(f"m{seed}-{i}")
        rows["doc_id"].append(f"d{i % max(1, n // 4)}")
        rows["mime"].append(mime)
        rows["payload"].append(payload)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)

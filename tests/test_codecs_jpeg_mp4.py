"""Baseline JPEG codec (ITU T.81 Annex K tables) and ISO-BMFF MP4
muxer/demuxer: round-trips, spec edge cases, hostile inputs, and the
real-codec multimodal stages built on them."""

import numpy as np
import pyarrow as pa
import pytest

from thecrowler_ray.codecs_jpeg import (
    jpeg_decode,
    jpeg_encode,
    jpeg_info,
)
from thecrowler_ray.codecs_mp4 import (
    mp4_encode_mjpeg,
    mp4_extract_samples,
    mp4_frame_sample,
    mp4_info,
    mp4_parse,
)


def _gradient(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 3 + seed) % 256, (yy * 5 + seed * 7) % 256,
         (xx + yy + seed) % 256],
        axis=2,
    ).astype(np.uint8)


@pytest.mark.parametrize("subsample", [True, False])
@pytest.mark.parametrize("shape", [(61, 83), (8, 8), (9, 17), (1, 1)])
def test_jpeg_rgb_roundtrip(shape, subsample):
    img = _gradient(*shape, seed=sum(shape))
    enc = jpeg_encode(img, quality=92, subsample=subsample)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    assert jpeg_info(enc) == (shape[1], shape[0], 3)
    dec = jpeg_decode(enc)
    assert dec.shape == img.shape
    mae = np.abs(dec.astype(int) - img.astype(int)).mean()
    assert mae < (6.0 if subsample else 3.0), mae


def test_jpeg_gray_roundtrip():
    g = ((np.arange(40)[:, None] * np.arange(56)[None, :]) % 256).astype(
        np.uint8
    )
    enc = jpeg_encode(g, quality=90)
    assert jpeg_info(enc) == (56, 40, 1)
    dec = jpeg_decode(enc)
    assert dec.shape == g.shape
    assert np.abs(dec.astype(int) - g.astype(int)).mean() < 5.0


def test_jpeg_flat_image_lossless():
    flat = np.full((16, 24, 3), 127, np.uint8)
    assert np.abs(
        jpeg_decode(jpeg_encode(flat, quality=95)).astype(int) - 127
    ).max() == 0


def test_jpeg_restart_markers_pixel_identical():
    img = _gradient(33, 49, seed=3)
    with_rst = jpeg_encode(img, quality=85, restart_interval=3)
    without = jpeg_encode(img, quality=85)
    assert b"\xff\xd0" in with_rst  # RST0 actually emitted
    np.testing.assert_array_equal(jpeg_decode(with_rst), jpeg_decode(without))


def test_jpeg_quality_monotonic_size():
    img = _gradient(64, 64, seed=1)
    sizes = [len(jpeg_encode(img, quality=q)) for q in (10, 50, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_jpeg_hostile_inputs():
    img = _gradient(16, 16)
    enc = jpeg_encode(img)
    for bad in (b"", b"\x00" * 64, enc[:2], enc[:20]):
        with pytest.raises(ValueError):
            jpeg_decode(bad)
    # progressive marker (SOF2) is detected, not mis-decoded
    prog = bytearray(enc)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        jpeg_decode(bytes(prog))


def _mjpeg(n_frames=5, w=48, h=32, fps=2, quality=90):
    frames = [jpeg_encode(_gradient(h, w, seed=i), quality=quality)
              for i in range(n_frames)]
    return frames, mp4_encode_mjpeg(frames, fps=fps, width=w, height=h)


def test_mp4_info_and_sample_table():
    frames, mp4 = _mjpeg(n_frames=6, fps=2)
    info = mp4_info(mp4)
    assert info == {"duration_ms": 3000, "width": 48, "height": 32,
                    "codec": "jpeg", "n_samples": 6}
    parsed = mp4_parse(mp4)
    vid = parsed["tracks"][0]
    assert [s[2] for s in vid["samples"]] == [0, 500, 1000, 1500, 2000, 2500]
    assert mp4_extract_samples(mp4, list(range(6))) == frames


def test_mp4_frame_sample_decodes():
    frames, mp4 = _mjpeg(n_frames=6, fps=2)
    sampled = mp4_frame_sample(mp4, fps=1.0)
    assert [t for t, _ in sampled] == [0, 1000, 2000]
    for (ts, payload), src in zip(sampled, (frames[0], frames[2], frames[4])):
        assert payload == src
        assert jpeg_decode(payload).shape == (32, 48, 3)


def test_mp4_hostile_inputs():
    for bad in (b"", b"\x00" * 32, b"A" * 100):
        with pytest.raises(ValueError):
            mp4_parse(bad)


@pytest.mark.usefixtures("ray_session")
def test_decode_stage_real_codecs_measure_formulas():
    """DecodeStage(real_codec=True, strict=True) measures dims/durations
    from the actual bytes; they must equal the generator formulas for
    every mime — the in-process version of the q_media_real oracle."""
    from thecrowler_ray.stages.multimodal import (
        DecodeStage,
        FrameSampleStage,
        real_media_from_documents,
    )

    docs = pa.table({"doc_id": pa.array(list(range(40)), pa.int64())})
    media = real_media_from_documents(docs)
    out = DecodeStage(real_codec=True, strict=True)(media)
    for row in out.to_pylist():
        d = int(row["doc_id"])
        sel = d % 4
        if sel in (0, 1):
            assert (row["width"], row["height"]) == (
                16 + (d % 13) * 4, 16 + (d % 11) * 4)
            assert row["n_frames"] == 1 and row["duration_ms"] == 0
            assert row["kind"] == "image"
        elif sel == 2:
            assert row["duration_ms"] == 100 + (d % 50) * 10
            assert row["kind"] == "audio"
        else:
            f = 2 + (d // 4) % 4
            assert row["n_frames"] == f
            assert row["duration_ms"] == f * 250
            assert (row["width"], row["height"]) == (
                16 + (d % 5) * 8, 16 + (d % 3) * 8)
        # feature is unit-norm for decodable media
        v = np.array(row["feature"])
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5

    frames = FrameSampleStage(fps=2.0)(media)
    vids = {int(d): 2 + (int(d) // 4) % 4
            for d in docs["doc_id"].to_pylist() if int(d) % 4 == 3}
    per_media = {}
    for row in frames.to_pylist():
        per_media.setdefault(int(row["doc_id"]), []).append(row)
    assert set(per_media) == set(vids)
    for d, rows in per_media.items():
        assert len(rows) == (vids[d] + 1) // 2
        assert [r["ts_ms"] for r in rows] == [i * 500 for i in range(len(rows))]
        assert all(r["width"] == 16 + (d % 5) * 8 for r in rows)


def test_decode_stage_strict_raises_for_unknown_mime():
    from thecrowler_ray.stages.multimodal import DecodeStage

    batch = pa.table({
        "media_id": pa.array(["x"], pa.string()),
        "doc_id": pa.array(["d"], pa.string()),
        "mime": pa.array(["application/x-flif"], pa.string()),
        "payload": pa.array([b"\x00\x01"], pa.large_binary()),
    })
    with pytest.raises(NotImplementedError):
        DecodeStage(real_codec=True, strict=True)(batch)
    # non-strict falls back to the deterministic fake
    out = DecodeStage(real_codec=True, strict=False)(batch)
    assert out.num_rows == 1 and out["kind"][0].as_py() == "binary"

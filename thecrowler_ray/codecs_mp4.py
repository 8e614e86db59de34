"""Minimal ISO-BMFF (MP4) muxer/demuxer, pure stdlib + numpy.

The reference treats downloaded videos as opaque web objects with typed
metadata (``pkg/crawler/web.go:163-517``); for the multimodal pipeline we
need real container parsing — duration, dimensions, sample table — and
real frame extraction. ISO-BMFF is publicly specified (ISO/IEC 14496-12);
this module implements the box subset a progressive MP4 needs:

- ``mp4_encode_mjpeg``: one video track whose samples are baseline JPEG
  frames (sample entry ``jpeg``, the Motion-JPEG-in-MP4 layout QuickTime
  defined) — so, combined with ``codecs_jpeg``, the synthetic corpus's
  videos are *fully decodable* files, not fakes.
- ``mp4_parse`` / ``mp4_info``: walk the box tree; read mvhd/tkhd/mdhd,
  hdlr, stsd fourcc, and the full sample table (stts, stsc, stsz,
  stco/co64) into per-sample (offset, size, timestamp).
- ``mp4_extract_samples`` / ``mp4_frame_sample``: pull sample bytes by
  index / sample at a target fps.

Sample timestamps are decode order (no ctts; MJPEG has no B-frames).
"""

from __future__ import annotations

import struct

import numpy as np

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts"}


def _boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body_off = pos + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body_off = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"bad box size {size} at {pos}")
        yield tag, body_off, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, path: list[bytes]):
    """All (body_off, box_end) for a '/'-style box path."""
    if not path:
        yield start, end
        return
    for tag, body, stop in _boxes(data, start, end):
        if tag == path[0]:
            yield from _find(data, body, stop, path[1:])


def _fullbox(data: bytes, off: int) -> tuple[int, int, int]:
    version = data[off]
    flags = int.from_bytes(data[off + 1 : off + 4], "big")
    return version, flags, off + 4


def mp4_parse(data: bytes) -> dict:
    """Parse the container into a dict:
    {duration_ms, timescale, tracks: [{kind, codec, width, height,
    duration_ms, samples: [(offset, size, ts_ms), ...]}]}.
    """
    if len(data) < 16:
        raise ValueError("not an MP4 (too short)")
    top = list(_boxes(data, 0, len(data)))
    tags = {t for t, _, _ in top}
    if b"ftyp" not in tags or b"moov" not in tags:
        raise ValueError("not an MP4 (missing ftyp/moov)")
    out: dict = {"duration_ms": 0, "timescale": 1000, "tracks": []}
    moov = next((b, e) for t, b, e in top if t == b"moov")
    for body, end in [moov]:
        for tag, b, e in _boxes(data, body, end):
            if tag == b"mvhd":
                ver, _, p = _fullbox(data, b)
                if ver == 1:
                    ts, dur = struct.unpack(">IQ", data[p + 16 : p + 28])
                else:
                    ts, dur = struct.unpack(">II", data[p + 8 : p + 16])
                out["timescale"] = ts or 1000
                out["duration_ms"] = int(dur * 1000 // (ts or 1000))
            elif tag == b"trak":
                out["tracks"].append(_parse_trak(data, b, e))
    return out


def _parse_trak(data: bytes, start: int, end: int) -> dict:
    tr: dict = {"kind": "", "codec": "", "width": 0, "height": 0,
                "duration_ms": 0, "samples": []}
    mdhd_ts = 1000
    for body, stop in _find(data, start, end, [b"tkhd"]):
        ver, _, p = _fullbox(data, body)
        skip = 32 if ver == 1 else 20  # ids/times up to reserved
        p += skip + 52
        w, h = struct.unpack(">II", data[p : p + 8])
        tr["width"], tr["height"] = w >> 16, h >> 16
    for body, stop in _find(data, start, end, [b"mdia", b"mdhd"]):
        ver, _, p = _fullbox(data, body)
        if ver == 1:
            ts, dur = struct.unpack(">IQ", data[p + 16 : p + 28])
        else:
            ts, dur = struct.unpack(">II", data[p + 8 : p + 16])
        mdhd_ts = ts or 1000
        tr["duration_ms"] = int(dur * 1000 // mdhd_ts)
    for body, stop in _find(data, start, end, [b"mdia", b"hdlr"]):
        tr["kind"] = data[body + 8 : body + 12].decode("ascii", "replace")
    stbl = [b"mdia", b"minf", b"stbl"]
    for body, stop in _find(data, start, end, stbl + [b"stsd"]):
        _, _, p = _fullbox(data, body)
        (cnt,) = struct.unpack(">I", data[p : p + 4])
        if cnt:
            tr["codec"] = data[p + 8 : p + 12].decode("ascii", "replace")
            if tr["width"] == 0 and tr["kind"] == "vide":
                tr["width"], tr["height"] = struct.unpack(
                    ">HH", data[p + 36 : p + 40])
    stts: list[tuple[int, int]] = []
    for body, stop in _find(data, start, end, stbl + [b"stts"]):
        _, _, p = _fullbox(data, body)
        (cnt,) = struct.unpack(">I", data[p : p + 4])
        vals = np.frombuffer(data, ">u4", cnt * 2, p + 4).reshape(cnt, 2)
        stts = [(int(a), int(b)) for a, b in vals]
    sizes = np.array([], np.int64)
    for body, stop in _find(data, start, end, stbl + [b"stsz"]):
        _, _, p = _fullbox(data, body)
        fixed, cnt = struct.unpack(">II", data[p : p + 8])
        sizes = (np.full(cnt, fixed, np.int64) if fixed
                 else np.frombuffer(data, ">u4", cnt, p + 8).astype(np.int64))
    stsc: list[tuple[int, int]] = []
    for body, stop in _find(data, start, end, stbl + [b"stsc"]):
        _, _, p = _fullbox(data, body)
        (cnt,) = struct.unpack(">I", data[p : p + 4])
        vals = np.frombuffer(data, ">u4", cnt * 3, p + 4).reshape(cnt, 3)
        stsc = [(int(a), int(b)) for a, b, _ in vals]
    chunk_offsets = np.array([], np.int64)
    for body, stop in _find(data, start, end, stbl + [b"stco"]):
        _, _, p = _fullbox(data, body)
        (cnt,) = struct.unpack(">I", data[p : p + 4])
        chunk_offsets = np.frombuffer(data, ">u4", cnt, p + 8 - 4).astype(np.int64)
    for body, stop in _find(data, start, end, stbl + [b"co64"]):
        _, _, p = _fullbox(data, body)
        (cnt,) = struct.unpack(">I", data[p : p + 4])
        chunk_offsets = np.frombuffer(data, ">u8", cnt, p + 4).astype(np.int64)

    n = len(sizes)
    if n == 0:
        return tr
    # stsc runs -> samples-per-chunk for every chunk
    spc = np.ones(len(chunk_offsets), np.int64)
    for i, (first, per) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(chunk_offsets)
        spc[first - 1 : last] = per
    # per-sample chunk index and in-chunk position
    chunk_of = np.repeat(np.arange(len(chunk_offsets)), spc)[:n]
    within = np.arange(n) - np.concatenate(
        ([0], np.cumsum(spc)))[chunk_of]
    # offset = chunk offset + sum of earlier sample sizes in the chunk
    csum = np.concatenate(([0], np.cumsum(sizes)))
    chunk_start_sample = np.concatenate(([0], np.cumsum(spc)))[chunk_of]
    offsets = (chunk_offsets[chunk_of]
               + (csum[np.arange(n)] - csum[chunk_start_sample]))
    del within
    # stts -> per-sample decode timestamps
    deltas = np.concatenate(
        [np.full(c, d, np.int64) for c, d in stts]) if stts else np.zeros(n, np.int64)
    deltas = deltas[:n]
    ts = np.concatenate(([0], np.cumsum(deltas)))[:n]
    ts_ms = (ts * 1000) // max(mdhd_ts, 1)
    tr["samples"] = list(zip(offsets.tolist(), sizes.tolist(), ts_ms.tolist()))
    return tr


def mp4_info(data: bytes) -> dict:
    """Compact metadata: duration_ms, video width/height/codec, n_samples."""
    p = mp4_parse(data)
    vid = next((t for t in p["tracks"] if t["kind"] == "vide"), None)
    return {
        "duration_ms": p["duration_ms"],
        "width": vid["width"] if vid else 0,
        "height": vid["height"] if vid else 0,
        "codec": vid["codec"] if vid else "",
        "n_samples": len(vid["samples"]) if vid else 0,
    }


def mp4_extract_samples(data: bytes, indices: list[int]) -> list[bytes]:
    p = mp4_parse(data)
    vid = next((t for t in p["tracks"] if t["kind"] == "vide"), None)
    if vid is None:
        raise ValueError("no video track")
    out = []
    for i in indices:
        off, size, _ts = vid["samples"][i]
        out.append(data[off : off + size])
    return out


def mp4_frame_sample(data: bytes, fps: float = 1.0) -> list[tuple[int, bytes]]:
    """Sample frames at ``fps``: for each target timestamp pick the last
    sample at-or-before it. Returns [(ts_ms, sample_bytes), ...]."""
    p = mp4_parse(data)
    vid = next((t for t in p["tracks"] if t["kind"] == "vide"), None)
    if vid is None or not vid["samples"]:
        return []
    ts = np.array([s[2] for s in vid["samples"]], np.int64)
    dur = max(p["duration_ms"], int(ts[-1]) + 1)
    step = max(int(1000 / fps), 1)
    out = []
    seen = set()
    for target in range(0, dur, step):
        idx = int(np.searchsorted(ts, target, side="right")) - 1
        idx = max(idx, 0)
        if idx in seen:
            continue
        seen.add(idx)
        off, size, sts = vid["samples"][idx]
        out.append((int(sts), data[off : off + size]))
    return out


# ----------------------------------------------------------------- muxer


def _box(tag: bytes, *parts: bytes) -> bytes:
    body = b"".join(parts)
    return struct.pack(">I", 8 + len(body)) + tag + body


def _full(tag: bytes, version: int, flags: int, *parts: bytes) -> bytes:
    return _box(tag, bytes([version]) + flags.to_bytes(3, "big"),
                *parts)


_MATRIX = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def mp4_encode_mjpeg(frames: list[bytes], fps: int, width: int,
                     height: int) -> bytes:
    """JPEG frame payloads -> a valid single-track progressive MP4
    (sample entry ``jpeg``, one sample per chunk, constant frame rate)."""
    if not frames:
        raise ValueError("no frames")
    timescale = 90_000
    delta = timescale // max(fps, 1)
    n = len(frames)
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 0x200),
                b"isom", b"iso2", b"mp41")
    mdat_payload = b"".join(frames)
    mdat = struct.pack(">I", 8 + len(mdat_payload)) + b"mdat" + mdat_payload
    base = len(ftyp) + 8  # first sample offset
    offsets = []
    pos = base
    for f in frames:
        offsets.append(pos)
        pos += len(f)

    stsd_entry = (
        struct.pack(">I", 86) + b"jpeg" + b"\x00" * 6
        + struct.pack(">H", 1)              # data_reference_index
        + b"\x00" * 16                       # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)              # frame_count
        + b"\x00" * 32                       # compressorname
        + struct.pack(">Hh", 24, -1)        # depth, pre_defined
    )
    stbl = _box(
        b"stbl",
        _full(b"stsd", 0, 0, struct.pack(">I", 1), stsd_entry),
        _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta)),
        _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1)),
        _full(b"stsz", 0, 0, struct.pack(">II", 0, n),
              b"".join(struct.pack(">I", len(f)) for f in frames)),
        _full(b"stco", 0, 0, struct.pack(">I", n),
              b"".join(struct.pack(">I", o) for o in offsets)),
    )
    minf = _box(
        b"minf",
        _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0)),
        _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1),
                            _full(b"url ", 0, 1))),
        stbl,
    )
    mdia = _box(
        b"mdia",
        _full(b"mdhd", 0, 0,
              struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0)),
        _full(b"hdlr", 0, 0, struct.pack(">I", 0), b"vide",
              b"\x00" * 12, b"VideoHandler\x00"),
        minf,
    )
    tkhd = _full(
        b"tkhd", 0, 3,
        struct.pack(">IIII", 0, 0, 1, 0),       # times, track id, reserved
        struct.pack(">I", duration),
        b"\x00" * 8,
        struct.pack(">HHHH", 0, 0, 0, 0),       # layer, group, volume, rsvd
        _MATRIX,
        struct.pack(">II", width << 16, height << 16),
    )
    moov = _box(
        b"moov",
        _full(b"mvhd", 0, 0,
              struct.pack(">IIII", 0, 0, timescale, duration),
              struct.pack(">IH", 0x00010000, 0x0100), b"\x00" * 10,
              _MATRIX, b"\x00" * 24, struct.pack(">I", 2)),
        _box(b"trak", tkhd, mdia),
    )
    return ftyp + mdat + moov

"""Fingerprint family (reference ``pkg/fingerprints``): digest, rolling and
network-handshake fingerprints exposed as a registry + a vectorized stage.

The reference's ``Fingerprint`` interface is ``Compute(data string) string``
(``pkg/fingerprints/types.go``; factory ``factory.go:53``): the caller
pre-formats handshake/content data into a canonical string, the fingerprint
is a pure function of it. Parity map (each from its PUBLIC spec, validated
against the reference's documented behavior — not its code):

====================  =====================================================
kind                  computation
====================  =====================================================
ja3 / ja3s            md5 hex of the canonical JA3 string (Salesforce JA3)
hassh / hassh_server  md5 hex of the canonical HASSH string
sha256 / custom_tls   sha256 hex
blake2                BLAKE2b-256 hex (RFC 7693)
md5                   md5 hex
tlsh                  byte-histogram digest: sha256 over the 256 bucket
                      counts (mod 256), the reference's simplified TLSH
                      (``tlsh.go:44-51``) rather than full Trend Micro TLSH
murmur3_32            MurmurHash3 x86 32-bit, seed 0 (Appleby, public
                      domain), ``%x`` hex
cityhash64            Google CityHash64 v1.1 (MIT), ``%x`` hex
jarm                  JARM fuzzy hash over "c|v|alpn|ext,"×10 probe results
                      (Salesforce JARM algorithm)
ja4 / ja4s            md5 hex over the comma-joined JA4 field string
====================  =====================================================

Canonical-string builders (``ja3_string``, ``hassh_string``,
``ja4_fields_string``) turn structured handshake metadata columns into the
strings the digests consume, so a fingerprint pass over a 100 TB handshake
table is one ``map_batches`` stage.
"""

from __future__ import annotations

import hashlib

import numpy as np

# ---------------------------------------------------------------------------
# canonical-string builders (public JA3 / HASSH / JA4 field orders)
# ---------------------------------------------------------------------------


def ja3_string(version: int, ciphers, extensions, curves, point_formats) -> str:
    j = lambda xs: "-".join(str(int(x)) for x in xs)  # noqa: E731
    return f"{int(version)},{j(ciphers)},{j(extensions)},{j(curves)},{j(point_formats)}"


def hassh_string(kex, enc, mac, comp) -> str:
    j = lambda xs: ",".join(str(x) for x in xs)  # noqa: E731
    return ";".join([j(kex), j(enc), j(mac), j(comp)])


def ja4_fields_string(version: int, ciphers, extensions, groups, sigs,
                      sni: str, alpn) -> str:
    return ",".join(
        [str(int(version)), str(len(ciphers)), str(len(extensions)),
         str(len(groups)), str(len(sigs)), sni, str(len(alpn))]
    )


# ---------------------------------------------------------------------------
# digest fingerprints
# ---------------------------------------------------------------------------


def _md5(data: str) -> str:
    return hashlib.md5(data.encode("utf-8")).hexdigest()


def _sha256(data: str) -> str:
    return hashlib.sha256(data.encode("utf-8")).hexdigest()


def _blake2(data: str) -> str:
    return hashlib.blake2b(data.encode("utf-8"), digest_size=32).hexdigest()


def tlsh_digest(data: str) -> str:
    """Simplified TLSH: sha256 over the 256-bucket byte histogram (counts
    mod 256). Matches the reference's construction; full Trend Micro TLSH
    (sliding-window Pearson buckets + quartile digest) is a drop-in swap."""
    raw = data.encode("utf-8")
    buckets = np.bincount(np.frombuffer(raw, dtype=np.uint8), minlength=256)
    return hashlib.sha256((buckets % 256).astype(np.uint8).tobytes()).hexdigest()


# ---------------------------------------------------------------------------
# Full TLSH (Trend Micro locality-sensitive hash, public spec / OSS ref
# implementation semantics: 128 buckets, 5-byte sliding window, 6 Pearson
# triplet hashes per position, quartile-coded 2-bit body, T1 hex output).
# The registry's default 'tlsh' stays the reference-parity histogram
# digest; 'tlsh_full' is the real locality-sensitive construction.
# ---------------------------------------------------------------------------

_PEARSON = [
    1, 87, 49, 12, 176, 178, 102, 166, 121, 193, 6, 84, 249, 230, 44, 163,
    14, 197, 213, 181, 161, 85, 218, 80, 64, 239, 24, 226, 236, 142, 38, 200,
    110, 177, 104, 103, 141, 253, 255, 50, 77, 101, 81, 18, 45, 96, 31, 222,
    25, 107, 190, 70, 86, 237, 240, 34, 72, 242, 20, 214, 244, 227, 149, 235,
    97, 234, 57, 22, 60, 250, 82, 175, 208, 5, 127, 199, 111, 62, 135, 248,
    174, 169, 211, 58, 66, 154, 106, 195, 245, 171, 17, 187, 182, 179, 0, 243,
    132, 56, 148, 75, 128, 133, 158, 100, 130, 126, 91, 13, 153, 246, 216, 219,
    119, 68, 223, 78, 83, 88, 201, 99, 122, 11, 92, 32, 136, 114, 52, 10,
    138, 30, 48, 183, 156, 35, 61, 26, 143, 74, 251, 94, 129, 162, 63, 152,
    170, 7, 115, 167, 241, 206, 3, 150, 55, 59, 151, 220, 90, 53, 23, 131,
    125, 173, 15, 238, 79, 95, 89, 16, 105, 137, 225, 224, 217, 160, 37, 123,
    118, 73, 2, 157, 46, 116, 9, 145, 134, 228, 207, 212, 202, 215, 69, 229,
    27, 188, 67, 124, 168, 252, 42, 4, 29, 108, 21, 247, 19, 205, 39, 203,
    233, 40, 186, 147, 198, 192, 155, 33, 164, 191, 98, 204, 165, 180, 117, 76,
    140, 36, 210, 172, 41, 54, 159, 8, 185, 232, 113, 196, 231, 47, 146, 120,
    51, 65, 28, 144, 254, 221, 93, 189, 194, 139, 112, 43, 71, 109, 184, 209,
]


def _b_mapping(salt: int, i: int, j: int, k: int) -> int:
    t = _PEARSON
    h = t[salt ^ i]
    h = t[h ^ j]
    h = t[h ^ k]
    return h


_LOG_1_5 = 0.4054651
_LOG_1_3 = 0.26236426
_LOG_1_1 = 0.095310180


def _l_capturing(n: int) -> int:
    import math

    if n <= 656:
        i = math.floor(math.log(max(n, 1)) / _LOG_1_5)
    elif n <= 3199:
        i = math.floor(math.log(n) / _LOG_1_3 - 8.72777)
    else:
        i = math.floor(math.log(n) / _LOG_1_1 - 62.5472)
    return i & 0xFF


def _swap_nibbles(b: int) -> int:
    return ((b & 0x0F) << 4) | ((b & 0xF0) >> 4)


def tlsh_full(data: str | bytes, *, min_len: int = 50) -> str:
    """Full 128-bucket TLSH per the public construction. Returns the
    'T1'-prefixed 70-hex digest, or '' when the input is shorter than the
    spec's minimum (TLSH is undefined for tiny inputs)."""
    raw = data.encode("utf-8") if isinstance(data, str) else bytes(data)
    n = len(raw)
    if n < min_len:
        return ""
    buckets = [0] * 256
    checksum = 0
    for i in range(n - 4):
        w = raw[i : i + 5]
        # window bytes ordered newest-first like the reference sliding window
        b4, b3, b2, b1, b0 = w[0], w[1], w[2], w[3], w[4]
        checksum = _b_mapping(0, b0, b1, checksum)
        buckets[_b_mapping(2, b0, b1, b2)] += 1
        buckets[_b_mapping(3, b0, b1, b3)] += 1
        buckets[_b_mapping(5, b0, b2, b3)] += 1
        buckets[_b_mapping(7, b0, b2, b4)] += 1
        buckets[_b_mapping(11, b0, b1, b4)] += 1
        buckets[_b_mapping(13, b0, b3, b4)] += 1
    cnt = sorted(buckets[:128])
    q1, q2, q3 = cnt[31], cnt[63], cnt[95]
    if q3 == 0:
        return ""
    header = [
        _swap_nibbles(checksum),
        _swap_nibbles(_l_capturing(n)),
        _swap_nibbles(((q1 * 100 // q3) % 16) << 4 | ((q2 * 100 // q3) % 16)),
    ]
    body = []
    for i in range(31, -1, -1):  # reversed bucket quads, spec output order
        byte = 0
        for j in range(4):
            b = buckets[i * 4 + j]
            if b <= q1:
                code = 0
            elif b <= q2:
                code = 1
            elif b <= q3:
                code = 2
            else:
                code = 3
            byte |= code << (j * 2)
        body.append(byte)
    return "T1" + bytes(header + body).hex().upper()


def tlsh_distance(a: str, b: str) -> int:
    """Approximate TLSH diff: hamming-style distance over the body's 2-bit
    codes plus header byte deltas (monotone in the official diff — used for
    near-dup thresholding, not score-compatible with the official tool)."""
    if not a or not b or len(a) != len(b):
        return 9999
    da, db = bytes.fromhex(a[2:]), bytes.fromhex(b[2:])
    dist = 0
    for x, y in zip(da[3:], db[3:]):
        for shift in (0, 2, 4, 6):
            ca, cb = (x >> shift) & 3, (y >> shift) & 3
            d = abs(ca - cb)
            dist += 6 if d == 3 else d
    dist += abs(da[1] - db[1]) % 256  # length bucket delta
    return dist


# ---------------------------------------------------------------------------
# MurmurHash3 x86 32-bit (Austin Appleby, public domain)
# ---------------------------------------------------------------------------

_M32 = 0xFFFFFFFF


def murmur3_32(data: bytes, seed: int = 0) -> int:
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _M32
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * c1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * c2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[nblocks * 4 :]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * c2) & _M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h


# ---------------------------------------------------------------------------
# CityHash64 v1.1 (Google, MIT) — from the published algorithm
# ---------------------------------------------------------------------------

_M64 = 0xFFFFFFFFFFFFFFFF
_K0 = 0xC3A5C85C97CB3127
_K1 = 0xB492B66FBE98F273
_K2 = 0x9AE16A3B2F90404F
_KMUL = 0x9DDFEA08EB382D69


def _f64(b: bytes, i: int) -> int:
    return int.from_bytes(b[i : i + 8], "little")


def _f32(b: bytes, i: int) -> int:
    return int.from_bytes(b[i : i + 4], "little")


def _rotr(v: int, s: int) -> int:
    return ((v >> s) | (v << (64 - s))) & _M64 if s else v


def _shift_mix(v: int) -> int:
    return (v ^ (v >> 47)) & _M64


def _bswap64(v: int) -> int:
    return int.from_bytes(v.to_bytes(8, "little"), "big")


def _h128to64(u: int, v: int, mul: int = _KMUL) -> int:
    a = ((u ^ v) * mul) & _M64
    a ^= a >> 47
    b = ((v ^ a) * mul) & _M64
    b ^= b >> 47
    return (b * mul) & _M64


def _hash0to16(s: bytes) -> int:
    n = len(s)
    if n >= 8:
        mul = (_K2 + n * 2) & _M64
        a = (_f64(s, 0) + _K2) & _M64
        b = _f64(s, n - 8)
        c = (_rotr(b, 37) * mul + a) & _M64
        d = ((_rotr(a, 25) + b) * mul) & _M64
        return _h128to64(c, d, mul)
    if n >= 4:
        mul = (_K2 + n * 2) & _M64
        a = _f32(s, 0)
        return _h128to64((n + (a << 3)) & _M64, _f32(s, n - 4), mul)
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = (a + (b << 8)) & _M64
        z = (n + (c << 2)) & _M64
        return (_shift_mix((y * _K2) & _M64 ^ (z * _K0) & _M64) * _K2) & _M64
    return _K2


def _hash17to32(s: bytes) -> int:
    n = len(s)
    mul = (_K2 + n * 2) & _M64
    a = (_f64(s, 0) * _K1) & _M64
    b = _f64(s, 8)
    c = (_f64(s, n - 8) * mul) & _M64
    d = (_f64(s, n - 16) * _K2) & _M64
    return _h128to64(
        (_rotr((a + b) & _M64, 43) + _rotr(c, 30) + d) & _M64,
        (a + _rotr((b + _K2) & _M64, 18) + c) & _M64,
        mul,
    )


def _hash33to64(s: bytes) -> int:
    n = len(s)
    mul = (_K2 + n * 2) & _M64
    a = (_f64(s, 0) * _K2) & _M64
    b = _f64(s, 8)
    c = _f64(s, n - 24)
    d = _f64(s, n - 32)
    e = (_f64(s, 16) * _K2) & _M64
    f = (_f64(s, 24) * 9) & _M64
    g = _f64(s, n - 8)
    h = (_f64(s, n - 16) * mul) & _M64
    u = (_rotr((a + g) & _M64, 43) + ((_rotr(b, 30) + c) & _M64) * 9) & _M64
    v = (((a + g) ^ d) + f + 1) & _M64
    w = (_bswap64(((u + v) & _M64) * mul & _M64) + h) & _M64
    x = (_rotr((e + f) & _M64, 42) + c) & _M64
    y = ((_bswap64(((v + w) & _M64) * mul & _M64) + g) * mul) & _M64
    z = (e + f + c) & _M64
    a = (_bswap64(((x + z) & _M64) * mul + y & _M64) + b) & _M64
    b = (_shift_mix(((z + a) & _M64) * mul + d + h & _M64) * mul) & _M64
    return (b + x) & _M64


def _weak32seeds(s: bytes, i: int, a: int, b: int) -> tuple[int, int]:
    w, x, y, z = _f64(s, i), _f64(s, i + 8), _f64(s, i + 16), _f64(s, i + 24)
    a = (a + w) & _M64
    b = _rotr((b + a + z) & _M64, 21)
    c = a
    a = (a + x + y) & _M64
    b = (b + _rotr(a, 44)) & _M64
    return (a + z) & _M64, (b + c) & _M64


def cityhash64(data: bytes) -> int:
    n = len(data)
    if n <= 16:
        return _hash0to16(data)
    if n <= 32:
        return _hash17to32(data)
    if n <= 64:
        return _hash33to64(data)
    s = data
    x = _f64(s, n - 40)
    y = (_f64(s, n - 16) + _f64(s, n - 56)) & _M64
    z = _h128to64((_f64(s, n - 48) + n) & _M64, _f64(s, n - 24))
    v = _weak32seeds(s, n - 64, n, z)
    w = _weak32seeds(s, n - 32, (y + _K1) & _M64, x)
    x = (x * _K1 + _f64(s, 0)) & _M64
    pos = 0
    remaining = (n - 1) & ~63
    while remaining > 0:
        x = (_rotr((x + y + v[0] + _f64(s, pos + 8)) & _M64, 37) * _K1) & _M64
        y = (_rotr((y + v[1] + _f64(s, pos + 48)) & _M64, 42) * _K1) & _M64
        x ^= w[1]
        y = (y + v[0] + _f64(s, pos + 40)) & _M64
        z = (_rotr((z + w[0]) & _M64, 33) * _K1) & _M64
        v = _weak32seeds(s, pos, (v[1] * _K1) & _M64, (x + w[0]) & _M64)
        w = _weak32seeds(s, pos + 32, (z + w[1]) & _M64, (y + _f64(s, pos + 16)) & _M64)
        z, x = x, z
        pos += 64
        remaining -= 64
    return _h128to64(
        (_h128to64(v[0], w[0]) + ((_shift_mix(y) * _K1) & _M64) + z) & _M64,
        (_h128to64(v[1], w[1]) + x) & _M64,
    )


# ---------------------------------------------------------------------------
# JARM fuzzy hash (Salesforce JARM algorithm)
# ---------------------------------------------------------------------------

_JARM_CIPHERS = [
    "0004", "0005", "0007", "000a", "0016", "002f", "0033", "0035", "0039",
    "003c", "003d", "0041", "0045", "0067", "006b", "0084", "0088", "009a",
    "009c", "009d", "009e", "009f", "00ba", "00be", "00c0", "00c4", "c007",
    "c008", "c009", "c00a", "c011", "c012", "c013", "c014", "c023", "c024",
    "c027", "c028", "c02b", "c02c", "c02f", "c030", "c060", "c061", "c072",
    "c073", "c076", "c077", "c09c", "c09d", "c09e", "c09f", "c0a0", "c0a1",
    "c0a2", "c0a3", "c0ac", "c0ad", "c0ae", "c0af", "cc13", "cc14", "cca8",
    "cca9", "1301", "1302", "1303", "1304", "1305",
]


def _jarm_cipher_byte(cipher: str) -> str:
    if not cipher:
        return "00"
    try:
        idx = _JARM_CIPHERS.index(cipher) + 1
    except ValueError:
        idx = len(_JARM_CIPHERS) + 1
    return f"{idx:02x}"


def _jarm_version_byte(version: str) -> str:
    if not version:
        return "0"
    count = ord(version[-1]) - ord("0")
    options = "abcdef"
    if 0 <= count < len(options):
        return options[count]
    return "0"


def jarm_hash(jarm_raw: str) -> str:
    """10 probe results "cipher|version|alpn|extensions" comma-joined →
    62-char JARM fuzzy hash."""
    if jarm_raw == ",".join(["|||"] * 10):
        return "0" * 62
    fuzzy = []
    alpns_exts = []
    for handshake in jarm_raw.split(","):
        parts = (handshake.split("|") + ["", "", "", ""])[:4]
        fuzzy.append(_jarm_cipher_byte(parts[0]))
        fuzzy.append(_jarm_version_byte(parts[1]))
        alpns_exts.append(parts[2])
        alpns_exts.append(parts[3])
    tail = hashlib.sha256("".join(alpns_exts).encode("utf-8")).hexdigest()[:32]
    return "".join(fuzzy) + tail


# ---------------------------------------------------------------------------
# registry + vectorized stage
# ---------------------------------------------------------------------------

FINGERPRINTS = {
    "ja3": _md5,
    "ja3s": _md5,
    "hassh": _md5,
    "hassh_server": _md5,
    "sha256": _sha256,
    "custom_tls": _sha256,
    "blake2": _blake2,
    "md5": _md5,
    "tlsh": tlsh_digest,
    "tlsh_full": tlsh_full,
    "murmur3_32": lambda s: format(murmur3_32(s.encode("utf-8")), "x"),
    "cityhash64": lambda s: format(cityhash64(s.encode("utf-8")), "x"),
    "jarm": jarm_hash,
    "ja4": _md5,
    "ja4s": _md5,
}


def compute_fingerprint(kind: str, data: str) -> str:
    """Reference FingerprintFactory analog: kind → Compute(data)."""
    try:
        fn = FINGERPRINTS[kind.strip().lower()]
    except KeyError:
        raise ValueError(f"unknown fingerprint type: {kind!r}") from None
    return fn(data or "")


class FingerprintStage:
    """map_batches stage: append one column per requested fingerprint kind,
    computed over ``text_col``. State (the resolved fn list) binds once per
    actor."""

    def __init__(self, kinds: list[str], text_col: str = "text"):
        self.kinds = [k.strip().lower() for k in kinds]
        self.fns = [FINGERPRINTS[k] for k in self.kinds]
        self.text_col = text_col

    def __call__(self, batch):
        import pandas as pd

        texts = batch[self.text_col].fillna("")
        for kind, fn in zip(self.kinds, self.fns):
            batch[f"fp_{kind}"] = pd.Series(
                [fn(t) for t in texts], index=batch.index
            )
        return batch

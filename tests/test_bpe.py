"""Byte-level BPE (stages/bpe.py): hand-computed merge pins, lossless
roundtrip, determinism, and the distributed-vs-local encode parity."""

import hashlib

import pandas as pd
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from thecrowler_ray.stages.bpe import (
    BpeModel,
    bpe_roundtrip_records,
    decode_doc,
    encode_doc,
    train_bpe,
    train_bpe_from_counts,
)


def test_merge_sequence_hand_computed():
    # corpus: "abab" ×10, "abc" ×5  (byte pairs)
    # pair counts: (a,b)=25, (b,a)=10, (b,c)=5 → merge 1 = (a,b)
    # then: (ab,ab)=10, (ab,c)=5 → merge 2 = (ab,ab)
    # then: (abab: done as single sym), (ab,c)=5 → merge 3 = (ab,c)
    merges = train_bpe_from_counts(
        [("abab", 10), ("abc", 5)], n_merges=3, min_count=1
    )
    assert merges == [(b"a", b"b"), (b"ab", b"ab"), (b"ab", b"c")]


def test_tie_break_is_bytewise_smallest():
    # "xy" and "ab" both appear 7 times → (a,b) < (x,y) wins first
    merges = train_bpe_from_counts(
        [("xy", 7), ("ab", 7)], n_merges=2, min_count=1
    )
    assert merges[0] == (b"a", b"b")
    assert merges[1] == (b"x", b"y")


def test_min_count_stops_training():
    merges = train_bpe_from_counts([("ab", 1)], n_merges=5, min_count=2)
    assert merges == []


def test_encode_word_uses_rank_order():
    model = BpeModel([(b"a", b"b"), (b"ab", b"c")])
    ids = model.encode_word("abc")
    assert [model.id_to_token[i] for i in ids] == [b"abc"]
    # unknown bytes fall back to the base alphabet
    ids = model.encode_word("zq")
    assert [model.id_to_token[i] for i in ids] == [b"z", b"q"]


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=80))
def test_roundtrip_is_normalized_text(text):
    model = BpeModel([(b"a", b"b"), (b"th", b"e")])
    # encode_doc/decode_doc roundtrip == whitespace-normalized lowercase
    want = " ".join((text or "").lower().split())
    assert decode_doc(model, encode_doc(model, text)) == want


def test_trained_roundtrip_and_compression(ray_session):
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "the cat sat on the mat the cat",
                "the the the the",
                "",
            ],
        }
    )
    model = train_bpe(rd.from_pandas(docs), n_merges=32, min_count=2)
    assert model.vocab_size > 256  # it actually learned merges
    cache: dict = {}
    for t in docs["text"]:
        ids = encode_doc(model, t, cache)
        want = " ".join(t.lower().split())
        assert decode_doc(model, ids) == want
        # learned merges must compress below raw byte count
        if t:
            assert len(ids) < len(want.encode())


def test_records_oracle_columns(ray_session):
    docs = pd.DataFrame(
        {"doc_id": [0, 1], "text": ["aa bb aa bb aa", "  aa   bb "]}
    )
    got = (
        bpe_roundtrip_records(rd.from_pandas(docs), n_merges=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, r in got.iterrows():
        norm = " ".join(docs.loc[r["doc_id"], "text"].lower().split())
        assert r["roundtrip_md5"] == hashlib.md5(norm.encode()).hexdigest()
        assert r["n_bytes"] == len(norm.encode())
        assert r["n_tokens"] <= max(1, r["n_bytes"])


def test_training_is_deterministic(ray_session):
    docs = pd.DataFrame(
        {"doc_id": range(6),
         "text": ["spark window merge spark"] * 3 + ["table scan row"] * 3}
    )
    m1 = train_bpe(rd.from_pandas(docs), n_merges=16, min_count=1)
    m2 = train_bpe(rd.from_pandas(docs), n_merges=16, min_count=1)
    assert m1.merges == m2.merges


def test_bpe_token_shards(ray_session, tmp_path):
    """The token-shard writer's learned-tokenizer seam: shards written
    with a BpeModel decode losslessly per doc boundary-free stream and
    the index records the BPE vocab."""
    from thecrowler_ray.pipelines.token_shards import write_token_shards
    import numpy as np
    import os
    import ray.data

    sf = "/root/testdata/sf0.001"
    docs = ray.data.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id", "text"])
    model = train_bpe(docs, n_merges=64)
    out = str(tmp_path / "bpe_shards")
    idx = write_token_shards(sf, out, bpe_model=model)
    assert idx["tokenizer"] == "bpe"
    assert idx["vocab_size"] == model.vocab_size
    assert idx["shards"]
    for name, entry in idx["shards"].items():
        ids = np.frombuffer(
            open(os.path.join(out, name), "rb").read(), dtype="<u4")
        assert len(ids) == entry["n_tokens"]
        assert (ids < model.vocab_size).all()
        # every id decodes to a known token; the stream is valid UTF-8
        decode_doc(model, ids)


def test_model_json_roundtrip():
    from thecrowler_ray.stages.bpe import model_from_json, model_to_json

    m = BpeModel([(b"a", b"b"), (b"ab", b"\xc3\xa9")])  # non-ASCII bytes
    m2 = model_from_json(model_to_json(m))
    assert m2.merges == m.merges
    assert m2.token_to_id == m.token_to_id
    import pytest as _pytest
    with _pytest.raises(ValueError):
        model_from_json({"format": "nope"})


def test_shards_persist_model(ray_session, tmp_path):
    from thecrowler_ray.pipelines.token_shards import write_token_shards
    from thecrowler_ray.stages.bpe import model_from_json
    import json
    import os
    import ray.data

    sf = "/root/testdata/sf0.001"
    docs = ray.data.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id", "text"])
    model = train_bpe(docs, n_merges=32)
    out = str(tmp_path / "shards_m")
    idx = write_token_shards(sf, out, bpe_model=model)
    loaded = model_from_json(
        json.load(open(os.path.join(out, idx["bpe_model"]))))
    assert loaded.merges == model.merges
    # a loader can decode the shards with the persisted model alone
    assert decode_doc(loaded, encode_doc(loaded, "the cat")) == "the cat"

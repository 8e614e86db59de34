"""Winnowing fingerprints (stages/winnow.py): brute-force oracle, the
detection guarantee, density, boilerplate cap."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from thecrowler_ray.stages.winnow import (
    _doc_fingerprints,
    winnow_fingerprints,
    winnow_pairs,
)


def _brute(text, k, w):
    toks = (text or "").lower().split()
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    grams = [" ".join(toks[i:i + k])
             for i in range(len(toks) - k + 1)]
    h = [hashlib.md5(g.encode()).hexdigest()[:16] for g in grams]
    n = len(h)
    width = min(w, n)
    sel = set()
    for s in range(n - width + 1):
        window = h[s:s + width]
        m = min(window)
        # rightmost minimal position
        p = s + max(i for i, v in enumerate(window) if v == m)
        sel.add((p, h[p]))
    return sorted(sel)


WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lam mu nu xi omicron pi rho sigma tau upsilon").split()


def _text(rng, n):
    return " ".join(rng.choice(WORDS) for _ in range(n))


class TestFingerprints:
    def test_matches_brute(self, ray_session):
        rng = np.random.RandomState(17)
        for n in (1, 4, 5, 6, 9, 40, 200):
            t = _text(rng, n)
            assert _doc_fingerprints(t, 5, 4) == _brute(t, 5, 4), n

    def test_stage_explodes_rows(self, ray_session):
        docs = pd.DataFrame({
            "doc_id": [1, 2],
            "text": ["a b c d e f g h", ""]})
        got = (winnow_fingerprints(rd.from_pandas(docs))
               .to_pandas().sort_values(["doc_id", "pos"]))
        for did, text in docs.itertuples(index=False):
            rows = got[got["doc_id"] == did]
            assert ([tuple(r) for r in
                     rows[["pos", "fp"]].itertuples(index=False)]
                    == _brute(text, 5, 4))

    def test_density(self, ray_session):
        # expected selected fraction ~= 2/(w+1); allow generous slack
        rng = np.random.RandomState(23)
        t = _text(rng, 2000)
        sel = _doc_fingerprints(t, 5, 4)
        frac = len(sel) / (2000 - 4)
        assert 0.2 < frac < 0.6

    def test_detection_guarantee(self, ray_session):
        # any shared run of >= w + k - 1 = 8 tokens must be detected
        rng = np.random.RandomState(29)
        shared = _text(rng, 8)
        a = _text(rng, 60) + " " + shared + " " + _text(rng, 60)
        b = _text(rng, 60) + " " + shared + " " + _text(rng, 60)
        fa = {f for _, f in _doc_fingerprints(a, 5, 4)}
        fb = {f for _, f in _doc_fingerprints(b, 5, 4)}
        assert fa & fb


class TestPairs:
    def test_shared_counts(self, ray_session):
        rng = np.random.RandomState(31)
        shared = _text(rng, 30)
        docs = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": [shared + " " + _text(rng, 40),
                     shared + " " + _text(rng, 40),
                     _text(rng, 70)]})
        got = winnow_pairs(rd.from_pandas(docs),
                           min_shared=1).to_pandas()
        pairs = {(int(a), int(b)): int(s) for a, b, s in
                 got.itertuples(index=False)}
        assert (1, 2) in pairs
        # the 30-token shared prefix must dominate any chance overlap
        others = [v for k_, v in pairs.items() if k_ != (1, 2)]
        assert all(pairs[(1, 2)] > v for v in others) or not others

    def test_boilerplate_cap(self, ray_session):
        # a fingerprint shared by every doc is dropped at the cap
        docs = pd.DataFrame({
            "doc_id": list(range(6)),
            "text": ["common one two three four five"] * 6})
        got = winnow_pairs(rd.from_pandas(docs), min_shared=1,
                           max_docs_per_hash=5).to_pandas()
        assert len(got) == 0

"""Training-data operators added in round 3: as-of join (ops/asof.py),
PII redaction (stages/pii.py), intra-doc line dedup (text_analysis).

The as-of join is pinned to ``pandas.merge_asof`` (the public oracle for
as-of semantics) under randomized keys/timestamps, all four
direction×equality modes, plus the degenerate shapes (right-only keys,
left-only keys, empty right)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def _random_frames(seed: int, n_left=120, n_right=90, n_keys=7):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_left),
        "ts": rng.choice(np.arange(0, 10_000, 3), n_left, replace=False).astype("int64"),
        "lv": rng.integers(0, 100, n_left).astype("int64"),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, n_keys + 2, n_right),  # some right-only keys
        "ts": rng.choice(np.arange(1, 10_000, 2), n_right, replace=False).astype("int64"),
        "rv": rng.integers(0, 100, n_right).astype("int64"),
    })
    return left, right


def _oracle(left, right, direction, allow_equal):
    ls = left.sort_values("ts").reset_index(drop=True)
    rs = right.sort_values("ts").reset_index(drop=True)
    return pd.merge_asof(
        ls, rs.rename(columns={"ts": "ts_r", "rv": "rv_r"}),
        left_on="ts", right_on="ts_r", by="k",
        direction=direction, allow_exact_matches=allow_equal,
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("allow_equal", [True, False])
@pytest.mark.parametrize("seed", [0, 1])
def test_asof_join_matches_merge_asof(ray_session, direction, allow_equal, seed):
    from thecrowler_ray.ops.asof import asof_join

    left, right = _random_frames(seed)
    got = asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        by="k", on="ts", direction=direction, allow_equal=allow_equal,
        suffix="_r",
    ).to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    exp = _oracle(left, right, direction, allow_equal) \
        .sort_values(["k", "ts"]).reset_index(drop=True)
    assert len(got) == len(left)
    assert got["ts"].tolist() == exp["ts"].tolist()
    assert got["ts_r"].astype("float64").fillna(-1).tolist() == \
        exp["ts_r"].astype("float64").fillna(-1).tolist()
    # "rv" does not collide with a left column, so it keeps its name
    assert pd.to_numeric(got["rv"]).fillna(-1).tolist() == \
        exp["rv_r"].astype("float64").fillna(-1).tolist()


def test_asof_join_empty_right_and_collisions(ray_session):
    from thecrowler_ray.ops.asof import asof_join

    left = pd.DataFrame({"k": [1, 1, 2], "ts": [5, 9, 3],
                         "v": [10, 20, 30]})
    # right shares column name "v" -> suffix applies
    right = pd.DataFrame({"k": [1], "ts": [6], "v": [99]})
    out = asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        by="k", on="ts", suffix="_r",
    ).to_pandas().sort_values("ts").reset_index(drop=True)
    assert list(out.columns) == ["k", "ts", "v", "ts_r", "v_r"]
    by_ts = out.set_index("ts")
    assert pd.isna(by_ts.loc[5, "v_r"]) and pd.isna(by_ts.loc[3, "v_r"])
    assert by_ts.loc[9, "v_r"] == 99 and by_ts.loc[9, "v"] == 20


def test_pii_stage_vectors(ray_session):
    from thecrowler_ray.stages.pii import pii_stage

    t = pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            "mail a.b+c@x-y.co.uk now phone +1 555 013 0042 done",
            "ssn 123-45-6789 vs ip 10.0.200.7 plain 1.2.3 nope",
            "no pii here at all",
        ],
    })
    out = pii_stage(t)
    assert out["n_email"].to_pylist() == [1, 0, 0]
    assert out["n_phone"].to_pylist() == [1, 0, 0]
    assert out["n_ssn"].to_pylist() == [0, 1, 0]
    assert out["n_ip"].to_pylist() == [0, 1, 0]  # 1.2.3 is not an IPv4
    red = out["redacted"].to_pylist()
    assert red[0] == "mail <EMAIL> now phone <PHONE> done"
    assert red[1] == "ssn <SSN> vs ip <IP> plain 1.2.3 nope"
    assert red[2] == "no pii here at all"


def test_pii_redaction_order_ssn_before_phone(ray_session):
    # an SSN must become <SSN>, never be half-eaten by the phone pattern
    from thecrowler_ray.stages.pii import pii_stage

    out = pii_stage(pa.table({"text": ["call 12 345 678 9012 ssn 111-22-3333"]}))
    assert "<SSN>" in out["redacted"][0].as_py()
    assert "<PHONE>" in out["redacted"][0].as_py()


def test_line_dedup_first_win(ray_session):
    from thecrowler_ray.stages.text_analysis import line_dedup_stage

    words = ["w%d" % i for i in range(12)]
    text = " ".join(words)           # 2 lines of 6
    doubled = text + " " + text      # lines repeat exactly (12 % 6 == 0)
    df = pd.DataFrame({"doc_id": [1], "text": [doubled]})
    out = line_dedup_stage(df.copy())
    assert out.loc[0, "n_lines"] == 4
    assert out.loc[0, "n_distinct_lines"] == 2
    assert out.loc[0, "dup_line_ratio"] == 0.5
    expect = hashlib.md5(
        ("\n".join([" ".join(words[:6]), " ".join(words[6:])])).encode()
    ).hexdigest()
    assert out.loc[0, "dedup_md5"] == expect


# ---------------------------------------------------------------------------
# corpus-GLOBAL line dedup (stages/dedup.py:global_line_dedup)
# ---------------------------------------------------------------------------


def _gld_oracle(docs: list[tuple[int, str]], line_words=3):
    """Pure-Python oracle: first (doc_id, line_no) occurrence of each
    distinct line corpus-wide wins."""
    seen: set[str] = set()
    out = {}
    for doc_id, text in sorted(docs):
        words = text.split(" ") if text else []
        lines = [" ".join(words[i:i + line_words])
                 for i in range(0, len(words), line_words)]
        kept = []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        out[doc_id] = (len(lines), len(kept),
                       hashlib.md5("\n".join(kept).encode()).hexdigest())
    return out


def _gld_docs(seed=0, n_docs=40, vocab=14, n_words=24):
    rng = np.random.default_rng(seed)
    docs = []
    for d in range(n_docs):
        words = [f"w{int(v)}" for v in rng.integers(0, vocab, n_words)]
        docs.append((d, " ".join(words)))
    docs.append((n_docs, ""))           # empty doc
    docs.append((n_docs + 1, "w0 w1"))  # single short line
    return docs


@pytest.mark.parametrize("threshold", [2_000_000, 0])
def test_global_line_dedup_both_paths(ray_session, threshold):
    from thecrowler_ray.stages.dedup import global_line_dedup

    docs = _gld_docs()
    oracle = _gld_oracle(docs, line_words=3)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [d for d, _ in docs], "text": [t for _, t in docs]}))
    out = global_line_dedup(ds, line_words=3,
                            broadcast_threshold=threshold).to_pandas()
    assert len(out) == len(docs)
    for _, r in out.iterrows():
        nl, nk, md = oracle[int(r["doc_id"])]
        assert (int(r["n_lines"]), int(r["n_kept"])) == (nl, nk), r["doc_id"]
        assert r["kept_md5"] == md
        assert abs(r["dup_line_ratio"]
                   - round((nl - nk) / max(nl, 1), 6)) < 1e-12
    # the corpus must actually contain cross-doc duplicates for this test
    # to exercise the global half
    assert (out["n_kept"] < out["n_lines"]).any()


def test_global_line_dedup_all_lines_lost(ray_session):
    """A doc whose every line was seen earlier keeps nothing: md5('')."""
    from thecrowler_ray.stages.dedup import global_line_dedup

    docs = [(1, "a b c d e f"), (2, "a b c d e f")]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [d for d, _ in docs], "text": [t for _, t in docs]}))
    out = (global_line_dedup(ds, line_words=3)
           .to_pandas().set_index("doc_id"))
    assert out.loc[2, "n_kept"] == 0
    assert out.loc[2, "kept_md5"] == hashlib.md5(b"").hexdigest()
    assert out.loc[1, "n_kept"] == 2

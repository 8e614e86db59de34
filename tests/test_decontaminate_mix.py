"""Decontamination (stages/decontaminate.py) + mixture sampling
(q_data_mix allocation)."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data

from thecrowler_ray.pipelines.queries import data_mix_allocation
from thecrowler_ray.stages.decontaminate import (
    benchmark_ngram_set,
    decontaminate_stage,
)


def test_decontaminate_hits_and_misses(ray_session):
    bench = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [0],
        "text": ["the quick brown fox jumps over the lazy dog"],
    }))
    probe = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [10, 11, 12],
        "text": [
            # contains benchmark 5-gram "quick brown fox jumps over" (×2
            # positions but ONE distinct gram)
            "a quick brown fox jumps over b quick brown fox jumps over c",
            "totally different words in this one here now",
            "tiny",  # shorter than n → 0 grams
        ],
    }))
    ref = benchmark_ngram_set(bench, n=5)
    out = probe.map_batches(
        decontaminate_stage(ref, n=5), batch_format="pandas"
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # "quick brown fox jumps over" occurs at two positions but is ONE
    # distinct benchmark gram
    assert out["n_hits"].tolist() == [1, 0, 0]
    assert out["contaminated"].tolist() == [1, 0, 0]
    assert out.loc[2, "n_grams"] == 0


def test_decontaminate_case_insensitive(ray_session):
    bench = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [0], "text": ["Alpha Beta Gamma Delta Eps"]}))
    probe = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1], "text": ["alpha beta gamma delta eps"]}))
    ref = benchmark_ngram_set(bench, n=5)
    out = probe.map_batches(
        decontaminate_stage(ref, n=5), batch_format="pandas").to_pandas()
    assert out.loc[0, "contaminated"] == 1


@pytest.mark.parametrize("budget", [1, 20, 200, 777])
def test_data_mix_allocation_largest_remainder(budget):
    alloc = data_mix_allocation(budget)
    assert sum(alloc.values()) == budget
    assert all(v >= 0 for v in alloc.values())
    # monotone-ish in weight: src19 (heaviest) never gets less than src0
    assert alloc["src19"] >= alloc["src0"]
    # exact check at the default: quota src_i = budget*(i+1)/210
    if budget == 200:
        assert alloc["src19"] == 19  # 200*20/210 = 19.047 → floor 19
        assert alloc["src0"] == 1    # 0.95 → large remainder → +1


def test_source_overlap_matrix(ray_session, tmp_path):
    """q_source_overlap on a corpus with engineered cross-source dups
    (the sf0.01 table has none — a 0-row oracle match alone is weak)."""
    import pandas as pd
    import pyarrow.parquet as pq
    import pyarrow as pa

    from thecrowler_ray.pipelines.queries import q_source_overlap

    df = pd.DataFrame({
        "doc_id": range(8),
        "text": ["dup one", "dup one", "dup one",     # src0, src1, src2
                 "dup two", "dup two",                 # src0, src1
                 "uniq a", "uniq b", None],            # no pairs
        "source": ["src0", "src1", "src2", "src0", "src1",
                   "src0", "src1", "src2"],
        "lang": ["en"] * 8,
        "n_chars": [7] * 8,
    })
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))
    out = q_source_overlap(str(tmp_path)).set_index(["src_a", "src_b"])
    # "dup one" links all three pairs; "dup two" adds one more to (0,1)
    assert out.loc[("src0", "src1"), "n_shared"] == 2
    assert out.loc[("src0", "src2"), "n_shared"] == 1
    assert out.loc[("src1", "src2"), "n_shared"] == 1
    # diagonal: distinct contents per source
    assert out.loc[("src0", "src0"), "n_shared"] == 3  # dup1, dup2, uniq a
    assert out.loc[("src1", "src1"), "n_shared"] == 3
    assert out.loc[("src2", "src2"), "n_shared"] == 2  # dup1, None
    assert len(out) == 6

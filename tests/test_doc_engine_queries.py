"""Oracle-twin engine queries added in r5: content-type detection
(M10, q_content_type) and page-load validation (M18,
q_page_validation) — exact-row pins beyond the DuckDB gate."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_content_type_rows():
    from thecrowler_ray.pipelines.queries import q_content_type

    out = q_content_type(SF).to_pandas().set_index("doc_id")["mime"]
    # doc 0: %7==0 -> sniff wins over .html extension
    assert out.loc[0] == "text/html"
    # doc 7: %7==0, ext .zip (7%12) -> sniff still wins
    assert out.loc[7] == "text/html"
    # doc 1: .json extension
    assert out.loc[1] == "application/json"
    # doc 9: unmapped .xyz -> UNKNOWN; doc 10: no extension -> UNKNOWN
    assert out.loc[9] == "UNKNOWN"
    assert out.loc[10] == "UNKNOWN"
    # doc 11: .csv
    assert out.loc[11] == "text/csv"


@pytest.mark.usefixtures("ray_session")
def test_page_validation_rows():
    import pyarrow.parquet as pq

    from thecrowler_ray.pipelines.queries import q_page_validation

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    docs = docs.set_index("doc_id")["text"]
    out = q_page_validation(SF).to_pandas().set_index("doc_id")
    for d in (0, 1, 2, 3, 40, 41):
        words = (docs.loc[d] or "").split()
        if d % 2 == 0:
            want_valid = int("scan" in words)
            want_action = "none" if want_valid else "skip"
            want_retries = 0
        else:
            want_valid = int(bool(words) and words[0] == "scan")
            want_action = "none" if want_valid else "retry"
            want_retries = 0 if want_valid else 2
        assert int(out.loc[d, "valid"]) == want_valid, d
        assert out.loc[d, "action"] == want_action, d
        assert int(out.loc[d, "max_retries"]) == want_retries, d
    # both branches of each parity must occur in the corpus
    even = out[out.index % 2 == 0]
    odd = out[out.index % 2 == 1]
    assert set(even["action"]) == {"none", "skip"}
    assert "retry" in set(odd["action"])


@pytest.mark.usefixtures("ray_session")
def test_transforms_rows():
    from thecrowler_ray.pipelines.queries import q_transforms

    out = q_transforms(SF).to_pandas().set_index("doc_id")
    # html removed, entity decoded, digits gone, 'tail' removed, trimmed
    c0 = out.loc[0, "cleaned"]
    assert c0.startswith("Doc &")
    assert "<" not in c0 and "&amp;" not in c0 and "tail" not in c0
    assert not any(ch.isdigit() for ch in c0)
    # JSON validity flag: 0 for %5==0 (broken payload), else 1
    assert int(out.loc[0, "valid_json"]) == 0
    assert int(out.loc[5, "valid_json"]) == 0
    assert int(out.loc[1, "valid_json"]) == 1

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


@pytest.mark.usefixtures("ray_session")
def test_servicescout_rows():
    from thecrowler_ray.pipelines.queries import q_servicescout

    out = q_servicescout(SF).to_pandas().set_index("doc_id")["argv"]
    # doc 0: %7==0 -> 'fast' template aborts timing; udp+syn+service+os
    a0 = out.loc[0]
    assert a0.startswith("-sU -sS --system-dns -Pn -p 1-1000 -sV -O -sS")
    assert a0.endswith("--traceroute -v2 -d2 --privileged 10.0.0.0")
    assert "--scan-delay" not in a0 and "-T" not in a0.replace("-sT", "")
    # doc 6: numeric template '0' -> -T0 present (even id, no delay)
    a6 = out.loc[6]
    assert "-T0" in a6.split() and "--scan-delay" not in a6
    # doc 7: %7==0 -> non-numeric template aborts timing AND scan-delay
    a7 = out.loc[7]
    assert "-T" not in a7.replace("-sT", "")  # no timing flag
    assert "--scan-delay" not in a7
    # doc 1: odd -> -n present, scan-delay 1.5ms (template numeric)
    a1 = out.loc[1]
    assert "-n" in a1.split() and "--scan-delay 1.5ms" in a1
    # doc 3: syn -> the double -sS plus -sO quirk
    assert out.loc[3].split().count("-sS") == 2 and "-sO" in out.loc[3]

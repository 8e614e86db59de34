import json

import pyarrow as pa
import pytest
import ray.data

from thecrowler_ray.detection import TechDetector
from thecrowler_ray.stages.enrich import (
    collect_httpinfo,
    collect_netinfo,
    enrich_hosts,
)


def test_collectors_deterministic():
    assert collect_netinfo("host1.test") == collect_netinfo("host1.test")
    assert collect_netinfo("host1.test") != collect_netinfo("host2.test")
    doc = collect_httpinfo("host3.test")
    assert "server" in doc["headers"] and doc["tls"]["protocol"] == "TLSv1.3"


@pytest.mark.usefixtures("ray_session")
def test_enrich_pipeline_and_detection_plane():
    pages = ray.data.from_arrow(
        pa.table({"host": ["a.test", "b.test", "a.test", "c.test", "b.test"]})
    )
    net, http = enrich_hosts(pages)
    net_df = net.to_pandas()
    http_df = http.to_pandas()
    assert sorted(net_df.host) == ["a.test", "b.test", "c.test"]
    assert net_df.details_hash.nunique() == 3
    # enrichment headers feed the tech-detection header plane
    det = TechDetector()
    found_any = False
    for _, row in http_df.iterrows():
        headers = json.loads(row.httpinfo)["headers"]
        res = det.detect(headers=headers)
        if res:
            found_any = True
    assert found_any

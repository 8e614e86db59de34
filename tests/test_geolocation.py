"""Geolocation tests (pkg/netinfo/geolocation.go): dispatch semantics,
the IP2Location response mapping, and the pure-stdlib MaxMind DB reader
exercised against a tiny valid .mmdb built from scratch here (32-bit
records, IPv4 tree, GeoLite2-City-shaped records)."""

import json
import struct

import pytest

from thecrowler_ray.geolocation import (
    InvalidIPAddressError,
    MMDBReader,
    detect_location,
    detect_location_maxmind,
)


# -- minimal MMDB writer (test-only) ----------------------------------------

def enc_str(s: str) -> bytes:
    b = s.encode("utf-8")
    assert len(b) < 29
    return bytes([(2 << 5) | len(b)]) + b


def enc_double(v: float) -> bytes:
    return bytes([(3 << 5) | 8]) + struct.pack(">d", v)


def enc_uint(v: int, dtype: int = 6) -> bytes:
    b = v.to_bytes((v.bit_length() + 7) // 8 or 1, "big") if v else b""
    return bytes([(dtype << 5) | len(b)]) + b


def enc_u64(v: int) -> bytes:  # extended type 9 (uint64)
    b = v.to_bytes((v.bit_length() + 7) // 8 or 1, "big") if v else b""
    return bytes([len(b), 9 - 7]) + b


def enc_map(d: dict) -> bytes:
    out = bytes([(7 << 5) | len(d)])
    for k, v in d.items():
        out += enc_str(k) + v
    return out


def enc_array(items: list) -> bytes:
    return bytes([len(items), 11 - 7]) + b"".join(items)


def build_mmdb(networks: dict[str, bytes], ip_version: int = 4) -> bytes:
    """networks: cidr → encoded record bytes. 32-bit records."""
    import ipaddress

    data_section = b""
    offsets = {}
    for cidr, payload in networks.items():
        offsets[cidr] = len(data_section)
        data_section += payload

    # build the bit tree: nodes as [left, right] with -1 = unset
    nodes = [[-1, -1]]
    leaves = {}
    for cidr in networks:
        net = ipaddress.ip_network(cidr)
        bits = int(net.network_address)
        cur = 0
        for i in range(net.prefixlen):
            bit = (bits >> (net.max_prefixlen - 1 - i)) & 1
            if i == net.prefixlen - 1:
                leaves[(cur, bit)] = cidr
            else:
                nxt = nodes[cur][bit]
                if nxt < 0:
                    nodes.append([-1, -1])
                    nxt = len(nodes) - 1
                    nodes[cur][bit] = nxt
                cur = nxt
    node_count = len(nodes)

    def record(node_idx, side):
        cidr = leaves.get((node_idx, side))
        if cidr is not None:
            return node_count + 16 + offsets[cidr]
        child = nodes[node_idx][side]
        return child if child >= 0 else node_count  # node_count = no data

    tree = b"".join(
        struct.pack(">II", record(i, 0), record(i, 1))
        for i in range(node_count))

    metadata = enc_map({
        "binary_format_major_version": enc_uint(2, 5),
        "binary_format_minor_version": enc_uint(0, 5),
        "build_epoch": enc_u64(1700000000),
        "database_type": enc_str("GeoLite2-City"),
        "description": enc_map({"en": enc_str("test db")}),
        "ip_version": enc_uint(ip_version, 5),
        "languages": enc_array([enc_str("en")]),
        "node_count": enc_uint(node_count),
        "record_size": enc_uint(32, 5),
    })
    return (tree + b"\x00" * 16 + data_section
            + b"\xab\xcd\xefMaxMind.com" + metadata)


def city_record(iso, country, city, lat, lon) -> bytes:
    return enc_map({
        "country": enc_map({"iso_code": enc_str(iso),
                            "names": enc_map({"en": enc_str(country)})}),
        "city": enc_map({"names": enc_map({"en": enc_str(city)})}),
        "location": enc_map({"latitude": enc_double(lat),
                             "longitude": enc_double(lon)}),
    })


@pytest.fixture(scope="module")
def mmdb_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("geo") / "test.mmdb"
    p.write_bytes(build_mmdb({
        "81.2.69.0/24": city_record("GB", "United Kingdom", "London",
                                    51.5142, -0.0931),
        "10.0.0.0/8": city_record("ZZ", "Private", "", 0.0, 0.0),
    }))
    return str(p)


def test_mmdb_reader_lookup(mmdb_path):
    r = MMDBReader(mmdb_path)
    assert r.metadata["database_type"] == "GeoLite2-City"
    assert r.node_count > 0 and r.record_size == 32
    rec = r.lookup("81.2.69.160")
    assert rec["country"]["iso_code"] == "GB"
    assert rec["location"]["latitude"] == pytest.approx(51.5142)
    assert r.lookup("8.8.8.8") is None  # outside every network
    assert r.lookup("10.200.3.4")["country"]["iso_code"] == "ZZ"
    with pytest.raises(InvalidIPAddressError):
        r.lookup("not-an-ip")


def test_detect_location_maxmind(mmdb_path):
    loc = detect_location_maxmind("81.2.69.1", mmdb_path)
    assert loc == {"country_code": "GB", "country_name": "United Kingdom",
                   "city": "London",
                   "latitude": pytest.approx(51.5142),
                   "longitude": pytest.approx(-0.0931)}
    # miss → zero-value DetectedLocation, like the Go struct default
    miss = detect_location_maxmind("8.8.8.8", mmdb_path)
    assert miss["country_code"] == "" and miss["latitude"] == 0.0
    with pytest.raises(ValueError):
        detect_location_maxmind("1.2.3.4", "")
    with pytest.raises(ValueError):
        detect_location_maxmind("1.2.3.4", "/nonexistent.mmdb")


def test_dispatch_and_ip2location(mmdb_path):
    # disabled / unsupported types error like the reference
    with pytest.raises(ValueError):
        detect_location("1.1.1.1", {"enabled": False})
    with pytest.raises(ValueError):
        detect_location("1.1.1.1", {"enabled": True, "type": "astral"})
    # local alias routes to maxmind
    loc = detect_location("81.2.69.1",
                          {"enabled": True, "type": "Local ",
                           "db_path": mmdb_path})
    assert loc["city"] == "London"

    # remote path maps the IP2Location JSON fields
    def transport(url, timeout):
        assert "ip=9.9.9.9" in url and "key=k1" in url
        return 200, json.dumps({
            "country_code": "CH", "country_name": "Switzerland",
            "region_name": "ZH", "city_name": "Zurich",
            "latitude": 47.37, "longitude": 8.54}).encode()

    loc2 = detect_location("9.9.9.9", {"enabled": True, "type": "remote",
                                       "api_key": "k1"},
                           transport=transport)
    assert loc2["city"] == "Zurich" and loc2["country_code"] == "CH"

    def bad_transport(url, timeout):
        return 503, b""

    with pytest.raises(ValueError):
        detect_location("9.9.9.9", {"enabled": True, "type": "ip2location",
                                    "api_key": "k1"},
                        transport=bad_transport)

"""IP geolocation (reference ``pkg/netinfo/geolocation.go``).

``DetectLocation`` dispatches on the configured type — ``maxmind`` /
``local`` reads a GeoLite2 ``.mmdb`` file, ``ip2location`` / ``remote``
calls the IP2Location API (geolocation.go:32-111). The HTTP call is a
transport seam; the *local* path is fully real here: :class:`MMDBReader`
is a pure-stdlib reader for the public MaxMind DB binary format
(https://maxmind.github.io/MaxMind-DB/ — binary search tree over IP
bits + typed data section + metadata map), since the maxminddb package
isn't available in this container. Tests build a tiny valid .mmdb from
scratch and read it back.

Deviation, documented: the reference decodes into a ``DetectedLocation``
struct with NO maxminddb field tags (types.go:87-93), so its MaxMind
lookups actually produce zero values — clearly not the intent. Here the
GeoLite2 record is mapped properly (country.iso_code,
country.names.en, city.names.en, location.latitude/longitude).
"""

from __future__ import annotations

import ipaddress
import json
import os
import struct

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"


class InvalidIPAddressError(ValueError):
    def __init__(self, ip: str):
        super().__init__(f"invalid IP address: {ip}")
        self.ip_address = ip


class MMDBReader:
    """Minimal MaxMind DB format reader (spec 2.0)."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.buf = f.read()
        idx = self.buf.rfind(_METADATA_MARKER)
        if idx < 0:
            raise ValueError("not an MMDB file (metadata marker missing)")
        meta, _ = self._decode(idx + len(_METADATA_MARKER), base=0)
        self.metadata = meta
        self.node_count = meta["node_count"]
        self.record_size = meta["record_size"]  # bits per record (24/28/32)
        self.ip_version = meta["ip_version"]
        self.node_bytes = self.record_size * 2 // 8
        self.tree_size = self.node_count * self.node_bytes
        self.data_base = self.tree_size + 16  # 16-byte data-section separator

    # -- search tree ---------------------------------------------------------
    def _record(self, node: int, side: int) -> int:
        off = node * self.node_bytes
        if self.record_size == 24:
            b = self.buf[off + 3 * side: off + 3 * side + 3]
            return int.from_bytes(b, "big")
        if self.record_size == 28:
            middle = self.buf[off + 3]
            if side == 0:
                return ((middle >> 4) << 24) | int.from_bytes(
                    self.buf[off:off + 3], "big")
            return ((middle & 0x0F) << 24) | int.from_bytes(
                self.buf[off + 4:off + 7], "big")
        if self.record_size == 32:
            return int.from_bytes(
                self.buf[off + 4 * side: off + 4 * side + 4], "big")
        raise ValueError(f"unsupported record size {self.record_size}")

    def lookup(self, ip: str):
        try:
            addr = ipaddress.ip_address(ip)
        except ValueError:
            raise InvalidIPAddressError(ip) from None
        if addr.version == 4 and self.ip_version == 6:
            addr = ipaddress.ip_address("::ffff:" + ip)
        elif addr.version == 6 and self.ip_version == 4:
            return None
        bits = addr.packed
        node = 0
        for i in range(len(bits) * 8):
            bit = (bits[i // 8] >> (7 - i % 8)) & 1
            node = self._record(node, bit)
            if node >= self.node_count:
                if node == self.node_count:
                    return None  # no data
                ptr = node - self.node_count - 16 + self.data_base
                value, _ = self._decode(ptr, base=self.data_base)
                return value
        return None

    # -- data section --------------------------------------------------------
    def _decode(self, pos: int, base: int):
        ctrl = self.buf[pos]
        pos += 1
        dtype = ctrl >> 5
        if dtype == 0:  # extended type
            dtype = self.buf[pos] + 7
            pos += 1
        size = ctrl & 0x1F
        if dtype == 1:  # pointer: size bits are the pointer encoding
            psize = ((ctrl >> 3) & 0x3) + 1
            raw = bytes([ctrl & 0x7]) + self.buf[pos:pos + psize]
            pos += psize
            value = int.from_bytes(raw, "big")
            value += (0, 2048, 526336, 0)[psize - 1]
            if psize == 4:
                value = int.from_bytes(raw[1:], "big")
            target, _ = self._decode(base + value, base)
            return target, pos
        if size == 29:
            size = 29 + self.buf[pos]
            pos += 1
        elif size == 30:
            size = 285 + int.from_bytes(self.buf[pos:pos + 2], "big")
            pos += 2
        elif size == 31:
            size = 65821 + int.from_bytes(self.buf[pos:pos + 3], "big")
            pos += 3
        if dtype == 2:  # UTF-8 string
            return self.buf[pos:pos + size].decode("utf-8"), pos + size
        if dtype == 3:  # double
            return struct.unpack(">d", self.buf[pos:pos + 8])[0], pos + 8
        if dtype == 4:  # bytes
            return self.buf[pos:pos + size], pos + size
        if dtype in (5, 6, 9, 10):  # uint16/32/64/128
            return int.from_bytes(self.buf[pos:pos + size], "big"), pos + size
        if dtype == 7:  # map
            out = {}
            for _ in range(size):
                key, pos = self._decode(pos, base)
                out[key], pos = self._decode(pos, base)
            return out, pos
        if dtype == 8:  # int32
            return int.from_bytes(self.buf[pos:pos + size], "big",
                                  signed=True), pos + size
        if dtype == 11:  # array
            out = []
            for _ in range(size):
                v, pos = self._decode(pos, base)
                out.append(v)
            return out, pos
        if dtype == 14:  # boolean (size IS the value)
            return bool(size), pos
        if dtype == 15:  # float
            return struct.unpack(">f", self.buf[pos:pos + 4])[0], pos + 4
        raise ValueError(f"unsupported MMDB type {dtype}")


def _geolite_to_location(record: dict | None) -> dict | None:
    if record is None:
        return None
    country = record.get("country", {}) or {}
    city = record.get("city", {}) or {}
    loc = record.get("location", {}) or {}
    return {
        "country_code": country.get("iso_code", ""),
        "country_name": (country.get("names", {}) or {}).get("en", ""),
        "city": (city.get("names", {}) or {}).get("en", ""),
        "latitude": float(loc.get("latitude", 0.0)),
        "longitude": float(loc.get("longitude", 0.0)),
    }


def detect_location_maxmind(ip: str, db_path: str) -> dict:
    """geolocation.go:47-77 — path validation, IP validation, DB lookup."""
    if not db_path:
        raise ValueError("GeoLite2 database path is empty")
    if not os.path.isfile(db_path):
        raise ValueError(
            "GeoLite2 database path is incorrect or the file does not exist")
    reader = MMDBReader(db_path)
    loc = _geolite_to_location(reader.lookup(ip))
    if loc is None:
        return {"country_code": "", "country_name": "", "city": "",
                "latitude": 0.0, "longitude": 0.0}
    return loc


def detect_location_ip2location(ip: str, api_key: str, timeout: int = 10,
                                transport=None) -> dict:
    """geolocation.go:79-111 — the API response→DetectedLocation mapping;
    ``transport(url, timeout) -> (status, body_bytes)`` is the HTTP seam."""
    url = (f"https://api.ip2location.com/v2/?ip={ip}&key={api_key}"
           f"&format=json")
    if transport is None:
        raise NotImplementedError(
            "no network in this environment: pass transport=")
    status, body = transport(url, timeout)
    if status != 200:
        raise ValueError(f"IP2Location API returned non-OK status: {status}")
    result = json.loads(body)
    return {
        "country_code": result.get("country_code", ""),
        "country_name": result.get("country_name", ""),
        "city": result.get("city_name", ""),
        "latitude": float(result.get("latitude", 0.0)),
        "longitude": float(result.get("longitude", 0.0)),
    }


def detect_location(ip: str, cfg: dict, transport=None) -> dict:
    """DetectLocation dispatch (geolocation.go:32-45)."""
    if not cfg.get("enabled"):
        raise ValueError("geolocation is disabled")
    gl_type = str(cfg.get("type", "")).strip().lower()
    if gl_type in ("maxmind", "local"):
        return detect_location_maxmind(ip, cfg.get("db_path", ""))
    if gl_type in ("ip2location", "remote"):
        return detect_location_ip2location(
            ip, cfg.get("api_key", ""), int(cfg.get("timeout", 10) or 10),
            transport=transport)
    raise ValueError(f"unsupported geolocation type: {cfg.get('type')}")

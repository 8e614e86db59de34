"""ServiceScout tests: option-builder quirks (serviceescout.go:118-297)
and nmap-XML result collection (serviceescout.go:300-512)."""

from thecrowler_ray.serviceescout import (
    build_nmap_args,
    parse_nmap_xml,
    parse_scan_results,
)

NMAP_XML = """<?xml version="1.0" encoding="UTF-8"?>
<nmaprun scanner="nmap" args="nmap -sV -oX - 192.0.2.10">
  <host>
    <address addr="192.0.2.10" addrtype=""/>
    <address addr="2001:db8::10" addrtype="unknown"/>
    <address addr="aa:bb:cc:dd:ee:ff" addrtype="mac" vendor="TestVendor"/>
    <hostnames>
      <hostname name="web.example.test" type="PTR"/>
    </hostnames>
    <ports>
      <extraports state="filtered" count="8986"/>
      <port protocol="tcp" portid="80">
        <state state="open"/>
        <service name="http" product="nginx" version="1.24.0" method="probed"/>
        <script id="http-title" output="Example Title">
          <elem key="title">Example Title</elem>
        </script>
      </port>
      <port protocol="tcp" portid="22">
        <state state="open"/>
        <service name="ssh" product="OpenSSH" version="9.3"/>
      </port>
      <port protocol="tcp" portid="8081">
        <state state="closed"/>
        <service name="" product="" version=""/>
      </port>
    </ports>
    <os>
      <osmatch name="Linux 5.X" accuracy="96" line="12345">
        <osclass type="general purpose" vendor="Linux" osfamily="Linux"
                 osgen="5.X" accuracy="96"/>
      </osmatch>
    </os>
    <hostscript>
      <script id="vulners" output="CVE-2023-0001 7.5">
        <elem key="title">Sample Vulnerability</elem>
        <elem key="severity">high</elem>
        <elem key="state">VULNERABLE</elem>
      </script>
      <script id="no-elems" output="raw only"/>
    </hostscript>
  </host>
</nmaprun>
"""


def test_build_args_basic_linux():
    cfg = {"service_detection": True, "max_port_number": 9000,
           "os_finger_print": True}
    args = build_nmap_args(cfg, "192.0.2.1")
    # DNS default on linux, service detection trio, OS, info, privileged
    assert args == ["--system-dns", "-Pn", "-p", "1-9000", "-sV", "-O",
                    "--traceroute", "-v2", "-d2", "--privileged",
                    "192.0.2.1"]


def test_build_args_quirks():
    # empty script_scan appends NOTHING (defaulted to ["default"]);
    # explicit scripts do
    assert "--script=default" not in build_nmap_args({}, "192.0.2.1")
    assert "--script=vulners,http-title" in build_nmap_args(
        {"script_scan": ["vulners", "http-title"]}, "192.0.2.1")
    # non-numeric timing template aborts scan-delay too
    args = build_nmap_args(
        {"timing_template": "fast", "scan_delay": "5"}, "192.0.2.1")
    assert "--scan-delay" not in args and not any(
        a.startswith("-T") for a in args if a != "-sT")
    # numeric template + sub-1 delay bumped by one
    args = build_nmap_args(
        {"timing_template": "4", "scan_delay": "0.5"}, "192.0.2.1")
    assert "-T4" in args
    assert args[args.index("--scan-delay") + 1] == "1.5ms"
    # ip_fragment + udp_scan injects -sS once and suppresses the
    # syn_scan repeat; any of ping/syn adds -sO
    args = build_nmap_args(
        {"ip_fragment": True, "udp_scan": True, "syn_scan": True},
        "192.0.2.1")
    assert args.count("-sS") == 2  # scan-types -sS + fragment-injected -sS
    assert "-sO" in args
    # ipv6 target leads with -6
    assert build_nmap_args({}, "2001:db8::1")[0] == "-6"


def test_build_args_darwin_skips():
    args = build_nmap_args({"ip_fragment": True}, "192.0.2.1",
                           platform_os="darwin")
    for flag in ("--system-dns", "--privileged", "-f", "--traceroute"):
        assert flag not in args


def test_parse_scan_results():
    run = parse_nmap_xml(NMAP_XML)
    hosts = parse_scan_results(run)
    assert len(hosts) == 1
    h = hosts[0]
    # empty/unknown addrtype re-typed by IP version; mac kept
    assert [(a["type"], a["address"]) for a in h["ip"]] == [
        ("ipv4", "192.0.2.10"), ("ipv6", "2001:db8::10"),
        ("mac", "aa:bb:cc:dd:ee:ff")]
    assert h["hostname"] == [{"name": "web.example.test", "type": "PTR"}]
    # 3 real ports + 1 extraports row with count-as-port quirk
    assert len(h["ports"]) == 4
    extra = h["ports"][-1]
    assert extra == {"port": 8986, "protocol": "unknown",
                     "state": "filtered", "service": "unknown"}
    # the empty-service port contributes a port row but no service row
    assert len(h["services"]) == 2
    assert h["services"][0]["product"] == "nginx"
    assert h["services"][0]["scripts"][0]["id"] == "http-title"
    assert "scripts" not in h["services"][1]
    assert h["os"][0]["classes"][0]["os_gen"] == "5.X"
    # vulnerability defaults + element overrides
    v0, v1 = h["vulnerabilities"]
    assert (v0["name"], v0["severity"], v0["state"]) == \
        ("Sample Vulnerability", "high", "VULNERABLE")
    assert (v1["id"], v1["name"], v1["severity"]) == \
        ("no-elems", "no-elems", "unknown")
    assert parse_scan_results(None) == []

"""ServiceScout — nmap options builder + scan-result parsing
(reference ``pkg/netinfo/serviceescout.go``).

The reference wraps the Ullaakut/nmap scanner: ``buildNmapOptions``
(serviceescout.go:118-297) turns a ``ServiceScoutConfig`` into a scan
option list, and ``parseScanResults`` (serviceescout.go:300-512) maps
the parsed nmap run into ``HostInfo`` records. Executing nmap needs a
network and root — that stays a seam — but both the option plane and
the result-parse plane are pure functions mirrored here:

- :func:`build_nmap_args` — the config→flags logic with its quirks
  preserved: ``ScriptScan`` defaulting to ``["default"]`` appends *no*
  ``--script`` flag, a non-numeric ``TimingTemplate`` aborts the rest of
  the timing options (ScanDelay included), ``ScanDelay < 1`` gets ``+1``,
  ``IPFragment`` + ``UDPScan`` injects ``-sS`` and suppresses the later
  SynScan repeat, and darwin hosts skip DNS/privileged/fragment/
  traceroute flags (serviceescout.go:163-297).
- :func:`parse_nmap_xml` — ``nmap -oX`` XML → run dict
  (hosts/addresses/hostnames/ports/extraports/os/hostscripts), the
  same shape the Go library hands to parseScanResults.
- :func:`parse_scan_results` — run dict → HostInfo records with the
  reference's collector semantics: unknown address types re-typed by IP
  version, extra-port rows carrying ``count`` in the port field with
  protocol/service "unknown" (serviceescout.go:438-452), vulnerability
  severity defaulting to "unknown" and title overriding the name
  (serviceescout.go:485-512).

Scale note: parse runs per *scanned host* inside ``map_batches`` over
the distinct-host set (like the WHOIS plane in ``stages/enrich.py``) —
O(distinct hosts), never per page.
"""

from __future__ import annotations

import ipaddress
import re
import xml.etree.ElementTree as ET

DARWIN = "darwin"


def _ip_version(ip: str) -> int:
    try:
        return ipaddress.ip_address(ip.strip()).version
    except ValueError:
        return 0


def _get_float(s: str) -> float:
    """exi.GetFloat analog for plain numeric strings: best-effort float,
    0.0 on garbage (the reference routes these through ExprTerpreter)."""
    try:
        return float(str(s).strip())
    except (TypeError, ValueError):
        return 0.0


def build_nmap_args(cfg: dict, ip: str, platform_os: str = "linux") -> list[str]:
    """buildNmapOptions (serviceescout.go:118-161) as the equivalent nmap
    CLI argument list, flags in the reference's option order with the
    target appended last (how the Go library assembles its command)."""
    args: list[str] = []
    if _ip_version(ip) == 6:
        args.append("-6")

    # scan types (serviceescout.go:163-181)
    if cfg.get("udp_scan"):
        args.append("-sU")
    if cfg.get("ping_scan"):
        args.append("-sn")
    if cfg.get("syn_scan"):
        args.append("-sS")
    if cfg.get("connect_scan"):
        args.append("-sT")
    if cfg.get("aggressive_scan"):
        args.append("-A")

    # DNS options (serviceescout.go:182-196)
    if platform_os != DARWIN:
        dns = cfg.get("dns_servers") or []
        if dns:
            args += ["--dns-servers", ",".join(dns)]
        else:
            args.append("--system-dns")
    if cfg.get("no_dns_resolution"):
        args.append("-n")

    # scripts (serviceescout.go:197-205): an EMPTY list is defaulted to
    # ["default"] without appending --script; only an explicit list does
    scripts = cfg.get("script_scan") or []
    if scripts:
        args.append("--script=" + ",".join(scripts))

    # service detection (serviceescout.go:206-215)
    if cfg.get("service_detection"):
        args.append("-Pn")
        args += ["-p", "1-" + str(cfg.get("max_port_number") or 9000)]
        args.append("-sV")

    # OS detection (serviceescout.go:216-222)
    if cfg.get("os_finger_print"):
        args.append("-O")

    # timing (serviceescout.go:223-246): a non-numeric timing template
    # RETURNS EARLY, skipping scan-delay
    if cfg.get("host_timeout"):
        args += ["--host-timeout",
                 f"{_get_float(cfg['host_timeout']):g}s"]
    tt = str(cfg.get("timing_template") or "")
    timing_aborted = False
    if tt:
        if re.fullmatch(r"[+-]?[0-9]+", tt):
            args.append("-T" + str(int(tt)))
        else:
            timing_aborted = True
    if not timing_aborted and cfg.get("scan_delay"):
        delay = _get_float(cfg["scan_delay"])
        if delay < 1:
            delay += 1
        args += ["--scan-delay", f"{delay:g}ms"]

    # low-nosing (serviceescout.go:247-297)
    if cfg.get("max_retries", 0) > 0:
        args += ["--max-retries", str(int(cfg["max_retries"]))]
    using_ss = False
    if platform_os != DARWIN and cfg.get("ip_fragment"):
        args.append("-f")
        if cfg.get("udp_scan"):
            args.append("-sS")
            using_ss = True
    if cfg.get("syn_scan") and not using_ss:
        args.append("-sS")
    if cfg.get("ping_scan") or cfg.get("syn_scan") or using_ss:
        args.append("-sO")
    idle = cfg.get("idle_scan") or {}
    if idle.get("zombie_host"):
        zombie = idle["zombie_host"]
        if idle.get("zombie_port"):
            zombie += ":" + str(idle["zombie_port"])
        args += ["-sI", zombie]
    if cfg.get("proxies"):
        args += ["--proxies", ",".join(cfg["proxies"])]
    if platform_os != DARWIN:
        args.append("--traceroute")

    # info gathering + privilege (serviceescout.go:150-159)
    args += ["-v2", "-d2"]
    if platform_os != DARWIN:
        args.append("--privileged")
    args.append(ip)
    return args


# -- nmap -oX parsing --------------------------------------------------------

def _script_dict(el: ET.Element) -> dict:
    return {
        "id": el.get("id", ""),
        "output": el.get("output", ""),
        "elements": [{"key": e.get("key", ""), "value": (e.text or "")}
                     for e in el.findall("elem")],
        "tables": [{
            "key": t.get("key", ""),
            "elements": [{"key": e.get("key", ""), "value": (e.text or "")}
                         for e in t.findall("elem")],
        } for t in el.findall("table")],
    }


def parse_nmap_xml(xml_text: str) -> dict:
    """``nmap -oX`` output → run dict shaped like the Go library's
    ``nmap.Run`` (the input to parseScanResults)."""
    root = ET.fromstring(xml_text)
    run = {"args": root.get("args", ""), "hosts": []}
    for h in root.findall("host"):
        host = {
            "addresses": [{"addr": a.get("addr", ""),
                           "addrtype": a.get("addrtype", ""),
                           "vendor": a.get("vendor", "")}
                          for a in h.findall("address")],
            "hostnames": [{"name": n.get("name", ""),
                           "type": n.get("type", "")}
                          for hn in h.findall("hostnames")
                          for n in hn.findall("hostname")],
            "ports": [],
            "extraports": [],
            "os_matches": [],
            "hostscripts": [],
        }
        ports_el = h.find("ports")
        if ports_el is not None:
            for ep in ports_el.findall("extraports"):
                host["extraports"].append({
                    "state": ep.get("state", ""),
                    "count": int(ep.get("count", "0") or 0),
                })
            for p in ports_el.findall("port"):
                state = p.find("state")
                svc = p.find("service")
                port = {
                    "id": int(p.get("portid", "0") or 0),
                    "protocol": p.get("protocol", ""),
                    "state": state.get("state", "") if state is not None
                    else "",
                    "service": {
                        k: (svc.get(xk, "") if svc is not None else "")
                        for k, xk in [
                            ("name", "name"), ("product", "product"),
                            ("version", "version"),
                            ("extrainfo", "extrainfo"),
                            ("devicetype", "devicetype"),
                            ("ostype", "ostype"), ("hostname", "hostname"),
                            ("method", "method"), ("proto", "proto"),
                            ("rpcnum", "rpcnum"), ("servicefp", "servicefp"),
                            ("tunnel", "tunnel")]
                    },
                    "scripts": [_script_dict(s) for s in p.findall("script")],
                }
                host["ports"].append(port)
        os_el = h.find("os")
        if os_el is not None:
            for m in os_el.findall("osmatch"):
                host["os_matches"].append({
                    "name": m.get("name", ""),
                    "accuracy": int(m.get("accuracy", "0") or 0),
                    "line": int(m.get("line", "0") or 0),
                    "classes": [{
                        "type": c.get("type", ""),
                        "vendor": c.get("vendor", ""),
                        "family": c.get("osfamily", ""),
                        "osgen": c.get("osgen", ""),
                        "accuracy": c.get("accuracy", ""),
                    } for c in m.findall("osclass")],
                })
        hs = h.find("hostscript")
        if hs is not None:
            host["hostscripts"] = [_script_dict(s)
                                   for s in hs.findall("script")]
        run["hosts"].append(host)
    return run


# -- result collection (serviceescout.go:300-512) ----------------------------

def _collect_vulnerability(script: dict) -> dict:
    vuln = {"id": script["id"], "name": script["id"], "severity": "unknown",
            "output": script["output"], "reference": "", "description": "",
            "state": "", "elements": []}
    for elem in script["elements"]:
        key, value = elem["key"], elem["value"]
        if key == "severity":
            vuln["severity"] = value
        elif key == "title":
            vuln["name"] = value
        elif key == "reference":
            vuln["reference"] = value
        elif key == "description":
            vuln["description"] = value
        elif key == "state":
            vuln["state"] = value
        vuln["elements"].append({"key": key, "value": value})
    return vuln


def parse_scan_results(run: dict | None) -> list[dict]:
    """parseScanResults: run dict → HostInfo records."""
    hosts: list[dict] = []
    if run is None:
        return hosts
    for hr in run["hosts"]:
        info = {"ip": [], "hostname": [], "ports": [], "services": [],
                "os": [], "vulnerabilities": []}
        for addr in hr["addresses"]:
            addr_type = addr["addrtype"].strip()
            if not addr_type or addr_type.lower() == "unknown":
                addr_type = ("ipv6" if _ip_version(addr["addr"]) == 6
                             else "ipv4")
            info["ip"].append({"address": addr["addr"], "type": addr_type,
                               "vendor": addr["vendor"]})
        for hn in hr["hostnames"]:
            info["hostname"].append({"name": hn["name"], "type": hn["type"]})
        for port in hr["ports"]:
            svc = port["service"]
            info["ports"].append({
                "port": port["id"], "protocol": port["protocol"],
                "state": port["state"], "service": svc["name"],
            })
            # Go gates on Service.String() != "" (the formatted
            # name/product/version summary)
            if any(svc[k] for k in ("name", "product", "version")):
                service = dict(svc)
                if port["scripts"]:
                    service["scripts"] = port["scripts"]
                info["services"].append(service)
        for ep in hr["extraports"]:
            info["ports"].append({
                "port": ep["count"], "protocol": "unknown",
                "state": ep["state"], "service": "unknown",
            })
        for m in hr["os_matches"]:
            info["os"].append({
                "name": m["name"], "accuracy": m["accuracy"],
                "line": m["line"],
                "classes": [{"type": c["type"], "vendor": c["vendor"],
                             "os_family": c["family"], "os_gen": c["osgen"],
                             "accuracy": c["accuracy"]}
                            for c in m["classes"]],
            })
        for script in hr["hostscripts"]:
            info["vulnerabilities"].append(_collect_vulnerability(script))
        hosts.append(info)
    return hosts

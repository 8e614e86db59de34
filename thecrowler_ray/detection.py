"""Technology detection (M19) — signature matching with confidence scores.

Reimplements (semantics only) ``pkg/detection/detection.go:57-434``:

- signatures per technology across planes: HTTP headers, URL
  micro-signatures, meta tags, page-content keywords (SSL/JARM planes are
  modeled but need live TLS — their matchers accept pre-collected fields)
- each match adds the signature's ``confidence`` weight to the tech's raw
  score ``x``
- ``calculate_confidence`` maps the raw score through the reference's
  piecewise curve: ``[0,noise)→[0,10) [noise,maybe)→[10,40)
  [maybe,detected)→[40,100)``, capped at 100; negative x = evidence of
  absence → ``100 - min(100, -x)``
- implied technologies: a detected tech pulls in its ``implies`` list at
  reduced weight (``processImpliedTechnologies``,
  ``detection.go:396-412``)

``DetectStage`` is the actor-pool ``map_batches`` stage; signature tables
load once per actor (reference loads them from detection rulesets, ST4).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class TechSignature:
    """One technology's signatures across planes.

    Patterns may be plain strings (weighted by ``confidence``) or
    ``(pattern, weight)`` pairs — the YAML detection rules carry
    per-signature confidences (``pkg/ruleset/types.go:442-476``)."""

    name: str
    headers: dict[str, list] = field(default_factory=dict)  # header → patterns
    url_patterns: list = field(default_factory=list)
    meta_tags: dict[str, list] = field(default_factory=dict)  # meta name → patterns
    content_patterns: list = field(default_factory=list)
    confidence: float = 10.0  # default weight for unweighted patterns
    implies: list[str] = field(default_factory=list)


DEFAULT_SIGNATURES: list[TechSignature] = [
    TechSignature(
        "nginx",
        headers={"server": [r"(?i)nginx"]},
        confidence=50,
    ),
    TechSignature(
        "apache",
        headers={"server": [r"(?i)apache"]},
        confidence=50,
    ),
    TechSignature(
        "php",
        headers={"x-powered-by": [r"(?i)php"]},
        url_patterns=[r"\.php(\?|$)"],
        confidence=30,
        implies=["apache"],
    ),
    TechSignature(
        "wordpress",
        meta_tags={"generator": [r"(?i)wordpress"]},
        content_patterns=[r"wp-content", r"wp-includes"],
        url_patterns=[r"/wp-"],
        confidence=25,
        implies=["php"],
    ),
    TechSignature(
        "jquery",
        content_patterns=[r"jquery[.-]?\d*\.?\d*\.?\d*(?:\.min)?\.js", r"jQuery"],
        confidence=20,
    ),
    TechSignature(
        "bootstrap",
        content_patterns=[r"bootstrap(?:\.min)?\.(?:css|js)"],
        confidence=20,
    ),
    TechSignature(
        "react",
        content_patterns=[r"data-reactroot", r"react(?:\.production)?(?:\.min)?\.js"],
        confidence=25,
    ),
    TechSignature(
        "cloudflare",
        headers={"server": [r"(?i)cloudflare"], "cf-ray": [r".+"]},
        confidence=40,
    ),
    TechSignature(
        "synthweb",
        meta_tags={"generator": [r"(?i)synthweb"]},
        confidence=60,
    ),
]


def calculate_confidence(
    x: float, noise: float = 10.0, maybe: float = 30.0, detected: float = 60.0
) -> float:
    if x < 0:
        return 100 - min(100.0, -x)
    if x < noise:
        return (x / noise) * 10
    if x < maybe:
        return 10 + ((x - noise) / (maybe - noise)) * 30
    if x < detected:
        return 40 + ((x - maybe) / (detected - maybe)) * 60
    return min(100.0, 40 + ((x - detected) / (detected - maybe)) * 60)


class TechDetector:
    def __init__(
        self,
        signatures: list[TechSignature] | None = None,
        noise: float = 10.0,
        maybe: float = 30.0,
        detected: float = 60.0,
        implied_weight: float = 0.5,
    ):
        self.signatures = signatures or DEFAULT_SIGNATURES
        self.noise, self.maybe, self.detected = noise, maybe, detected
        self.implied_weight = implied_weight
        # precompile all patterns once (per actor); normalize to
        # (compiled_pattern, weight) pairs
        def _pw(pats, default):
            out = []
            for p in pats:
                if isinstance(p, (tuple, list)):
                    out.append((re.compile(p[0]), float(p[1])))
                else:
                    out.append((re.compile(p), float(default)))
            return out

        self._compiled: dict[str, dict] = {}
        for sig in self.signatures:
            self._compiled[sig.name] = {
                "headers": {
                    h.lower(): _pw(pats, sig.confidence)
                    for h, pats in sig.headers.items()
                },
                "url": _pw(sig.url_patterns, sig.confidence),
                "meta": {
                    m.lower(): _pw(pats, sig.confidence)
                    for m, pats in sig.meta_tags.items()
                },
                "content": _pw(sig.content_patterns, sig.confidence),
                "sig": sig,
            }

    def raw_scores(
        self,
        url: str = "",
        headers: dict[str, str] | None = None,
        meta_tags: list[dict] | None = None,
        content: str = "",
    ) -> dict[str, float]:
        headers = {k.lower(): v for k, v in (headers or {}).items()}
        metas = {
            str(m.get("name", "")).lower(): str(m.get("content", ""))
            for m in (meta_tags or [])
        }
        scores: dict[str, float] = {}
        for name, c in self._compiled.items():
            x = 0.0
            for h, pats in c["headers"].items():
                val = headers.get(h)
                if val is not None:
                    hit = max((w for p, w in pats if p.search(val)), default=0.0)
                    x += hit
            if url:
                x += max((w for p, w in c["url"] if p.search(url)), default=0.0)
            for mname, pats in c["meta"].items():
                val = metas.get(mname)
                if val is not None:
                    x += max((w for p, w in pats if p.search(val)), default=0.0)
            if content:
                x += max(
                    (w for p, w in c["content"] if p.search(content)), default=0.0
                )
            if x:
                scores[name] = x
        # implied-tech closure at reduced weight
        changed = True
        while changed:
            changed = False
            for name, x in list(scores.items()):
                conf = calculate_confidence(x, self.noise, self.maybe, self.detected)
                if conf >= 40:  # "maybe" or better implies its stack
                    for implied in self._compiled[name]["sig"].implies:
                        # implied tech inherits a fraction of the implying
                        # tech's evidence
                        add = x * self.implied_weight
                        if implied not in scores:
                            scores[implied] = add
                            changed = True
        return scores

    def detect(self, **kwargs) -> dict[str, float]:
        """→ {tech: confidence%} for every tech above the noise floor."""
        out = {}
        for name, x in self.raw_scores(**kwargs).items():
            conf = calculate_confidence(x, self.noise, self.maybe, self.detected)
            if conf >= 10:
                out[name] = round(conf, 2)
        return out


class DetectStage:
    """Actor-pool map_batches stage over (url, html) columns."""

    def __init__(self, signatures: list[TechSignature] | None = None):
        self.detector = TechDetector(signatures)

    def __call__(self, batch):
        import json

        import pyarrow as pa

        from .htmlx import parse_html

        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist() if "html" in batch.column_names else [""] * len(urls)
        out = []
        for u, h in zip(urls, htmls):
            metas = parse_html(h or "").meta
            out.append(
                json.dumps(
                    self.detector.detect(url=u or "", meta_tags=metas, content=h or ""),
                    sort_keys=True,
                )
            )
        return batch.append_column("detected_tech", pa.array(out, pa.string()))


def external_detections_from_yaml(yaml_text: str) -> dict[str, list[str]]:
    """DetectionRule YAML → {lowercased object_name: [provider, ...]}, the
    map the reference builds with GetAllExternalDetectionsMap
    (``pkg/ruleset/detectionrule.go:268-283``; ExternalDetection shape
    ``types.go:430-434``). Feed it to ``extdetect.ExtDetectStage``."""
    import yaml as _yaml

    doc = _yaml.safe_load(yaml_text) or []
    rules: list[dict] = []
    if isinstance(doc, dict):
        for g in doc.get("rule_groups", []):
            rules.extend(g.get("detection_rules", []) or [])
    else:
        rules = list(doc)

    out: dict[str, list[str]] = {}
    for r in rules:
        ext = r.get("external_detections")
        if not ext:
            continue
        name = str(r.get("object_name") or r.get("rule_name", "")).lower()
        out.setdefault(name, []).extend(
            e.get("provider", "") for e in ext if e.get("provider")
        )
    return out


def detection_rules_from_yaml(yaml_text: str) -> list[TechSignature]:
    """Load DetectionRule-shaped YAML (the reference ruleset's
    ``detection_rules`` entries, ``pkg/ruleset/types.go:299-314``) into
    TechSignatures with per-signature confidences. Accepts either a bare
    list of rules or a ruleset document with ``rule_groups``."""
    import yaml as _yaml

    doc = _yaml.safe_load(yaml_text) or []
    rules: list[dict] = []
    if isinstance(doc, dict):
        for g in doc.get("rule_groups", []):
            rules.extend(g.get("detection_rules", []) or [])
    else:
        rules = list(doc)

    sigs: list[TechSignature] = []
    for r in rules:
        name = r.get("object_name") or r.get("rule_name", "")
        headers: dict[str, list] = {}
        for hf in r.get("http_header_fields", []) or []:
            conf = float(hf.get("confidence", 10))
            headers.setdefault(str(hf.get("key", "")).lower(), []).extend(
                (v, conf) for v in (hf.get("value") or [])
            )
        urls = [
            (u.get("value", ""), float(u.get("confidence", 10)))
            for u in (r.get("url_micro_signatures") or [])
        ]
        metas: dict[str, list] = {}
        for mt in r.get("meta_tags", []) or []:
            metas.setdefault(str(mt.get("name", "")).lower(), []).append(
                (mt.get("content", ""), float(mt.get("confidence", 10)))
            )
        content = []
        for pc_sig in r.get("page_content_patterns", []) or []:
            conf = float(pc_sig.get("confidence", 10))
            for v in (pc_sig.get("value") or []) + (pc_sig.get("text") or []):
                content.append((v, conf))
        sigs.append(
            TechSignature(
                name=name,
                headers=headers,
                url_patterns=urls,
                meta_tags=metas,
                content_patterns=content,
                implies=list(r.get("implies") or []),
            )
        )
    return sigs

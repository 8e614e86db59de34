"""CLI entry point — the ``ray job submit``-able surface (SURVEY.md §7.2#9).

    python -m thecrowler_ray crawl  [--config cfg.yaml] [--out DIR] [--resume]
    python -m thecrowler_ray index  --pages 'GLOB' --out DIR
    python -m thecrowler_ray search --index DIR --query 'dork words' [-k 10]

The CLI owns its Ray session (guarded init; ``ray.shutdown()`` on exit) —
library code never does. Config YAML (see thecrowler_ray.config) controls
the engine knobs; ``crawler:`` keys map onto EngineConfig fields, and the
``corpus:`` section configures the deterministic synthetic web (swap for a
real fetcher on a live cluster).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


_OWNS_RAY = False


def _ray_init(num_cpus: int | None):
    import ray

    global _OWNS_RAY
    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
        _OWNS_RAY = True


def cmd_crawl(args) -> int:
    from .config import load_config
    from .pipelines.crawl import CrawlRun, EngineConfig
    from .sources.synthweb import CorpusConfig, seed_urls

    cfg_doc = {}
    if args.config:
        with open(args.config, encoding="utf-8") as f:
            cfg_doc = load_config(f.read())
    crawler = cfg_doc.get("crawler", {})
    corpus_doc = cfg_doc.get("corpus", {})
    corpus = CorpusConfig(
        seed=int(corpus_doc.get("seed", 42)),
        n_hosts=int(corpus_doc.get("n_hosts", 50)),
        base_pages=int(corpus_doc.get("base_pages", 500)),
        branch=int(corpus_doc.get("branch", 3)),
        filler_words=int(corpus_doc.get("filler_words", 0)),
    )
    pol = cfg_doc.get("politeness", {})
    engine = EngineConfig(
        max_links=int(crawler.get("max_links") or 10_000),
        max_waves=int(crawler.get("max_depth") or 50) or 50,
        check_robots=bool(crawler.get("check_for_robots", False)),
        unwanted=list(crawler.get("unwanted_urls", []) or []),
        politeness_rate=int(pol.get("rate", 10**9)),
        politeness_capacity=int(pol.get("capacity", 10**9)),
        out_dir=args.out,
    )
    seeds = seed_urls(corpus, int(corpus_doc.get("n_seeds", corpus.n_hosts)))
    _ray_init(args.num_cpus)
    if args.resume:
        run = CrawlRun.resume(corpus, seeds, engine)
        summary = run.run_resumed() if run else CrawlRun(corpus, seeds, engine).run()
    else:
        summary = CrawlRun(corpus, seeds, engine).run()
    print(json.dumps({k: summary[k] for k in
                      ("run_id", "waves", "total_fetched", "seen_total",
                       "elapsed_sec", "urls_per_sec", "out_dir")}))
    return 0


def cmd_index(args) -> int:
    from .pipelines.index import index_pages

    pages = sorted(glob.glob(args.pages))
    if not pages:
        print(f"no parquet files match {args.pages!r}", file=sys.stderr)
        return 2
    _ray_init(args.num_cpus)
    counts = index_pages(pages, args.out)
    print(json.dumps(counts))
    return 0


def cmd_search(args) -> int:
    from .pipelines.search_api import search_pages

    _ray_init(args.num_cpus)
    got = search_pages(args.index, args.query, k=args.k)
    for _, row in got.iterrows():
        print(json.dumps({"doc_id": row.doc_id, "url": row.url,
                          "title": row.title, "score": float(row.score)}))
    return 0


def cmd_serve(args) -> int:
    """Serve the HTTP API (reference services/api) over an index dir."""
    from .api_server import ApiConfig, ApiServer

    _ray_init(args.num_cpus)
    srv = ApiServer(
        args.index,
        ApiConfig(host=args.host, port=args.port,
                  rate_limit=args.rate_limit, auth_token=args.token),
    )
    port = srv.start()
    print(json.dumps({"serving": f"http://{args.host}:{port}",
                      "endpoints": ["/v1/health", "/v1/ready",
                                    "/v1/search/general?q=", "/v1/timeseries"]}))
    try:
        import time as _time

        while True:
            _time.sleep(3600)
    except KeyboardInterrupt:
        srv.close()
    return 0


def cmd_dedup(args) -> int:
    """Near/exact-dup pipelines over a documents-shaped parquet table."""
    import ray.data

    from .stages import dedup as dd
    from .storage import write_table

    _ray_init(args.num_cpus)
    ds = ray.data.read_parquet(args.input)
    if args.method == "exact":
        out = dd.exact_dedup(ds, id_col=args.id_col)
    elif args.method == "minhash":
        out = dd.minhash_candidate_pairs(ds, id_col=args.id_col)
    elif args.method == "simhash":
        out = dd.simhash_candidate_pairs(
            ds, id_col=args.id_col, max_hamming=args.max_hamming
        )
    elif args.method == "embedding":
        out = dd.embedding_neardup_pairs(
            ds, threshold=args.threshold, id_col=args.id_col,
            emb_col=args.emb_col,
        )
    else:
        print(f"unknown method {args.method}", file=sys.stderr)
        return 2
    fmt = write_table(out.materialize(), args.out)
    print(json.dumps({"method": args.method, "rows": out.count(),
                      "out": args.out, "format": fmt}))
    return 0


def cmd_fingerprint(args) -> int:
    import ray.data

    from .fingerprints import FingerprintStage
    from .storage import write_table

    _ray_init(args.num_cpus)
    kinds = [k.strip() for k in args.kinds.split(",") if k.strip()]
    ds = ray.data.read_parquet(args.input).map_batches(
        FingerprintStage(kinds, text_col=args.text_col),
        batch_format="pandas", concurrency=2,
    ).materialize()
    fmt = write_table(ds, args.out)
    print(json.dumps({"kinds": kinds, "rows": ds.count(), "out": args.out,
                      "format": fmt}))
    return 0


def cmd_analyze(args) -> int:
    """Text-analysis battery: tokens + quality + language ID + simhash."""
    import ray.data

    from .stages.text_analysis import (
        LangIdStage,
        quality_stage,
        simhash_stage,
        token_count_stage,
    )
    from .storage import write_table

    _ray_init(args.num_cpus)
    ds = (
        ray.data.read_parquet(args.input)
        .map_batches(token_count_stage, batch_format="pandas")
        .map_batches(quality_stage, batch_format="pandas")
        .map_batches(LangIdStage, batch_format="pandas", concurrency=2)
        .map_batches(simhash_stage, batch_format="pandas")
        .materialize()
    )
    fmt = write_table(ds, args.out)
    print(json.dumps({"rows": ds.count(), "out": args.out, "format": fmt}))
    return 0


def cmd_sources(args) -> int:
    """Source-registry console (reference cmd/addSource, cmd/removeSource,
    cmd/updateSourceStatus, cmd/exportSources, cmd/addCategory). Registry
    ops are metadata-only — no Ray session needed."""
    import time

    from .source_registry import SourceRegistry, export_sources

    reg = SourceRegistry(args.registry)
    now_s = time.time()
    if args.action == "add":
        if args.bulk:
            ids = reg.add_bulk_csv(args.bulk, force=args.force, now_s=now_s)
            print(json.dumps({"inserted": ids}))
        else:
            if not args.url:
                print("provide --url or --bulk", file=sys.stderr)
                return 2
            cfg = open(args.srccfg).read() if args.srccfg else None
            sid = reg.add_source(
                args.url, category_id=args.cat_id, usr_id=args.usr_id,
                restricted=args.restricted, flags=args.flags,
                config=cfg, now_s=now_s)
            print(json.dumps({"source_id": sid}))
    elif args.action == "remove":
        resp = reg.remove_source(args.url)
        print(json.dumps(resp))
    elif args.action == "status":
        n = reg.update_status(
            args.status, url=args.url or "", source_id=args.id,
            bulk_csv=args.bulk or "", all_sources=args.all,
            yesterday=args.yesterday, within=args.within,
            after=args.after, before=args.before, now_s=now_s)
        print(json.dumps({"updated": n}))
    elif args.action == "export":
        out = export_sources(reg, args.index or "",
                             exported_at=_iso_utc(now_s))
        text = json.dumps(out, indent=1, default=str)
        if args.out:
            open(args.out, "w").write(text)
        else:
            print(text)
        return 0  # export mutates nothing
    elif args.action == "addcat":
        schema = json.load(open(args.schema))
        ids = reg.add_categories(schema)
        print(json.dumps({"category_ids": ids}))
    reg.save()
    return 0


def cmd_agents(args) -> int:
    """Agent-file console (reference cmd/crowler-agt: agents
    lint|validate|convert). No Ray session needed."""
    from .agents_cli import (
        AgentValidationError,
        convert_agent_file,
        lint_agent_file,
        validate_agent_file,
    )

    try:
        if args.action == "lint":
            lint_agent_file(args.file)
            print(json.dumps({"ok": True}))
        elif args.action == "validate":
            validate_agent_file(args.file, strict=args.strict)
            print(json.dumps({"ok": True, "strict": args.strict}))
        elif args.action == "convert":
            out = convert_agent_file(args.file, args.out, args.mode)
            if not args.out:
                sys.stdout.write(out)
    except AgentValidationError as exc:
        print(json.dumps({"ok": False,
                          "issues": [{"path": p, "message": m}
                                     for p, m in exc.issues]}))
        return 1
    except (ValueError, OSError) as exc:
        print(str(exc), file=sys.stderr)
        return 1
    return 0


def _iso_utc(now_s: float) -> str:
    import datetime as _dt

    return _dt.datetime.fromtimestamp(
        now_s, tz=_dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def cmd_export_training(args) -> int:
    """documents.parquet → admission/dedup/split/packing parquet export
    (+ optional uint32 token shards) — the training-data flagship as a
    one-command pipeline."""
    from .pipelines.token_shards import write_token_shards
    from .pipelines.training_export import export_training_set

    _ray_init(args.num_cpus)
    manifest = export_training_set(
        args.sf_dir, args.out, seed=args.seed, window=args.window)
    if args.token_shards:
        bpe_model = None
        if args.bpe_merges:
            import ray.data as _rd

            from .stages.bpe import train_bpe

            docs = _rd.read_parquet(
                os.path.join(args.sf_dir, "documents.parquet"),
                columns=["text"])
            bpe_model = train_bpe(docs, n_merges=args.bpe_merges)
        shards_dir = os.path.join(args.out, "token_shards")
        index = write_token_shards(
            args.sf_dir, shards_dir, vocab_size=args.vocab_size,
            seed=args.seed, window=args.window, bpe_model=bpe_model)
        manifest = dict(manifest, token_shards={
            "dir": shards_dir, "n_shards": len(index["shards"]),
            "tokenizer": index["tokenizer"],
            "vocab_size": index["vocab_size"]})
    print(json.dumps(manifest, indent=1, sort_keys=True))
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="thecrowler_ray")
    parser.add_argument("--num-cpus", type=int, default=None)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_crawl = sub.add_parser("crawl")
    p_crawl.add_argument("--config", default=None)
    p_crawl.add_argument("--out", default="/tmp/crowler_ray/cli_run")
    p_crawl.add_argument("--resume", action="store_true")
    p_crawl.set_defaults(fn=cmd_crawl)

    p_index = sub.add_parser("index")
    p_index.add_argument("--pages", required=True, help="glob of pages parquet")
    p_index.add_argument("--out", required=True)
    p_index.set_defaults(fn=cmd_index)

    p_search = sub.add_parser("search")
    p_search.add_argument("--index", required=True)
    p_search.add_argument("--query", required=True)
    p_search.add_argument("-k", type=int, default=10)
    p_search.set_defaults(fn=cmd_search)

    p_serve = sub.add_parser("serve")
    p_serve.add_argument("--index", required=True)
    p_serve.add_argument("--host", default="127.0.0.1")
    p_serve.add_argument("--port", type=int, default=8080)
    p_serve.add_argument("--rate-limit", default="10,10")
    p_serve.add_argument("--token", default="")
    p_serve.set_defaults(fn=cmd_serve)

    p_dedup = sub.add_parser("dedup")
    p_dedup.add_argument("--input", required=True)
    p_dedup.add_argument("--method", default="exact",
                         choices=["exact", "minhash", "simhash", "embedding"])
    p_dedup.add_argument("--out", required=True)
    p_dedup.add_argument("--id-col", dest="id_col", default="doc_id")
    p_dedup.add_argument("--emb-col", dest="emb_col", default="embedding")
    p_dedup.add_argument("--threshold", type=float, default=0.95)
    p_dedup.add_argument("--max-hamming", dest="max_hamming", type=int, default=12)
    p_dedup.set_defaults(fn=cmd_dedup)

    p_fp = sub.add_parser("fingerprint")
    p_fp.add_argument("--input", required=True)
    p_fp.add_argument("--out", required=True)
    p_fp.add_argument("--kinds", default="sha256,tlsh,cityhash64")
    p_fp.add_argument("--text-col", dest="text_col", default="text")
    p_fp.set_defaults(fn=cmd_fingerprint)

    p_an = sub.add_parser("analyze")
    p_an.add_argument("--input", required=True)
    p_an.add_argument("--out", required=True)
    p_an.set_defaults(fn=cmd_analyze)

    p_src = sub.add_parser("sources")
    p_src.add_argument("action",
                       choices=["add", "remove", "status", "export",
                                "addcat"])
    p_src.add_argument("--registry", required=True,
                       help="sources parquet path")
    p_src.add_argument("--url", default="")
    p_src.add_argument("--bulk", default="")
    p_src.add_argument("--cat-id", dest="cat_id", type=int, default=0)
    p_src.add_argument("--usr-id", dest="usr_id", type=int, default=0)
    p_src.add_argument("--restricted", type=int, default=1)
    p_src.add_argument("--flags", type=int, default=0)
    p_src.add_argument("--srccfg", default="")
    p_src.add_argument("--force", action="store_true")
    p_src.add_argument("--status", default="")
    p_src.add_argument("--id", type=int, default=0)
    p_src.add_argument("--all", action="store_true")
    p_src.add_argument("--yesterday", action="store_true")
    p_src.add_argument("--within", default="")
    p_src.add_argument("--after", default="")
    p_src.add_argument("--before", default="")
    p_src.add_argument("--index", default="")
    p_src.add_argument("--out", default="")
    p_src.add_argument("--schema", default="")
    p_src.set_defaults(fn=cmd_sources)

    p_exp = sub.add_parser("export-training")
    p_exp.add_argument("--sf-dir", required=True,
                       help="directory with documents.parquet")
    p_exp.add_argument("--out", required=True)
    p_exp.add_argument("--seed", default="s0")
    p_exp.add_argument("--window", type=int, default=2048)
    p_exp.add_argument("--token-shards", action="store_true",
                       help="also write uint32 token shards + index")
    p_exp.add_argument("--vocab-size", type=int, default=50_000)
    p_exp.add_argument("--bpe-merges", type=int, default=0,
                       help="train a byte-level BPE with this many merges "
                            "and tokenize shards with it (0 = FNV vocab)")
    p_exp.set_defaults(fn=cmd_export_training)

    p_agt = sub.add_parser("agents")
    p_agt.add_argument("action", choices=["lint", "validate", "convert"])
    p_agt.add_argument("file")
    p_agt.add_argument("--strict", action="store_true")
    p_agt.add_argument("--mode", default="",
                       choices=["", "json2yaml", "yaml2json"])
    p_agt.add_argument("--out", default="")
    p_agt.set_defaults(fn=cmd_agents)

    args = parser.parse_args(argv)
    try:
        return args.fn(args)
    finally:
        import ray

        # only tear down a session this CLI created (an embedding caller —
        # tests, a driver — keeps its own session)
        if _OWNS_RAY and ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())

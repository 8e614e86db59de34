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
import sys


def _ray_init(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


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

    args = parser.parse_args(argv)
    try:
        return args.fn(args)
    finally:
        import ray

        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())

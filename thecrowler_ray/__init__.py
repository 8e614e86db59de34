"""thecrowler_ray — a Ray-Data-native web-discovery data engine.

A from-scratch rebuild of the data-processing capabilities of
pzaino/thecrowler (reference at /root/reference, read-only) on top of
``ray.data.Dataset`` pipelines: stateless ``map_batches`` task stages for
canonicalization / parsing / extraction, stateful actor pools for URL-seen
membership (sharded cuckoo filters), per-host politeness token buckets and
robots caches, and explicit groupby/sort shuffles for dedup, wave ordering
and dictionary aggregation.

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()`` — the
session is owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"

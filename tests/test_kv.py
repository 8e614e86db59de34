import pytest
import ray

from thecrowler_ray.state.kv import KVStore, kv_actor


def test_kv_values_and_sessions():
    kv = KVStore()
    assert kv.set("a", 1, session="s1")
    assert kv.get("a") == 1
    assert kv.set("cfg", "locked", static=True)
    assert not kv.set("cfg", "overwrite")  # static wins
    assert kv.get("cfg") == "locked"
    kv.set("b", 2, session="s1", persistent=True)
    kv.set("c", 3, session="s2")
    assert kv.clean_session("s1") == 1    # only the non-persistent one
    assert kv.get("a") is None and kv.get("b") == 2 and kv.get("c") == 3
    assert kv.keys("s2") == ["c"]
    assert kv.delete("c") and not kv.delete("c")


def test_counters_with_windows():
    kv = KVStore()
    assert kv.incr("hits", now=100.0) == 1
    assert kv.incr("hits", by=4, now=101.0) == 5
    assert kv.counter("hits") == 5
    assert kv.incr("rate", window_seconds=10, now=100.0) == 1
    assert kv.incr("rate", now=105.0) == 2
    assert kv.incr("rate", now=111.0) == 1  # window rolled
    kv.reset_counter("hits")
    assert kv.counter("hits") == 0


def test_leases():
    kv = KVStore()
    assert kv.try_acquire("job", "w1", ttl_seconds=10, now=100.0)
    assert not kv.try_acquire("job", "w2", ttl_seconds=10, now=105.0)
    assert kv.try_acquire("job", "w1", ttl_seconds=10, now=105.0)  # re-entrant
    assert kv.lease_owner("job", now=105.0) == "w1"
    assert kv.try_acquire("job", "w2", ttl_seconds=10, now=120.0)  # expired
    assert kv.release("job", "w2") and not kv.release("job", "w2")
    assert kv.lease_owner("job", now=121.0) == ""


@pytest.mark.usefixtures("ray_session")
def test_named_actor_shared_across_callers():
    a = kv_actor("t_kv")
    b = kv_actor("t_kv")  # same actor by name
    ray.get(a.set.remote("x", 41))
    assert ray.get(b.get.remote("x")) == 41
    assert ray.get(b.incr.remote("n")) == 1
    assert ray.get(a.incr.remote("n")) == 2
    ray.kill(ray.get_actor("t_kv"))


def test_event_bus_local():
    from thecrowler_ray.state.events import EventBus

    bus = EventBus()
    e1 = bus.publish("crawl_done", "engine", details={"source": 1}, now=100.0)
    e2 = bus.publish("tmp", "engine", ttl_seconds=10, now=100.0)
    assert [e["event_id"] for e in bus.poll("engine", now=105.0)] == [e1, e2]
    # expiry drops e2
    assert [e["event_id"] for e in bus.poll("engine", now=111.0)] == [e1]
    assert bus.ack(e1) and not bus.ack(e1)

    bus.add_schedule("agg", "run_timeseries", every_seconds=60, now=100.0)
    assert bus.due_schedules(now=130.0) == []
    assert bus.due_schedules(now=161.0) == ["agg"]
    assert bus.due_schedules(now=165.0) == []  # just ran
    fired = bus.poll("scheduler", now=165.0)
    assert fired and fired[0]["details"]["schedule"] == "agg"


@pytest.mark.usefixtures("ray_session")
def test_event_bus_actor_shared():
    from thecrowler_ray.state.events import event_bus

    a = event_bus("t_events")
    b = event_bus("t_events")
    eid = ray.get(a.publish.remote("x", "t"))
    assert ray.get(b.poll.remote("t"))[0]["event_id"] == eid
    ray.kill(ray.get_actor("t_events"))


@pytest.mark.usefixtures("ray_session")
def test_crawl_publishes_events():
    import shutil

    from thecrowler_ray.pipelines.crawl import CrawlRun, EngineConfig
    from thecrowler_ray.sources.synthweb import CorpusConfig, seed_urls
    from thecrowler_ray.state.events import event_bus

    bus = event_bus("t_crawl_events")
    cfg = CorpusConfig(seed=42, n_hosts=3, base_pages=10)
    shutil.rmtree("/tmp/crowler_t_events", ignore_errors=True)
    run = CrawlRun(cfg, seed_urls(cfg, 2), EngineConfig(
        max_links=30, max_waves=4, out_dir="/tmp/crowler_t_events",
        n_seen_shards=2, n_pol_shards=2, seen_log2_buckets=10),
        events_bus=bus)
    summary = run.run()
    events = ray.get(bus.poll.remote("engine"))
    actions = [e["action"] for e in events]
    assert "crawl_complete" in actions
    assert actions.count("crawl_wave_complete") == summary["waves"]
    done = [e for e in events if e["action"] == "crawl_complete"][0]
    assert done["details"]["total_fetched"] == summary["total_fetched"]
    ray.kill(ray.get_actor("t_crawl_events"))


@pytest.mark.usefixtures("ray_session")
def test_storage_seam_roundtrip(tmp_path):
    """write_table/read_table: auto resolves to parquet here (no lance in
    container), round-trips a Dataset, and format='lance' fails loudly
    rather than silently degrading."""
    import pyarrow as pa
    import pytest as _pytest
    import ray.data

    from thecrowler_ray.storage import (
        lance_available,
        read_table,
        resolve_format,
        write_table,
    )

    assert resolve_format("auto") in ("lance", "parquet")
    ds = ray.data.from_arrow(pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]}))
    used = write_table(ds, str(tmp_path / "t"), "auto")
    back = read_table(str(tmp_path / "t")).to_pandas().sort_values("a")
    assert list(back.a) == [1, 2, 3] and list(back.b) == ["x", "y", "z"]
    if not lance_available():
        assert used == "parquet"
        with _pytest.raises(ImportError):
            resolve_format("lance")
    with _pytest.raises(ValueError):
        resolve_format("csvish")


@pytest.mark.usefixtures("ray_session")
def test_event_handlers_consume_events(tmp_path):
    """§3.3 consumer loop: events dispatch to registered handlers by type,
    unmatched events are dropped, scheduled actions run real pipelines
    (time-series aggregation) through the scheduler->handler path."""
    import ray

    from thecrowler_ray.pipelines.handlers import (
        HandlerRegistry,
        drain_events,
        make_timeseries_handler,
        run_schedules,
        scheduler_router,
    )
    from thecrowler_ray.state.events import event_bus

    bus = event_bus("t_handlers_bus")
    reg = HandlerRegistry()
    seen = []
    reg.register("content_change", lambda ev: seen.append(ev["action"]) or "ok")

    ray.get(bus.publish.remote("recrawl", "content_change", now=100.0))
    ray.get(bus.publish.remote("nobody_listens", "mystery", now=100.0))
    out = drain_events(bus, reg, now=101.0)
    assert out["handled"] == 1 and out["dropped"] == 1
    assert seen == ["recrawl"]
    assert ray.get(bus.poll.remote(None, 101.0)) == []  # all acked

    # scheduled time-series aggregation fires through the scheduler router
    ts_out = str(tmp_path / "ts_agg")
    reg.register("timeseries_aggregate",
                 make_timeseries_handler("/root/testdata/sf0.001", ts_out))
    scheduler_router(reg)
    ray.get(bus.add_schedule.remote("ts", "timeseries_aggregate", 60.0, now=200.0))
    res = run_schedules(bus, reg, now=199.0 + 60.0 + 1.0)
    assert res["fired"] == ["ts"]
    assert res["handled"] == 1
    agg = res["results"][0]["result"][0]
    assert agg["rows"] > 0
    import ray.data as rd

    assert rd.read_parquet(ts_out).count() == agg["rows"]
    # not due again immediately
    res2 = run_schedules(bus, reg, now=260.5)
    assert res2["fired"] == [] and res2["handled"] == 0


@pytest.mark.usefixtures("ray_session")
def test_drain_events_broadcasts_to_ws_hub():
    """Events flowing through the consumer loop surface as live "event"
    websocket messages (services/events/main.go:1157)."""
    import json

    import ray

    from thecrowler_ray.pipelines.handlers import HandlerRegistry, drain_events
    from thecrowler_ray.state.events import event_bus
    from thecrowler_ray.ws import OP_TEXT, Client, Hub, WSConfig

    bus = event_bus("t_ws_bus")
    reg = HandlerRegistry()
    reg.register("content_change", lambda ev: "ok")
    hub = Hub("events", WSConfig(enabled=True, allowed_origins=["*"]))
    spy = Client(hub, sock=None)  # thread-less client; frames pile up in queue
    hub._clients.add(spy)

    ray.get(bus.publish.remote("recrawl", "content_change", now=100.0))
    out = drain_events(bus, reg, now=101.0, ws_hub=hub)
    assert out["handled"] == 1
    frame = spy.send.get_nowait()
    # skip the 2-byte header; payload is unmasked server->client JSON
    msg = json.loads(frame[2 + (frame[1] & 0x7F >= 126) * 2:])
    assert msg["type"] == "event" and msg["service"] == "events"
    assert msg["payload"]["action"] == "recrawl"

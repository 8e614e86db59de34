"""Fleet heartbeat tests (services/events/helpers.go:84-362) over the
EventBus actor."""

import pytest

from thecrowler_ray.pipelines.heartbeat import (
    HeartbeatCoordinator,
    normalize_heartbeat_timeout,
    respond_to_heartbeat,
)


def test_timeout_normalization():
    assert normalize_heartbeat_timeout(None) == 15.0
    assert normalize_heartbeat_timeout("garbage") == 15.0
    assert normalize_heartbeat_timeout(0) == 15.0
    assert normalize_heartbeat_timeout(3) == 15.0  # sub-5s snaps back
    assert normalize_heartbeat_timeout(30) == 30.0


@pytest.mark.usefixtures("ray_session")
def test_heartbeat_round_trip_and_idle_maintenance():
    import ray

    from thecrowler_ray.state.events import event_bus

    bus = event_bus("t_heartbeat_bus")
    hb = HeartbeatCoordinator(bus, origin_name="events-manager-1",
                              timeout=15, master="events-manager-1",
                              maintenance_interval=3600)
    parent = hb.start(now=100.0)
    assert parent is not None
    assert hb.start(now=101.0) is None  # one round at a time

    # replicas see the broadcast and answer; a busy engine reports running
    requests = ray.get(bus.poll.remote("crowler_heartbeat", 101.0))
    assert len(requests) == 1
    respond_to_heartbeat(bus, requests[0], "engine-1",
                         pipeline_status=[], now=102.0)
    respond_to_heartbeat(bus, requests[0], "engine-2",
                         pipeline_status=[{"pipeline_status": "completed",
                                           "crawling_status": "idle"}],
                         now=102.0)
    # a stale response for another round is ignored
    ray.get(bus.publish.remote("", "crowler_heartbeat_response",
                               details={"parent_event_id": "999",
                                        "origin_name": "ghost"},
                               now=102.0))
    assert hb.collect(now=103.0) == 2
    report = hb.finish(now=110.0)
    assert report["total"] == 2
    assert report["responders"] == ["engine-1", "engine-2"]
    assert report["all_idle"] is True
    assert report["maintenance_scheduled"] is True
    maint = ray.get(bus.poll.remote("system_event", 111.0))
    assert maint and maint[0]["details"]["reason"] == "all_fleet_idle"

    # second idle round inside the interval → no second maintenance event
    hb.start(now=120.0)
    report2 = hb.finish(now=130.0)
    assert report2["maintenance_scheduled"] is False


@pytest.mark.usefixtures("ray_session")
def test_busy_fleet_blocks_maintenance_and_non_master():
    import ray

    from thecrowler_ray.state.events import event_bus

    bus = event_bus("t_heartbeat_busy_bus")
    hb = HeartbeatCoordinator(bus, origin_name="events-manager-1",
                              master="events-manager-1",
                              maintenance_interval=3600)
    parent = hb.start(now=10.0)
    requests = ray.get(bus.poll.remote("crowler_heartbeat", 11.0))
    respond_to_heartbeat(
        bus, requests[0], "engine-1",
        pipeline_status=[{"pipeline_status": "idle",
                          "netinfo_status": "Running "}], now=12.0)
    hb.collect(now=13.0)
    report = hb.finish(now=26.0)
    assert report["all_idle"] is False
    assert report["maintenance_scheduled"] is False
    assert report["parent_id"] == parent

    # non-master never schedules even when idle
    hb2 = HeartbeatCoordinator(bus, origin_name="events-manager-2",
                               master="events-manager-1",
                               maintenance_interval=3600)
    hb2.start(now=30.0)
    assert hb2.finish(now=50.0)["maintenance_scheduled"] is False

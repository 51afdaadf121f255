"""Cost-model routing decisions across link operating points."""

import os

from defuse_tpu.pipeline.routing import LINK_POINTS, routing_table


def test_routing_crossover():
    """On the tunneled dev link every stage stays host-side at bench
    shapes; at PCIe-class parameters the screen and verify kernels
    engage (the kernels beat host compute, so only the link can route
    them away)."""
    table = routing_table()
    assert set(table) == {"tunnel", "pcie"}
    t = table["tunnel"]
    assert t["screen"]["choice"] == "host"
    assert t["verify"]["choice"] == "host"
    p = table["pcie"]
    assert p["screen"]["choice"] == "device"
    assert p["verify"]["choice"] == "device"
    for point in table.values():
        for stage in ("screen", "verify", "em"):
            assert point[stage]["t_dev_s"] > 0
            assert point[stage]["t_host_s"] > 0


def test_link_profile_env_override(monkeypatch):
    from defuse_tpu.core import devices

    monkeypatch.setenv("DEFUSE_LINK_BW", "1000")
    monkeypatch.setenv("DEFUSE_LINK_RTT", "1")
    link = devices.link_profile()
    assert link["bw_MBps"] == 1000.0
    assert link["rtt_ms"] == 1.0
    assert link["override"] is True

"""Resource telemetry channel (VERDICT r1 missing #5; reference
package.json:17-26 node-nvidia-smi graphs)."""
import asyncio
import logging
import time

from xva_trainer_tpu.utils import telemetry


def test_cpu_percent_in_range():
    telemetry.cpu_percent()  # prime
    for _ in range(200000):
        pass  # burn a little cpu
    time.sleep(0.05)
    v = telemetry.cpu_percent()
    assert 0.0 <= v <= 100.0


def test_ram_and_disk():
    ram = telemetry.ram_usage()
    assert ram["total_gb"] > 0 and 0 <= ram["percent"] <= 100
    disk = telemetry.disk_usage("/")
    assert disk["total_gb"] > 0 and 0 <= disk["percent"] <= 100


def test_snapshot_shape():
    s = telemetry.snapshot()
    assert {"time", "cpu_percent", "ram", "disk", "device",
            "pid_rss_gb"} <= set(s)
    assert s["pid_rss_gb"] > 0  # this process certainly has RSS
    assert "platform" in s["device"]


def test_resource_usage_endpoint():
    from xva_trainer_tpu.app import AppServer

    lg = logging.getLogger("t-telemetry")
    lg.addHandler(logging.NullHandler())
    lg.propagate = False
    server = AppServer(logger=lg)
    out = asyncio.new_event_loop().run_until_complete(
        server.handle_http("/resourceUsage", {}))
    assert 0 <= out["cpu_percent"] <= 100
    assert out["ram"]["total_gb"] > 0


def test_profile_endpoints(tmp_path):
    """on-demand jax.profiler capture via /profileStart + /profileStop."""
    import asyncio
    import os

    import jax.numpy as jnp

    from xva_trainer_tpu.app.server import AppServer

    async def run():
        srv = AppServer(http_port=8097, ws_port=8098)
        d = str(tmp_path / "traces")
        r = await srv.handle_http("/profileStart", {"dir": d})
        assert r["ok"], r
        # double-start refused
        r2 = await srv.handle_http("/profileStart", {"dir": d})
        assert not r2["ok"]
        (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
        r3 = await srv.handle_http("/profileStop", {})
        assert r3["ok"] and r3["dir"] == d
        # stop without start refused
        r4 = await srv.handle_http("/profileStop", {})
        assert not r4["ok"]
        found = [f for _, _, fs in os.walk(d) for f in fs]
        assert found, "trace directory is empty"

    asyncio.run(run())

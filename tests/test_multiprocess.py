"""Launcher for the true multi-process (multi-controller) mesh test.

The single-process mesh suite (tests/test_mesh.py) validates sharding
semantics on 8 virtual devices in one process; this test additionally
exercises the cross-process path a TPU pod uses — jax.distributed
coordination and collectives that actually cross process boundaries —
by running 2 JAX processes x 4 CPU devices each (SURVEY.md par.4
item d: "multi-host tests via host-device-count spoofing").
"""

import os
import pathlib
import socket
import subprocess
import sys

WORKER = pathlib.Path(__file__).parent / "mesh" / "mp_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disables eager TPU plugin
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coord, "2", str(pid)],
            env=env,
            cwd=str(WORKER.parent.parent.parent),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {pid} failed (rc={p.returncode})\n{out[-6000:]}"
        )
        assert f"proc {pid}:" in out, out[-2000:]
        assert "batch dp x sp verified" in out, out[-2000:]
        assert "4K batch downsize verified" in out, out[-2000:]
        assert "2d cross-process verified" in out, out[-2000:]

"""Launcher for the multi-device mesh tests (tests/mesh/).

The mesh tests need 8 virtual CPU devices, which requires XLA flags to be
set before any JAX backend initializes.  Environments that eagerly
register a TPU plugin at interpreter start (sitecustomize) make that
impossible in-process, so the mesh suite runs in a subprocess with a
sanitized environment.
"""

import os
import pathlib
import subprocess
import sys

MESH_DIR = pathlib.Path(__file__).parent / "mesh"


def test_mesh_suite():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disables eager TPU plugin
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", str(MESH_DIR / "sharded_mesh.py"),
         "-q", "--no-header", "-p", "no:cacheprovider"],
        env=env,
        cwd=str(MESH_DIR.parent.parent),
        capture_output=True,
        text=True,
        timeout=1800,
    )
    if proc.returncode != 0:
        raise AssertionError(
            "mesh suite failed\n--- stdout ---\n"
            + proc.stdout[-8000:]
            + "\n--- stderr ---\n"
            + proc.stderr[-4000:]
        )

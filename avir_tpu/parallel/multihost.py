"""Multi-host setup helpers.

The reference has no distributed layer (SURVEY.md §2.3); this module is
the new capability: initialize JAX's multi-host runtime and build the
standard (dp, sp) mesh used by ``make_sharded_avir_executor`` so that
row strips ride ICI within a host-block and batch data-parallelism
spans hosts over DCN.

Typical pod usage (same program on every host):

    from avir_tpu.parallel import multihost, sharded
    multihost.initialize()                       # jax.distributed
    mesh = multihost.make_dp_sp_mesh(sp=8)       # rows within 8 chips
    fn = sharded.make_sharded_avir_executor(
        plan, mesh, rows_axis="sp", batch_axis="dp")

Single-process testing uses ``XLA_FLAGS=--xla_force_host_platform_
device_count=N`` (see tests/mesh/ and __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

from typing import Optional



def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op if already initialized or
    single-process).  Arguments default to the TPU pod auto-detection
    path of jax.distributed.initialize."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # Already initialized, or single-process without coordinator.
        pass


def make_dp_sp_mesh(sp: Optional[int] = None):
    """Mesh with a scanline-parallel axis of size ``sp`` (default: all
    devices on one axis) and batch data-parallelism over the rest.

    ASSUMPTION (verified below): the sp axis must land on
    physically-adjacent devices so the halo ppermutes ride ICI rather
    than DCN.  ``jax.make_mesh`` hands the MINOR mesh axis the
    fastest-varying (most-local) hardware dimension, and this helper
    always places sp minor; when sp does not exceed a host's local
    device count we additionally assert that each sp column stays
    within one process, which guarantees intra-host ICI for its
    ppermutes.  For sp spanning hosts, make_mesh's device assignment
    follows the pod's physical torus order — adjacent by construction —
    but crossing DCN-connected host groups is then the caller's
    topology decision.
    """
    import jax
    import numpy as np

    n = len(jax.devices())
    if sp is None:
        sp = n
    if n % sp != 0:
        raise ValueError(f"device count {n} not divisible by sp={sp}")
    mesh = jax.make_mesh((n // sp, sp), ("dp", "sp"))
    local = jax.local_device_count()
    if sp <= local:
        procs = np.vectorize(lambda d: d.process_index)(mesh.devices)
        if not (procs == procs[:, :1]).all():
            raise ValueError(
                "sp axis crosses process boundaries despite fitting "
                "in one host; device ordering violates the adjacency "
                "assumption (halo ppermutes would ride DCN)"
            )
    return mesh

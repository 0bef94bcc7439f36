"""Multi-process mesh worker: one JAX process of a 2-process x
4-device-per-process CPU cluster (launched by tests/test_multiprocess.py).

Exercises the true multi-controller path that a TPU pod uses
(SURVEY.md par.4 item d): jax.distributed.initialize over a local
coordinator, a global (sp=8) mesh spanning both processes, global
input arrays assembled from process-local shards, and cross-process
halo-exchange collectives inside the sharded executor.  Each process
checks its addressable output rows against the float64 host oracle.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent.parent))


def main() -> int:
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from avir_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )

    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc * jax.local_device_count()

    from conftest import xorshift128_fill
    from avir_tpu.models.host_reference import execute_plan_numpy
    from avir_tpu.parallel.sharded import make_sharded_avir_executor
    from avir_tpu.plan.plan import build_resize_plan

    mesh = multihost.make_dp_sp_mesh()  # (dp=1, sp=8) across processes
    assert mesh.shape["sp"] == nproc * jax.local_device_count()

    # Same deterministic image on every process (multi-controller SPMD).
    sh, sw, c = 256, 96, 3
    nh, nw = 160, 64
    src = xorshift128_fill((sh, sw, c), np.uint8, 123)
    plan = build_resize_plan(sw, sh, nw, nh, c, np.uint8, np.uint8)
    fn = make_sharded_avir_executor(plan, mesh, rows_axis="sp")

    flat = src.reshape(sh, sw * c)
    sharding = NamedSharding(mesh, P("sp", None))
    garr = jax.make_array_from_callback(
        flat.shape, sharding, lambda idx: flat[idx]
    )
    out = fn(garr)
    jax.block_until_ready(out)

    oracle = execute_plan_numpy(plan, src).reshape(nh, nw * c)
    checked = 0
    for shard in out.addressable_shards:
        rows = shard.index[0]
        got = np.asarray(shard.data).astype(np.int64)
        ref = oracle[rows].astype(np.int64)
        maxdiff = np.abs(got - ref).max() if got.size else 0
        assert maxdiff <= 1, (pid, rows, maxdiff)
        checked += got.shape[0]
    assert checked == nh // nproc, checked
    print(f"proc {pid}: {checked} output rows verified", flush=True)

    # Scenario 1b — the PRODUCTION kernel across processes: the same
    # geometry through the fused-Pallas strip route (interpret mode on
    # CPU devices), so the cross-process halo ppermutes feed the strip
    # kernel exactly as a TPU pod would (scenario 1 covers the
    # portable XLA route).
    fn1b = make_sharded_avir_executor(
        plan, mesh, rows_axis="sp", engine="pallas", interpret=True
    )
    out1b = fn1b(garr)
    jax.block_until_ready(out1b)
    checked1b = 0
    for shard in out1b.addressable_shards:
        rows = shard.index[0]
        got = np.asarray(shard.data).astype(np.int64)
        ref = oracle[rows].astype(np.int64)
        maxdiff = np.abs(got - ref).max() if got.size else 0
        assert maxdiff <= 1, (pid, rows, maxdiff)
        checked1b += got.shape[0]
    assert checked1b == nh // nproc, checked1b
    print(f"proc {pid}: pallas strip route verified", flush=True)

    # Scenario 2 — the BASELINE.json multi-host config shape: BATCH
    # downsize on a 2-D (dp, sp) mesh where the batch axis spans
    # processes (DCN-analog) and row strips span the local devices.
    mesh2 = multihost.make_dp_sp_mesh(sp=jax.local_device_count())
    assert mesh2.shape["dp"] == nproc
    bsz, sh2, sw2 = 2, 512, 384
    nh2, nw2 = 128, 96
    batch = np.stack(
        [xorshift128_fill((sh2, sw2, c), np.uint8, 500 + i) for i in range(bsz)]
    )
    plan2 = build_resize_plan(sw2, sh2, nw2, nh2, c, np.uint8, np.uint8)
    fn2 = make_sharded_avir_executor(
        plan2, mesh2, rows_axis="sp", batch_axis="dp"
    )
    flat2 = batch.reshape(bsz, sh2, sw2 * c)
    sh2d = NamedSharding(mesh2, P("dp", "sp", None))
    garr2 = jax.make_array_from_callback(
        flat2.shape, sh2d, lambda idx: flat2[idx]
    )
    out2 = fn2(garr2)
    jax.block_until_ready(out2)
    oracles = [
        execute_plan_numpy(plan2, batch[i]).reshape(nh2, nw2 * c)
        for i in range(bsz)
    ]
    checked2 = 0
    for shard in out2.addressable_shards:
        b, rows = shard.index[0], shard.index[1]
        got = np.asarray(shard.data).astype(np.int64)
        for j, bi in enumerate(range(*b.indices(bsz))):
            ref = oracles[bi][rows].astype(np.int64)
            maxdiff = np.abs(got[j] - ref).max() if got[j].size else 0
            assert maxdiff <= 1, (pid, bi, rows, maxdiff)
            checked2 += got[j].shape[0]
    assert checked2 == nh2, checked2  # one batch element per process
    print(f"proc {pid}: batch dp x sp verified", flush=True)

    # Scenario 3 — BASELINE.json config 5 at representative scale:
    # 4Kx4K -> 1Kx1K RGB batch downsize, batch across processes (DCN
    # analog), row strips across the 4 local devices.  Parity is
    # asserted against the float64 host oracle on every addressable
    # shard (full coverage across the 2 processes).
    sh3, sw3, nh3, nw3 = 4096, 4096, 1024, 1024
    batch3 = np.stack(
        [
            xorshift128_fill((sh3, sw3, c), np.uint8, 900 + i)
            for i in range(nproc)
        ]
    )
    plan3 = build_resize_plan(sw3, sh3, nw3, nh3, c, np.uint8, np.uint8)
    fn3 = make_sharded_avir_executor(
        plan3, mesh2, rows_axis="sp", batch_axis="dp"
    )
    flat3 = batch3.reshape(nproc, sh3, sw3 * c)
    garr3 = jax.make_array_from_callback(
        flat3.shape, sh2d, lambda idx: flat3[idx]
    )
    out3 = fn3(garr3)
    jax.block_until_ready(out3)
    checked3 = 0
    for shard in out3.addressable_shards:
        b, rows = shard.index[0], shard.index[1]
        got = np.asarray(shard.data).astype(np.int64)
        for j, bi in enumerate(range(*b.indices(nproc))):
            oracle3 = execute_plan_numpy(plan3, batch3[bi]).reshape(
                nh3, nw3 * c
            )
            ref = oracle3[rows].astype(np.int64)
            maxdiff = np.abs(got[j] - ref).max() if got[j].size else 0
            assert maxdiff <= 1, (pid, bi, rows, maxdiff)
            checked3 += got[j].shape[0]
    assert checked3 == nh3, checked3
    print(f"proc {pid}: 4K batch downsize verified", flush=True)

    # Scenario 4 — BASELINE.json config 5 VERBATIM geometry: 16K x 16K
    # -> 4K RGB downsize, row-strip sharded across both processes
    # (sp=8 spanning the 2-process cluster, cross-process halo
    # ppermutes).  Full-image f64 oracles are unaffordable at 16K, so
    # parity uses the sampled-row oracle (execute_plan_rows_numpy):
    # 16 deterministic rows per process checked at <= 1 LSB.
    from avir_tpu.models.host_reference import execute_plan_rows_numpy

    sh4, sw4, nh4, nw4 = 16384, 16384, 4096, 4096
    src4 = xorshift128_fill((sh4, sw4 * c), np.uint8, 777).reshape(
        sh4, sw4, c
    )
    plan4 = build_resize_plan(sw4, sh4, nw4, nh4, c, np.uint8, np.uint8)
    fn4 = make_sharded_avir_executor(plan4, mesh, rows_axis="sp")
    flat4 = src4.reshape(sh4, sw4 * c)
    garr4 = jax.make_array_from_callback(
        flat4.shape, sharding, lambda idx: flat4[idx]
    )
    out4 = fn4(garr4)
    jax.block_until_ready(out4)
    rng4 = np.random.default_rng(4242)  # same stream on both processes
    sample = np.sort(rng4.choice(nh4, size=32, replace=False))
    oracle4 = execute_plan_rows_numpy(plan4, src4, sample)
    oracle4 = oracle4.reshape(len(sample), nw4 * c)
    checked4 = 0
    for shard in out4.addressable_shards:
        r0, r1 = shard.index[0].start or 0, shard.index[0].stop
        mine = [i for i, r in enumerate(sample) if r0 <= r < r1]
        if not mine:
            continue
        got = np.asarray(shard.data).astype(np.int64)
        for i in mine:
            diff = np.abs(
                got[sample[i] - r0] - oracle4[i].astype(np.int64)
            ).max()
            assert diff <= 1, (pid, int(sample[i]), diff)
            checked4 += 1
    assert checked4 >= 8, checked4  # each process owns ~half the rows
    print(f"proc {pid}: 16K row-sharded sampled parity verified",
          flush=True)

    # Scenario 5 — 2-D intra-image sharding ACROSS processes (VERDICT
    # r4 item 7): an (sp=2, cp=2, dp=2) mesh laid out so the sp axis
    # spans the two processes — the 2-D executor's ROW-halo ppermutes
    # cross the process boundary while column halos ride the local
    # devices (the ICI-local axis of a pod), under a batch axis, on
    # the fused-Pallas tile body (interpret mode on CPU devices).
    from jax.sharding import Mesh
    from avir_tpu.parallel.sharded import make_sharded_avir_executor_2d

    mesh5 = Mesh(
        np.array(jax.devices()).reshape(2, 2, 2), ("sp", "cp", "dp")
    )
    sh5, sw5, nh5, nw5, b5 = 128, 96, 64, 48, 2
    batch5 = np.stack(
        [
            xorshift128_fill((sh5, sw5, c), np.uint8, 1500 + i)
            for i in range(b5)
        ]
    )
    plan5 = build_resize_plan(sw5, sh5, nw5, nh5, c, np.uint8, np.uint8)
    fn5 = make_sharded_avir_executor_2d(
        plan5, mesh5, rows_axis="sp", cols_axis="cp", batch_axis="dp",
        engine="pallas", interpret=True,
    )
    flat5 = batch5.reshape(b5, sh5, sw5 * c)
    sh5d = NamedSharding(mesh5, P("dp", "sp", "cp"))
    garr5 = jax.make_array_from_callback(
        flat5.shape, sh5d, lambda idx: flat5[idx]
    )
    out5 = fn5(garr5)
    jax.block_until_ready(out5)
    oracles5 = [
        execute_plan_numpy(plan5, batch5[i]).reshape(nh5, nw5 * c)
        for i in range(b5)
    ]
    checked5 = 0
    for shard in out5.addressable_shards:
        b, rows, cols = shard.index
        got = np.asarray(shard.data).astype(np.int64)
        for j, bi in enumerate(range(*b.indices(b5))):
            ref = oracles5[bi][rows, cols].astype(np.int64)
            maxdiff = np.abs(got[j] - ref).max() if got[j].size else 0
            assert maxdiff <= 1, (pid, bi, rows, cols, maxdiff)
            checked5 += got[j].size
    # Each process holds half the global (b, rows, cols) output cells.
    assert checked5 == b5 * nh5 * nw5 * c // nproc, checked5
    print(f"proc {pid}: 2d cross-process verified", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

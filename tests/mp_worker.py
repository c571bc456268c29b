"""Subprocess worker for the multi-process (pod) trainer test.

Each worker is one "host" of a 2-process CPU pod: it pins the CPU
platform with 2 virtual local devices, joins the jax.distributed
coordinator, builds the global 4-device data mesh, feeds its disjoint
host-local slice of every global batch (ArrayDataset process sharding),
and runs one epoch of the full CycleGan trainer. The lead process writes
the checkpoint; the test then replays the same schedule single-process
and asserts the trained params match.

Run: python tests/mp_worker.py <coordinator_port> <process_id> <nproc> <workdir>
"""

import os
import sys
import traceback


def build_configs(workdir):
    from tests.test_trainer import tiny_model_config, tiny_train_config

    model_config = tiny_model_config(workdir)
    train_config = tiny_train_config(epochs=1, batch_size=2, image_size=16)
    return model_config, train_config


def make_domains(n=8, size=16):
    # Deterministic and identical on every host — each host then feeds its
    # own disjoint slice via ArrayDataset(process_index, process_count).
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, size=(n, size, size, 3), dtype=np.uint8)
    b = rng.integers(0, 256, size=(n, size, size, 3), dtype=np.uint8)
    return a, b


def main() -> int:
    port, pid, nproc, workdir = sys.argv[1:5]
    pid, nproc = int(pid), int(nproc)
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception as exc:  # jaxlib built without gloo
        print(f"MP_SKIP no gloo cpu collectives: {exc}", flush=True)
        return 0
    try:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc,
            process_id=pid,
        )
    except Exception as exc:
        print(f"MP_SKIP distributed init failed: {exc}", flush=True)
        return 0

    assert jax.process_index() == pid
    assert jax.process_count() == nproc
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 2 * nproc

    import numpy as np

    from cyclegan_tpu.data.pipeline import ArrayDataset
    from cyclegan_tpu.parallel import create_mesh
    from cyclegan_tpu.trainer import CHECKPOINT_FILE, CycleGan

    model_config, train_config = build_configs(workdir)
    mesh = create_mesh()  # all 4 global devices
    assert mesh.devices.size == 2 * nproc
    gan = CycleGan(model_config, train_config, mesh=mesh)

    a, b = make_domains()
    train_ds = ArrayDataset(a, b, shuffle=True, seed=0,
                            process_index=pid, process_count=nproc)
    val_ds = ArrayDataset(a[:4], b[:4], shuffle=False,
                          process_index=pid, process_count=nproc)
    gan.train(train_ds, val_ds)

    # Spatial-axis process locality (mesh.shard_batch guard): a spatial
    # axis spanning hosts must raise — each host feeds FULL-HEIGHT images,
    # so cross-host H assembly would silently corrupt the global batch —
    # while the standard layout (cross-host 'data', intra-host 'spatial')
    # must assemble fine.
    from cyclegan_tpu.parallel import shard_batch
    from cyclegan_tpu.parallel.spatial import create_spatial_mesh

    x = np.zeros((1, 16, 16, 3), np.float32)
    spanning = create_spatial_mesh(data=1, spatial=2 * nproc)
    try:
        shard_batch(spanning, x, spatial_axis="spatial")
    except ValueError as exc:
        assert "spans processes" in str(exc), exc
    else:
        raise AssertionError("cross-host spatial axis must be rejected")
    intra = create_spatial_mesh(data=nproc, spatial=2)
    g = shard_batch(intra, x, spatial_axis="spatial")
    assert g.shape == (nproc, 16, 16, 3), g.shape  # data axis spans hosts
    print(f"MP_SPATIAL_OK pid={pid}", flush=True)

    ckpt = os.path.join(workdir, "tiny", CHECKPOINT_FILE)
    if pid == 0:
        assert os.path.exists(ckpt), "lead process must write the checkpoint"
    # every host holds the same replicated final state
    flat, _ = jax.flatten_util.ravel_pytree(jax.device_get(gan.state.params))
    digest = float(np.sum(np.asarray(flat, np.float64) ** 2))
    print(f"MP_OK pid={pid} step={int(gan.state.step)} "
          f"params_sq={digest:.10e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        sys.exit(main())
    except Exception:
        traceback.print_exc()
        sys.exit(1)

"""Subprocess worker for the two-process ``jax.distributed`` smoke test.

Launched by ``test_parallel_utils.py::test_two_process_distributed`` as
``python distributed_worker.py <port> <process_id>``; each process owns one
CPU device, joins the localhost coordinator, shards a global batch through
``local_batch_slice``, and reduces it over DCN — printing one JSON line the
parent asserts on.
"""

import json
import os
import sys


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    os.environ["JAX_PLATFORMS"] = "cpu"
    # one local device per process so the global mesh is 2 devices / 2 hosts
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from vit_grid_model_tpu.core import distributed

    # must run BEFORE any backend use (the module enforces this)
    distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    devs = jax.devices()                       # global: 2 CPU devices
    assert len(devs) == 2, devs
    mesh = Mesh(np.asarray(devs).reshape(2, 1), ("data", "model"))

    # per-host disjoint shard of a global batch of 8
    sl = distributed.local_batch_slice(8)
    global_x = np.arange(8, dtype=np.float32)
    sharding = NamedSharding(mesh, P("data"))
    arr = jax.make_array_from_process_local_data(sharding, global_x[sl],
                                                 global_x.shape)
    # the sum crosses hosts: GSPMD emits the DCN collective
    total = jax.jit(jnp.sum,
                    out_shardings=NamedSharding(mesh, P()))(arr)
    print(json.dumps({
        "pid": pid,
        "process_count": jax.process_count(),
        "is_primary": distributed.is_primary(),
        "slice": [sl.start, sl.stop],
        "sum": float(total),
    }), flush=True)


if __name__ == "__main__":
    main()

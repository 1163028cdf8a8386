"""Child process for the 2-process jax.distributed smoke test.

Run as: python _multihost_child.py <process_id> <coordinator_port>
Forces the CPU backend with 4 virtual devices per process, joins the
2-process cluster over DCN (localhost), builds a global 8-device mesh,
and verifies a sharded computation + cross-process reduction.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert jax.device_count() == 8

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("batch",))
    # each process contributes its local (4, 3) shard of the global (8, 3)
    local = np.arange(12.0).reshape(4, 3) + 100.0 * pid
    garr = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("batch"))

    @jax.jit
    def f(a):
        return jnp.sum(a * 2.0)

    s = float(f(garr))  # fully replicated scalar: addressable everywhere
    expected = 2.0 * (np.arange(12.0).sum() * 2 + 100.0 * 12)
    assert abs(s - expected) < 1e-9, (s, expected)
    print(f"proc {pid}: OK sum={s}", flush=True)


if __name__ == "__main__":
    main()

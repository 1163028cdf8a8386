"""SPMD scaling: device meshes, batch sharding, multi-host init."""

from mpc_code_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    batched_closed_loop,
    make_closed_loop_runner,
    init_distributed,
)

__all__ = ["make_mesh", "shard_batch", "batched_closed_loop", "make_closed_loop_runner", "init_distributed"]

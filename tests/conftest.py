"""Test configuration: run everything on a virtual 8-device CPU mesh in f64.

Real-TPU runs are exercised by bench.py and the driver's compile checks; the
test suite validates numerics (f64 on CPU) and multi-chip sharding (virtual
devices), per SURVEY.md section 4 test strategy item 4.

Note: the environment's sitecustomize imports jax and registers the remote
TPU ('axon') backend before conftest runs, so the env-var route
(JAX_PLATFORMS) is already latched — we must override via jax.config.
"""

import os

# The remote-TPU ('axon') PJRT plugin registers itself in EVERY python
# process via sitecustomize when PALLAS_AXON_POOL_IPS is set, and its
# native client can abort the whole process when the tunnel is flaky —
# observed as intermittent faulthandler crashes in pure-CPU tests.  The
# suite never uses the remote chip, so drop the trigger variable here:
# xdist workers (and any subprocess a test spawns) then start without the
# plugin entirely.  (Too late for THIS interpreter — sitecustomize already
# ran — but jax_platforms=cpu below keeps it off the dispatch path.)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite's wall time is dominated by XLA
# compiles of the same solver/loop graphs run after run; cache them on disk
# so repeat runs (CI, local iteration) skip recompilation.
_cache_dir = os.environ.get("MPC_TPU_TEST_CACHE", "/tmp/mpc_tpu_jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

"""Multi-host (DCN) mechanics smoke test — SURVEY.md §2.4 multi-host bullet.

Spawns two REAL processes that join a jax.distributed cluster over
localhost, build one global mesh spanning both, and verify a sharded
computation.  This exercises the exact code path `init_distributed` /
pod runs would use, without pod hardware.
"""

import os
import socket
import subprocess
import sys


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_cpu():
    port = _free_port()
    child = os.path.join(os.path.dirname(__file__), "_multihost_child.py")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # skip the axon TPU plugin registration
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, child, str(i), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: OK" in out, out

"""Two-process multi-host smoke (SURVEY §5.8, VERDICT r4 #9).

Genuine multi-HOST hardware never exists in this environment, but the
multi-process runtime path does: two OS processes, each owning 4 virtual
CPU devices, joined through jax.distributed.initialize with a local
coordinator into one 8-device mesh. This executes the real multi-host
code path — process-local batch assembly (``host_local_batch_to_global``
with ``process_count() == 2``) and an XLA cross-process all-reduce — not
the single-process fast path those helpers reduce to elsewhere in the
suite.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys
sys.path.insert(0, os.environ["KBE_REPO"])
import numpy as np
import jax
import jax.numpy as jnp

from kbe_tpu.parallel import (data_mesh, host_local_batch_to_global,
                              initialize_multihost, process_shard_indices)

assert initialize_multihost(), "distributed init should trigger"
assert jax.process_count() == 2, jax.process_count()
pi = jax.process_index()
assert jax.device_count() == 8, jax.device_count()
assert len(jax.local_devices()) == 4

mesh = data_mesh()

# per-process dataset shard indices interleave without overlap
idx = process_shard_indices(10)
assert (idx == np.arange(pi, 10, 2)).all()

# process-local batches -> one globally batch-sharded array
local = {"x": (np.arange(4 * 3, dtype=np.float32).reshape(4, 3)
               + 100.0 * pi)}
gbatch = host_local_batch_to_global(mesh, local)
assert gbatch["x"].shape == (8, 3)

# a jitted global reduction forces a cross-process all-reduce
total = jax.jit(jnp.sum)(gbatch["x"])
want = float(np.arange(12).sum() * 2 + 100.0 * 4 * 3)
assert abs(float(total) - want) < 1e-3, (float(total), want)
print(f"proc {pi}: OK total={float(total)}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_multihost_allreduce(tmp_path):
    child = tmp_path / "child.py"
    child.write_text(_CHILD)
    port = _free_port()
    env_base = {
        **os.environ,
        "KBE_REPO": _REPO,
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        "JAX_NUM_PROCESSES": "2",
    }
    procs = [
        subprocess.Popen([sys.executable, str(child)],
                         env={**env_base, "JAX_PROCESS_ID": str(i)},
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for i in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert f"proc {i}: OK" in out

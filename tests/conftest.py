"""Test configuration: force a REAL CPU backend with 8 virtual devices.

The environment's sitecustomize registers the axon TPU tunnel backend at
interpreter startup whenever ``PALLAS_AXON_POOL_IPS`` is set, and it
overrides ``JAX_PLATFORMS`` — so the only reliable way to run the suite on
CPU is to re-exec the interpreter with the trigger variable cleared before
any jax state exists. Multi-chip sharding paths are exercised with 8
virtual CPU devices.
"""

import os
import sys

if (os.environ.get("PALLAS_AXON_POOL_IPS")
        and not os.environ.get("KBE_TESTS_ALLOW_TPU")
        and not os.environ.get("_KBE_TESTS_REEXECED")):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["_KBE_TESTS_REEXECED"] = "1"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"]
              + sys.argv[1:], env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

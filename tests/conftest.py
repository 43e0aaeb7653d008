"""Test configuration: force CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware."""

import os
import sys

# Force CPU: the ambient environment presets JAX_PLATFORMS=axon (the TPU
# tunnel), which must not be used for the test suite.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

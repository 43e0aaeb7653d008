"""Test configuration: force a REAL CPU backend with 8 virtual devices.

The environment's sitecustomize registers the axon TPU tunnel backend at
interpreter startup whenever ``PALLAS_AXON_POOL_IPS`` is set (and its
``register()`` call imports jax, so env-var overrides set later are too
late). Backends are only *resolved* lazily though — updating
``jax_platforms`` through ``jax.config`` before the first device query
still wins, and unlike the previous re-exec approach it keeps pytest's
stdout intact (pytest holds fd-level capture while loading conftests, so
an ``os.execve`` here inherits the capture tmpfile and all test output is
lost). Multi-chip sharding paths are exercised with 8 virtual CPU devices.

Set ``KBE_TESTS_ALLOW_TPU=1`` to run the suite on the real TPU backend.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

if not os.environ.get("KBE_TESTS_ALLOW_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache for the suite (.jax_cache_tests,
# gitignored): the suite's wall time is dominated by recompiling the same
# splat/fill/net programs every run — with the cache, re-runs start from
# compiled binaries. Disable with KBE_TESTS_NO_CACHE=1 (e.g. when timing
# cold compiles).
#
# The cache is scoped PER HOST CPU: XLA:CPU AOT executables bake the
# compile machine's feature set, and loading an entry produced on a
# different microarchitecture can SIGILL/segfault outright (observed:
# avx512-set mismatch across round hosts). The key hashes
# platform.processor + the cpuinfo flags line.
if not os.environ.get("KBE_TESTS_NO_CACHE"):
    import hashlib
    import platform

    import jax

    def _host_cpu_key():
        sig = platform.processor() + platform.machine()
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith(("flags", "Features")):
                        sig += line
                        break
        except OSError:
            pass
        return hashlib.sha1(sig.encode()).hexdigest()[:12]

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache_tests",
                _host_cpu_key()))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax: flag names differ; cold compile still works

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

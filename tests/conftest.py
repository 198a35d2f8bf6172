"""Test configuration: force the CPU backend with an 8-device virtual mesh.

Tests never need real TPU hardware (SURVEY.md section 4: CPU-backend runs so
CI needs no TPU); sharding tests use the virtual device mesh. The axon TPU
plugin re-exports ``JAX_PLATFORMS=axon`` at import time, so the env var alone
is not enough — we must also update the jax config before any computation.
"""

import os
import resource

# Deep jax tracing (scan-of-frames over the sorted-state wavefront loop)
# can overflow the default 8 MB C stack mid-suite — a hard SIGSEGV in
# core.bind, reproducible at tests/test_sorted_trace.py once enough jit
# caches accumulate. The main thread's stack grows on demand up to the
# soft rlimit, so raising it here (hard limit permitting) fixes it.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 512 * 1024 * 1024
if _soft != resource.RLIM_INFINITY and _soft < _want:
    _new = _want if _hard == resource.RLIM_INFINITY else min(_want, _hard)
    try:
        resource.setrlimit(resource.RLIMIT_STACK, (_new, _hard))
    except (ValueError, OSError):
        pass

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _unclog_backend_maps():
    """Clear jax's executable caches when the process map count nears the
    kernel's vm.max_map_count (65530 default): every compiled program adds
    mmap'd JIT code/data segments, and once the limit is reached the next
    big XLA CPU compile segfaults inside backend_compile_and_load —
    deterministic mid-suite, machine-independent victim (whichever large
    compile comes after ~100 programs), absent standalone. Clearing remaps
    the suite far from the ceiling at the cost of recompiling shared
    programs in later modules."""
    yield
    try:
        with open("/proc/self/maps", "rb") as f:
            n = sum(1 for _ in f)
    except OSError:
        return
    if n > 40_000:
        import sys
        print(f"\n[conftest] clearing jax caches at {n} memory maps",
              file=sys.stderr, flush=True)
        jax.clear_caches()

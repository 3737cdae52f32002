"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware, and enable x64
for the fp64 parity tests (the reference ships fp32 and fp64 examples).

Pallas kernels run in interpret mode on CPU (selected inside the tests /
backends); on a real TPU the same tests compile natively.
"""

import os

# Force CPU (override any ambient JAX_PLATFORMS): the suite must run without
# TPU hardware. Set TPCG_TEST_TPU=1 to run on whatever platform is ambient.
if not os.environ.get("TPCG_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Raise the stack soft-limit to the hard limit BEFORE jax/XLA initialize:
# XLA:CPU compilation of the largest SQP graphs (vmapped jacfwd over
# rigid-body RK4) has been observed to SIGSEGV mid-suite inside
# backend_compile_and_load — the signature of an LLVM stack overflow on a
# deep module with the default 8 MiB stack.
import resource  # noqa: E402

_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _soft != resource.RLIM_INFINITY and (_hard == resource.RLIM_INFINITY
                                        or _soft < _hard):
    try:
        resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
    except (ValueError, OSError):
        pass

import jax  # noqa: E402

if not os.environ.get("TPCG_TEST_TPU"):
    # The ambient environment may have pre-registered a TPU platform via
    # sitecustomize; the config update wins over the env var.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache for the suite (separate, gitignored dir — the
# tracked .jax_cache holds TPU executables for bench): most suite time is
# XLA-compiling small while-loop solvers per shape; warm runs are much
# faster.
#
# HAZARD (observed as a SIGSEGV mid-suite): XLA:CPU AOT cache entries are
# NOT keyed by host CPU features, and loading an executable compiled on a
# machine with different features can crash ("Machine type used for
# XLA:CPU compilation doesn't match..." warnings precede it). Stamp the
# cache with this host's CPU feature fingerprint and wipe it on mismatch.
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache_tests")
os.makedirs(_cache, exist_ok=True)


def _host_fingerprint() -> str:
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:16]
    except OSError:
        pass
    import platform
    return platform.processor() or "unknown"


_stamp = os.path.join(_cache, "HOST_FINGERPRINT")
_fp = _host_fingerprint()
try:
    _old = open(_stamp).read()
except OSError:
    _old = None
if _old != _fp:
    import shutil
    shutil.rmtree(_cache, ignore_errors=True)
    os.makedirs(_cache, exist_ok=True)
    with open(_stamp, "w") as f:
        f.write(_fp)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

"""Test harness: force an 8-virtual-device CPU mesh before jax initializes.

Benchmarks run on real TPU separately; tests exercise the identical code on
host CPU (including shard_map/psum multi-device paths) per SURVEY.md §4.5.
"""
import os

# NOTE: this image pre-imports jax (sitecustomize) with JAX_PLATFORMS=axon
# (remote TPU tunnel), so plain env vars are too late — use jax.config.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # allow f64 oracle-parity tests
# persistent compile cache: the interpret-mode kernel tests cost minutes of
# CPU compile each; cached across runs they are near-instant
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules: the full suite
    otherwise accumulates every module's jitted programs (multi-GB RSS) and
    the big trace-time-unrolled graphs (legacy vpt3's 127-node tree) can
    then segfault XLA's CPU compiler under memory pressure."""
    yield
    jax.clear_caches()

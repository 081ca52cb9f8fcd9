"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends, so this happens
at conftest import time (pytest imports conftest before test modules).
The same jitted frame functions run identically on CPU and TPU; sharding
tests use the 8 virtual devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# XLA compiles are slow-ish on this host; persist them across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/funky_tpu_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import pathlib
import sys

import pytest

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) force-sets
# jax_platforms="axon,cpu" via jax.config at interpreter start, which
# overrides the env var — override it back so tests really run on the
# 8-device virtual CPU mesh, not the tunneled TPU.
import jax

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_MODELS = pathlib.Path("/root/reference/models")


@pytest.fixture(scope="session")
def duck_gltf_path():
    p = REFERENCE_MODELS / "scene.gltf"
    if not p.exists():
        pytest.skip("reference Duck assets not available")
    return p

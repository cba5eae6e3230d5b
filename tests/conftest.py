"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-device tests replace the reference's multithread tests
(SURVEY.md §4): sharding is validated on host CPU devices via
``xla_force_host_platform_device_count`` exactly as the driver's
``dryrun_multichip`` does.
"""

import os
import sys

# force CPU: the environment presets JAX_PLATFORMS=axon (the TPU tunnel),
# but tests must run on the virtual multi-device CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# the TPU-tunnel sitecustomize may have force-set jax_platforms=axon,cpu at
# interpreter start (it imports jax and calls jax.config.update before this
# file runs) — override it back before any backend initializes
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE_FILES = "/root/reference/test_files"


@pytest.fixture(scope="session")
def test_files():
    """Path to the reference fixture corpus (read-only)."""
    if not os.path.isdir(REFERENCE_FILES):
        pytest.skip("reference test_files corpus not available")
    return REFERENCE_FILES

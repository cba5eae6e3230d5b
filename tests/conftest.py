"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-device tests replace the reference's multithread tests
(SURVEY.md §4): sharding is validated on host CPU devices via
``xla_force_host_platform_device_count`` exactly as the driver's
``dryrun_multichip`` does.

Backend matrix (SURVEY §4, the reference's feature-matrix CI analogue):
by default the whole suite runs on the CPU mesh; setting
``GROAN_TEST_PLATFORM=axon`` (or ``tpu``) runs on the REAL chip instead —
use it with the numeric-parity subset:

    GROAN_TEST_PLATFORM=axon python -m pytest tests/ -m device_parity

Modules marked ``device_parity`` assert reference numerics (vecmath,
centers, RMSD, PBC, triclinic, Pallas pair kernels) with tolerances that
hold on TPU MXU defaults too.
"""

import os
import sys

_PLATFORM = os.environ.get("GROAN_TEST_PLATFORM", "cpu")

os.environ["JAX_PLATFORMS"] = _PLATFORM
if _PLATFORM == "cpu":
    # the environment presets JAX_PLATFORMS=axon (the TPU tunnel), but by
    # default tests must run on the virtual multi-device CPU mesh
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

jax.config.update("jax_platforms", _PLATFORM)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE_FILES = "/root/reference/test_files"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "device_parity: numeric-parity tests safe to run on the real TPU "
        "chip (GROAN_TEST_PLATFORM=axon pytest -m device_parity)",
    )


def pytest_collection_modifyitems(config, items):
    if _PLATFORM == "cpu":
        return
    # on a real device, only the marked numeric-parity subset is valid
    # (everything else assumes the virtual 8-device CPU mesh)
    skip = pytest.mark.skip(
        reason=f"not marked device_parity (platform={_PLATFORM})"
    )
    for item in items:
        if "device_parity" not in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def test_files():
    """Path to the reference fixture corpus (read-only)."""
    if not os.path.isdir(REFERENCE_FILES):
        pytest.skip("reference test_files corpus not available")
    return REFERENCE_FILES

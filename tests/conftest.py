"""Test configuration: make an 8-virtual-CPU-device mesh available.

Must run before the first ``import jax`` anywhere (SURVEY.md §4: the
multi-device tests use the single-process fake-mesh pattern via
``--xla_force_host_platform_device_count``).  On hosts where a TPU plugin
pins the default platform, single-device tests run on the TPU (which also
validates TPU lowering) while the multi-device tests build their mesh from
``jax.devices("cpu")`` explicitly.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pin the whole test session to the host-CPU platform: fast compiles, no
# contention on the (single, tunneled) TPU chip, and 8 virtual devices for
# the multi-device mesh tests.  Must happen before any backend initializes;
# plain JAX_PLATFORMS env is overridden by TPU plugin hooks on some hosts,
# so use jax.config directly.  RUN_TPU_TESTS=1 opts in to the real chip
# (tests/test_tpu_compiled.py — asserts Mosaic lowering, not interpreter
# semantics; everything else still passes but compiles slowly).
import jax  # noqa: E402

if not os.environ.get("RUN_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 virtual CPU devices (XLA_FLAGS forcing failed)")
    return devs

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_data_dir():
    path = os.path.join(REFERENCE_DIR, "data")
    if not os.path.isdir(path):
        pytest.skip("reference assets not available")
    return path


@pytest.fixture(scope="session")
def reference_renders_dir():
    path = os.path.join(REFERENCE_DIR, "renders")
    if not os.path.isdir(path):
        pytest.skip("reference golden renders not available")
    return path


@pytest.fixture(scope="session")
def cornell_scene():
    from chiaroscuro_tpu.scene.builtin import cornell_box
    from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays

    return build_scene_arrays(cornell_box())


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running render tests")

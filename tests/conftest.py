"""Test environment: force an 8-device virtual CPU mesh.

Multi-chip code paths (shard_map over a Mesh) are exercised on virtual
CPU devices; the driver separately dry-runs the multichip path. Must run
before jax initializes.
"""
import os

# force CPU even when the environment exports JAX_PLATFORMS (e.g. a
# tunneled TPU backend): tests must never contend for the real chip.
# NOTE: this image's sitecustomize.py imports jax at interpreter startup,
# so the env var alone is too late — pin the config explicitly too
# (backends are not initialized yet at conftest time).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cornell_scene():
    """The minimum end-to-end fixture: Cornell box (SURVEY.md §7.2) —
    diffuse walls, one positional sphere light, perspective camera.
    Mirrors data/scripts/CornellBox.tcl:10-37 minus the glass objects."""
    from cadrays_tpu.testing.scenes import cornell_box

    return cornell_box()


@pytest.fixture(scope="session")
def cornell_camera():
    from cadrays_tpu.testing.scenes import cornell_camera as cam

    return cam()

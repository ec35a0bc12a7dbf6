"""Test configuration: run on CPU with 8 virtual devices and 64-bit floats.

The TPU-targeted code paths (jit, shard_map meshes) are exercised on a
virtual 8-device CPU mesh, matching how the driver dry-runs the
multi-chip path.
"""
import os

# must be set before the jax backend initializes
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax

# the environment may pre-register an accelerator platform via
# sitecustomize; force the CPU backend regardless
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib

import pytest

REFERENCE_INSTANCES = pathlib.Path("/root/reference/check/instances")


@pytest.fixture(scope="session")
def instances_dir():
    if not REFERENCE_INSTANCES.is_dir():
        pytest.skip("reference instance directory unavailable")
    return REFERENCE_INSTANCES


def instance_path(name: str) -> str:
    return str(REFERENCE_INSTANCES / name)

"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware."""

import os

# Force the CPU backend with 8 virtual devices even when the environment
# pins an accelerator platform (JAX_PLATFORMS=axon and a sitecustomize that
# registers it); config.update after import wins over the plugin.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from mesh_navigation_tpu.mesh import build_mesh, synthetic


@pytest.fixture(scope="session")
def grid_mesh_small():
    """8x8 flat grid — hand-checkable distances."""
    v, f = synthetic.grid_mesh(8, 8)
    return build_mesh(v, f)


@pytest.fixture(scope="session")
def terrain_mesh_medium():
    """32x32 undulating terrain — irregular edge lengths and normals."""
    v, f = synthetic.terrain_mesh(32, 32, spacing=0.5, hills=2.0, roughness=0.02, seed=3)
    return build_mesh(v, f)


@pytest.fixture(scope="session")
def sphere_mesh():
    v, f = synthetic.icosphere(2)
    return build_mesh(v, f)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound in-process compile-cache growth. The suite compiles hundreds of
    interpret-mode Pallas programs; with all executables kept alive the XLA
    CPU compiler aborts (SIGABRT in backend_compile) ~140 tests in. Dropping
    caches between modules keeps peak compiler memory flat; session-scoped
    mesh fixtures (plain arrays) are unaffected."""
    yield
    jax.clear_caches()

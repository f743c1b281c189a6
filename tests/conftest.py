"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The environment may have a TPU registered as the default backend (axon
plugin, initialized at interpreter start by sitecustomize).  The CPU backend
coexists and initializes lazily, so setting XLA_FLAGS here (before first
use) still yields 8 virtual CPU devices; an autouse fixture makes CPU the
default device so unit tests never wait on TPU compiles.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _default_to_cpu():
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    yield


def cpu_mesh(n: int = 8, axis: str = "shard"):
    """A Mesh over n virtual CPU devices."""
    from jax.sharding import Mesh
    import numpy as np

    return Mesh(np.array(jax.devices("cpu")[:n]), (axis,))


def assert_dirs_byte_equal(a: str, b: str, context: str = ""):
    """Both directories contain the same file NAMES with identical BYTES —
    the suite-wide check that two build paths produced the same octree."""
    fa, fb = sorted(os.listdir(a)), sorted(os.listdir(b))
    assert fa == fb, f"{context}: file sets differ ({len(fa)} vs {len(fb)})"
    for name in fa:
        with open(os.path.join(a, name), "rb") as f:
            ba = f.read()
        with open(os.path.join(b, name), "rb") as f:
            bb = f.read()
        assert ba == bb, f"{context}: {name} bytes differ"

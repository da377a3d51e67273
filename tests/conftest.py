"""Test environment: CPU backend with 8 fake devices.

Multi-chip sharding tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count``), the standard way to exercise
``shard_map``/``ppermute`` layouts without a TPU pod.

This sandbox injects a TPU-relay PJRT plugin (axon) into *every* Python
process via ``sitecustomize``; its ``register()`` force-sets
``jax_platforms="axon,cpu"``, overriding the ``JAX_PLATFORMS`` env var. Tests
must be hermetic, local and deterministic (the relay also silently demotes
f32 matmuls to bf16 MXU passes), so we point the config back at CPU here —
before any test imports jax — and request the fake-device mesh.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    # 32 fake devices: most tests slice an 8-device mesh out of these, the
    # multi-chip hardening tests (test_parallel.py) go up to D=16/32.
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=32").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the local CPU backend"


@pytest.fixture(scope="session")
def reference_data_dir():
    """The reference repo's dataset directory, if mounted."""
    import pathlib

    p = pathlib.Path("/root/reference/main_project/data")
    if not p.is_dir():
        pytest.skip("reference data not available")
    return p

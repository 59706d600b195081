"""Test configuration: run everything on a virtual 8-device CPU mesh.

The ambient environment routes JAX at a remote TPU tunnel (sitecustomize
registers the axon plugin and pins JAX_PLATFORMS), so tests must override the
platform via jax.config *after* import, before any backend initialization.
Multi-chip sharding paths are validated here exactly as the driver does
(xla_force_host_platform_device_count); the real-TPU path is exercised by
bench.py and __graft_entry__.py instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture(autouse=True, scope="module")
def _bound_compile_memory():
    """Free compiled-executable memory between test modules: the full suite
    accumulates hundreds of distinct XLA CPU programs in one process, which
    previously ended in a segfault inside XLA during the later e2e modules
    (every test passes in isolation). Costs some recompilation, buys a
    stable single-process `pytest tests/`."""
    yield
    jax.clear_caches()

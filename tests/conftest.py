"""Test bootstrap: run everything on a virtual 8-device CPU mesh so sharding
tests work without TPU hardware (the standard JAX fake-backend trick).

The container boots an 'axon' TPU backend from sitecustomize and forces
JAX_PLATFORMS=axon, so setting the env var alone is not enough — we also
flip the already-imported jax config back to CPU."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The full suite compiles hundreds of XLA:CPU programs in one process;
    with all of them kept alive, a late large compile (the diffusion
    train step in test_training.py) segfaults inside
    backend_compile_and_load deterministically — 4/4 full-suite runs,
    while every module and half-suite subset passes. Freeing the
    accumulated executables between modules keeps the JIT well under
    that threshold (intra-module caching is preserved, so the runtime
    cost is only cross-module recompiles that would mostly happen
    anyway)."""
    yield
    jax.clear_caches()

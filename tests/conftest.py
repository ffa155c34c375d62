"""Test environment: force CPU with 8 virtual devices so distributed paths
(mesh sharding, halo exchange) are exercised hermetically without TPU chips.

The image's sitecustomize imports jax and pins JAX_PLATFORMS=axon (real TPU
tunnel) at interpreter startup, so env vars alone are too late — we must flip
the platform through jax.config before any backend is initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# float32 means float32 in parity tests (TPU default would be bf16 passes)
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound in-process XLA:CPU compiler state: with today's larger
    BN=512 interpret-mode programs, full-suite runs (190 tests, hundreds
    of compiled executables) started segfaulting INSIDE
    backend_compile_and_load near the end of the run — standalone and
    half-suite runs of the same tests pass. Releasing executables between
    modules keeps the live-program count bounded; measured overhead is
    small (cross-module cache reuse was minimal anyway)."""
    yield
    jax.clear_caches()

"""Test config: run everything on CPU with 8 virtual devices.

The reference test suite required a physical CUDA GPU
(/root/reference/test/CMakeLists.txt); the JAX rebuild runs the identical
math on any backend, so CI tests use the CPU backend with a virtual
8-device mesh to also exercise the sharded multi-chip paths.
"""

import os

# Force CPU: the test suite must not touch the (single, shared) TPU tunnel.
# The harness exports JAX_PLATFORMS=axon globally, so a hard override is
# required, not setdefault. PALLAS_AXON_POOL_IPS must also be scrubbed:
# sitecustomize re-registers the axon TPU plugin whenever it is set, which
# would route the whole suite through the shared single-client tunnel.
# Escape hatch: SOBFU_TPU_TESTS=1 keeps the real backend so the
# hardware-validation lane (tests/test_tpu_hw.py) can run on a TPU host.
if os.environ.get("SOBFU_TPU_TESTS") != "1":
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# sitecustomize imports jax at interpreter startup (axon plugin
# registration), so jax's env snapshot predates this file — the env vars
# above are NOT enough on their own. Backends initialise lazily, so
# updating the live config here still wins as long as no array op ran yet.
import jax  # noqa: E402

if os.environ.get("SOBFU_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", (
        "test suite must not run on the shared TPU tunnel; got "
        + jax.default_backend()
    )

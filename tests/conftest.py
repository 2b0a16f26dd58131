"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; shardings are validated on
host-platform virtual devices instead (same XLA partitioner code paths).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-sets jax_platforms='axon,cpu'
# AFTER env vars — override it back so the suite runs on the virtual CPU
# mesh (config.update wins over the plugin's earlier update).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Parity tests compare against float32 torch/numpy references; JAX's default
# matmul precision is lower (bf16-like passes) even off-TPU.
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compile cache: the suite is compile-bound on CPU otherwise
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _reference_importable():
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        import torch  # noqa: F401

        return True
    except Exception:
        return False


REFERENCE_AVAILABLE = _reference_importable()

requires_reference = pytest.mark.skipif(
    not REFERENCE_AVAILABLE, reason="reference repo / torch not available"
)

"""Test harness configuration.

All tests run on a virtual 8-device CPU platform so sharding/pjit paths are
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; bench.py runs on the real chip).
"""

import os

# Force CPU: the host environment pre-sets JAX_PLATFORMS=axon (the real TPU
# tunnel) and its sitecustomize imports jax at interpreter start, freezing
# the env-derived default — so the platform must be overridden through
# jax.config after import, not via os.environ.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# CPU golden tests compare against fp32 references; do not emulate the TPU
# bf16 matmul default here.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite is dominated by jit compiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_text2nerf")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)

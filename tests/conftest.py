"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding code
paths compile and execute without TPU hardware.  A persistent JAX
compilation cache keeps the (one-time) SCL scan compilation out of every
test run.
"""
import os

# NOTE: this image's axon sitecustomize registers the TPU backend at
# interpreter start and pins JAX_PLATFORMS=axon, so the env var alone does
# not stick -- jax.config.update('jax_platforms', ...) below is what works.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# host-CPU-keyed cache dir: XLA:CPU AOT artifacts are machine-specific, and
# loading a foreign machine's artifacts has flipped rounding-adjacent test
# verdicts (VERDICT r2 weak #2)
from echoseal_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def key32() -> bytes:
    return bytes.fromhex("aa" * 32)


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(0xE5EA1)

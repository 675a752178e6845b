"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-world equivalent of a fake communication backend (which the
reference lacks entirely — see SURVEY.md §4): sharding/collective code paths
are exercised on 8 virtual CPU devices.

NOTE: this environment registers the experimental 'axon' TPU platform inside
libtpu, which takes priority over the JAX_PLATFORMS env var, so we force the
CPU backend through jax.config *before any backend is initialized*.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compile cache: the 1-core CPU in CI pays heavy XLA compile
# costs; caching across test runs keeps the suite fast.
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)

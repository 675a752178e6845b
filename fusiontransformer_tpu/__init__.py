"""FusionTransformer-TPU: a TPU-native rebuild of aliabdelkader/FusionTransformer.

FTX_PLATFORM=cpu forces the CPU backend before any JAX backend initializes.
This environment registers the experimental 'axon' TPU platform inside
libtpu, which takes priority over the JAX_PLATFORMS env var — so hermetic
CLI runs (the real-eval drill, parity oracles, CI) must pin the platform
through jax.config instead (same mechanism as tests/conftest.py).
"""

import os

if os.environ.get("FTX_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["FTX_PLATFORM"])

import os
import sys

# Multi-device tests run on a virtual 8-device CPU mesh (SURVEY.md §4).
# The axon environment pins JAX_PLATFORMS=axon (real TPU tunnel); tests must
# not touch the single real chip, so force the CPU backend explicitly.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

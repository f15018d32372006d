"""Process-environment helpers.

The reference pins each multi-GPU inference worker to one device via
``CUDA_VISIBLE_DEVICES`` (subprocess.py:40-106). The TPU-native analogue
needs a working platform override: on remote-attached-TPU rigs the
``JAX_PLATFORMS`` environment variable alone does NOT override a pinned
platform plugin, but ``jax.config.update('jax_platforms', ...)`` before
backend initialization does. Workers therefore receive the
``NAFWEBSOD_PLATFORM`` variable and apply it here at tool startup.
"""

import logging
import os

logger = logging.getLogger(__name__)

PLATFORM_ENV_VAR = 'NAFWEBSOD_PLATFORM'


def apply_platform_override():
    """Honor ``NAFWEBSOD_PLATFORM`` (e.g. 'cpu') by forcing the JAX
    platform before the backend initializes. Call at CLI-tool startup,
    before any jax device query. No-op when the variable is unset."""
    plat = os.environ.get(PLATFORM_ENV_VAR)
    if not plat:
        return None
    import jax
    jax.config.update('jax_platforms', plat)
    logger.info('Forced JAX platform to %r (%s)', plat, PLATFORM_ENV_VAR)
    return plat


def accelerator_device_count():
    """Number of non-CPU JAX devices visible to this process."""
    import jax
    try:
        return sum(1 for d in jax.devices() if d.platform != 'cpu')
    except Exception:
        return 0

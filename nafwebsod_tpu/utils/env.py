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


def enable_compilation_cache(min_compile_seconds=10):
    """Point JAX at the persistent compilation cache (same recipe as
    bench.py). On this rig first compiles of the big scan-window/eval
    programs go through a remote compile helper and can take tens of
    minutes under CPU contention; the on-disk cache makes every rerun of
    an unchanged program fast. Opt out with NAFWEBSOD_COMPILE_CACHE=0;
    relocate with NAFWEBSOD_COMPILE_CACHE_DIR. Call at CLI-tool startup
    (any time before the first compile). ``min_compile_seconds``: only
    cache programs that took at least this long to compile (the multichip
    dryrun passes 1 — it compiles ~30 small programs whose aggregate
    wall matters)."""
    if os.environ.get('NAFWEBSOD_COMPILE_CACHE', '1') == '0':
        return
    import jax
    try:
        jax.config.update(
            'jax_compilation_cache_dir',
            os.environ.get('NAFWEBSOD_COMPILE_CACHE_DIR',
                           os.path.expanduser('~/.cache/jax_comp_cache')))
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          min_compile_seconds)
    except Exception:  # cache support missing: not worth failing a run
        logger.warning('persistent compilation cache unavailable',
                       exc_info=True)


def accelerator_device_count():
    """Number of non-CPU JAX devices visible to this process."""
    import jax
    try:
        return sum(1 for d in jax.devices() if d.platform != 'cpu')
    except Exception:
        return 0

"""XLA FFI custom-call registration for the native CPU kernels
(native/roi_pool_ffi.cpp).

The TPU compute path uses the Pallas RoIPool kernel; this is the CPU
native path — a real XLA custom call (not a host callback), so it
composes with jit/vmap-free call sites and keeps the op layer native
where the reference's was (SURVEY.md §7: "RoIPool/NMS/box-merge as C++
custom-calls for CPU, Pallas for TPU, behind one API").
"""

import ctypes
import logging
import os
import subprocess

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    'native')
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libroipoolffi.so')
_registered = None  # None = untried, True/False afterwards


def _build():
    src = os.path.join(_NATIVE_DIR, 'roi_pool_ffi.cpp')
    if not os.path.exists(src):
        return False
    try:
        subprocess.check_call(
            ['make', '-C', _NATIVE_DIR, '-s', 'libroipoolffi.so'],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return os.path.exists(_LIB_PATH)
    except Exception:
        logger.info('native roi_pool_ffi build failed; using XLA fallback')
        return False


def roi_pool_registered():
    """Register the RoiPoolFwd CPU custom call once. Returns bool."""
    global _registered
    if _registered is not None:
        return _registered
    _registered = False
    if os.environ.get('NAFWEBSOD_NO_FFI'):
        return False
    if not os.path.exists(_LIB_PATH) and not _build():
        return False
    try:
        import jax.ffi
        lib = ctypes.cdll.LoadLibrary(_LIB_PATH)
        jax.ffi.register_ffi_target(
            'nafwebsod_roi_pool_fwd', jax.ffi.pycapsule(lib.RoiPoolFwd),
            platform='cpu')
        _registered = True
    except Exception:
        logger.exception('roi_pool FFI registration failed; XLA fallback')
        _registered = False
    return _registered

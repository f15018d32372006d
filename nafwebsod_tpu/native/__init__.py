"""ctypes bindings for the native host box kernels (native/box_ops.cpp).

The reference ships its host-side box math as compiled Cython
(cython_nms.pyx / cython_bbox.pyx); this is the rebuild's native equivalent,
built with g++ on first use (no pybind11 in the image — plain C ABI via
ctypes). All entry points fall back to the pure-numpy implementations in
``ops/boxes.py`` when the toolchain is unavailable.
"""

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    'native')
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libboxops.so')
_lib = None
_tried = False


def _build():
    src = os.path.join(_NATIVE_DIR, 'box_ops.cpp')
    if not os.path.exists(src):
        return False
    try:
        subprocess.check_call(['make', '-C', _NATIVE_DIR, '-s'],
                              stdout=subprocess.DEVNULL,
                              stderr=subprocess.DEVNULL)
        return os.path.exists(_LIB_PATH)
    except Exception:
        logger.info('native box_ops build failed; using numpy fallback')
        return False


def get_lib():
    """Load (building if necessary) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
    i64p = np.ctypeslib.ndpointer(np.int64, flags='C_CONTIGUOUS')
    lib.bbox_overlaps.argtypes = [f32p, i64, f32p, i64, f32p]
    lib.bbox_overlaps.restype = None
    lib.nms.argtypes = [f32p, i64, ctypes.c_float, i64p]
    lib.nms.restype = i64
    lib.soft_nms.argtypes = [f32p, i64, ctypes.c_float, ctypes.c_float,
                             ctypes.c_float, ctypes.c_int, i64p]
    lib.soft_nms.restype = i64
    _lib = lib
    return _lib


def available():
    return get_lib() is not None


def bbox_overlaps(boxes, query_boxes):
    lib = get_lib()
    boxes = np.ascontiguousarray(boxes, np.float32)
    query = np.ascontiguousarray(query_boxes, np.float32)
    out = np.zeros((boxes.shape[0], query.shape[0]), np.float32)
    lib.bbox_overlaps(boxes, boxes.shape[0], query, query.shape[0], out)
    return out


def nms(dets, thresh):
    lib = get_lib()
    dets = np.ascontiguousarray(dets, np.float32)
    keep = np.zeros((dets.shape[0],), np.int64)
    n = lib.nms(dets, dets.shape[0], float(thresh), keep)
    return keep[:n].tolist()


def soft_nms(dets, sigma=0.5, overlap_thresh=0.3, score_thresh=0.001,
             method='linear'):
    lib = get_lib()
    methods = {'hard': 0, 'linear': 1, 'gaussian': 2}
    out = np.ascontiguousarray(dets, np.float32).copy()
    keep = np.zeros((out.shape[0],), np.int64)
    n = lib.soft_nms(out, out.shape[0], float(sigma), float(overlap_thresh),
                     float(score_thresh), methods[method], keep)
    return out[:n], keep[:n].tolist()

"""Build script for the TPU-native NA-fWebSOD framework.

The reference packages its host kernels as Cython extension modules
(/root/reference/setup.py: detectron.utils.cython_bbox / cython_nms); the
rebuild's host kernels are plain-C-ABI shared libraries (native/box_ops.cpp,
native/roi_pool_ffi.cpp — see native/ and nafwebsod_tpu/native/) loaded via
ctypes / jax.ffi, so instead of `cythonize` we compile them with g++ in a
custom build step and bundle them as package data next to
``nafwebsod_tpu/native/__init__.py``.

Both libraries are optional at runtime: the pure-numpy and pure-XLA
fallbacks keep every entry point working when no C++ toolchain exists, so a
failed native build degrades the wheel instead of breaking it.
"""

import logging
import os
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py

logger = logging.getLogger(__name__)

HERE = os.path.dirname(os.path.abspath(__file__))
NATIVE_SRC = os.path.join(HERE, 'native')


class build_py_with_native(build_py):
    """build_py + `make -C native`, copying the .so files into the package.

    The runtime loaders (nafwebsod_tpu/native/__init__.py, ffi.py) look next
    to their own module first, then in the repo-layout ``<root>/native``
    directory, so the same code serves installed wheels and git checkouts.
    """

    def run(self):
        super().run()
        pkg_native = os.path.join(self.build_lib, 'nafwebsod_tpu', 'native')
        self.mkpath(pkg_native)
        # Always ship the sources + Makefile so installed trees can rebuild.
        for name in ('box_ops.cpp', 'roi_pool_ffi.cpp', 'Makefile'):
            src = os.path.join(NATIVE_SRC, name)
            if os.path.exists(src):
                shutil.copy2(src, os.path.join(pkg_native, name))
        try:
            subprocess.check_call(['make', '-C', NATIVE_SRC, '-s'])
        except Exception as exc:  # toolchain-less build: fall back gracefully
            logger.warning('native kernel build failed (%s); the wheel will '
                           'use the numpy/XLA fallbacks', exc)
        for name in ('libboxops.so', 'libroipoolffi.so'):
            src = os.path.join(NATIVE_SRC, name)
            if os.path.exists(src):
                shutil.copy2(src, os.path.join(pkg_native, name))


setup(cmdclass={'build_py': build_py_with_native})

#!/usr/bin/env python
"""Inspect a pkl file (weights checkpoint, detections, or proposals): print
keys, shapes, and basic stats. Capability parity with ``tools/show_pkl.py``.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.utils.io import load_object


def describe(name, v, indent=0):
    pad = '  ' * indent
    if isinstance(v, np.ndarray):
        print('{}{}: ndarray{} {} [{:.4g}, {:.4g}]'.format(
            pad, name, v.shape, v.dtype,
            float(v.min()) if v.size else 0,
            float(v.max()) if v.size else 0))
    elif isinstance(v, dict):
        print('{}{}: dict({} keys)'.format(pad, name, len(v)))
        for k in list(v)[:200]:
            describe(k, v[k], indent + 1)
    elif isinstance(v, (list, tuple)):
        print('{}{}: {}(len {})'.format(pad, name, type(v).__name__, len(v)))
        if v and indent < 2:
            describe('[0]', v[0], indent + 1)
    else:
        s = str(v)
        print('{}{}: {} {}'.format(pad, name, type(v).__name__,
                                   s[:80] + ('...' if len(s) > 80 else '')))


if __name__ == '__main__':
    if len(sys.argv) < 2 or sys.argv[1] in ('-h', '--help'):
        print('usage: show_pkl.py <file.pkl> [...]')
        sys.exit(0 if len(sys.argv) > 1 else 1)
    for path in sys.argv[1:]:
        print('==== {} ===='.format(path))
        describe(os.path.basename(path), load_object(path))

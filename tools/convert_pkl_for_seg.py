#!/usr/bin/env python
"""Print every blob name + shape in a weights pkl (the quick inspection pass
used when preparing seg-branch inits).

Capability parity with ``tools/convert_pkl_for_seg.py`` (reference :15-22).
For richer stats use ``tools/show_pkl.py``.

Usage: python tools/convert_pkl_for_seg.py <weights.pkl>
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.utils.io import load_object


def main():
    if len(sys.argv) != 2:
        print('usage: convert_pkl_for_seg.py <weights.pkl>')
        sys.exit(1)
    data = load_object(sys.argv[1])
    if 'blobs' in data:
        data = data['blobs']
    for name in sorted(data):
        v = data[name]
        print(name, getattr(v, 'shape', type(v).__name__))


if __name__ == '__main__':
    main()

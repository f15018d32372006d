#!/usr/bin/env python
"""Strip momentum blobs from a weights pkl.

Capability parity with ``tools/delete_momentum.py`` (reference :33-47):
unwraps the {'blobs': ...} envelope, drops every ``*_momentum`` entry, and
writes a bare blob dict — the shape downstream fine-tuning inits expect.

Usage: python tools/delete_momentum.py <in.pkl> <out.pkl>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.utils.io import load_object, save_object


def strip_momentum(blobs):
    kept = {k: v for k, v in blobs.items() if 'momentum' not in k}
    for k in sorted(set(blobs) - set(kept)):
        print('delete', k)
    return kept


def main():
    if len(sys.argv) != 3:
        print('usage: delete_momentum.py <in.pkl> <out.pkl>')
        sys.exit(1)
    data = load_object(sys.argv[1])
    if 'blobs' in data:
        data = data['blobs']
    save_object(strip_momentum(data), sys.argv[2])


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Fold affine batch-norm scale/bias blobs into the preceding conv.

Capability parity with ``tools/merge_conv_and_bn.py`` (reference :30-100):
for every ``<name>_bn_s`` / ``<name>_bn_b`` pair the conv weight
``<conv>_w`` is scaled per output channel and the (possibly missing) conv
bias becomes ``b * s + bn_b``; all other blobs pass through. Blob layout is
the pkl schema's Caffe2 OIHW, so the output-channel axis is 0.

Usage: python tools/merge_conv_and_bn.py <in.pkl> <out.pkl>
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.utils.io import load_object, save_object


def fold_bn(blobs):
    """Return a new blob dict with every *_bn_s/*_bn_b pair folded into its
    conv. The reference's special case maps ``res_conv1_bn_s`` onto
    ``conv1`` (ResNet stem naming)."""
    out = {}
    consumed = set()
    for name in sorted(blobs):
        if not name.endswith('_bn_s'):
            continue
        bn_b_name = name[:-2] + '_b'                 # ..._bn_s -> ..._bn_b
        conv = ('conv1' if name == 'res_conv1_bn_s'
                else name[:-len('_bn_s')])
        w_name, b_name = conv + '_w', conv + '_b'
        if w_name not in blobs:
            print('skip {}: no conv weight {}'.format(name, w_name))
            continue
        s = blobs[name]
        b = blobs[bn_b_name]
        w = blobs[w_name]
        bias = blobs.get(b_name)
        if bias is None:
            bias = np.zeros((w.shape[0],), w.dtype)
        out[w_name] = w * s.reshape((-1,) + (1,) * (w.ndim - 1))
        out[b_name] = bias * s + b
        consumed.update({name, bn_b_name, w_name, b_name})
        print('folded {} -> {}'.format(name, w_name))
    for name in sorted(blobs):
        if name not in consumed and name not in out:
            out[name] = blobs[name]
    return out


def main():
    if len(sys.argv) != 3:
        print('usage: merge_conv_and_bn.py <in.pkl> <out.pkl>')
        sys.exit(1)
    data = load_object(sys.argv[1])
    if 'blobs' in data:
        data = data['blobs']
    merged = fold_bn(data)
    print('{} blobs in, {} out'.format(len(data), len(merged)))
    save_object(merged, sys.argv[2])


if __name__ == '__main__':
    main()

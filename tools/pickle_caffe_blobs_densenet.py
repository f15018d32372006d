#!/usr/bin/env python
"""Convert a DenseNet-style .caffemodel (conv + BatchNorm + Scale triplets)
into the framework's pkl weight format.

Capability parity with ``tools/pickle_caffe_blobs_densenet.py``
(reference :102-253): missing conv biases are zero-filled, and each
BatchNorm/Scale pair is either folded into an affine pair
``<bn>_s = scale/sqrt(var+1e-5)``, ``<bn>_b = bias - mean*scale/std``
(default, remove_spatial_bn_layers:176-220) or kept as raw
``_rm``/``_riv``/``_s``/``_b`` blobs (``--keep-bn``,
remove_spatial_bn_layers_keep_bn:113-162). Uses the same self-contained
protobuf reader as tools/pickle_caffe_blobs.py (extended with layer types)
instead of the Caffe python bindings.

Usage: python tools/pickle_caffe_blobs_densenet.py <model.caffemodel> \
           <out.pkl> [--keep-bn]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.utils.io import save_object
from pickle_caffe_blobs import _iter_fields, _parse_blob


def parse_caffemodel_typed(path):
    """Like pickle_caffe_blobs.parse_caffemodel but keeps layer order and
    type: returns [(name, type, [blobs])]. Modern LayerParameter carries
    type as a string (field 2); V1LayerParameter as an enum (field 5)."""
    with open(path, 'rb') as f:
        buf = f.read()
    _V1_TYPES = {4: 'Convolution', 14: 'InnerProduct'}  # the ones we act on
    layers = []
    for field, wire, val in _iter_fields(buf):
        if wire != 2 or field not in (2, 100):
            continue
        v1 = field == 2
        name = ltype = None
        blobs = []
        for f2, w2, v2 in _iter_fields(val):
            if f2 == (4 if v1 else 1) and w2 == 2:
                name = v2.decode('utf-8', 'replace')
            elif not v1 and f2 == 2 and w2 == 2:
                ltype = v2.decode('utf-8', 'replace')
            elif v1 and f2 == 5 and w2 == 0:
                ltype = _V1_TYPES.get(v2, str(v2))
            elif f2 == (6 if v1 else 7) and w2 == 2:
                blobs.append(_parse_blob(v2))
        if name:
            layers.append((name, ltype or '', blobs))
    return layers


def convert(layers, keep_bn=False):
    """Produce the blob dict from typed layers."""
    out = {}
    pending_bn = None  # (name, mean, var) awaiting its Scale partner
    for name, ltype, blobs in layers:
        name = name.replace('/', '_')
        if ltype == 'BatchNorm':
            mean = np.asarray(blobs[0], np.float32).ravel()
            var = np.asarray(blobs[1], np.float32).ravel()
            if len(blobs) > 2:
                # caffe stores a moving-average scale factor as blob 2
                factor = float(np.asarray(blobs[2]).ravel()[0])
                if factor != 0:
                    mean = mean / factor
                    var = var / factor
            pending_bn = (name, mean, var)
            continue
        if ltype == 'Scale' and pending_bn is not None:
            bn_name, mean, var = pending_bn
            pending_bn = None
            s = np.asarray(blobs[0], np.float32).ravel()
            b = np.asarray(blobs[1], np.float32).ravel()
            if keep_bn:
                out[bn_name + '_rm'] = mean
                out[bn_name + '_riv'] = var
                out[bn_name + '_s'] = s
                out[bn_name + '_b'] = b
            else:
                std = np.sqrt(var + 1e-5)
                out[bn_name + '_s'] = s / std
                out[bn_name + '_b'] = b - mean * s / std
            continue
        if not blobs:
            continue
        w = np.asarray(blobs[0], np.float32)
        out[name + '_w'] = w
        if len(blobs) > 1:
            out[name + '_b'] = np.asarray(blobs[1], np.float32).ravel()
        elif ltype == 'Convolution':
            out[name + '_b'] = np.zeros((w.shape[0],), np.float32)
    return out


def main():
    args = [a for a in sys.argv[1:] if a != '--keep-bn']
    keep_bn = '--keep-bn' in sys.argv[1:]
    if len(args) != 2:
        print('usage: pickle_caffe_blobs_densenet.py <model.caffemodel> '
              '<out.pkl> [--keep-bn]')
        sys.exit(1)
    layers = parse_caffemodel_typed(args[0])
    blobs = convert(layers, keep_bn=keep_bn)
    for name in sorted(blobs):
        print(name, blobs[name].shape)
    save_object({'blobs': blobs}, args[1])
    print('Wrote {} blobs to {}'.format(len(blobs), args[1]))


if __name__ == '__main__':
    main()

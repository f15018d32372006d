#!/usr/bin/env python
"""Convert a COCO-trained detector pkl into a cityscapes fine-tuning init.

Capability parity with ``tools/convert_coco_model_to_cityscapes.py``
(reference :38-128): momentum blobs are dropped, and every blob whose
leading axis is 81 (class scores) or 324 (= 4*81, box deltas) is remapped
to the 9 cityscapes classes — rows copied from COCO via the selected
``coco_to_cityscapes_id`` mapping, unmapped rows drawn from a Gaussian
matched to the COCO blob's mean/std.

Usage: python tools/convert_coco_model_to_cityscapes.py \
           --coco_model <in.pkl> --output <out.pkl> \
           [--convert_func cityscapes_to_coco]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.data import coco_to_cityscapes_id as cs_ids
from nafwebsod_tpu.utils.io import load_object, save_object

NUM_CS_CLS = 9
NUM_COCO_CLS = 81


def remap_class_blob(blob, convert_func):
    """(81*k, ...) -> (9*k, ...) with k in {1, 4}; per-class rows seeded
    from COCO or Gaussian-matched random."""
    k = blob.shape[0] // NUM_COCO_CLS
    assert k in (1, 4) and blob.shape[0] == k * NUM_COCO_CLS
    tail = blob.shape[1:]
    per_class = blob.reshape((NUM_COCO_CLS, k) + tail)
    out = (np.random.randn(*((NUM_CS_CLS, k) + tail)) * per_class.std()
           + per_class.mean()).astype(np.float32)
    mapper = getattr(cs_ids, convert_func)
    for cs_id in range(NUM_CS_CLS):
        coco_id = mapper(cs_id)
        if coco_id >= 0:
            out[cs_id] = per_class[coco_id]
    return out.reshape((NUM_CS_CLS * k,) + tail)


def convert(blobs, convert_func):
    out = {}
    for name, v in blobs.items():
        if name.endswith('_momentum'):
            continue
        v = np.asarray(v)
        if v.ndim >= 1 and v.shape[0] in (NUM_COCO_CLS, 4 * NUM_COCO_CLS):
            print('remapping {} {} -> cityscapes'.format(name, v.shape))
            v = remap_class_blob(v, convert_func)
            print('   new shape {}'.format(v.shape))
        out[name] = v
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--coco_model', required=True)
    parser.add_argument('--convert_func', default='cityscapes_to_coco',
                        choices=[f for f in dir(cs_ids)
                                 if f.startswith('cityscapes_to')])
    parser.add_argument('--output', required=True)
    args = parser.parse_args()

    data = load_object(args.coco_model)
    wrapped = 'blobs' in data
    blobs = data['blobs'] if wrapped else data
    converted = convert(blobs, args.convert_func)
    save_object({'blobs': converted} if wrapped else converted, args.output)
    print('wrote {} blobs to {}'.format(len(converted), args.output))


if __name__ == '__main__':
    main()

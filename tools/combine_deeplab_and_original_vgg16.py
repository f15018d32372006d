#!/usr/bin/env python
"""Merge a deeplab-VGG16 pkl with the original VGG16 pkl into one init.

Capability parity with ``tools/combine_deeplab_and_original_vgg16.py``
(reference :18-60): original-VGG16 blobs win on name clashes (asserted
identical), deeplab-only blobs are appended, and every ``fc8*`` classifier
blob is dropped from both (the seg branch re-initializes its own).

Usage: python tools/combine_deeplab_and_original_vgg16.py \
           <original_vgg16.pkl> <deeplab_vgg16.pkl> <out.pkl>
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.utils.io import load_object, save_object


def combine(original, deeplab):
    out = {}
    for name, v in original.items():
        if 'fc8' in name:
            continue
        out[name] = v
    for name, v in deeplab.items():
        if name in original:
            assert np.asarray(v).shape == np.asarray(original[name]).shape, \
                'shape clash on shared blob {}'.format(name)
            # the reference also asserts VALUE equality (sum == sum,
            # :46-47): silently keeping the original over a fine-tuned
            # deeplab copy would produce a mixed init it rejects
            assert np.isclose(np.asarray(v, np.float64).sum(),
                              np.asarray(original[name],
                                         np.float64).sum()), \
                'value clash on shared blob {}'.format(name)
            continue
        if 'fc8' in name:
            continue
        out[name] = v
    return out


def main():
    if len(sys.argv) != 4:
        print('usage: combine_deeplab_and_original_vgg16.py '
              '<original.pkl> <deeplab.pkl> <out.pkl>')
        sys.exit(1)
    original = load_object(sys.argv[1])
    deeplab = load_object(sys.argv[2])
    original = original.get('blobs', original)
    deeplab = deeplab.get('blobs', deeplab)
    out = combine(original, deeplab)
    print('combined {} blobs ({} original, {} deeplab)'.format(
        len(out), len(original), len(deeplab)))
    save_object(out, sys.argv[3])


if __name__ == '__main__':
    main()

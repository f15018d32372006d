#!/usr/bin/env python
"""Convert a torchvision VGG16 .pth checkpoint into the framework's pkl
weight format (the same blob names the Caffe pkl uses: conv1_1..conv5_3,
fc6/fc7/fc8).

Capability parity with ``tools/convert_pth_to_pkl.py``: the torchvision
layer-index -> Caffe name mapping, weights stored in pkl layout (conv OIHW,
fc (out, in)) so ``utils/checkpoint.py`` can load them with its usual layout
translation. Note: torchvision VGG16 is RGB-trained while the Caffe release
is BGR — pass --flip-rgb to swap conv1_1's input channels for BGR pipelines.

Usage: python tools/convert_pth_to_pkl.py <vgg16.pth> <out.pkl> [--flip-rgb]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.utils.io import save_object

VGG16_MAP = [
    ('conv1_1', 'features.0'), ('conv1_2', 'features.2'),
    ('conv2_1', 'features.5'), ('conv2_2', 'features.7'),
    ('conv3_1', 'features.10'), ('conv3_2', 'features.12'),
    ('conv3_3', 'features.14'),
    ('conv4_1', 'features.17'), ('conv4_2', 'features.19'),
    ('conv4_3', 'features.21'),
    ('conv5_1', 'features.24'), ('conv5_2', 'features.26'),
    ('conv5_3', 'features.28'),
    ('fc6', 'classifier.0'), ('fc7', 'classifier.3'), ('fc8', 'classifier.6'),
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('pth')
    parser.add_argument('out_pkl')
    parser.add_argument('--flip-rgb', action='store_true',
                        help='swap conv1_1 input channels RGB->BGR')
    args = parser.parse_args()

    import torch
    state = torch.load(args.pth, map_location='cpu')
    if hasattr(state, 'state_dict'):
        state = state.state_dict()

    blobs = {}
    for caffe_name, pth_name in VGG16_MAP:
        w = state[pth_name + '.weight'].numpy().astype(np.float32)
        b = state[pth_name + '.bias'].numpy().astype(np.float32)
        if caffe_name == 'conv1_1' and args.flip_rgb:
            w = w[:, ::-1].copy()
        blobs[caffe_name + '_w'] = w
        blobs[caffe_name + '_b'] = b

    save_object({'blobs': blobs}, args.out_pkl)
    print('Wrote {} blobs to {}'.format(len(blobs), args.out_pkl))


if __name__ == '__main__':
    main()

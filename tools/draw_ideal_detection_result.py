#!/usr/bin/env python
"""Render the 'ideal' detection signal: proposals colored by their gt
overlap for each gt class of each image.

Capability parity with ``tools/draw_ideal_detection_result.py``
(reference :53-148): loads a JsonDataset + proposal file with gt overlaps,
and for every gt class draws the top-overlap proposals over the image with
a jet colormap scaled by overlap — the upper bound a perfect scorer could
reach with these proposals.

Usage: python tools/draw_ideal_detection_result.py <dataset> \
           <proposal.pkl> <output_dir> [--top-n 1000]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.utils.env import apply_platform_override

apply_platform_override()


def jet_bgr(f):
    """Map [0,1] to a jet-like BGR tuple (reference gray2jet:23-50)."""
    import cv2
    v = np.uint8([[[np.clip(f, 0.0, 1.0) * 255]]])
    b, g, r = cv2.applyColorMap(v, cv2.COLORMAP_JET)[0, 0]
    return int(b), int(g), int(r)


def main():
    import cv2

    from nafwebsod_tpu.data.json_dataset import JsonDataset

    parser = argparse.ArgumentParser()
    parser.add_argument('dataset')
    parser.add_argument('proposal_file')
    parser.add_argument('output_dir')
    parser.add_argument('--top-n', type=int, default=1000)
    args = parser.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)

    ds = JsonDataset(args.dataset)
    roidb = ds.get_roidb(gt=True, proposal_file=args.proposal_file)
    for i, entry in enumerate(roidb):
        if i % 100 == 0:
            print('{}/{}'.format(i + 1, len(roidb)))
        overlaps = entry['gt_overlaps']
        if hasattr(overlaps, 'toarray'):
            overlaps = overlaps.toarray()
        gt_classes = np.unique(entry['gt_classes'][entry['gt_classes'] > 0])
        if len(gt_classes) == 0:
            continue
        im = cv2.imread(entry['image'])
        if im is None:
            continue
        for cls in gt_classes:
            ov = overlaps[:, cls]
            order = np.argsort(-ov)[:args.top_n][::-1]
            canvas = im.copy()
            peak = max(float(ov.max()), 1e-6)
            for ridx in order:
                x1, y1, x2, y2 = entry['boxes'][ridx].astype(int)
                cv2.rectangle(canvas, (x1, y1), (x2, y2),
                              jet_bgr(ov[ridx] / peak), 2)
            name = '{}_cls{}_ideal.png'.format(
                os.path.splitext(os.path.basename(entry['image']))[0], cls)
            cv2.imwrite(os.path.join(args.output_dir, name), canvas)


if __name__ == '__main__':
    main()

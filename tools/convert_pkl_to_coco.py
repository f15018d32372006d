#!/usr/bin/env python
"""Convert a detections.pkl into a COCO-format annotation json (for pseudo
ground-truth self-training rounds).

Capability parity with ``tools/convert_pkl_to_coco.py`` (reference :1-106):
each detection above a score threshold becomes a COCO annotation with its
score kept in the 'score' field.

Usage: python tools/convert_pkl_to_coco.py <detections.pkl> <dataset_name> \
          <out.json> [--thresh 0.0]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.data import catalog
from nafwebsod_tpu.utils.io import load_object


def convert(pkl, dataset, out_json, thresh=0.0):
    detections = load_object(pkl)
    all_boxes = detections['all_boxes']
    num_classes = len(all_boxes)
    num_images = len(all_boxes[1])

    with open(catalog.get_ann_fn(dataset)) as f:
        src = json.load(f)
    images = src['images']
    categories = src['categories']
    assert len(images) == num_images, (
        'pkl has {} images but dataset has {}'.format(num_images,
                                                      len(images)))

    annotations = []
    ann_id = 1
    for i, im_info in enumerate(images):
        for c in range(1, num_classes):
            dets = all_boxes[c][i]
            if dets is None or len(dets) == 0:
                continue
            for det in np.asarray(dets):
                score = float(det[4])
                if score < thresh:
                    continue
                x1, y1, x2, y2 = [float(v) for v in det[:4]]
                annotations.append({
                    'id': ann_id,
                    'image_id': im_info['id'],
                    'category_id': categories[c - 1]['id'],
                    'bbox': [x1, y1, x2 - x1 + 1, y2 - y1 + 1],
                    'area': (x2 - x1 + 1) * (y2 - y1 + 1),
                    'iscrowd': 0,
                    'segmentation': [],
                    'score': score,
                })
                ann_id += 1

    with open(out_json, 'w') as f:
        json.dump({'images': images, 'annotations': annotations,
                   'categories': categories}, f)
    print('Wrote {} annotations to {}'.format(len(annotations), out_json))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('pkl')
    parser.add_argument('dataset')
    parser.add_argument('out_json')
    parser.add_argument('--thresh', type=float, default=0.0)
    args = parser.parse_args()
    convert(args.pkl, args.dataset, args.out_json, args.thresh)


if __name__ == '__main__':
    main()

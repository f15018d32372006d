#!/usr/bin/env python
"""Convert Cityscapes gtFine instance annotations to COCO-format json.

Capability parity with ``tools/convert_cityscapes_to_coco.py``: walks the
gtFine polygon jsons, keeps the instance-only categories, and emits a COCO
json compatible with the catalog's ``cityscapes_fine_instanceonly_seg_*``
entries.

Usage: python tools/convert_cityscapes_to_coco.py <gtFine_dir> <img_dir> \
          <split> <out.json>
"""

import glob
import json
import os
import sys

import numpy as np

INSTANCE_CATEGORIES = [
    'person', 'rider', 'car', 'truck', 'bus', 'train', 'motorcycle',
    'bicycle',
]


def poly_to_box(poly):
    pts = np.asarray(poly, np.float64)
    x1, y1 = pts[:, 0].min(), pts[:, 1].min()
    x2, y2 = pts[:, 0].max(), pts[:, 1].max()
    return [float(x1), float(y1), float(x2 - x1), float(y2 - y1)]


def main():
    if len(sys.argv) < 5 or sys.argv[1] in ('-h', '--help'):
        print('usage: convert_cityscapes_to_coco.py <gt_dir> <img_dir> <split> <out.json>')
        sys.exit(0 if '-h' in sys.argv or '--help' in sys.argv else 1)
    gt_dir, img_dir, split, out_json = sys.argv[1:5]
    cat_to_id = {n: i + 1 for i, n in enumerate(INSTANCE_CATEGORIES)}
    images, annotations = [], []
    ann_id = 1
    files = sorted(glob.glob(os.path.join(
        gt_dir, split, '*', '*_gtFine_polygons.json')))
    for img_id, path in enumerate(files, start=1):
        with open(path) as f:
            data = json.load(f)
        stem = os.path.basename(path).replace('_gtFine_polygons.json', '')
        city = os.path.basename(os.path.dirname(path))
        images.append({
            'id': img_id,
            'file_name': os.path.join(
                split, city, stem + '_leftImg8bit.png'),
            'width': data['imgWidth'], 'height': data['imgHeight'],
        })
        for obj in data['objects']:
            label = obj['label']
            crowd = 0
            if label.endswith('group'):
                label = label[:-len('group')]
                crowd = 1
            if label not in cat_to_id:
                continue
            poly = [c for pt in obj['polygon'] for c in pt]
            bbox = poly_to_box(obj['polygon'])
            annotations.append({
                'id': ann_id, 'image_id': img_id,
                'category_id': cat_to_id[label],
                'segmentation': [poly],
                'bbox': bbox, 'area': bbox[2] * bbox[3],
                'iscrowd': crowd,
            })
            ann_id += 1
    with open(out_json, 'w') as f:
        json.dump({
            'images': images, 'annotations': annotations,
            'categories': [{'id': i, 'name': n}
                           for n, i in cat_to_id.items()],
        }, f)
    print('Wrote {} images / {} annotations to {}'.format(
        len(images), len(annotations), out_json))


if __name__ == '__main__':
    main()

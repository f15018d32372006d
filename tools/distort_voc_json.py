#!/usr/bin/env python
"""Inject label noise into a COCO-style VOC json (noise-robustness ablation).

Capability parity with ``tools/distort_voc_json.py`` (reference :17-88):
with probability p1 (0.1) an annotation's category is re-rolled uniformly,
and with probability p2 (1.0) each image keeps only ONE randomly chosen
annotation — producing the weak single-label regime the webly experiments
simulate.

Usage: python tools/distort_voc_json.py <in.json> <out.json> [p1] [p2] [seed]
"""

import json
import random
import sys
from collections import defaultdict


def distort(datastore, p1=0.1, p2=1.0, rng=random):
    num_classes = len(datastore['categories'])
    by_image = defaultdict(list)
    for idx, ann in enumerate(datastore['annotations']):
        by_image[ann['image_id']].append(idx)

    drop = set()
    for img in datastore['images']:
        idxs = by_image.get(img['id'], [])
        if not idxs:
            continue
        for idx in idxs:
            if rng.random() < p1:
                datastore['annotations'][idx]['category_id'] = rng.randint(
                    0, num_classes - 1)
        if rng.random() < p2:
            keep = rng.choice(idxs)
            drop.update(i for i in idxs if i != keep)
    datastore['annotations'] = [
        a for i, a in enumerate(datastore['annotations']) if i not in drop]
    return datastore


def main():
    if len(sys.argv) < 3:
        print('usage: distort_voc_json.py <in.json> <out.json> '
              '[p1=0.1] [p2=1.0] [seed]')
        sys.exit(1)
    p1 = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1
    p2 = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0
    if len(sys.argv) > 5:
        random.seed(int(sys.argv[5]))
    with open(sys.argv[1]) as f:
        datastore = json.load(f)
    n_before = len(datastore['annotations'])
    distort(datastore, p1, p2)
    print('annotations: {} -> {}'.format(n_before,
                                         len(datastore['annotations'])))
    with open(sys.argv[2], 'w') as f:
        json.dump(datastore, f)


if __name__ == '__main__':
    main()

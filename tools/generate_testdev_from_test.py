#!/usr/bin/env python
"""Filter a COCO test-set detections json down to the test-dev subset.

Capability parity with ``tools/generate_testdev_from_test.py``
(reference :55-96): keeps only detections whose image_id appears in the
``coco_2017_test-dev`` image list, writing ``<name>_test-dev.json`` next to
the output dir for COCO evaluation-server submission.

Usage: python tools/generate_testdev_from_test.py --json <dets.json> \
           [--output-dir /tmp] [--testdev-ann <image_info_test-dev.json>]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.data import catalog


def filter_testdev(detections, testdev_image_ids):
    ids = set(testdev_image_ids)
    return [d for d in detections if d['image_id'] in ids]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--json', dest='json_file', required=True)
    parser.add_argument('--output-dir', default='/tmp')
    parser.add_argument('--testdev-ann', default=None,
                        help='image_info json for test-dev (defaults to the '
                             'catalog coco_2017_test-dev entry)')
    args = parser.parse_args()

    with open(args.json_file) as f:
        dets = json.load(f)
    ann_fn = args.testdev_ann or catalog.get_ann_fn('coco_2017_test-dev')
    with open(ann_fn) as f:
        ids = [im['id'] for im in json.load(f)['images']]
    print('test-dev has {} images; filtering {} detections'.format(
        len(ids), len(dets)))
    kept = filter_testdev(dets, ids)
    stem, ext = os.path.splitext(os.path.basename(args.json_file))
    out = os.path.join(args.output_dir, stem + '_test-dev' + ext)
    with open(out, 'w') as f:
        json.dump(kept, f)
    print('wrote {} detections to {}'.format(len(kept), out))


if __name__ == '__main__':
    main()

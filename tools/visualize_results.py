#!/usr/bin/env python
"""Render detections saved in a detections.pkl onto the dataset images.

Capability parity with ``tools/visualize_results.py`` (reference :84-135):
walk the dataset's roidb, pick each image's per-class boxes (plus segms /
keypoints when the pkl carries them), and write a rendered image per input
via ``vis_one_image``.

Usage:
  python tools/visualize_results.py --dataset voc_2007_test \
      --detections /path/detections.pkl [--thresh 0.9] [--first 10] \
      [--output-dir /tmp/vis-output]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.utils.env import apply_platform_override

apply_platform_override()  # must run before any jax device query

from nafwebsod_tpu.utils.cli import parse_or_usage
from nafwebsod_tpu.utils.logging_utils import setup_logging

logger = setup_logging(__name__)


def parse_args():
    parser = argparse.ArgumentParser(
        description='Visualize a detections.pkl')
    parser.add_argument('--dataset', default='coco_2014_minival')
    parser.add_argument('--detections', required=True,
                        help='detections.pkl from test_net.py')
    parser.add_argument('--thresh', type=float, default=0.9)
    parser.add_argument('--kp-thresh', type=float, default=2.0)
    parser.add_argument('--output-dir', default='./tmp/vis-output')
    parser.add_argument('--first', type=int, default=0,
                        help='only visualize the first k images')
    return parse_or_usage(parser)


def _id_or_index(ix, val):
    # per-class entries may be flat (shared across images) or per-image
    # lists, exactly as the reference tolerates (:96-100)
    if val is None or len(val) == 0:
        return val
    return val[ix]


def vis(dataset_name, detections_pkl, thresh, kp_thresh, output_dir,
        limit=0):
    import cv2

    from nafwebsod_tpu.data.json_dataset import JsonDataset
    from nafwebsod_tpu.utils.io import load_object
    from nafwebsod_tpu.utils.vis import vis_one_image

    ds = JsonDataset(dataset_name)
    roidb = ds.get_roidb()
    dets = load_object(detections_pkl)
    assert 'all_boxes' in dets, (
        'Expected a detections pkl in the test_engine.py format')
    all_boxes = dets['all_boxes']
    all_segms = dets.get('all_segms')
    all_keyps = dets.get('all_keyps')

    os.makedirs(output_dir, exist_ok=True)
    for ix, entry in enumerate(roidb):
        if limit > 0 and ix >= limit:
            break
        if ix % 10 == 0:
            logger.info('%d/%d', ix + 1, len(roidb))
        im = cv2.imread(entry['image'])
        if im is None:
            logger.warning('Could not read %s', entry['image'])
            continue
        stem = os.path.splitext(os.path.basename(entry['image']))[0]
        cls_boxes_i = [_id_or_index(ix, b) for b in all_boxes]
        cls_segms_i = ([_id_or_index(ix, s) for s in all_segms]
                       if all_segms is not None else None)
        cls_keyps_i = ([_id_or_index(ix, k) for k in all_keyps]
                       if all_keyps is not None else None)
        vis_one_image(
            im,  # BGR end to end, like the eval-time rendering path
            cls_boxes_i, segms=cls_segms_i, keypoints=cls_keyps_i,
            thresh=thresh, kp_thresh=kp_thresh, class_names=ds.classes,
            output_name=os.path.join(output_dir, stem + '.png'))
    logger.info('Wrote renderings to %s', os.path.abspath(output_dir))


def main():
    args = parse_args()
    vis(args.dataset, args.detections, args.thresh, args.kp_thresh,
        args.output_dir, limit=args.first)


if __name__ == '__main__':
    main()

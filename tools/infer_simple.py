#!/usr/bin/env python
"""Run inference on a directory of images (or one image) with precomputed
proposals and render/save detections.

Capability parity with ``tools/infer_simple.py`` (reference :1-185), adapted
to the WSL pipeline: proposals come from a proposal pkl keyed by file stem
or, if absent, a uniform grid of boxes is used as a crude fallback.
"""

import argparse
import glob
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.utils.env import (apply_platform_override,
                                     enable_compilation_cache)

apply_platform_override()  # must run before any jax device query
enable_compilation_cache()  # reruns skip the remote-helper compile wall

from nafwebsod_tpu.core.config import cfg
from nafwebsod_tpu.utils.cli import configure_from_args, parse_or_usage
from nafwebsod_tpu.utils.logging_utils import setup_logging

logger = setup_logging(__name__)


def parse_args():
    parser = argparse.ArgumentParser(description='Simple inference demo')
    parser.add_argument('--cfg', dest='cfg_file', default=None)
    parser.add_argument('--wts', dest='weights', required=True)
    parser.add_argument('--output-dir', default='/tmp/infer_simple')
    parser.add_argument('--image-ext', default='jpg')
    parser.add_argument('--proposals', default=None,
                        help='proposal pkl keyed per image')
    parser.add_argument('--thresh', type=float, default=0.5)
    parser.add_argument('im_or_folder')
    return parse_or_usage(parser)


def grid_proposals(h, w, n_per_axis=8):
    """Fallback proposal grid when no proposal file is given."""
    boxes = []
    for s in (0.3, 0.5, 0.8):
        bw, bh = w * s, h * s
        for cx in np.linspace(bw / 2, w - bw / 2, n_per_axis):
            for cy in np.linspace(bh / 2, h - bh / 2, n_per_axis):
                boxes.append([cx - bw / 2, cy - bh / 2,
                              cx + bw / 2 - 1, cy + bh / 2 - 1])
    return np.array(boxes, np.float32)


def main():
    import cv2

    args = parse_args()
    configure_from_args(args)
    os.makedirs(args.output_dir, exist_ok=True)

    from nafwebsod_tpu.data.dummy_datasets import classes_for_num
    from nafwebsod_tpu.engine import test as infer
    from nafwebsod_tpu.engine.test_engine import initialize_model_from_cfg
    from nafwebsod_tpu.utils.vis import vis_one_image

    spec, params = initialize_model_from_cfg(args.weights)
    class_names = classes_for_num(cfg.MODEL.NUM_CLASSES)

    if os.path.isdir(args.im_or_folder):
        im_list = sorted(glob.glob(os.path.join(
            args.im_or_folder, '*.' + args.image_ext)))
    else:
        im_list = [args.im_or_folder]

    props = None
    if args.proposals:
        with open(args.proposals, 'rb') as f:
            props = pickle.load(f, encoding='latin1')

    for i, im_name in enumerate(im_list):
        logger.info('Processing %s (%d/%d)', im_name, i + 1, len(im_list))
        im = cv2.imread(im_name)
        if im is None:
            logger.warning('Could not read %s; skipping', im_name)
            continue
        stem = os.path.splitext(os.path.basename(im_name))[0]
        if props is not None and stem in props:
            boxes = np.asarray(props[stem]['boxes'], np.float32)
            scores = np.asarray(props[stem].get(
                'scores', np.ones((len(boxes), 1))), np.float32)
        else:
            boxes = grid_proposals(im.shape[0], im.shape[1])
            scores = np.ones((len(boxes), 1), np.float32)

        cls_boxes, _, _ = infer.im_detect_all(spec, params, im, boxes, scores)
        out_name = os.path.join(args.output_dir, stem + '_det.jpg')
        vis_one_image(im, cls_boxes, thresh=args.thresh,
                      class_names=class_names, output_name=out_name)
        logger.info('Wrote %s', out_name)


if __name__ == '__main__':
    main()

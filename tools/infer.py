#!/usr/bin/env python
"""Single-image inference with model-generated OR file-based proposals.

Capability parity with ``tools/infer.py`` (reference :66-198): run one image
through a trained model and render the detections. Where the reference
spins up a separate RPN-only model to make proposals (``--rpn-pkl``), the
TPU rebuild generates proposals in-graph when the config is an end-to-end
model (MODEL.FASTER_RCNN / retinanet); otherwise pass ``--proposals`` with a
per-image pkl like infer_simple.py.

Usage:
  python tools/infer.py --cfg cfg.yaml --wts model.pkl [--proposals p.pkl]
      [--output-dir /tmp/infer] [--thresh 0.5] image.jpg
"""

import argparse
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
    parser = argparse.ArgumentParser(description='Single-image inference')
    parser.add_argument('--cfg', dest='cfg_file', default=None)
    parser.add_argument('--wts', dest='weights', required=True)
    parser.add_argument('--output-dir', default='/tmp/infer')
    parser.add_argument('--proposals', default=None,
                        help='proposal pkl keyed by image stem')
    parser.add_argument('--thresh', type=float, default=0.5)
    parser.add_argument('--opts', nargs='*', default=[],
                        help='cfg KEY VALUE override pairs')
    parser.add_argument('image')
    return parse_or_usage(parser)


def main():
    import cv2

    args = parse_args()
    configure_from_args(args)
    os.makedirs(args.output_dir, exist_ok=True)

    from nafwebsod_tpu.engine import test as infer
    from nafwebsod_tpu.engine.test_engine import initialize_model_from_cfg
    from nafwebsod_tpu.utils.io import save_object
    from nafwebsod_tpu.utils.vis import vis_one_image

    spec, params = initialize_model_from_cfg(args.weights)
    im = cv2.imread(args.image)
    assert im is not None, 'could not read {}'.format(args.image)
    stem = os.path.splitext(os.path.basename(args.image))[0]

    boxes = scores = None
    if not (spec.faster_rcnn or spec.retinanet or spec.retinanet_wsl):
        assert args.proposals, (
            'this model needs precomputed proposals; pass --proposals '
            '(or use a FASTER_RCNN / retinanet config)')
        with open(args.proposals, 'rb') as f:
            props = pickle.load(f, encoding='latin1')
        if stem in props:
            entry = props[stem]
        elif isinstance(props.get('boxes'), np.ndarray) or (
                isinstance(props.get('boxes'), list) and
                not isinstance(props['boxes'][0], (list, np.ndarray))):
            entry = props  # single-image pkl: {boxes, scores}
        else:
            raise SystemExit(
                "'{}' not found in {} — pass a per-image proposal pkl "
                "keyed by image stem, or {{boxes, scores}} for one image "
                "(dataset-wide pkls from convert_proposals.py belong to "
                "test_net.py via TEST.PROPOSAL_FILES)".format(
                    stem, args.proposals))
        boxes = np.asarray(entry['boxes'], np.float32)
        scores = np.asarray(entry.get('scores',
                                      np.ones((len(boxes), 1))), np.float32)

    cls_boxes, _, cls_keyps = infer.im_detect_all(
        spec, params, im, boxes, scores)
    out_img = os.path.join(args.output_dir, stem + '_det.png')
    vis_one_image(im, cls_boxes, thresh=args.thresh, output_name=out_img)
    out_pkl = os.path.join(args.output_dir, stem + '_det.pkl')
    save_object({'cls_boxes': cls_boxes, 'cls_keyps': cls_keyps}, out_pkl)
    logger.info('Wrote %s and %s', out_img, out_pkl)


if __name__ == '__main__':
    main()

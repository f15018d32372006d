#!/usr/bin/env python
"""Grid-search NMS threshold x score threshold x detections-per-image over a
cached detections.pkl, re-running only the NMS-and-limit + evaluation stage.

Capability parity with ``tools/test_net_wsl_grid_search.py`` (reference
:109-192): rebuilds the pre-NMS per-image (scores, boxes) cache from
detections.pkl, sweeps the grid, and writes grid_search.csv in the output
dir.

PRECONDITION (same as the reference, :128-150): the cached detections must
come from a WSL-style run where every class shares the same box rows —
i.e. test with NMS effectively off (TEST.NMS 1.0), a tiny SCORE_THRESH and
a huge DETECTIONS_PER_IM, no bbox regression. Detections cached after
per-class NMS/regression cannot be reconstructed (the reference crashes on
them; this port skips the mismatched classes).
"""

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.core.config import (assert_and_infer_cfg, cfg,
                                       get_output_dir)
from nafwebsod_tpu.utils.cli import configure_from_args, parse_or_usage
from nafwebsod_tpu.utils.io import load_object
from nafwebsod_tpu.utils.logging_utils import setup_logging

logger = setup_logging(__name__)

NMSES = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2, 0.1, 0.0]
THRESHS = [1e-10, 1e-9, 1e-8, 1e-7, 1e-6, 1e-5, 1e-4, 1e-3, 1e-2, 1e-1]
MAX_PER_IMAGES = [10000, 1000, 100, 10, 1]


def parse_args():
    parser = argparse.ArgumentParser(
        description='Grid search NMS/thresh/topk over cached detections')
    parser.add_argument('--cfg', dest='cfg_file', default=None)
    parser.add_argument('--wait', action='store_true',
                        help='Wait for detections.pkl to exist')
    parser.add_argument('opts', default=None, nargs=argparse.REMAINDER)
    return parse_or_usage(parser)


def rebuild_prenms_cache(all_boxes, num_classes, num_images):
    """detections.pkl stores post-NMS per-class boxes; reconstruct the
    per-image (scores, boxes) matrices the NMS stage consumes
    (reference :128-150)."""
    all_scores_cache, all_boxes_cache = [], []
    for i in range(num_images):
        max_det = all_boxes[1][i].shape[0]
        boxes = np.full((max_det, 4), -1, dtype=np.float32)
        scores = np.full((max_det, num_classes), -1, dtype=np.float32)
        for j in range(1, num_classes):
            if len(all_boxes[j]) > 0 and all_boxes[j][i].shape[0] == max_det:
                scores[:, j] = all_boxes[j][i][:, 4]
        if max_det:
            boxes[:, 0:4] = all_boxes[1][i][:, :4]
        boxes = np.tile(boxes, (1, num_classes))
        all_scores_cache.append(scores)
        all_boxes_cache.append(boxes)
    return all_scores_cache, all_boxes_cache


def main():
    args = parse_args()
    configure_from_args(args, infer=False)
    assert_and_infer_cfg(make_immutable=False)

    from nafwebsod_tpu.data import task_evaluation
    from nafwebsod_tpu.engine.test import box_results_with_nms_and_limit
    from nafwebsod_tpu.engine.test_engine import (empty_results,
                                                  extend_results,
                                                  get_roidb_and_dataset)

    dataset_name = cfg.TEST.DATASETS[0]
    proposal_file = (cfg.TEST.PROPOSAL_FILES[0]
                     if cfg.TEST.PROPOSAL_FILES else None)
    output_dir = get_output_dir((dataset_name,), training=False)
    det_file = os.path.join(output_dir, 'detections.pkl')
    if args.wait:
        import time
        while not os.path.exists(det_file):
            logger.info('Waiting for %s', det_file)
            time.sleep(10)

    roidb, dataset, _, _, num_images = get_roidb_and_dataset(
        dataset_name, proposal_file)
    num_classes = cfg.MODEL.NUM_CLASSES
    outputs = load_object(det_file)
    all_scores_cache, all_boxes_cache = rebuild_prenms_cache(
        outputs['all_boxes'], num_classes, num_images)

    rows = [['nms', 'thresh', 'max_per_im', 'results']]
    for nms in NMSES:
        for thresh in THRESHS:
            for max_per_image in MAX_PER_IMAGES:
                logger.info('NMS %s thresh %s max_per_im %s', nms, thresh,
                            max_per_image)
                cfg.TEST.NMS = nms
                cfg.TEST.SCORE_THRESH = thresh
                cfg.TEST.DETECTIONS_PER_IM = max_per_image
                all_boxes, all_segms, all_keyps = empty_results(
                    num_classes, num_images)
                for i in range(num_images):
                    _, _, cls_boxes_i = box_results_with_nms_and_limit(
                        all_scores_cache[i],
                        all_boxes_cache[i])
                    extend_results(i, all_boxes, cls_boxes_i)
                results = task_evaluation.evaluate_all(
                    dataset, all_boxes, all_segms, all_keyps, output_dir,
                    image_ids=outputs.get('image_ids'))
                logger.info('%s', results)
                rows.append([nms, thresh, max_per_image, results])

    csv_path = os.path.join(output_dir, 'grid_search.csv')
    with open(csv_path, 'w', newline='') as f:
        csv.writer(f, dialect='excel').writerows(rows)
    logger.info('Wrote %s', csv_path)


if __name__ == '__main__':
    main()

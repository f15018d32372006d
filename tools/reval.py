#!/usr/bin/env python
"""Re-evaluate a cached detections.pkl without re-running inference.

Capability parity with ``tools/reval.py``.
Usage: python tools/reval.py --cfg cfg.yaml [--det-file path] [OPT VAL ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.core.config import (assert_and_infer_cfg, cfg,
                                       get_output_dir, merge_cfg_from_file,
                                       merge_cfg_from_list)
from nafwebsod_tpu.utils.io import load_object
from nafwebsod_tpu.utils.logging_utils import setup_logging

logger = setup_logging(__name__)


def parse_args():
    parser = argparse.ArgumentParser(description='Re-evaluate detections')
    parser.add_argument('--cfg', dest='cfg_file', default=None)
    parser.add_argument('--det-file', default=None,
                        help='Path to detections.pkl (defaults to the '
                             'dataset output dir)')
    parser.add_argument('opts', default=None, nargs=argparse.REMAINDER)
    if len(sys.argv) == 1:
        parser.print_help()
        sys.exit(1)
    return parser.parse_args()


def main():
    args = parse_args()
    if args.cfg_file is not None:
        merge_cfg_from_file(args.cfg_file)
    if args.opts is not None:
        merge_cfg_from_list(args.opts)
    assert_and_infer_cfg()

    from nafwebsod_tpu.data import task_evaluation
    from nafwebsod_tpu.data.json_dataset import JsonDataset

    dataset_name = cfg.TEST.DATASETS[0]
    output_dir = get_output_dir((dataset_name,), training=False)
    det_file = args.det_file or os.path.join(output_dir, 'detections.pkl')
    data = load_object(det_file)
    dataset = JsonDataset(dataset_name)
    results = task_evaluation.evaluate_all(
        dataset, data['all_boxes'], data.get('all_segms'),
        data.get('all_keyps'), output_dir,
        image_ids=data.get('image_ids'))
    logger.info('%s', results)


if __name__ == '__main__':
    main()

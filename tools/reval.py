#!/usr/bin/env python
"""Re-evaluate a cached detections.pkl without re-running inference.

Capability parity with ``tools/reval.py``.
Usage: python tools/reval.py --cfg cfg.yaml [--det-file path] [OPT VAL ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.core.config import cfg, get_output_dir
from nafwebsod_tpu.utils.cli import configure_from_args, parse_or_usage
from nafwebsod_tpu.utils.io import load_object
from nafwebsod_tpu.utils.logging_utils import setup_logging

logger = setup_logging(__name__)


def main():
    parser = argparse.ArgumentParser(description='Re-evaluate detections')
    parser.add_argument('--cfg', dest='cfg_file', default=None)
    parser.add_argument('--det-file', default=None,
                        help='Path to detections.pkl (defaults to the '
                             'dataset output dir)')
    parser.add_argument('opts', default=None, nargs=argparse.REMAINDER)
    args = parse_or_usage(parser)
    configure_from_args(args)

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

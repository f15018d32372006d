#!/usr/bin/env python
"""Test a trained model on one or more datasets.

Capability parity with ``tools/test_net_wsl.py``: YAML cfg + CLI overrides,
``--range`` for sharded inference over an image index range, ``--wait`` to
poll for the weights file to appear (reference :87-136).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.utils.env import (apply_platform_override,
                                     enable_compilation_cache)

apply_platform_override()  # must run before any jax device query
enable_compilation_cache()  # reruns skip the remote-helper compile wall

from nafwebsod_tpu.core.config import assert_and_infer_cfg, cfg
from nafwebsod_tpu.utils.cli import configure_from_args, parse_or_usage
from nafwebsod_tpu.utils.logging_utils import setup_logging

logger = setup_logging(__name__)


def parse_args():
    # separate from main(): tools/test_net_vis.py wraps this to force --vis
    parser = argparse.ArgumentParser(description='Test a detection network')
    parser.add_argument('--cfg', dest='cfg_file', default=None)
    parser.add_argument('--wait', dest='wait', action='store_true',
                        help='Wait for the weights file to exist')
    parser.add_argument('--vis', dest='vis', action='store_true',
                        help='Visualize detections')
    parser.add_argument('--multi-gpu-testing', dest='multi_gpu_testing',
                        action='store_true')
    parser.add_argument('--range', dest='range', type=int, nargs=2,
                        default=None, help='start end image index range')
    parser.add_argument('opts', default=None, nargs=argparse.REMAINDER)
    return parse_or_usage(parser)


def main():
    args = parse_args()
    configure_from_args(args, infer=False)
    if args.vis:
        cfg.VIS = True
    assert_and_infer_cfg()

    weights_file = cfg.TEST.WEIGHTS
    assert weights_file, 'TEST.WEIGHTS must be set'
    while args.wait and not os.path.exists(weights_file):
        logger.info('Waiting for %s to exist...', weights_file)
        time.sleep(10)

    from nafwebsod_tpu.engine import test_engine
    test_engine.run_inference(
        weights_file,
        ind_range=tuple(args.range) if args.range else None,
        multi_gpu_testing=args.multi_gpu_testing,
        check_expected_results=True,
    )


if __name__ == '__main__':
    main()

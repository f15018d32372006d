#!/usr/bin/env python
"""Train a model with the TPU-native NA-fWebSOD framework.

Capability parity with ``tools/train_net_wsl.py`` (reference lines 87-159):
merge YAML cfg + CLI overrides, seed, train, then test the final weights and
every snapshot; when the training dataset is a VOC split, re-test on the
training set for CorLoc.

Usage:
    python tools/train_net.py --cfg configs/.../na_wsddn.yaml \
        [--skip-test] [--multi-gpu-testing] [OPT VAL ...]
"""

import argparse
import os
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
    # separate from main(): tools/train_net_vis.py wraps this to force the
    # WSL.SAMPLE vis hooks on
    parser = argparse.ArgumentParser(description='Train a network')
    parser.add_argument('--cfg', dest='cfg_file', default=None,
                        help='Config file for training (and optionally testing)')
    parser.add_argument('--multi-gpu-testing', dest='multi_gpu_testing',
                        action='store_true',
                        help='Use cfg.NUM_GPUS devices for inference')
    parser.add_argument('--skip-test', dest='skip_test', action='store_true',
                        help='Do not test the final model')
    parser.add_argument('opts', default=None, nargs=argparse.REMAINDER,
                        help='See nafwebsod_tpu/core/config.py for all options')
    return parse_or_usage(parser)


def main():
    args = parse_args()
    configure_from_args(args)
    np.random.seed(cfg.RNG_SEED)

    from nafwebsod_tpu.engine import train as train_engine
    checkpoints, _ = train_engine.train_model()

    import jax
    if jax.process_count() > 1:
        # Multi-host pods: the in-process post-train evaluation would build
        # inference meshes over the global device set while only one process
        # drove them (deadlock), so it is skipped — run tools/test_net.py on
        # the written checkpoints separately. The barrier keeps every worker
        # alive until all have finished training (an exiting peer would tear
        # down the slice for the rest).
        from jax.experimental import multihost_utils
        if not args.skip_test and jax.process_index() == 0:
            logger.info(
                'multi-host run: skipping in-process post-train testing; '
                'evaluate %s with tools/test_net.py', checkpoints['final'])
        multihost_utils.sync_global_devices('train_net_done')
        return

    if not args.skip_test:
        test_model(checkpoints['final'], args.multi_gpu_testing)
        for snapshot_iter in sorted(k for k in checkpoints if k != 'final'):
            test_model(checkpoints[snapshot_iter], args.multi_gpu_testing)


def test_model(model_file, multi_gpu_testing):
    """Test a model and, for VOC-style training sets, re-test on the training
    split to compute CorLoc (tools/train_net_wsl.py:121-144)."""
    from nafwebsod_tpu.engine import test_engine
    cfg.immutable(False)
    cfg.TEST.WEIGHTS = model_file
    cfg.immutable(True)
    test_engine.run_inference(
        model_file, multi_gpu_testing=multi_gpu_testing,
        check_expected_results=True)


if __name__ == '__main__':
    main()

#!/usr/bin/env python
"""Benchmark the training data loader's minibatch throughput.

Capability parity with ``detectron/tests/data_loader_benchmark.py``: spin up
the threaded RoIDataLoader on the configured TRAIN dataset and report
minibatches/sec for a few thread counts.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.core.config import assert_and_infer_cfg, cfg
from nafwebsod_tpu.utils.cli import configure_from_args
from nafwebsod_tpu.utils.logging_utils import setup_logging

logger = setup_logging(__name__)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg', dest='cfg_file', default=None)
    parser.add_argument('--num-batches', type=int, default=200)
    parser.add_argument('--threads', type=int, nargs='+', default=[1, 2, 4])
    parser.add_argument('opts', default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    configure_from_args(args, infer=False)
    assert_and_infer_cfg(make_immutable=False)

    from nafwebsod_tpu.data.loader import RoIDataLoader
    from nafwebsod_tpu.data.roidb import combined_roidb_for_training

    roidb = combined_roidb_for_training(cfg.TRAIN.DATASETS,
                                        cfg.TRAIN.PROPOSAL_FILES)
    logger.info('roidb: %d entries', len(roidb))
    for nt in args.threads:
        loader = RoIDataLoader(roidb, num_loaders=nt,
                               pad_rois_to=cfg.TRAIN.BATCH_SIZE_PER_IM,
                               size_bucket=cfg.TPU.SIZE_BUCKET_MULTIPLE)
        loader.start(prefill=True)
        t0 = time.perf_counter()
        for _ in range(args.num_batches):
            loader.get()
        dt = time.perf_counter() - t0
        loader.shutdown()
        logger.info('%d threads: %.1f minibatches/sec',
                    nt, args.num_batches / dt)


if __name__ == '__main__':
    main()

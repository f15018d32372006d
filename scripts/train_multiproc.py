#!/usr/bin/env python
"""Multi-controller training worker: one OS process per (virtual) host.

The reference's only multi-process execution is inference sharding
(detectron/utils/subprocess.py:40-106); its training is single-process. The
TPU rebuild scales training across hosts with one controller process per
host over a global ``jax.sharding.Mesh`` (parallel/multihost.py). This
worker drives that path FOR REAL — ``jax.distributed.initialize`` + Gloo
CPU collectives on localhost — so the multi-process branches
(``shard_roidb`` / ``global_canvas`` / ``form_global_batch`` /
``form_global_rngs`` / process-0 checkpointing) execute un-mocked.

Usage (launch once per process):
    python scripts/train_multiproc.py --coordinator localhost:PORT \
        --num-processes N --process-id I --devices-per-process D \
        --cfg CFG [KEY VALUE ...]

Used by tests/test_multiproc_train.py, which asserts the 2-process
per-step losses and final checkpoint match the single-process run to
executable-difference tolerance (the two layouts compile different XLA
executables whose local reductions differ at ulp scale — see the test
module docstring for the measured physics; bitwise equality across
layouts is not a property XLA grants).
"""

import argparse
import os
import sys


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--coordinator', required=True,
                   help='coordinator address, e.g. localhost:29701')
    p.add_argument('--num-processes', type=int, required=True)
    p.add_argument('--process-id', type=int, required=True)
    p.add_argument('--devices-per-process', type=int, default=1)
    p.add_argument('--cfg', dest='cfg_file', required=True)
    p.add_argument('opts', default=None, nargs=argparse.REMAINDER)
    return p.parse_args()


def main():
    args = parse_args()
    # platform + virtual device count must be pinned before jax backends
    # initialize (CLAUDE.md: plain JAX_PLATFORMS does not override the
    # pinned axon platform; NAFWEBSOD_PLATFORM does, via jax.config)
    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '') +
        ' --xla_force_host_platform_device_count=%d'
        % args.devices_per_process)
    os.environ['NAFWEBSOD_PLATFORM'] = 'cpu'
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

    from nafwebsod_tpu.utils.env import apply_platform_override
    apply_platform_override()

    import jax
    if args.num_processes > 1:
        jax.distributed.initialize(args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)

    import numpy as np
    from nafwebsod_tpu.core.config import (assert_and_infer_cfg, cfg,
                                           merge_cfg_from_file,
                                           merge_cfg_from_list)
    merge_cfg_from_file(args.cfg_file)
    if args.opts:
        merge_cfg_from_list(args.opts)
    assert_and_infer_cfg()
    np.random.seed(cfg.RNG_SEED)

    from nafwebsod_tpu.engine import train as train_engine
    checkpoints, losses = train_engine.train_model()
    if jax.process_index() == 0:
        print('FINAL_CHECKPOINT:%s' % checkpoints.get('final', ''))
        print('FINAL_LOSSES:%s' % ','.join('%.9g' % l for l in losses))
    # keep every controller alive until all finished (an early exit tears
    # down the Gloo process group under the peers)
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices('train_multiproc_done')


if __name__ == '__main__':
    main()

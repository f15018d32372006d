"""Per-iteration training statistics.

Capability parity with ``detectron/utils/training_stats_wsl.py``:
median-smoothed loss/metric windows sized ``1280 / num_devices``, iteration
timing with ETA, loader queue depth, and JSON-lines emission via
``log_json_stats`` (reference lines 24-124). Device-memory stats come from
``jax.local_devices()[0].memory_stats()`` instead of Caffe2's GPU tracker.
"""

import datetime

import jax
import numpy as np

from nafwebsod_tpu.core.config import cfg
from nafwebsod_tpu.utils.logging_utils import (SmoothedValue, log_json_stats,
                                               setup_logging)
from nafwebsod_tpu.utils.timer import Timer

logger = setup_logging(__name__)


class TrainingStats(object):
    """Track vital training statistics (ref training_stats_wsl.py:33-124)."""

    def __init__(self, losses_and_metrics=(), log_period=20,
                 num_devices=None):
        self.LOG_PERIOD = log_period
        num_devices = num_devices or max(cfg.NUM_GPUS, 1)
        self.WIN_SZ = max(1280 // num_devices, 100)
        self.iter_timer = Timer()
        self.filter_losses_and_metrics = list(losses_and_metrics)
        self.smoothed_losses_and_metrics = {
            key: SmoothedValue(self.WIN_SZ)
            for key in self.filter_losses_and_metrics
        }
        self.smoothed_total_loss = SmoothedValue(self.WIN_SZ)
        self.iter_total_loss = np.nan

    def IterTic(self):
        self.iter_timer.tic()

    def IterToc(self, span=1):
        """span > 1: the timed interval covered `span` iterations (a scan
        window); record it as `span` calls of 1/span the duration so
        average_time / ETA stay per-iteration."""
        dt = self.iter_timer.toc(average=False)
        if span > 1:
            t = self.iter_timer
            t.calls += span - 1
            t.diff = dt / span
            t.average_time = t.total_time / t.calls
        return self.iter_timer.diff

    def UpdateIterStats(self, total_loss, aux):
        """total_loss: float; aux: dict of already device-averaged scalars."""
        for k, v in aux.items():
            if k not in self.smoothed_losses_and_metrics:
                self.smoothed_losses_and_metrics[k] = SmoothedValue(self.WIN_SZ)
                self.filter_losses_and_metrics.append(k)
            self.smoothed_losses_and_metrics[k].AddValue(float(v))
        self.iter_total_loss = float(total_loss)
        self.smoothed_total_loss.AddValue(self.iter_total_loss)

    def LogIterStats(self, cur_iter, lr, queue_size=None):
        final = cur_iter == cfg.SOLVER.MAX_ITER - 1
        if final or cur_iter % self.LOG_PERIOD == 0:
            log_json_stats(self.GetStats(cur_iter, lr, queue_size))

    def GetStats(self, cur_iter, lr, queue_size=None):
        # json_stats protocol keys (iter/lr/time/loss/eta [+metrics, mem,
        # queue_size]) — consumed by tools/visualize_learn.py
        per_iter = self.iter_timer.average_time
        remaining = int(per_iter * (cfg.SOLVER.MAX_ITER - cur_iter))
        stats = {
            'iter': cur_iter,
            'lr': float(lr),
            'time': per_iter,
            'loss': self.smoothed_total_loss.GetMedianValue(),
            'eta': str(datetime.timedelta(seconds=remaining)),
        }
        if queue_size is not None:
            stats['queue_size'] = queue_size
        for k in self.filter_losses_and_metrics:
            stats[k] = self.smoothed_losses_and_metrics[k].GetMedianValue()
        mem = device_memory_mb()
        if mem is not None:
            stats['mem'] = mem
        return stats


def device_memory_mb():
    """Peak device memory in MiB when the backend exposes it (TPU does;
    the CPU test backend does not)."""
    try:
        ms = jax.local_devices()[0].memory_stats()
        if ms and 'peak_bytes_in_use' in ms:
            return int(ms['peak_bytes_in_use'] / (1024 * 1024))
    except Exception:
        pass
    return None

"""Threaded training data loader.

Capability parity with ``detectron/roi_data/loader_wsl.py``:
  * N loader threads building minibatches into a bounded host queue
    (ref :99-115,279-330), coordinator-based shutdown and SIGINT handling
  * deque-rotation shuffling with aspect-ratio grouping (ref :172-210)
  * bagging-mixup: class->image index (ref :80-93); with probability 0.2 a
    second same-class image is sampled and blended with lambda ~ Beta(a, a)
    (ref :136-169)

The Caffe2 per-GPU BlobsQueue/DequeueBlobs machinery is replaced by a host
queue feeding `jax.device_put` in the training loop (device transfer overlaps
with the jitted step; multi-chip sharding happens in parallel/train_step).
"""

import logging
import queue
import random
import signal
import threading
import time
from collections import deque

import numpy as np

from nafwebsod_tpu.core.config import cfg
from nafwebsod_tpu.data.minibatch import get_minibatch, mixup_blobs
from nafwebsod_tpu.utils.coordinator import (Coordinator, coordinated_get,
                                             coordinated_put)

logger = logging.getLogger(__name__)


class RoIDataLoader:
    def __init__(self, roidb, num_loaders=4, minibatch_queue_size=64,
                 pad_rois_to=None, size_bucket=None):
        self._roidb = roidb
        self._lock = threading.Lock()
        self._perm = deque(range(len(roidb)))
        self._cur = 0
        self._minibatch_queue = queue.Queue(maxsize=minibatch_queue_size)
        self._num_loaders = num_loaders
        self._pad_rois_to = pad_rois_to
        self._size_bucket = size_bucket
        self.coordinator = Coordinator()
        self._threads = []

        self._mixup_on = cfg.WEBLY.WEBLY_ON and cfg.WEBLY.BAGGING_MIXUP
        if self._mixup_on:
            self._class2idx = {}
            for im_i, entry in enumerate(roidb):
                gt_inds = np.where(entry['gt_classes'] > 0)[0]
                gt_classes = entry['gt_classes'][gt_inds]
                key = int(gt_classes[0])
                self._class2idx.setdefault(key, []).append(im_i)

        self._shuffle_roidb_inds()

    # ------------------------------------------------------------------ #

    def get_next_minibatch(self):
        """Build the next minibatch (thread safe). Applies bagging-mixup with
        probability 0.2 using a same-class partner image."""
        db_inds = self._get_next_minibatch_inds()
        entry = self._roidb[db_inds[0]]
        rng = np.random
        target_size = cfg.TRAIN.SCALES[rng.randint(0, len(cfg.TRAIN.SCALES))]
        blobs = get_minibatch(entry, rng=rng, pad_rois_to=self._pad_rois_to,
                              size_bucket=self._size_bucket,
                              target_size=target_size)
        if self._mixup_on and rng.random_sample() > 0.8:
            gt_inds = np.where(entry['gt_classes'] > 0)[0]
            key = int(entry['gt_classes'][gt_inds][0])
            partner_idx = random.sample(self._class2idx[key], 1)[0]
            partner = self._roidb[partner_idx]
            # the reference builds both images through the same get_minibatch
            # call (independent random scales); replicate with a second call
            blobs_b = get_minibatch(partner, rng=rng,
                                    pad_rois_to=self._pad_rois_to,
                                    size_bucket=self._size_bucket)
            lam = rng.beta(cfg.WEBLY.BAGGING_MIXUP_ALPHA,
                           cfg.WEBLY.BAGGING_MIXUP_ALPHA)
            blobs = mixup_blobs(blobs, blobs_b, lam,
                                max_rois=self._pad_rois_to)
            if self._size_bucket:
                from nafwebsod_tpu.data.minibatch import pad_image_to_bucket
                blobs['data'] = pad_image_to_bucket(
                    blobs['data'][0], self._size_bucket)[None]
        return blobs

    def _shuffle_roidb_inds(self):
        """Deque-rotation shuffle with aspect grouping (ref :172-196)."""
        if cfg.TRAIN.ASPECT_GROUPING:
            widths = np.array([r['width'] for r in self._roidb])
            heights = np.array([r['height'] for r in self._roidb])
            horz = (widths >= heights)
            vert = np.logical_not(horz)
            horz_inds = np.where(horz)[0]
            vert_inds = np.where(vert)[0]
            horz_inds = np.random.permutation(horz_inds)
            vert_inds = np.random.permutation(vert_inds)
            inds = np.hstack((horz_inds, vert_inds))
        else:
            inds = np.random.permutation(np.arange(len(self._roidb)))
        self._perm = deque(inds.tolist())
        self._cur = 0

    def _get_next_minibatch_inds(self):
        """Rotate the deque under a lock (ref :198-210)."""
        with self._lock:
            db_inds = [self._perm[0]]
            self._perm.rotate(-1)
            self._cur += 1
            if self._cur >= len(self._roidb):
                self._shuffle_roidb_inds()
        return db_inds

    # ------------------------------------------------------------------ #

    def _loader_thread(self):
        with self.coordinator.stop_on_exception():
            while not self.coordinator.should_stop():
                blobs = self.get_next_minibatch()
                coordinated_put(self.coordinator, self._minibatch_queue, blobs)
        logger.info('Stopping mini-batch loading thread')

    def start(self, prefill=False):
        for _ in range(self._num_loaders):
            t = threading.Thread(target=self._loader_thread, daemon=True)
            t.start()
            self._threads.append(t)
        if prefill:
            while self._minibatch_queue.qsize() < min(
                    4, self._minibatch_queue.maxsize):
                if self.coordinator.should_stop():
                    break
                # yield the core to the loader threads we are waiting on
                # (a bare spin starves them on few-core hosts)
                time.sleep(0.01)

    def get(self, timeout=None):
        """Pop one host minibatch for the training loop. With ``timeout``
        (seconds), raise ``queue.Empty`` if no batch arrives in time even
        though the coordinator has not stopped — lets callers detect
        silently wedged loader threads instead of blocking forever."""
        import time as _time

        if timeout is None:
            return coordinated_get(self.coordinator, self._minibatch_queue)
        deadline = _time.monotonic() + timeout
        while _time.monotonic() < deadline:
            if self.coordinator.should_stop():
                raise Exception('Coordinator stopped during get()')
            try:
                return self._minibatch_queue.get(block=True, timeout=1.0)
            except queue.Empty:
                continue
        raise queue.Empty(
            'no minibatch within {:.0f}s (loader threads wedged?)'.format(
                timeout))

    def queue_size(self):
        return self._minibatch_queue.qsize()

    def shutdown(self):
        self.coordinator.request_stop()
        for t in self._threads:
            t.join(timeout=5.0)

    def register_sigint_handler(self):
        def signal_handler(signum, frame):
            logger.info('SIGINT: shutting down RoIDataLoader threads')
            self.shutdown()
        signal.signal(signal.SIGINT, signal_handler)

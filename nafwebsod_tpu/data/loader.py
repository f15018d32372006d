"""Threaded training data loader.

Capability parity with ``detectron/roi_data/loader_wsl.py``:
  * N loader threads building minibatches into a bounded host queue
    (ref :99-115,279-330), coordinator-based shutdown and SIGINT handling
  * per-epoch shuffling with aspect-ratio grouping (ref :172-210) via a
    stably-partitioned permutation and an epoch cursor
  * bagging-mixup: class->image index (ref :80-93); with probability 0.2 a
    second same-class image is sampled and blended with lambda ~ Beta(a, a)
    (ref :136-169)

The Caffe2 per-GPU BlobsQueue/DequeueBlobs machinery is replaced by a host
queue feeding `jax.device_put` in the training loop (device transfer overlaps
with the jitted step; multi-chip sharding happens in parallel/train_step).
"""

import logging
import queue
import signal
import threading
import time
from collections import defaultdict

import numpy as np

from nafwebsod_tpu.core.config import cfg
from nafwebsod_tpu.data.minibatch import get_minibatch, mixup_blobs
from nafwebsod_tpu.utils.coordinator import (Coordinator, coordinated_get,
                                             coordinated_put)

logger = logging.getLogger(__name__)


def _image_label(entry):
    """First positive image-level class; mixup partners must share it."""
    return int(entry['gt_classes'][entry['gt_classes'] > 0][0])


class RoIDataLoader:
    def __init__(self, roidb, num_loaders=4, minibatch_queue_size=64,
                 pad_rois_to=None, size_bucket=None):
        self._roidb = roidb
        self._lock = threading.Lock()
        self._order = []
        self._pos = 0
        self._minibatch_queue = queue.Queue(maxsize=minibatch_queue_size)
        self._num_loaders = num_loaders
        self._pad_rois_to = pad_rois_to
        self._size_bucket = size_bucket
        self.coordinator = Coordinator()
        self._threads = []

        self._mixup_on = cfg.WEBLY.WEBLY_ON and cfg.WEBLY.BAGGING_MIXUP
        if self._mixup_on:
            by_class = defaultdict(list)
            for im_i, entry in enumerate(roidb):
                by_class[_image_label(entry)].append(im_i)
            self._class2idx = dict(by_class)

        self._begin_epoch()

    # ------------------------------------------------------------------ #

    def build_minibatch(self):
        """Build the next minibatch (thread safe). Applies bagging-mixup with
        probability 0.2 using a same-class partner image."""
        entry = self._roidb[self._next_index()]
        rng = np.random
        target_size = cfg.TRAIN.SCALES[rng.randint(0, len(cfg.TRAIN.SCALES))]
        blobs = get_minibatch(entry, rng=rng, pad_rois_to=self._pad_rois_to,
                              size_bucket=self._size_bucket,
                              target_size=target_size)
        if self._mixup_on and rng.random_sample() > 0.8:
            same_class = self._class2idx[_image_label(entry)]
            partner = self._roidb[same_class[rng.randint(len(same_class))]]
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

    def _begin_epoch(self):
        """Start a new epoch order (aspect grouping per ref :172-196).

        One random permutation is drawn; under ``TRAIN.ASPECT_GROUPING`` it is
        stably partitioned so landscape images precede portrait ones. Each
        orientation group stays uniformly shuffled, matching the distribution
        of the reference's independent per-group permutations.
        """
        order = np.random.permutation(len(self._roidb))
        if cfg.TRAIN.ASPECT_GROUPING:
            landscape = np.fromiter(
                (self._roidb[i]['width'] >= self._roidb[i]['height']
                 for i in order),
                dtype=bool, count=len(order))
            order = np.concatenate([order[landscape], order[~landscape]])
        self._order = [int(i) for i in order]
        self._pos = 0

    def _next_index(self):
        """Advance the epoch cursor under the lock (ref :198-210)."""
        with self._lock:
            if self._pos >= len(self._order):
                self._begin_epoch()
            idx = self._order[self._pos]
            self._pos += 1
        return idx

    # ------------------------------------------------------------------ #

    def _loader_thread(self):
        coord = self.coordinator
        with coord.stop_on_exception():
            while not coord.should_stop():
                coordinated_put(coord, self._minibatch_queue,
                                self.build_minibatch())
        logger.info('mini-batch loader thread exiting')

    def start(self, prefill=False):
        for _ in range(self._num_loaders):
            t = threading.Thread(target=self._loader_thread, daemon=True)
            t.start()
            self._threads.append(t)
        if not prefill:
            return
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
        def _on_sigint(signum, frame):
            logger.info('SIGINT: shutting down RoIDataLoader threads')
            self.shutdown()
        signal.signal(signal.SIGINT, _on_sigint)

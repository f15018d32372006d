"""END-TO-END inference throughput: im_detect_all -> NMS-and-limit ->
detections.pkl, host work included.

Unlike the device-forward number in BASELINE.md (forward_test only), this
drives the real eval pipeline per image: blob prep + roi dedup/padding on
host, the jitted forward, the device class-batched NMS kernel (or the host
native path with NAFWEBSOD_HOST_NMS=1 for A/B), detection assembly, and
the detections.pkl write at the end.

Usage: python scripts/bench_inference_e2e.py [n_images] [R] [batch]
(batch > 1 measures the scan-of-B chunked path, TPU.INFER_BATCH)
"""

import os
import pickle
import sys
import time

import numpy as np

import jax

try:
    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser('~/.cache/jax_comp_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.utils.env import apply_platform_override  # noqa: E402

apply_platform_override()

from nafwebsod_tpu.core.config import cfg  # noqa: E402
from nafwebsod_tpu.models import detector  # noqa: E402


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    # pipeline depth: chunks kept in flight before harvesting (argv[4]);
    # 1 = the engine's double-buffer, 2+ = deeper dispatch-ahead
    depth = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    on_tpu = any(d.platform == 'tpu' for d in jax.devices())
    side = 704 if on_tpu else 96
    hidden = 4096 if on_tpu else 32

    cfg.MODEL.NUM_CLASSES = 21
    cfg.TEST.SCALE = side
    cfg.TEST.MAX_SIZE = int(side * 1.8)
    cfg.TEST.NMS = 0.5
    cfg.TEST.SCORE_THRESH = 1e-9       # flagship eval protocol
    cfg.TEST.DETECTIONS_PER_IM = 100
    cfg.TPU.ROI_PAD_MULTIPLE = 256
    cfg.TPU.HEAD_HIDDEN_DIM = hidden

    spec = detector.ModelSpec(
        num_classes=21, hidden_dim=hidden, webly_on=True,
        webly_entropy=True, dilation=2,
        compute_dtype='bfloat16' if on_tpu else 'float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))

    from nafwebsod_tpu.engine import test as infer

    rng = np.random.RandomState(0)
    # synthetic images at eval scale: prep_im_for_blob will resize to
    # TEST.SCALE exactly like the real loop
    ims = [rng.randint(0, 255, (side - 16, side, 3), np.uint8)
           for _ in range(2)]
    boxes = rng.uniform(0, side - 40, (r, 4)).astype(np.float32)
    boxes[:, 2:] = np.minimum(boxes[:, :2] + 8 +
                              rng.uniform(0, 160, (r, 2)), side - 1)
    obn = rng.rand(r, 1).astype(np.float32)

    num_classes = cfg.MODEL.NUM_CLASSES
    all_boxes = [[[] for _ in range(n_images)] for _ in range(num_classes)]

    # warm both image-shape buckets + the NMS program
    if batch > 1:
        infer.im_detect_fused_batch(
            spec, params, [ims[i % len(ims)] for i in range(batch)],
            [boxes] * batch, [obn] * batch)
    else:
        for im in ims:
            infer.im_detect_all(spec, params, im, boxes, obn)

    t0 = time.perf_counter()
    if batch > 1:
        # double-buffered like engine/test_engine.test_net: dispatch
        # chunk i+1 before harvesting chunk i so host prep + transfer
        # overlap device compute
        inflight = []

        def harvest():
            handle, idx0 = inflight.pop(0)
            for k, cls_boxes in enumerate(
                    infer.im_detect_fused_batch_harvest(handle)):
                for j in range(1, num_classes):
                    all_boxes[j][idx0 + k] = cls_boxes[j]

        for i0 in range(0, n_images, batch):
            chunk = [ims[i % len(ims)]
                     for i in range(i0, min(i0 + batch, n_images))]
            inflight.append((infer.im_detect_fused_batch_dispatch(
                spec, params, chunk, [boxes] * len(chunk),
                [obn] * len(chunk)), i0))
            while len(inflight) > depth:
                harvest()
        while inflight:
            harvest()
    else:
        for i in range(n_images):
            cls_boxes, _, _ = infer.im_detect_all(
                spec, params, ims[i % len(ims)], boxes, obn)
            for j in range(1, num_classes):
                all_boxes[j][i] = cls_boxes[j]
    out = '/tmp/bench_e2e_detections.pkl'
    with open(out, 'wb') as f:
        pickle.dump({'all_boxes': all_boxes, 'cfg': ''}, f,
                    pickle.HIGHEST_PROTOCOL)
    dt = time.perf_counter() - t0
    n_dets = sum(len(all_boxes[j][0]) for j in range(1, num_classes))
    print('e2e inference: {:.1f} ms/image = {:.2f} images/sec '
          '({} images, {} rois, batch {}, depth {}, {} dets/im0, '
          'device_nms={})'
          .format(dt / n_images * 1e3, n_images / dt, n_images, r, batch,
                  depth, n_dets, not os.environ.get('NAFWEBSOD_HOST_NMS')))


if __name__ == '__main__':
    main()

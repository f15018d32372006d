"""Phase breakdown of the fused end-to-end inference path: host prep
(cv2 resize + dedup hashing) vs input transfer vs device program vs
assembly. Explains the residual ms/image in bench_inference_e2e.py.

Usage: python scripts/probe_infer_breakdown.py [batch]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

try:
    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser('~/.cache/jax_comp_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.core.config import cfg  # noqa: E402
from nafwebsod_tpu.models import detector  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    on_tpu = any(d.platform == 'tpu' for d in jax.devices())
    side = 704 if on_tpu else 96
    hidden = 4096 if on_tpu else 32
    r = 2048

    cfg.MODEL.NUM_CLASSES = 21
    cfg.TEST.SCALE = side
    cfg.TEST.MAX_SIZE = int(side * 1.8)
    cfg.TEST.NMS = 0.5
    cfg.TEST.SCORE_THRESH = 1e-9
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
    ims = [rng.randint(0, 255, (side - 16, side, 3), np.uint8)
           for _ in range(2)]
    boxes = rng.uniform(0, side - 40, (r, 4)).astype(np.float32)
    boxes[:, 2:] = np.minimum(boxes[:, :2] + 8 +
                              rng.uniform(0, 160, (r, 2)), side - 1)
    obn = rng.rand(r, 1).astype(np.float32)

    chunk = [ims[i % 2] for i in range(batch)]
    # warm
    infer.im_detect_fused_batch(spec, params, chunk, [boxes] * batch,
                                [obn] * batch)

    reps = 4

    # 1. host prep
    t0 = time.perf_counter()
    for _ in range(reps):
        preps = [infer._fused_host_prep(im, boxes, obn) for im in chunk]
    t_prep = (time.perf_counter() - t0) / reps

    # 2. stacking + padding on host
    bucket = cfg.TPU.SIZE_BUCKET_MULTIPLE
    hmax = max(p[0].shape[0] for p in preps)
    wmax = max(p[0].shape[1] for p in preps)
    if bucket > 1:
        hmax = int(np.ceil(hmax / bucket) * bucket)
        wmax = int(np.ceil(wmax / bucket) * bucket)
    mult = max(int(cfg.TPU.ROI_PAD_MULTIPLE), 1)
    rmax = max(p[1].shape[0] for p in preps)
    rcap = max(mult, int(np.ceil(rmax / mult) * mult))
    t0 = time.perf_counter()
    for _ in range(reps):
        b = len(preps)
        ims_p = np.zeros((b, hmax, wmax, 3), np.float32)
        rois_p = np.zeros((b, rcap, 5), np.float32)
        obn_p = np.zeros((b, rcap, 1), np.float32)
        valid = np.zeros((b, rcap), bool)
        orig_p = np.zeros((b, rcap, 4), np.float32)
        for i, (blob, rois5, o, boxes_u) in enumerate(preps):
            ims_p[i, :blob.shape[0], :blob.shape[1]] = blob
            n = rois5.shape[0]
            rois_p[i, :n] = rois5
            obn_p[i, :n] = o
            valid[i, :n] = True
            orig_p[i, :n] = boxes_u
    t_stack = (time.perf_counter() - t0) / reps

    # 3. transfer only (device_put + block)
    t0 = time.perf_counter()
    for _ in range(reps):
        d = jax.device_put(ims_p)
        float(d[0, 0, 0, 0])
    t_xfer_im = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        d2 = jax.device_put((rois_p, obn_p, valid, orig_p))
        float(d2[0][0, 0, 0])
    t_xfer_rest = (time.perf_counter() - t0) / reps

    # 4. device program with pre-staged inputs
    dims = jax.device_put(ims_p)
    drois = jax.device_put(rois_p)
    dobn = jax.device_put(obn_p)
    dvalid = jax.device_put(valid)
    dorig = jax.device_put(orig_p)
    limit = int(cfg.TEST.DETECTIONS_PER_IM)
    out = infer._fused_detect_scan(
        spec, params, dims, drois, dobn, dvalid, dorig,
        jnp.float32(cfg.TEST.NMS), jnp.float32(cfg.TEST.SCORE_THRESH),
        max_keep=min(limit, rcap), limit=limit)
    float(out[1][0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = infer._fused_detect_scan(
            spec, params, dims, drois, dobn, dvalid, dorig,
            jnp.float32(cfg.TEST.NMS), jnp.float32(cfg.TEST.SCORE_THRESH),
            max_keep=min(limit, rcap), limit=limit)
        float(out[1][0, 0, 0])
    t_dev = (time.perf_counter() - t0) / reps

    # 5. fetch outputs + assemble
    t0 = time.perf_counter()
    for _ in range(reps):
        idx, vals, keep = (np.asarray(out[0]), np.asarray(out[1]),
                           np.asarray(out[2]))
        res = [infer._assemble_cls_boxes(orig_p[i], idx[i], vals[i],
                                         keep[i]) for i in range(batch)]
    t_out = (time.perf_counter() - t0) / reps

    total = t_prep + t_stack + t_xfer_im + t_xfer_rest + t_dev + t_out
    print('batch={} ims_p {:.1f} MB  rois etc {:.1f} MB'.format(
        batch, ims_p.nbytes / 1e6,
        (rois_p.nbytes + obn_p.nbytes + valid.nbytes + orig_p.nbytes) / 1e6))
    for name, t in [('host_prep', t_prep), ('host_stack', t_stack),
                    ('xfer_images', t_xfer_im), ('xfer_rois', t_xfer_rest),
                    ('device_call', t_dev), ('fetch+assemble', t_out)]:
        print('  {:<14} {:7.1f} ms total  {:6.1f} ms/image'.format(
            name, t * 1e3, t / batch * 1e3))
    print('  {:<14} {:7.1f} ms total  {:6.1f} ms/image'.format(
        'SUM', total * 1e3, total / batch * 1e3))


if __name__ == '__main__':
    main()

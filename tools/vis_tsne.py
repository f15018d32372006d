#!/usr/bin/env python
"""t-SNE visualization of RoI fc7 features colored by top class.

Capability parity with ``tools/vis_tsne.py``: run the model on a handful of
dataset images, collect per-RoI fc7 features + their predicted classes, and
scatter a 2-D t-SNE embedding.

Usage: python tools/vis_tsne.py --cfg cfg.yaml --wts model.pkl \
          [--num-images 20] [--out tsne.png]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nafwebsod_tpu.utils.env import apply_platform_override

apply_platform_override()  # must run before any jax device query

from nafwebsod_tpu.core.config import cfg
from nafwebsod_tpu.utils.cli import configure_from_args


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg', dest='cfg_file', default=None)
    parser.add_argument('--wts', dest='weights', required=True)
    parser.add_argument('--num-images', type=int, default=20)
    parser.add_argument('--out', default='tsne.png')
    parser.add_argument('opts', default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    configure_from_args(args)

    import cv2
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from sklearn.manifold import TSNE

    from nafwebsod_tpu.engine import test as infer
    from nafwebsod_tpu.engine.test_engine import (get_roidb_and_dataset,
                                                  initialize_model_from_cfg)

    dataset_name = cfg.TEST.DATASETS[0]
    proposal_file = (cfg.TEST.PROPOSAL_FILES[0]
                     if cfg.TEST.PROPOSAL_FILES else None)
    roidb, _, _, _, _ = get_roidb_and_dataset(dataset_name, proposal_file)
    spec, params = initialize_model_from_cfg(args.weights)

    from nafwebsod_tpu.data.minibatch import (pad_image_to_bucket,
                                              prep_im_for_blob)
    from nafwebsod_tpu.models import detector as det

    feats, classes = [], []
    for entry in roidb[:args.num_images]:
        im = cv2.imread(entry['image'])
        if im is None:
            print('skipping unreadable', entry['image'])
            continue
        # class colors from the per-roi scores; EMBEDDED vectors are the
        # fc7 tower features like the reference tool (which reads the
        # dumped 4096-d fc7/roi_feats blobs)
        scores, _, _ = infer.im_detect_bbox(
            spec, params, im, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE,
            boxes=entry['boxes'], obn_scores=entry['obn_scores'])
        im_blob, im_scale = prep_im_for_blob(
            im, cfg.PIXEL_MEANS, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE,
            cfg.PIXEL_STDS)
        rois5, obn, _, inv = infer._dedup_scaled_rois(
            entry['boxes'], entry['obn_scores'], im_scale)
        rois_p, obn_p, valid = infer._pad_rois(
            rois5, obn, cfg.TPU.ROI_PAD_MULTIPLE)
        im_in = pad_image_to_bucket(im_blob, cfg.TPU.SIZE_BUCKET_MULTIPLE)
        fc7, _, _ = det._run_body_and_head(
            spec, params, jnp.asarray(im_in[None]), jnp.asarray(rois_p),
            jnp.asarray(obn_p), train=False, rng=None,
            im_hw=jnp.asarray(np.array(im_blob.shape[:2], np.float32)))
        if isinstance(fc7, tuple):  # context head returns three streams
            fc7 = fc7[0]
        fc7 = np.asarray(fc7, np.float32)[:rois5.shape[0]]
        if inv is not None:
            fc7 = fc7[inv]  # scatter back to original rows like the scores
        top = scores[:, 1:].argmax(axis=1)
        keep = scores[:, 1:].max(axis=1) > 1e-4
        feats.append(fc7[keep])
        classes.append(top[keep])
    if not feats or sum(len(f) for f in feats) < 2:
        raise SystemExit('fewer than 2 RoI features passed the score '
                         'filter — nothing to embed (try more images or a '
                         'trained checkpoint)')
    x = np.vstack(feats)
    c = np.concatenate(classes)
    # sklearn requires perplexity < n_samples; clamp for tiny sweeps
    perplexity = max(1, min(30, len(x) // 4, len(x) - 1))
    emb = TSNE(n_components=2, init='pca',
               perplexity=perplexity).fit_transform(x)
    plt.figure(figsize=(8, 8))
    plt.scatter(emb[:, 0], emb[:, 1], c=c, cmap='tab20', s=6)
    plt.colorbar()
    plt.savefig(args.out, dpi=120)
    print('Wrote', args.out)


if __name__ == '__main__':
    main()

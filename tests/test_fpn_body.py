"""FPN as a dispatchable CONV_BODY: multilevel RoI transform correctness,
WSL-over-FPN forward, and the FPN Faster R-CNN composition."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nafwebsod_tpu.models import detector, fpn


def test_multilevel_pool_selects_assigned_level():
    # two levels with constant, distinguishable features: a small roi must
    # pool from the fine level, a large roi from the coarse level
    rng = np.random.RandomState(0)
    levels = {
        2: jnp.full((1, 32, 32, 4), 1.0),
        3: jnp.full((1, 16, 16, 4), 2.0),
    }
    scales = {2: 1.0 / 4.0, 3: 1.0 / 8.0}
    rois = jnp.asarray([
        [0, 4, 4, 20, 20],        # sqrt(17*17) small -> level 2
        [0, 0, 0, 120, 120],      # large -> level 3
    ], jnp.float32)
    obn = jnp.ones((2, 1), jnp.float32)
    out = fpn.multilevel_roi_pool(
        levels, scales, rois, obn, k_min=2, k_max=3, method='RoIAlign',
        resolution=2, sampling_ratio=1, canonical_scale=56,
        canonical_level=2)
    out = np.asarray(out)
    assert np.allclose(out[0], 1.0), out[0]
    assert np.allclose(out[1], 2.0), out[1]


def test_level_mapping_device_matches_host():
    rng = np.random.RandomState(1)
    rois = rng.rand(64, 4).astype(np.float32) * 300
    rois[:, 2:] += rois[:, :2] + 4
    host = fpn.map_rois_to_fpn_levels(rois, 2, 5)
    dev = np.asarray(fpn.map_rois_to_fpn_levels_dev(jnp.asarray(rois), 2, 5))
    np.testing.assert_array_equal(dev, host)


@pytest.fixture(scope='module')
def wsl_fpn_spec():
    return detector.ModelSpec(
        num_classes=5, hidden_dim=16, conv_body='fpn_resnet18',
        box_head='vgg16_2fc_noise', webly_on=True, webly_entropy=True,
        dilation=1, freeze_conv_body=False, roi_xform_method='RoIAlign',
        roi_resolution=7, fpn_dim=16, fpn_roi_min_level=2,
        fpn_roi_max_level=5, compute_dtype='float32')


def _wsl_batch(num_classes=5, h=64, w=64, r=12):
    rng = np.random.RandomState(2)
    image = rng.randn(1, h, w, 3).astype(np.float32)
    x1 = rng.uniform(0, w - 16, r)
    y1 = rng.uniform(0, h - 16, r)
    rois = np.stack([np.zeros(r), x1, y1,
                     np.minimum(x1 + 12, w - 1),
                     np.minimum(y1 + 12, h - 1)], 1).astype(np.float32)
    labels = np.zeros((1, num_classes - 1), np.float32)
    labels[0, 1] = 1
    return {
        'image': image, 'rois': rois,
        'obn_scores': rng.rand(r, 1).astype(np.float32) + 1.0,
        'valid_mask': np.ones((r,), bool),
        'labels_oh': labels,
    }


def test_wsl_fpn_forward_train_and_test(wsl_fpn_spec):
    spec = wsl_fpn_spec
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    assert 'fpn_inner5_w' in params and 'fpn_post2_w' in params
    batch = {k: jnp.asarray(v) for k, v in _wsl_batch().items()}
    loss, aux = detector.forward_train(spec, params, batch,
                                       jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert 'loss_cls' in aux and 'loss_cls_noise' in aux

    # FPN pyramid params receive gradients (the VERDICT's dead-weight check)
    def loss_fn(p):
        return detector.forward_train(spec, p, batch,
                                      jax.random.PRNGKey(1))[0]
    grads = jax.grad(loss_fn)(params)
    assert float(jnp.abs(grads['fpn_inner3_w']).sum()) > 0

    out = detector.forward_test(
        spec, params, batch['image'], batch['rois'], batch['obn_scores'],
        batch['valid_mask'])
    assert np.asarray(out['scores']).shape == (12, 5)


def test_fpn_faster_rcnn_composition():
    spec = detector.ModelSpec(
        num_classes=5, hidden_dim=16, supervised=True, faster_rcnn=True,
        conv_body='fpn_resnet18', box_head='vgg16_2fc', webly_on=False,
        webly_entropy=False, dilation=1, freeze_conv_body=False,
        roi_xform_method='RoIAlign', roi_resolution=7, fpn_dim=16,
        fpn_roi_min_level=2, fpn_roi_max_level=5, fpn_rpn_min_level=2,
        fpn_rpn_max_level=6, fpn_rpn_anchor_start_size=16,
        rpn_pre_nms_top_n=30, rpn_post_nms_top_n=12,
        rpn_test_pre_nms_top_n=30, rpn_test_post_nms_top_n=8,
        frcnn_batch_size=16, compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    assert 'conv_rpn_w' in params
    # shared head: A = 3 aspect ratios
    assert params['rpn_cls_logits_w'].shape[-1] == 3

    gt = np.zeros((4, 4), np.float32)
    gt[0] = [4, 4, 30, 30]
    gt[1] = [20, 24, 60, 56]
    gv = np.zeros((4,), bool)
    gv[:2] = True
    gcls = np.zeros((4,), np.int32)
    gcls[:2] = [1, 3]
    batch = {
        'image': jnp.asarray(
            np.random.RandomState(3).randn(1, 64, 64, 3), jnp.float32),
        'rois': jnp.zeros((1, 5)), 'obn_scores': jnp.ones((1, 1)),
        'valid_mask': jnp.zeros((1,), bool),
        'labels_oh': jnp.zeros((1, 4)),
        'gt_boxes': jnp.asarray(gt), 'gt_classes': jnp.asarray(gcls),
        'gt_valid': jnp.asarray(gv),
        'im_info': jnp.asarray([64.0, 64.0, 1.0]),
    }
    loss, aux = detector.forward_train(spec, params, batch,
                                       jax.random.PRNGKey(4))
    assert np.isfinite(float(loss))
    for k in ('loss_rpn_cls', 'loss_rpn_bbox', 'loss_cls', 'loss_bbox'):
        assert np.isfinite(float(aux[k])), k

    out = detector.forward_test(
        spec, params, batch['image'], None, None, None,
        im_info=batch['im_info'])
    assert np.asarray(out['scores']).shape == (8, 5)
    assert np.asarray(out['proposal_valid']).any()

"""R-FCN and Keypoint R-CNN as config-buildable model types."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nafwebsod_tpu.models import detector, keypoint_head


def _gt_batch(num_classes=5, h=64, w=64, with_kps=False, k=4):
    rng = np.random.RandomState(0)
    gt = np.zeros((4, 4), np.float32)
    gt[0] = [8, 8, 40, 40]
    gt[1] = [24, 16, 60, 52]
    gv = np.zeros((4,), bool)
    gv[:2] = True
    gc = np.zeros((4,), np.int32)
    gc[:2] = [1, 3]
    batch = {
        'image': jnp.asarray(rng.randn(1, h, w, 3), jnp.float32),
        'rois': jnp.zeros((1, 5)), 'obn_scores': jnp.ones((1, 1)),
        'valid_mask': jnp.zeros((1,), bool),
        'labels_oh': jnp.zeros((1, num_classes - 1)),
        'gt_boxes': jnp.asarray(gt), 'gt_classes': jnp.asarray(gc),
        'gt_valid': jnp.asarray(gv),
        'im_info': jnp.asarray([float(h), float(w), 1.0]),
    }
    if with_kps:
        kps = np.zeros((4, k, 3), np.float32)
        for g in range(2):
            cx = (gt[g, 0] + gt[g, 2]) / 2
            cy = (gt[g, 1] + gt[g, 3]) / 2
            for j in range(k):
                kps[g, j] = [cx + j, cy + j, 2]
        batch['gt_keypoints'] = jnp.asarray(kps)
    return batch


def test_rfcn_faster_composition():
    spec = detector.ModelSpec(
        num_classes=5, supervised=True, rfcn=True, faster_rcnn=True,
        rfcn_ps_grid=3, conv_body='resnet18_c5', box_head='vgg16_2fc',
        webly_on=False, webly_entropy=False, dilation=2,
        freeze_conv_body=False, rpn_stride=16, rpn_sizes=(16, 32),
        rpn_pre_nms_top_n=30, rpn_post_nms_top_n=12,
        rpn_test_pre_nms_top_n=30, rpn_test_post_nms_top_n=8,
        frcnn_batch_size=16, compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    assert 'conv_cls_w' in params and 'fc6_w' not in params
    batch = _gt_batch()
    loss, aux = detector.forward_train(spec, params, batch,
                                       jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: detector.forward_train(
        spec, p, batch, jax.random.PRNGKey(1))[0])(params)
    assert float(jnp.abs(grads['conv_cls_w']).sum()) > 0
    assert float(jnp.abs(grads['conv_bbox_pred_w']).sum()) > 0

    out = detector.forward_test(
        spec, params, batch['image'], None, None, None,
        im_info=batch['im_info'])
    assert np.asarray(out['scores']).shape == (8, 5)


def test_rfcn_precomputed_proposals():
    spec = detector.ModelSpec(
        num_classes=5, supervised=True, rfcn=True, faster_rcnn=False,
        rfcn_ps_grid=3, conv_body='resnet18_c5', box_head='vgg16_2fc',
        webly_on=False, webly_entropy=False, dilation=2,
        freeze_conv_body=False, compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    r = 8
    rois = np.zeros((r, 5), np.float32)
    rng = np.random.RandomState(2)
    rois[:, 1:3] = rng.rand(r, 2) * 30
    rois[:, 3:5] = rois[:, 1:3] + 16
    batch = {
        'image': jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32),
        'rois': jnp.asarray(rois),
        'obn_scores': jnp.ones((r, 1)),
        'valid_mask': jnp.ones((r,), bool),
        'labels_oh': jnp.zeros((1, 4)),
        'labels_int32': jnp.asarray(rng.randint(0, 5, r), jnp.int32),
        'bbox_targets': jnp.zeros((r, 20)),
        'bbox_inside_weights': jnp.zeros((r, 20)),
        'bbox_outside_weights': jnp.zeros((r, 20)),
    }
    loss, aux = detector.forward_train(spec, params, batch,
                                       jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    out = detector.forward_test(
        spec, params, batch['image'], batch['rois'], batch['obn_scores'],
        batch['valid_mask'])
    assert np.asarray(out['scores']).shape == (r, 5)


def test_keypoint_targets_dev_matches_host():
    rng = np.random.RandomState(4)
    rois = np.zeros((6, 5), np.float32)
    rois[:, 1:3] = rng.rand(6, 2) * 20
    rois[:, 3:5] = rois[:, 1:3] + rng.rand(6, 2) * 40 + 8
    kps = np.zeros((6, 5, 3), np.float32)
    kps[..., 0] = rois[:, 1:2] + rng.rand(6, 5) * 30
    kps[..., 1] = rois[:, 2:3] + rng.rand(6, 5) * 30
    kps[..., 2] = rng.randint(0, 3, (6, 5))
    h_loc, h_w = keypoint_head.keypoint_targets(kps, rois, 28)
    d_loc, d_w = keypoint_head.keypoint_targets_dev(
        jnp.asarray(kps), jnp.asarray(rois), 28)
    np.testing.assert_array_equal(np.asarray(d_loc), h_loc)
    np.testing.assert_allclose(np.asarray(d_w), h_w)


def test_keypoint_rcnn_composition():
    spec = detector.ModelSpec(
        num_classes=5, hidden_dim=16, supervised=True, faster_rcnn=True,
        keypoints_on=True, num_keypoints=4, keypoint_num_convs=2,
        keypoint_conv_dim=16, keypoint_deconv_dim=16,
        keypoint_resolution=7, conv_body='resnet18_c5',
        box_head='vgg16_2fc', webly_on=False, webly_entropy=False,
        dilation=2, freeze_conv_body=False, rpn_stride=16,
        rpn_sizes=(16, 32), rpn_pre_nms_top_n=30, rpn_post_nms_top_n=12,
        rpn_test_pre_nms_top_n=30, rpn_test_post_nms_top_n=8,
        frcnn_batch_size=16, compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    assert 'kps_score_w' in params
    batch = _gt_batch(with_kps=True, k=4)
    loss, aux = detector.forward_train(spec, params, batch,
                                       jax.random.PRNGKey(5))
    assert np.isfinite(float(loss))
    assert 'loss_kps' in aux and np.isfinite(float(aux['loss_kps']))
    grads = jax.grad(lambda p: detector.forward_train(
        spec, p, batch, jax.random.PRNGKey(5))[0])(params)
    assert float(jnp.abs(grads['kps_score_w']).sum()) > 0

    rois = np.zeros((4, 5), np.float32)
    rois[:, 1:3] = 4
    rois[:, 3:5] = 40
    maps = detector.forward_keypoints(
        spec, params, batch['image'], jnp.asarray(rois))
    assert np.asarray(maps).shape == (4, 14, 14, 4)


def test_res5_head_faster_composition():
    """C4 Faster R-CNN: conv4 body + res5-stage box head."""
    spec = detector.ModelSpec(
        num_classes=5, hidden_dim=512, supervised=True, faster_rcnn=True,
        conv_body='resnet18_c4', box_head='res5_head', webly_on=False,
        webly_entropy=False, dilation=1, freeze_conv_body=False,
        roi_xform_method='RoIAlign', roi_resolution=7, rpn_stride=16,
        rpn_sizes=(16, 32), rpn_pre_nms_top_n=30, rpn_post_nms_top_n=8,
        rpn_test_pre_nms_top_n=30, rpn_test_post_nms_top_n=8,
        frcnn_batch_size=8, compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    assert 'res5_0_branch2a_w' in params and 'fc6_w' not in params
    assert params['cls_score_w'].shape == (512, 5)
    batch = _gt_batch()
    loss, aux = detector.forward_train(spec, params, batch,
                                       jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: detector.forward_train(
        spec, p, batch, jax.random.PRNGKey(1))[0])(params)
    assert float(jnp.abs(grads['res5_0_branch2a_w']).sum()) > 0
    out = detector.forward_test(
        spec, params, batch['image'], None, None, None,
        im_info=batch['im_info'])
    assert np.asarray(out['scores']).shape == (8, 5)

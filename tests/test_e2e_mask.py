"""End-to-end Mask R-CNN: device gt-mask resampling, the faster+mask
composition, the Xconv1fc GN head, and the full reference-config sweep."""

import glob
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nafwebsod_tpu.models import detector
from nafwebsod_tpu.ops import seg as seg_ops


def test_crop_and_resize_identity():
    # roi == gt box -> resampled mask ~= the original grid
    rng = np.random.RandomState(0)
    m = (rng.rand(1, 16, 16) > 0.5).astype(np.float32)
    box = np.array([[10.0, 20.0, 42.0, 52.0]])
    roi = np.array([[0.0, 10.0, 20.0, 42.0, 52.0]])
    out = np.asarray(seg_ops.crop_and_resize_masks(
        jnp.asarray(m), jnp.asarray(box), jnp.asarray(roi), 16))
    # bin centers line up exactly with the source grid at equal size
    np.testing.assert_allclose(out[0], m[0], atol=1e-5)


def test_crop_and_resize_outside_is_zero():
    m = np.ones((1, 8, 8), np.float32)
    box = np.array([[0.0, 0.0, 10.0, 10.0]])
    roi = np.array([[0.0, 20.0, 20.0, 30.0, 30.0]])  # disjoint from the box
    out = np.asarray(seg_ops.crop_and_resize_masks(
        jnp.asarray(m), jnp.asarray(box), jnp.asarray(roi), 8))
    assert out.max() == 0.0


def test_e2e_mask_rcnn_fpn_composition():
    spec = detector.ModelSpec(
        num_classes=5, hidden_dim=16, supervised=True, faster_rcnn=True,
        mask_on=True, mask_resolution=7, mask_dim_reduced=8,
        conv_body='fpn_resnet18', box_head='vgg16_2fc', webly_on=False,
        webly_entropy=False, dilation=1, freeze_conv_body=False,
        roi_xform_method='RoIAlign', roi_resolution=7, fpn_dim=16,
        fpn_roi_min_level=2, fpn_roi_max_level=5, fpn_rpn_min_level=2,
        fpn_rpn_max_level=6, fpn_rpn_anchor_start_size=16,
        rpn_pre_nms_top_n=30, rpn_post_nms_top_n=12,
        rpn_test_pre_nms_top_n=30, rpn_test_post_nms_top_n=8,
        frcnn_batch_size=16, compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    assert 'mask_fcn_logits_w' in params

    rng = np.random.RandomState(1)
    gt = np.zeros((4, 4), np.float32)
    gt[0] = [8, 8, 40, 40]
    gt[1] = [20, 24, 56, 58]
    gv = np.zeros((4,), bool)
    gv[:2] = True
    gc = np.zeros((4,), np.int32)
    gc[:2] = [1, 3]
    gm = np.zeros((4, 14, 14), np.float32)
    gm[:2, 3:11, 3:11] = 1.0
    batch = {
        'image': jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32),
        'rois': jnp.zeros((1, 5)), 'obn_scores': jnp.ones((1, 1)),
        'valid_mask': jnp.zeros((1,), bool), 'labels_oh': jnp.zeros((1, 4)),
        'gt_boxes': jnp.asarray(gt), 'gt_classes': jnp.asarray(gc),
        'gt_valid': jnp.asarray(gv), 'gt_masks': jnp.asarray(gm),
        'im_info': jnp.asarray([64.0, 64.0, 1.0]),
    }
    loss, aux = detector.forward_train(spec, params, batch,
                                       jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert 'loss_mask' in aux and np.isfinite(float(aux['loss_mask']))
    grads = jax.grad(lambda p: detector.forward_train(
        spec, p, batch, jax.random.PRNGKey(2))[0])(params)
    assert float(jnp.abs(grads['mask_fcn_logits_w']).sum()) > 0

    # inference masks through the FPN pooled path
    rois = np.zeros((3, 5), np.float32)
    rois[:, 1:3] = 4
    rois[:, 3:5] = 40
    masks = detector.forward_masks(spec, params, batch['image'],
                                   jnp.asarray(rois))
    assert np.asarray(masks).shape == (3, 14, 14, 5)


def test_xconv1fc_gn_head_composition():
    spec = detector.ModelSpec(
        num_classes=5, hidden_dim=16, supervised=True, faster_rcnn=True,
        conv_body='fpn_resnet18', box_head='xconv1fc_gn', conv_head_dim=8,
        num_stacked_convs=2, webly_on=False, webly_entropy=False,
        dilation=1, freeze_conv_body=False, roi_xform_method='RoIAlign',
        roi_resolution=7, fpn_dim=16, fpn_roi_min_level=2,
        fpn_roi_max_level=5, fpn_rpn_min_level=2, fpn_rpn_max_level=6,
        fpn_rpn_anchor_start_size=16, rpn_pre_nms_top_n=30,
        rpn_post_nms_top_n=12, rpn_test_pre_nms_top_n=30,
        rpn_test_post_nms_top_n=8, frcnn_batch_size=16,
        compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    assert 'head_conv1_gn_s' in params
    assert params['fc6_w'].shape == (8 * 49, 16)

    rng = np.random.RandomState(3)
    gt = np.zeros((4, 4), np.float32)
    gt[0] = [8, 8, 40, 40]
    gv = np.zeros((4,), bool)
    gv[0] = True
    gc = np.zeros((4,), np.int32)
    gc[0] = 2
    batch = {
        'image': jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32),
        'rois': jnp.zeros((1, 5)), 'obn_scores': jnp.ones((1, 1)),
        'valid_mask': jnp.zeros((1,), bool), 'labels_oh': jnp.zeros((1, 4)),
        'gt_boxes': jnp.asarray(gt), 'gt_classes': jnp.asarray(gc),
        'gt_valid': jnp.asarray(gv),
        'im_info': jnp.asarray([64.0, 64.0, 1.0]),
    }
    loss, _ = detector.forward_train(spec, params, batch,
                                     jax.random.PRNGKey(4))
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: detector.forward_train(
        spec, p, batch, jax.random.PRNGKey(4))[0])(params)
    assert float(jnp.abs(grads['head_conv1_w']).sum()) > 0
    assert float(jnp.abs(grads['head_conv1_gn_s']).sum()) > 0


def test_every_reference_config_builds_a_spec():
    """All 90 reference YAMLs must merge AND produce a buildable spec."""
    from nafwebsod_tpu.core import config as C

    yamls = sorted(glob.glob('/root/reference/configs/**/*.yaml',
                             recursive=True))
    if not yamls:
        pytest.skip('reference configs unavailable')
    bad = []
    for p in yamls:
        C.reset_cfg()
        try:
            C.merge_cfg_from_file(p)
            detector.spec_from_cfg(C.cfg)
        except Exception as e:
            bad.append((os.path.basename(p), str(e)[:70]))
    C.reset_cfg()
    assert not bad, bad


def test_every_shipped_config_builds_a_spec():
    """The YAMLs this repo ships (configs/) must merge AND build."""
    from nafwebsod_tpu.core import config as C

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    yamls = sorted(glob.glob(os.path.join(repo_root, 'configs', '**',
                                          '*.yaml'), recursive=True))
    assert yamls, 'no shipped configs found'
    bad = []
    for p in yamls:
        C.reset_cfg()
        try:
            C.merge_cfg_from_file(p)
            detector.spec_from_cfg(C.cfg)
        except Exception as e:
            bad.append((os.path.basename(p), str(e)[:70]))
    C.reset_cfg()
    assert not bad, bad


class TestMaskHeadVariants:
    """MRCNN.ROI_MASK_HEAD strings must build the architecture their names
    promise (mask_rcnn_heads.py:112-300) — or raise."""

    def _fields(self, name):
        return detector._mask_head_fields('mask_rcnn_heads.' + name, True)

    def test_variant_registry(self):
        f = self._fields('mask_rcnn_fcn_head_v1up4convs')
        assert f == dict(mask_head='fcn', mask_num_convs=4, mask_gn=False)
        f = self._fields('mask_rcnn_fcn_head_v1up4convs_gn')
        assert f == dict(mask_head='fcn', mask_num_convs=4, mask_gn=True)
        f = self._fields('mask_rcnn_fcn_head_v1up')
        assert f == dict(mask_head='fcn', mask_num_convs=2, mask_gn=False)
        assert self._fields('mask_rcnn_fcn_head_v0up')['mask_head'] == 'v0up'
        assert (self._fields('mask_rcnn_fcn_head_v0upshare')['mask_head']
                == 'v0upshare')
        wsl = detector._mask_head_fields(
            'wsl_seg_heads.mask_rcnn_fcn_head', True)
        assert wsl == dict(mask_head='fcn', mask_num_convs=2, mask_gn=False)
        assert detector._mask_head_fields(
            'wsl_seg_heads.deeplab_vgg16_head', True)['mask_head'] == 'deeplab'

    def test_unknown_head_raises(self):
        with pytest.raises(NotImplementedError):
            detector._mask_head_fields('mask_rcnn_heads.fancy_new_head', True)

    def _spec(self, **kw):
        base = dict(
            num_classes=5, hidden_dim=16, supervised=True, mask_on=True,
            mask_resolution=14, mask_dim_reduced=8,
            conv_body='resnet18_c4', box_head='res5_head', webly_on=False,
            webly_entropy=False, dilation=1, freeze_conv_body=False,
            roi_xform_method='RoIAlign', roi_resolution=14,
            compute_dtype='float32')
        base.update(kw)
        return detector.ModelSpec(**base)

    def test_v1up4convs_gn_params_and_forward(self):
        spec = self._spec(mask_head='fcn', mask_num_convs=4, mask_gn=True)
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        for i in range(1, 5):
            assert '_mask_fcn%d_w' % i in params
            assert '_mask_fcn%d_gn_s' % i in params
            assert '_mask_fcn%d_b' % i not in params  # ConvGN is bias-free
        assert '_mask_fcn5_w' not in params
        pooled = jnp.asarray(np.random.RandomState(0).randn(
            3, 14, 14, 256).astype(np.float32))
        out = detector._apply_mask_head(spec, params, pooled)
        assert out.shape == (3, 28, 28, 4)

    def test_v1up_conv_count(self):
        spec = self._spec(mask_head='fcn', mask_num_convs=2, mask_gn=False)
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        assert '_[mask]_fcn2_w' in params and '_[mask]_fcn3_w' not in params

    def test_v0up_params_and_forward(self):
        spec = self._spec(mask_head='v0up')
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        assert '_[mask]_res5_0_branch2a_w' in params
        # deconv from the res5 width (512 for the shallow trunk)
        assert params['conv5_mask_w'].shape == (2, 2, 512, 8)
        pooled = jnp.asarray(np.random.RandomState(1).randn(
            3, 14, 14, 256).astype(np.float32))
        out = detector._apply_mask_head(spec, params, pooled)
        # res5 stride 2: 14 -> 7, deconv 2x: -> 14
        assert out.shape == (3, 14, 14, 4)

    def test_v0upshare_shares_box_res5(self):
        spec = self._spec(mask_head='v0upshare')
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        assert not any(k.startswith('_[mask]_res5') for k in params)
        assert 'res5_0_branch2a_w' in params  # the box head's
        pooled = jnp.asarray(np.random.RandomState(2).randn(
            3, 14, 14, 256).astype(np.float32))
        out = detector._apply_mask_head(spec, params, pooled)
        assert out.shape == (3, 14, 14, 4)
        # gradient through the shared stage reaches the box-head weights
        g = jax.grad(lambda p: jnp.sum(
            detector._apply_mask_head(spec, p, pooled) ** 2))(params)
        assert float(jnp.abs(g['res5_0_branch2a_w']).sum()) > 0

    def test_v0upshare_requires_res5_box_head(self):
        spec = self._spec(mask_head='v0upshare', box_head='vgg16_2fc')
        with pytest.raises(AssertionError):
            detector.init_params(spec, jax.random.PRNGKey(0))

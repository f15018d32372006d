"""TEST.MASK_AUG / TEST.KPS_AUG test-time augmentation sweeps
(ref detectron/core/test.py:416-486 mask aug, :581-746 keypoint aug)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nafwebsod_tpu.core.config import cfg, reset_cfg
from nafwebsod_tpu.engine import test as eng_test
from nafwebsod_tpu.models import detector


@pytest.fixture
def mask_setup():
    reset_cfg()
    cfg.MODEL.NUM_CLASSES = 4
    cfg.MRCNN.CLS_SPECIFIC_MASK = True
    cfg.TEST.SCALE = 48
    cfg.TEST.MAX_SIZE = 64
    spec = detector.ModelSpec(
        num_classes=4, hidden_dim=8, mask_on=True, mask_head='fcn',
        mask_resolution=7, mask_dim_reduced=8, compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    im = (np.random.RandomState(1).rand(48, 48, 3) * 255).astype(np.uint8)
    boxes = np.array([[4., 4., 24., 24.],
                      [10., 8., 30., 28.]], np.float32)
    return spec, params, im, boxes


@pytest.fixture
def kps_setup():
    reset_cfg()
    cfg.MODEL.NUM_CLASSES = 2
    cfg.TEST.SCALE = 48
    cfg.TEST.MAX_SIZE = 64
    spec = detector.ModelSpec(
        num_classes=2, hidden_dim=8, keypoints_on=True, num_keypoints=4,
        keypoint_num_convs=2, keypoint_conv_dim=8, keypoint_deconv_dim=8,
        keypoint_resolution=14, compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    im = (np.random.RandomState(2).rand(48, 48, 3) * 255).astype(np.uint8)
    boxes = np.array([[4., 4., 24., 24.],
                      [8., 10., 40., 40.]], np.float32)
    return spec, params, im, boxes


def test_mask_aug_identity_only_equals_plain(mask_setup):
    spec, params, im, boxes = mask_setup
    plain = eng_test._mask_forward(spec, params, im, boxes,
                                   cfg.TEST.SCALE, cfg.TEST.MAX_SIZE)
    cfg.TEST.MASK_AUG.ENABLED = True
    cfg.TEST.MASK_AUG.HEUR = 'SOFT_AVG'
    aug = eng_test.im_detect_mask_aug(spec, params, im, boxes)
    np.testing.assert_allclose(aug, plain, rtol=1e-6)


def test_mask_aug_hflip_and_heuristics(mask_setup):
    spec, params, im, boxes = mask_setup
    cfg.TEST.MASK_AUG.ENABLED = True
    cfg.TEST.MASK_AUG.H_FLIP = True
    cfg.TEST.MASK_AUG.SCALES = (32,)
    cfg.TEST.MASK_AUG.MAX_SIZE = 64
    cfg.TEST.MASK_AUG.SCALE_H_FLIP = True
    cfg.TEST.MASK_AUG.ASPECT_RATIOS = (0.75,)
    cfg.TEST.MASK_AUG.ASPECT_RATIO_H_FLIP = True

    cfg.TEST.MASK_AUG.HEUR = 'SOFT_AVG'
    avg = eng_test.im_detect_mask_aug(spec, params, im, boxes)
    cfg.TEST.MASK_AUG.HEUR = 'SOFT_MAX'
    mx = eng_test.im_detect_mask_aug(spec, params, im, boxes)
    cfg.TEST.MASK_AUG.HEUR = 'LOGIT_AVG'
    lavg = eng_test.im_detect_mask_aug(spec, params, im, boxes)

    assert avg.shape == (2, 14, 14, 4)
    # max over transforms dominates the mean of the same set
    assert (mx >= avg - 1e-6).all()
    assert (lavg >= 0).all() and (lavg <= 1).all()
    assert np.isfinite(avg).all() and np.isfinite(lavg).all()


def test_mask_hflip_double_application_is_identity(mask_setup):
    """Flipping the image+boxes twice must reproduce the plain masks (the
    mask-invert axis and box flip must be mutually consistent)."""
    spec, params, im, boxes = mask_setup
    plain = eng_test._mask_forward(spec, params, im, boxes,
                                   cfg.TEST.SCALE, cfg.TEST.MAX_SIZE)
    im_hf = im[:, ::-1, :]
    from nafwebsod_tpu.ops import boxes as box_utils
    boxes_hf = box_utils.flip_boxes(boxes, im.shape[1])
    # hflip-detect on the flipped image with flipped boxes == plain
    twice = eng_test.im_detect_mask_hflip(
        spec, params, im_hf, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE, boxes_hf)
    np.testing.assert_allclose(twice[:, :, ::-1, :], plain, atol=1e-5)


def test_mask_aug_end_to_end_rle(mask_setup):
    spec, params, im, boxes = mask_setup
    cfg.TEST.MASK_AUG.ENABLED = True
    cfg.TEST.MASK_AUG.HEUR = 'SOFT_AVG'
    cfg.TEST.MASK_AUG.H_FLIP = True
    cls_boxes = [[] for _ in range(4)]
    cls_boxes[1] = np.hstack([boxes[:1], [[0.9]]]).astype(np.float32)
    cls_boxes[2] = np.hstack([boxes[1:], [[0.8]]]).astype(np.float32)
    cls_boxes[3] = np.zeros((0, 5), np.float32)
    cls_segms = eng_test.im_detect_mask(spec, params, im, cls_boxes)
    assert len(cls_segms[1]) == 1 and len(cls_segms[2]) == 1


def test_flip_heatmaps_involution():
    rng = np.random.RandomState(0)
    hm = rng.randn(3, 7, 9, 4).astype(np.float32)
    flip_map = np.array([1, 0, 2, 3])  # kp0 <-> kp1 are left/right twins
    out = eng_test.flip_heatmaps(
        eng_test.flip_heatmaps(hm, flip_map), flip_map)
    np.testing.assert_array_equal(out, hm)
    # channel swap actually happened after one application
    one = eng_test.flip_heatmaps(hm, flip_map)
    np.testing.assert_array_equal(one[..., 0], hm[:, :, ::-1, 1])


def test_kps_aug_identity_only_equals_plain(kps_setup):
    spec, params, im, boxes = kps_setup
    plain = eng_test._keypoint_forward(spec, params, im, boxes,
                                       cfg.TEST.SCALE, cfg.TEST.MAX_SIZE)
    cfg.TEST.KPS_AUG.ENABLED = True
    cfg.TEST.KPS_AUG.HEUR = 'HM_AVG'
    aug = eng_test.im_detect_keypoints_aug(spec, params, im, boxes)
    np.testing.assert_allclose(aug, plain, rtol=1e-6)


def test_kps_aug_full_sweep_with_size_dep(kps_setup):
    spec, params, im, boxes = kps_setup
    cfg.TEST.KPS_AUG.ENABLED = True
    cfg.TEST.KPS_AUG.H_FLIP = True
    cfg.TEST.KPS_AUG.SCALES = (32, 56)   # one down-, one up-scale vs 48
    cfg.TEST.KPS_AUG.MAX_SIZE = 64
    cfg.TEST.KPS_AUG.SCALE_H_FLIP = True
    cfg.TEST.KPS_AUG.ASPECT_RATIOS = (0.8,)
    cfg.TEST.KPS_AUG.ASPECT_RATIO_H_FLIP = True
    cfg.TEST.KPS_AUG.SCALE_SIZE_DEP = True
    cfg.TEST.KPS_AUG.AREA_TH = 500.  # box0 area 400 (small), box1 1024
    flip_map = np.array([1, 0, 2, 3])
    maps = eng_test.im_detect_keypoints_aug(spec, params, im, boxes,
                                            kp_flip_map=flip_map)
    assert maps.shape[0] == 2 and maps.shape[-1] == 4
    assert np.isfinite(maps).all()
    cfg.TEST.KPS_AUG.HEUR = 'HM_MAX'
    mx = eng_test.im_detect_keypoints_aug(spec, params, im, boxes,
                                          kp_flip_map=flip_map)
    assert mx.shape == maps.shape


def test_combine_heatmaps_size_dep_math():
    """Small objects drop downscaled maps; large drop upscaled (ref
    test.py:721-746)."""
    cfg.TEST.KPS_AUG.AREA_TH = 100.
    boxes = np.array([[0, 0, 5, 5],        # area 25 -> small
                      [0, 0, 20, 20]], np.float32)  # area 400 -> large
    base = np.zeros((2, 1, 1, 1), np.float32)
    ds = np.full((2, 1, 1, 1), 10., np.float32)
    us = np.full((2, 1, 1, 1), 20., np.float32)
    out = eng_test.combine_heatmaps_size_dep(
        [base, ds, us], [False, True, False], [False, False, True], boxes,
        lambda h: np.mean(h, axis=0))
    # small object: mean(base, us) = 10; large: mean(base, ds) = 5
    assert out[0, 0, 0, 0] == pytest.approx(10.0)
    assert out[1, 0, 0, 0] == pytest.approx(5.0)


def test_kps_end_to_end_with_aug(kps_setup):
    spec, params, im, boxes = kps_setup
    cfg.TEST.KPS_AUG.ENABLED = True
    cfg.TEST.KPS_AUG.HEUR = 'HM_AVG'
    cfg.TEST.KPS_AUG.H_FLIP = True
    cls_boxes = [[], np.hstack([boxes, [[0.9], [0.8]]]).astype(np.float32)]
    cls_keyps = eng_test.im_detect_keypoints(
        spec, params, im, cls_boxes, kp_flip_map=np.array([1, 0, 2, 3]))
    assert cls_keyps[1].shape == (2, 4, 4)

"""COCO RLE codec + the mask inference path (im_detect_mask/segm_results)."""

import numpy as np
import jax
import jax.numpy as jnp

from nafwebsod_tpu.utils import segms


def test_rle_roundtrip_random():
    rng = np.random.RandomState(0)
    for _ in range(5):
        m = (rng.rand(23, 31) > 0.6).astype(np.uint8)
        rle = segms.mask_to_rle(m)
        back = segms.rle_to_mask(rle)
        np.testing.assert_array_equal(back, m)
        assert rle['size'] == [23, 31]
        assert isinstance(rle['counts'], bytes)


def test_rle_matches_known_encoding():
    # hand-checked tiny case: (2, 3) column-major [0,1, 0,0, 1,1]
    m = np.array([[0, 0, 1], [1, 0, 1]], np.uint8)
    rle = segms.mask_to_rle(m)
    counts = segms._rle_string_to_counts(rle['counts'])
    assert counts == [1, 1, 2, 2]
    np.testing.assert_array_equal(segms.rle_to_mask(rle), m)


def test_rle_all_zero_and_all_one():
    z = np.zeros((4, 5), np.uint8)
    o = np.ones((4, 5), np.uint8)
    np.testing.assert_array_equal(segms.rle_to_mask(segms.mask_to_rle(z)), z)
    np.testing.assert_array_equal(segms.rle_to_mask(segms.mask_to_rle(o)), o)


def test_forward_masks_and_segm_results():
    from nafwebsod_tpu.core.config import cfg, reset_cfg
    from nafwebsod_tpu.engine import test as eng_test
    from nafwebsod_tpu.models import detector

    reset_cfg()
    cfg.MODEL.NUM_CLASSES = 4
    cfg.MRCNN.CLS_SPECIFIC_MASK = True
    spec = detector.ModelSpec(
        num_classes=4, hidden_dim=8, mask_on=True, mask_head='fcn',
        mask_resolution=7, mask_dim_reduced=8, compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    assert 'mask_fcn_logits_w' in params

    image = jnp.asarray(np.random.RandomState(1).randn(1, 48, 48, 3),
                        jnp.float32)
    rois = np.zeros((3, 5), np.float32)
    rois[:, 1:3] = [[4, 4], [10, 8], [2, 20]]
    rois[:, 3:5] = rois[:, 1:3] + 20
    masks = np.asarray(detector.forward_masks(
        spec, params, image, jnp.asarray(rois)))
    assert masks.shape == (3, 14, 14, 4)
    assert (masks >= 0).all() and (masks <= 1).all()

    # segm_results pastes + RLE-encodes one mask per final detection
    cls_boxes = [[] for _ in range(4)]
    cls_boxes[1] = np.array([[4, 4, 24, 24, 0.9]], np.float32)
    cls_boxes[2] = np.array([[10, 8, 30, 28, 0.8],
                             [2, 20, 22, 40, 0.7]], np.float32)
    cls_boxes[3] = np.zeros((0, 5), np.float32)
    boxes = np.vstack([cls_boxes[1][:, :4], cls_boxes[2][:, :4]])
    cls_segms = eng_test.segm_results(cls_boxes, masks, boxes, 48, 48)
    assert len(cls_segms[1]) == 1 and len(cls_segms[2]) == 2
    m = segms.rle_to_mask(cls_segms[1][0])
    assert m.shape == (48, 48)


def test_deeplab_mask_inference_and_segm_results():
    """Deeplab test-time masks (test_wsl.py:im_detect_mask_deeplab:366-405 +
    segm_results_deeplab:866-916): ONE image-level bg/fg grid; each
    detection crops the binarized class channel to its box."""
    from nafwebsod_tpu.core.config import cfg, reset_cfg
    from nafwebsod_tpu.engine import test as eng_test
    from nafwebsod_tpu.models import detector

    reset_cfg()
    cfg.MODEL.NUM_CLASSES = 4
    cfg.MRCNN.CLS_SPECIFIC_MASK = True
    cfg.MRCNN.ROI_MASK_HEAD = 'wsl_seg_heads.deeplab_vgg16_head'
    cfg.MRCNN.THRESH_BINARIZE = 0.5
    spec = detector.ModelSpec(num_classes=4, hidden_dim=8, mask_on=True,
                              mask_head='deeplab', compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    assert 'fc6_1_w' in params  # ASPP branch params exist

    image = jnp.asarray(np.random.RandomState(1).randn(1, 48, 48, 3),
                        jnp.float32)
    grid = np.asarray(detector.forward_deeplab_masks(spec, params, image))
    # bgfg semantics: channel 0 == 1 - max_c sigmoid (add_deeplab_outputs)
    assert grid.shape[0] == 1 and grid.shape[-1] == 4
    np.testing.assert_allclose(grid[..., 0], 1.0 - grid[..., 1:].max(-1),
                               atol=1e-6)
    assert (grid >= 0).all() and (grid <= 1).all()

    # segm_results dispatches on 'deeplab' in MRCNN.ROI_MASK_HEAD; oracle
    # on a hand grid: class-2 hot in the top-left grid quadrant, one
    # detection box covering the image's left half
    h = w = 6
    im_h = im_w = 12
    masks = np.zeros((1, h, w, 4), np.float32)
    masks[0, :3, :3, 2] = 1.0
    cls_boxes = [np.zeros((0, 5), np.float32) for _ in range(4)]
    cls_boxes[2] = np.array([[0, 0, 7, 7, 0.9]], np.float32)
    ref_boxes = np.array([[0, 0, 7, 7]], np.float32)
    cls_segms = eng_test.segm_results(cls_boxes, masks, ref_boxes,
                                      im_h, im_w)
    assert len(cls_segms[2]) == 1 and len(cls_segms[1]) == 0
    m = segms.rle_to_mask(cls_segms[2][0])
    assert m.shape == (im_h, im_w)
    # hot 3x6-cell region resized 6->12 covers ~rows/cols 0..5; the box
    # keeps cols/rows 0..7 only
    assert m[:4, :4].all()
    assert not m[:, 8:].any() and not m[8:, :].any()

    # end-to-end: im_detect_mask routes deeplab through the image-level
    # path and returns per-class RLE lists sized like the detections
    cfg.TEST.SCALE = 48
    cfg.TEST.MAX_SIZE = 64
    im = np.random.RandomState(2).randint(
        0, 255, (48, 48, 3)).astype(np.uint8)
    dets = [np.zeros((0, 5), np.float32) for _ in range(4)]
    dets[1] = np.array([[4, 4, 24, 24, 0.9]], np.float32)
    dets[3] = np.array([[2, 20, 22, 40, 0.7],
                        [10, 8, 30, 28, 0.6]], np.float32)
    cls_segms = eng_test.im_detect_mask(spec, params, im, dets)
    assert len(cls_segms[1]) == 1 and len(cls_segms[3]) == 2
    for rle in cls_segms[1] + cls_segms[3]:
        assert segms.rle_to_mask(rle).shape == (48, 48)

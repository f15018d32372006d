"""Box op tests: numpy host ops vs brute-force golds, and device (jnp) ops vs
the numpy implementations (reference test model: detectron/tests/test_bbox_transform.py)."""

import numpy as np
import pytest

from nafwebsod_tpu.ops import boxes as box_utils


def _rand_dets(n, seed=0, size=100):
    rng = np.random.RandomState(seed)
    x1 = rng.uniform(0, size, n)
    y1 = rng.uniform(0, size, n)
    w = rng.uniform(1, size / 2, n)
    h = rng.uniform(1, size / 2, n)
    scores = rng.uniform(0, 1, n)
    return np.stack([x1, y1, x1 + w, y1 + h, scores], axis=1).astype(np.float32)


def test_bbox_overlaps_basic():
    a = np.array([[0, 0, 9, 9]], dtype=np.float32)  # area 100
    b = np.array([[0, 0, 9, 9], [5, 5, 14, 14], [20, 20, 29, 29]], dtype=np.float32)
    ov = box_utils.bbox_overlaps(a, b)
    assert ov.shape == (1, 3)
    np.testing.assert_allclose(ov[0, 0], 1.0)
    np.testing.assert_allclose(ov[0, 1], 25.0 / 175.0)
    np.testing.assert_allclose(ov[0, 2], 0.0)


def test_nms_simple():
    dets = np.array([
        [0, 0, 10, 10, 0.9],
        [1, 1, 11, 11, 0.8],   # heavy overlap with first -> suppressed
        [50, 50, 60, 60, 0.7],
    ], dtype=np.float32)
    keep = box_utils.nms(dets, 0.5)
    assert list(keep) == [0, 2]


def test_nms_threshold_is_inclusive():
    # cython nms suppresses at ovr >= thresh
    dets = np.array([
        [0, 0, 9, 9, 0.9],
        [0, 0, 19, 9, 0.8],  # iou = 100/200 = 0.5 exactly
    ], dtype=np.float32)
    assert list(box_utils.nms(dets, 0.5)) == [0]
    assert list(box_utils.nms(dets, 0.500001)) == [0, 1]


def test_soft_nms_linear_matches_manual():
    dets = np.array([
        [0, 0, 10, 10, 0.9],
        [1, 1, 11, 11, 0.8],
        [50, 50, 60, 60, 0.7],
    ], dtype=np.float32)
    out, keep = box_utils.soft_nms(dets, sigma=0.5, overlap_thresh=0.3,
                                   score_thresh=0.001, method='linear')
    # box 1 overlaps box 0 by iou
    ov = box_utils.bbox_overlaps(dets[0:1, :4], dets[1:2, :4])[0, 0]
    expected = 0.8 * (1 - ov)
    scores = {tuple(np.round(r[:4]).astype(int)): r[4] for r in out}
    np.testing.assert_allclose(scores[(1, 1, 11, 11)], expected, rtol=1e-5)
    assert len(keep) == 3  # nothing pruned at low score_thresh


def test_soft_nms_hard_equals_nms():
    dets = _rand_dets(60, seed=3)
    keep_nms = sorted(box_utils.nms(dets, 0.5))
    # hard soft-nms with high score_thresh prunes the same set (note: hard
    # method uses > thresh, nms uses >=; avoid exact-boundary inputs)
    _, keep_soft = box_utils.soft_nms(dets, overlap_thresh=0.5,
                                      score_thresh=1e-6, method='hard')
    assert sorted(keep_soft) == keep_nms


def test_box_voting_id():
    top = np.array([[0, 0, 10, 10, 0.9]], dtype=np.float32)
    allb = np.array([
        [0, 0, 10, 10, 0.9],
        [2, 2, 12, 12, 0.1],
        [70, 70, 80, 80, 0.5],
    ], dtype=np.float32)
    out = box_utils.box_voting(top, allb, thresh=0.5, scoring_method='ID')
    w = np.array([0.9, 0.1])
    expected = (allb[0, :4] * w[0] + allb[1, :4] * w[1]) / w.sum()
    np.testing.assert_allclose(out[0, :4], expected, rtol=1e-6)
    assert out[0, 4] == pytest.approx(0.9)


def test_bbox_transform_roundtrip():
    rng = np.random.RandomState(7)
    boxes = _rand_dets(20, seed=1)[:, :4].astype(np.float64)
    gt = boxes + rng.uniform(-3, 3, boxes.shape)
    gt[:, 2:] = np.maximum(gt[:, 2:], gt[:, :2] + 1)
    deltas = box_utils.bbox_transform_inv(boxes, gt)
    rec = box_utils.bbox_transform(boxes, deltas)
    np.testing.assert_allclose(rec, gt, atol=1e-6)


def test_flip_boxes_involution():
    boxes = _rand_dets(10, seed=2)[:, :4]
    W = 640
    flipped = box_utils.flip_boxes(boxes, W)
    np.testing.assert_allclose(box_utils.flip_boxes(flipped, W), boxes,
                               rtol=1e-4, atol=1e-4)


def test_unique_boxes():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [1, 1, 10, 10]],
                     dtype=np.float32)
    idx = box_utils.unique_boxes(boxes)
    assert len(idx) == 2


class TestDeviceOps:
    def test_iou_matrix_matches_numpy(self):
        import jax.numpy as jnp
        from nafwebsod_tpu.ops import jbox
        dets = _rand_dets(50, seed=4)
        got = np.asarray(jbox.iou_matrix(jnp.array(dets[:, :4]), jnp.array(dets[:, :4])))
        want = box_utils.bbox_overlaps(dets[:, :4], dets[:, :4])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_roi_iou_int_truncation_and_diag(self):
        import jax.numpy as jnp
        from nafwebsod_tpu.ops import jbox
        rois = np.array([
            [0, 0.9, 0.9, 10.7, 10.7],
            [0, 0.0, 0.0, 10.0, 10.0],
        ], dtype=np.float32)
        j = np.asarray(jbox.roi_iou(jnp.array(rois)))
        np.testing.assert_allclose(np.diag(j), 1.0)
        # truncated coords: both boxes are [0,0,10,10] -> IoU 1
        np.testing.assert_allclose(j[0, 1], 1.0)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_device_nms_matches_numpy(self, seed):
        import jax.numpy as jnp
        from nafwebsod_tpu.ops import jbox
        dets = _rand_dets(80, seed=seed)
        keep_np = sorted(box_utils.nms(dets, 0.5))
        keep_mask, _ = jbox.nms(jnp.array(dets[:, :4]), jnp.array(dets[:, 4]), 0.5)
        keep_jax = sorted(np.where(np.asarray(keep_mask))[0].tolist())
        assert keep_jax == keep_np

    def test_device_nms_with_padding(self):
        import jax.numpy as jnp
        from nafwebsod_tpu.ops import jbox
        dets = _rand_dets(40, seed=5)
        pad_boxes = np.zeros((24, 4), dtype=np.float32)
        boxes = np.concatenate([dets[:, :4], pad_boxes])
        scores = np.concatenate([dets[:, 4], np.full((24,), -np.inf, np.float32)])
        keep_mask, _ = jbox.nms(jnp.array(boxes), jnp.array(scores), 0.5)
        keep_jax = sorted(np.where(np.asarray(keep_mask))[0].tolist())
        assert keep_jax == sorted(box_utils.nms(dets, 0.5))
        assert not np.asarray(keep_mask)[40:].any()

    def test_device_nms_max_output(self):
        import jax.numpy as jnp
        from nafwebsod_tpu.ops import jbox
        dets = _rand_dets(80, seed=6)
        keep_np = box_utils.nms(dets, 0.5)
        keep_mask, _ = jbox.nms(jnp.array(dets[:, :4]), jnp.array(dets[:, 4]),
                                0.5, max_output=3)
        got = set(np.where(np.asarray(keep_mask))[0].tolist())
        assert got == set(keep_np[:3])

"""Supervised Fast R-CNN path tests: bbox target computation, fg/bg
sampling, smooth-L1 semantics, and the supervised forward/losses."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nafwebsod_tpu.core.config import cfg, reset_cfg
from nafwebsod_tpu.data import fast_rcnn
from nafwebsod_tpu.models import detector
from nafwebsod_tpu.ops import boxes as box_ops
from nafwebsod_tpu.ops import losses as loss_ops


@pytest.fixture(autouse=True)
def fresh_cfg():
    reset_cfg()
    cfg.MODEL.NUM_CLASSES = 4
    cfg.TRAIN.BATCH_SIZE_PER_IM = 16
    cfg.TRAIN.FG_FRACTION = 0.25
    yield
    reset_cfg()


def _entry():
    boxes = np.array([
        [10, 10, 50, 50],    # gt class 1
        [60, 60, 90, 90],    # gt class 2
        [12, 12, 52, 52],    # high overlap with gt0
        [0, 0, 20, 20],      # low overlap
        [61, 59, 91, 92],    # high overlap with gt1
    ], np.float32)
    gt_classes = np.array([1, 2, 0, 0, 0], np.int32)
    overlaps = box_ops.bbox_overlaps(boxes, boxes[:2])
    return {
        'boxes': boxes,
        'gt_classes': gt_classes,
        'is_crowd': np.zeros(5, bool),
        'max_overlaps': overlaps.max(1),
        'max_classes': np.where(overlaps.max(1) > 0.1,
                                overlaps.argmax(1) + 1, 0).astype(np.int32),
    }


class TestBBoxTargets:
    def test_compact_targets(self):
        entry = _entry()
        t = fast_rcnn.compute_bbox_regression_targets(entry)
        assert t.shape == (5, 5)
        # the aligned box has a target toward its gt with its class
        assert t[2, 0] == 1
        assert np.abs(t[2, 1:]).sum() > 0
        # gt boxes regress to themselves: zero deltas
        np.testing.assert_allclose(t[0, 1:], 0, atol=1e-6)

    def test_sampling_and_padding(self):
        entry = _entry()
        blobs = fast_rcnn.sample_rois(entry, im_scale=2.0,
                                      rng=np.random.RandomState(0),
                                      pad_to=16)
        assert blobs['rois'].shape == (16, 5)
        assert blobs['labels_int32'].shape == (16,)
        assert blobs['bbox_targets'].shape == (16, 16)  # 4 * num_classes
        # rois scaled by im_scale
        v = blobs['valid_mask']
        assert (blobs['rois'][v][:, 1:] % 1 == 0).any()
        # fg rows carry nonzero inside weights at their class slot
        fg = blobs['labels_int32'] > 0
        assert blobs['bbox_inside_weights'][fg].sum() > 0
        assert blobs['bbox_inside_weights'][~fg].sum() == 0


class TestSmoothL1:
    def test_matches_manual(self):
        rng = np.random.RandomState(0)
        pred = rng.randn(4, 8).astype(np.float32)
        tgt = rng.randn(4, 8).astype(np.float32)
        inw = (rng.rand(4, 8) > 0.5).astype(np.float32)
        outw = inw.copy()
        got = float(loss_ops.smooth_l1_loss(
            jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(inw),
            jnp.asarray(outw)))
        d = inw * (pred - tgt)
        ad = np.abs(d)
        elem = np.where(ad < 1, 0.5 * d * d, ad - 0.5) * outw
        assert got == pytest.approx(elem.sum() / 4, rel=1e-5)


class TestSupervisedModel:
    def test_forward_train_and_test(self):
        spec = detector.ModelSpec(
            num_classes=4, box_head='vgg16_2fc', webly_on=False,
            webly_entropy=False, hidden_dim=16, supervised=True,
            freeze_conv_body=True)
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        assert 'cls_score_w' in params and 'bbox_pred_w' in params
        assert 'fc8c_w' not in params

        rng = np.random.RandomState(0)
        R = 8
        x1 = rng.uniform(0, 20, R)
        y1 = rng.uniform(0, 20, R)
        batch = {
            'image': jnp.asarray(rng.randn(1, 48, 48, 3).astype(np.float32)),
            'rois': jnp.asarray(np.stack(
                [np.zeros(R), x1, y1, x1 + 16, y1 + 16], 1).astype(
                    np.float32)),
            'obn_scores': jnp.asarray(np.ones((R, 1), np.float32)),
            'labels_int32': jnp.asarray(
                rng.randint(0, 4, R).astype(np.int32)),
            'labels_oh': jnp.asarray(np.zeros((1, 3), np.float32)),
            'bbox_targets': jnp.asarray(rng.randn(R, 16).astype(np.float32)),
            'bbox_inside_weights': jnp.asarray(
                (rng.rand(R, 16) > 0.8).astype(np.float32)),
            'bbox_outside_weights': jnp.asarray(
                np.ones((R, 16), np.float32)),
            'valid_mask': jnp.ones((R,), bool),
        }
        total, aux = detector.forward_train(spec, params, batch,
                                            jax.random.PRNGKey(1))
        assert np.isfinite(float(total))
        assert 'loss_cls' in aux and 'loss_bbox' in aux

        grads = jax.grad(lambda p: detector.forward_train(
            spec, p, batch, jax.random.PRNGKey(1))[0])(params)
        assert float(jnp.abs(grads['cls_score_w']).max()) > 0
        assert float(jnp.abs(grads['bbox_pred_w']).max()) > 0

        out = detector.forward_test(spec, params, batch['image'],
                                    batch['rois'], batch['obn_scores'],
                                    batch['valid_mask'])
        probs = np.asarray(out['scores'])
        assert probs.shape == (R, 4)
        np.testing.assert_allclose(probs.sum(1), np.ones(R), rtol=1e-4)
        assert np.asarray(out['bbox_pred']).shape == (R, 16)


class TestRPN:
    def test_generate_anchors_matches_reference_port(self):
        from nafwebsod_tpu.ops.rpn import generate_anchors

        # direct numpy port of generate_anchors.py:68-119 as the golden
        # (the matlab table in the reference header is 1-indexed)
        def ref(base, scales, ratios):
            def whctrs(a):
                w = a[2] - a[0] + 1
                h = a[3] - a[1] + 1
                return w, h, a[0] + 0.5 * (w - 1), a[1] + 0.5 * (h - 1)

            def mk(ws, hs, xc, yc):
                ws, hs = ws[:, None], hs[:, None]
                return np.hstack((xc - 0.5 * (ws - 1), yc - 0.5 * (hs - 1),
                                  xc + 0.5 * (ws - 1), yc + 0.5 * (hs - 1)))

            anchor = np.array([1, 1, base, base], np.float64) - 1
            w, h, xc, yc = whctrs(anchor)
            ws = np.round(np.sqrt(w * h / ratios))
            ratio_anchors = mk(ws, np.round(ws * ratios), xc, yc)
            out = []
            for i in range(ratio_anchors.shape[0]):
                w, h, xc, yc = whctrs(ratio_anchors[i])
                out.append(mk(w * scales, h * scales, xc, yc))
            return np.vstack(out)

        scales = np.array([8.0, 16.0, 32.0])
        ratios = np.array([0.5, 1.0, 2.0])
        golden = ref(16, scales, ratios)
        got = generate_anchors(stride=16, sizes=(128, 256, 512),
                               aspect_ratios=(0.5, 1, 2))
        np.testing.assert_allclose(got, golden, atol=1e-4)
        # sanity: ratio-1 scale-8 anchor is 128x128 centered at 7.5
        assert got[3, 2] - got[3, 0] + 1 == 128

    def test_generate_proposals(self):
        from nafwebsod_tpu.ops.rpn import generate_anchors, generate_proposals
        rng = np.random.RandomState(0)
        anchors = generate_anchors(16, (64, 128), (0.5, 1, 2))
        A = anchors.shape[0]
        H, W = 8, 10
        scores = rng.rand(A, H, W).astype(np.float32)
        deltas = (rng.randn(4 * A, H, W) * 0.1).astype(np.float32)
        im_info = np.array([128.0, 160.0, 1.0], np.float32)
        props, sc = generate_proposals(scores, deltas, im_info, anchors,
                                       spatial_scale=1.0 / 16,
                                       pre_nms_top_n=200, post_nms_top_n=50,
                                       nms_thresh=0.7, min_size=4)
        assert props.shape[0] <= 50 and props.shape[0] > 0
        assert props.shape[0] == sc.shape[0]
        # clipped to the image
        assert props[:, 0].min() >= 0 and props[:, 2].max() <= 159
        assert props[:, 3].max() <= 127
        # scores sorted descending after NMS
        assert (np.diff(sc.squeeze(-1)) <= 1e-6).all()

    def test_rpn_targets_and_head(self):
        from nafwebsod_tpu.models import rpn_head
        from nafwebsod_tpu.ops.rpn import (generate_anchors, rpn_targets,
                                           shifted_anchors)
        rng = np.random.RandomState(0)
        anchors = generate_anchors(16, (64, 128), (0.5, 1, 2))
        A = anchors.shape[0]
        H, W = 6, 8
        all_anchors = shifted_anchors(H, W, 16, anchors)
        gt = np.array([[20, 20, 80, 80], [50, 10, 110, 60]], np.float32)
        labels, tgts, inw, outw = rpn_targets(
            H * 16, W * 16, all_anchors, gt, rng=rng, batch_size=32)
        assert labels.shape == (H * W * A,)
        assert (labels == 1).sum() > 0       # per-gt best anchors forced fg
        assert (labels == 0).sum() > 0
        assert ((labels == 1) | (labels == 0)).sum() <= 32 + 2  # ties slack
        # fg rows have targets + unit inside weights
        fg = labels == 1
        assert inw[fg].sum() == 4 * fg.sum()
        assert outw[labels >= 0].sum() > 0

        params = rpn_head.init_rpn_params(jax.random.PRNGKey(0), 16, A)
        feat = jnp.asarray(rng.randn(1, H, W, 16).astype(np.float32))
        cls, bbox = rpn_head.forward(params, feat)
        assert cls.shape == (1, H, W, A) and bbox.shape == (1, H, W, 4 * A)
        l = rpn_head.losses(cls, bbox, jnp.asarray(labels),
                            jnp.asarray(tgts), jnp.asarray(inw),
                            jnp.asarray(outw))
        assert np.isfinite(float(l['loss_rpn_cls']))
        assert np.isfinite(float(l['loss_rpn_bbox']))
        g = jax.grad(lambda p: sum(rpn_head.losses(
            *rpn_head.forward(p, feat), jnp.asarray(labels),
            jnp.asarray(tgts), jnp.asarray(inw),
            jnp.asarray(outw)).values()))(params)
        assert float(jnp.abs(g['conv_rpn_w']).max()) > 0


class TestRFCN:
    def test_psroi_pool_selects_groups(self):
        from nafwebsod_tpu.models.rfcn_head import psroi_pool
        k, c = 2, 3
        H, W = 8, 8
        # group-coded features: group g everywhere equals g+1
        feat = np.zeros((H, W, k * k * c), np.float32)
        for g in range(k * k):
            feat[:, :, g * c:(g + 1) * c] = g + 1
        rois = np.array([[0, 0, 0, 63, 63]], np.float32)  # whole image
        out = np.asarray(psroi_pool(jnp.asarray(feat), jnp.asarray(rois),
                                    c, group_size=k, spatial_scale=1.0 / 8))
        assert out.shape == (1, k, k, c)
        # bin (i, j) must read exclusively from group i*k + j
        for i in range(k):
            for j in range(k):
                np.testing.assert_allclose(out[0, i, j], i * k + j + 1,
                                           rtol=1e-5)

    def test_rfcn_forward(self):
        from nafwebsod_tpu.models import rfcn_head
        rng = np.random.RandomState(0)
        params = rfcn_head.init_rfcn_params(
            jax.random.PRNGKey(0), dim_in=16, num_classes=4, ps_grid=3,
            dim_reduce=8)
        feat = jnp.asarray(rng.randn(1, 10, 10, 16).astype(np.float32))
        rois = jnp.asarray(np.array([[0, 0, 0, 80, 80],
                                     [0, 40, 40, 150, 150]], np.float32))
        cls, bbox = rfcn_head.forward(params, feat, rois, num_classes=4,
                                      ps_grid=3, spatial_scale=1.0 / 16)
        assert cls.shape == (2, 4) and bbox.shape == (2, 16)
        g = jax.grad(lambda p: jnp.sum(rfcn_head.forward(
            p, feat, rois, 4, 3, 1.0 / 16)[0]))(params)
        assert float(jnp.abs(g['conv_cls_w']).max()) > 0


class TestKeypointHead:
    def test_forward_targets_loss(self):
        from nafwebsod_tpu.models import keypoint_head
        rng = np.random.RandomState(0)
        K = 5
        params = keypoint_head.init_keypoint_params(
            jax.random.PRNGKey(0), dim_in=8, hidden=8, num_convs=2,
            num_keypoints=K, deconv_dim=8)
        feat = jnp.asarray(rng.randn(12, 12, 8).astype(np.float32))
        rois = np.array([[0, 8, 8, 72, 72], [0, 16, 0, 88, 64]], np.float32)
        logits = keypoint_head.forward(params, feat, jnp.asarray(rois),
                                       1.0 / 8, resolution=7, num_convs=2)
        assert logits.shape == (2, 14, 14, K)

        kps = np.zeros((2, K, 3), np.float32)
        kps[0, 0] = [40, 40, 1]    # visible, inside roi 0
        kps[0, 1] = [100, 100, 1]  # outside roi 0 -> ignored
        kps[1, 2] = [50, 30, 1]
        locs, w = keypoint_head.keypoint_targets(kps, rois, 14)
        assert locs.shape == (2 * K,) and w.shape == (2 * K,)
        assert w.sum() == 2  # two usable keypoints
        assert locs[0] >= 0 and w[0] == 1
        assert w[1] == 0

        loss = keypoint_head.keypoint_losses(
            logits, jnp.asarray(locs), jnp.asarray(w))
        assert np.isfinite(float(loss)) and float(loss) > 0
        g = jax.grad(lambda p: keypoint_head.keypoint_losses(
            keypoint_head.forward(p, feat, jnp.asarray(rois), 1.0 / 8,
                                  resolution=7, num_convs=2),
            jnp.asarray(locs), jnp.asarray(w)))(params)
        assert float(jnp.abs(g['kps_score_w']).max()) > 0


class TestMaskRCNNBlobs:
    def test_targets_and_loss(self):
        from nafwebsod_tpu.data.mask_rcnn import (add_mask_rcnn_blobs,
                                                  mask_rcnn_loss)
        segms = [[[2, 2, 30, 2, 30, 30, 2, 30]],
                 [[40, 40, 60, 40, 60, 60, 40, 60]]]
        gt_classes = np.array([1, 2], np.int32)
        boxes = np.array([[2, 2, 30, 30], [40, 40, 60, 60],
                          [0, 0, 10, 10]], np.float32)
        labels = np.array([1, 2, 0], np.int32)
        rois5, masks, has_mask = add_mask_rcnn_blobs(
            boxes, labels, segms, gt_classes,
            np.zeros(2, bool), im_scale=1.0, M=8, cls_specific=True,
            num_classes=3)
        assert rois5.shape == (2, 5)
        assert masks.shape == (2, 3 * 64)
        # roi 0 (class 1): its class slot is mostly 1, other slots ignored
        assert (masks[0, 64:128] == 1).mean() > 0.8
        assert (masks[0, :64] == -1).all()

        logits = jnp.asarray(np.random.RandomState(0).randn(
            2, 8, 8, 3).astype(np.float32))
        loss = mask_rcnn_loss(logits, jnp.asarray(masks))
        assert np.isfinite(float(loss)) and float(loss) > 0

    def test_no_fg_fallback(self):
        from nafwebsod_tpu.data.mask_rcnn import add_mask_rcnn_blobs
        boxes = np.array([[0, 0, 10, 10]], np.float32)
        rois5, masks, has_mask = add_mask_rcnn_blobs(
            boxes, np.zeros(1, np.int32), [], np.zeros(0, np.int32),
            np.zeros(0, bool), 1.0, M=8, cls_specific=False, num_classes=3)
        assert (masks == -1).all()
        assert has_mask[0] == 1

"""Context-stream tests: RoIContext geometry, RoILoopPool ring semantics vs a
numpy port of roi_loop_pool_op.cu, and the three-stream context head."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nafwebsod_tpu.models import detector
from nafwebsod_tpu.ops.context import roi_context, roi_loop_pool


class TestRoIContext:
    def test_frame_and_context_geometry(self):
        rois = np.array([[0, 10, 20, 50, 60]], np.float32)
        frame, context = roi_context(jnp.asarray(rois), 100, 100,
                                     context_ratio=2.0)
        frame, context = np.asarray(frame), np.asarray(context)
        # frame: outer = original; inner = shrunk by ratio about the center
        np.testing.assert_allclose(frame[0, 1:5], [10, 20, 50, 60])
        w, h = 40.0, 40.0
        np.testing.assert_allclose(
            frame[0, 5:], [10 + w / 4, 20 + h / 4, 50 - w / 4, 60 - h / 4])
        # context: outer = expanded (clipped); inner = original
        np.testing.assert_allclose(
            context[0, 1:5], [0, 0, 70, 80])  # 10-20 clipped to 0
        np.testing.assert_allclose(context[0, 5:], [10, 20, 50, 60])

    def test_clipping(self):
        rois = np.array([[0, 0, 0, 99, 99]], np.float32)
        frame, context = roi_context(jnp.asarray(rois), 100, 100, 1.8)
        assert np.asarray(context)[0, 1:5].min() >= 0
        assert np.asarray(context)[0, 3] <= 100


def _np_loop_pool(feat, roi9, pooled, scale):
    """Direct numpy port of roi_loop_pool_op.cu ROIPoolForward."""
    H, W, C = feat.shape
    r = np.round(np.asarray(roi9[1:]) * scale).astype(int)
    x1, y1, x2, y2, ix1, iy1, ix2, iy2 = r
    roi_h = max(y2 - y1 + 1, 1)
    roi_w = max(x2 - x1 + 1, 1)
    out = np.zeros((pooled, pooled, C), np.float32)
    for ph in range(pooled):
        for pw in range(pooled):
            hs = min(max(int(np.floor(ph * roi_h / pooled)) + y1, 0), H)
            he = min(max(int(np.ceil((ph + 1) * roi_h / pooled)) + y1, 0), H)
            ws = min(max(int(np.floor(pw * roi_w / pooled)) + x1, 0), W)
            we = min(max(int(np.ceil((pw + 1) * roi_w / pooled)) + x1, 0), W)
            for c in range(C):
                maxval = 0.0
                for h in range(hs, he):
                    inside_h = iy1 < h < iy2
                    for w in range(ws, we):
                        inside_w = ix1 < w < ix2
                        if inside_h and inside_w:
                            continue
                        maxval = max(maxval, feat[h, w, c])
                out[ph, pw, c] = maxval
    return out


class TestRoILoopPool:
    def test_matches_numpy_golden(self):
        rng = np.random.RandomState(0)
        H, W, C = 24, 24, 3
        feat = rng.rand(H, W, C).astype(np.float32)  # post-ReLU: >= 0
        rois = np.array([
            [0, 8, 8, 120, 120, 40, 40, 90, 90],     # ring
            [0, 0, 0, 60, 60, 10, 10, 50, 50],
            [0, 16, 16, 170, 170, 16, 16, 170, 170],  # inner == outer
        ], np.float32)
        got = np.asarray(roi_loop_pool(jnp.asarray(feat), jnp.asarray(rois),
                                       4, 4, 0.125, chunk=1))
        for i in range(rois.shape[0]):
            expect = _np_loop_pool(feat, rois[i], 4, 0.125)
            np.testing.assert_allclose(got[i], expect, rtol=1e-6,
                                       err_msg='roi {}'.format(i))

    def test_grad_is_argmax_scatter(self):
        rng = np.random.RandomState(1)
        feat = rng.rand(16, 16, 2).astype(np.float32)
        rois = np.array([[0, 0, 0, 100, 100, 30, 30, 80, 80]], np.float32)

        g = jax.grad(lambda f: jnp.sum(
            roi_loop_pool(f, jnp.asarray(rois), 2, 2, 0.125)))(
                jnp.asarray(feat))
        g = np.asarray(g)
        # gradient lands only on argmax cells, never strictly inside the ring
        # interior (cells 4..9 in feature coords at scale 1/8... compute: the
        # inner box 30..80 * 0.125 -> 4..10 exclusive interior 5..9)
        assert g.sum() > 0
        assert np.count_nonzero(g) <= 2 * 2 * 2  # <= one cell per bin/channel
        inner = g[5:10, 5:10, :]
        assert np.abs(inner).sum() == 0


class TestContextHeadIntegration:
    def test_forward_train_and_test(self):
        spec = detector.ModelSpec(
            num_classes=5, hidden_dim=16, webly_on=False,
            webly_entropy=False, box_head='vgg16_context_2fc')
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        assert 'fc8d_frame_w' in params and 'fc8d_w' not in params

        rng = np.random.RandomState(0)
        R = 8
        x1 = rng.uniform(0, 30, R)
        y1 = rng.uniform(0, 30, R)
        labels = np.zeros((1, 4), np.float32)
        labels[0, 1] = 1
        batch = {
            'image': jnp.asarray(rng.randn(1, 48, 48, 3).astype(np.float32)),
            'rois': jnp.asarray(np.stack(
                [np.zeros(R), x1, y1, x1 + 12, y1 + 12], 1).astype(
                    np.float32)),
            'obn_scores': jnp.asarray(rng.rand(R, 1).astype(np.float32)),
            'labels_oh': jnp.asarray(labels),
            'valid_mask': jnp.ones((R,), bool),
        }
        total, aux = detector.forward_train(spec, params, batch,
                                            jax.random.PRNGKey(1))
        assert np.isfinite(float(total))

        out = detector.forward_test(spec, params, batch['image'],
                                    batch['rois'], batch['obn_scores'],
                                    batch['valid_mask'])
        assert np.asarray(out['scores']).shape == (R, 5)

        # frame-stream weights learn through the shared fc8d_frame layer
        grads = jax.grad(lambda p: detector.forward_train(
            spec, p, batch, jax.random.PRNGKey(1))[0])(params)
        assert float(jnp.abs(grads['fc8d_frame_w']).max()) > 0


class TestContextImHw:
    def test_ring_geometry_clips_at_traced_image_extent(self):
        """roi_context must accept a TRACED (im_h, im_w) and clip the
        frame/context rings identically to the static-bound computation —
        the padded batch canvas passes the true image extent this way
        (round-4 review finding: rings used to clip at the canvas edge and
        RoILoopPool sampled dead zero-canvas activations)."""
        rois = np.array([[0, 30, 20, 55, 44],
                         [0, 8, 28, 30, 47],
                         [0, 4, 4, 24, 20]], np.float32)
        f_static, c_static = roi_context(jnp.asarray(rois), 48, 56,
                                         context_ratio=1.8)
        f_traced, c_traced = jax.jit(
            lambda r, h, w: roi_context(r, h, w, context_ratio=1.8)
        )(jnp.asarray(rois), jnp.float32(48), jnp.float32(56))
        np.testing.assert_allclose(np.asarray(f_traced),
                                   np.asarray(f_static), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(c_traced),
                                   np.asarray(c_static), rtol=1e-6)
        # the border roi's outer ring really is clipped at the image edge
        assert np.asarray(c_static)[0, 3] <= 56  # outer x2
        assert np.asarray(c_static)[1, 4] <= 48  # outer y2

    def test_forward_train_uses_im_hw(self):
        """On a padded canvas, im_hw must reach the context head: the loss
        changes when the rings stop extending into the dead canvas."""
        spec = detector.ModelSpec(
            num_classes=5, hidden_dim=16,
            box_head='vgg16_context_2fc',
            webly_on=False, webly_entropy=False)
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        h, w = 48, 56
        image = (rng.randn(1, h, w, 3) * 8).astype(np.float32)
        R = 4
        rois = np.array([[0, 30, 20, w - 1, 44],
                         [0, 8, 28, 30, h - 1],
                         [0, 4, 4, 24, 20],
                         [0, 20, 10, 50, 40]], np.float32)
        obn = rng.uniform(0.5, 1.5, (R, 1)).astype(np.float32)
        labels = np.zeros((1, 4), np.float32)
        labels[0, 1] = 1
        canvas = np.zeros((1, h + 16, w + 24, 3), np.float32)
        canvas[:, :h, :w] = image
        batch = {
            'image': jnp.asarray(canvas), 'rois': jnp.asarray(rois),
            'obn_scores': jnp.asarray(obn), 'labels_oh': jnp.asarray(labels),
            'valid_mask': jnp.ones((R,), bool),
            'im_hw': jnp.asarray(np.array([h, w], np.float32)),
        }
        key = jax.random.PRNGKey(1)
        loss1, _ = detector.forward_train(spec, params, batch, key)
        batch_n = {k: v for k, v in batch.items() if k != 'im_hw'}
        loss2, _ = detector.forward_train(spec, params, batch_n, key)
        assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
        assert abs(float(loss2) - float(loss1)) > 1e-7

"""Golden tests for the device op library vs independent numpy references
(the reference repo ships no unit tests for these ops — SURVEY.md §4 asks the
rebuild to do better)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nafwebsod_tpu.ops import losses as L
from nafwebsod_tpu.ops.roi_pool import roi_pool, roi_align, roi_feature_boost
from nafwebsod_tpu.ops.entropy import spatial_entropy_weights


# ---------------------------------------------------------------------------
# numpy reference implementations (independently coded from the op semantics)
# ---------------------------------------------------------------------------

def np_ce_with_logits(X, Lb, W=None, is_mean=False):
    N, C = X.shape
    norm = C if is_mean else 1.0
    p = np.maximum(X, 1e-20)
    q = np.maximum(1 - X, 1e-20)
    elem = -(Lb * np.log(p) + (1 - Lb) * np.log(q))
    if W is not None:
        elem = elem * W
    return elem.sum() / norm / N


def np_ce_grad(X, Lb, W=None, is_mean=False, g=1.0):
    N, C = X.shape
    norm = C if is_mean else 1.0
    p = np.maximum(X, 1e-20)
    q = np.maximum(1 - X, 1e-20)
    grad = g * (-Lb / p + (1 - Lb) / q) / norm
    grad = np.minimum(grad, 1e4)
    if W is not None:
        grad = grad * W
    return grad / N


def np_roi_pool(feat, rois, ph, pw, scale):
    """Direct triple-loop RoIPoolF."""
    H, W, C = feat.shape
    R = rois.shape[0]
    out = np.zeros((R, ph, pw, C), feat.dtype)

    def rnd(v):
        return int(np.floor(abs(v) + 0.5) * np.sign(v)) if v != 0 else 0

    for r in range(R):
        x1 = rnd(rois[r, 1] * scale)
        y1 = rnd(rois[r, 2] * scale)
        x2 = rnd(rois[r, 3] * scale)
        y2 = rnd(rois[r, 4] * scale)
        rh = max(y2 - y1 + 1, 1)
        rw = max(x2 - x1 + 1, 1)
        # exact integer bin boundaries (see ops/roi_pool.py for rationale)
        for i in range(ph):
            hs = min(max((i * rh) // ph + y1, 0), H)
            he = min(max(((i + 1) * rh + ph - 1) // ph + y1, 0), H)
            for j in range(pw):
                ws = min(max((j * rw) // pw + x1, 0), W)
                we = min(max(((j + 1) * rw + pw - 1) // pw + x1, 0), W)
                if he <= hs or we <= ws:
                    continue
                out[r, i, j] = feat[hs:he, ws:we].max(axis=(0, 1))
    return out


# ---------------------------------------------------------------------------


class TestCrossEntropy:
    def test_forward_matches(self):
        rng = np.random.RandomState(0)
        X = rng.uniform(0, 1, (1, 20)).astype(np.float32)
        Lb = (rng.rand(1, 20) > 0.8).astype(np.float32)
        for is_mean in (False, True):
            got = float(L.cross_entropy_with_logits(jnp.array(X), jnp.array(Lb), is_mean))
            want = np_ce_with_logits(X, Lb, is_mean=is_mean)
            assert got == pytest.approx(want, rel=1e-5)

    def test_grad_matches_with_clamp(self):
        rng = np.random.RandomState(1)
        # include a zero prob with label 1 to exercise the kDIFF clamp
        X = rng.uniform(0, 1, (1, 20)).astype(np.float32)
        X[0, 3] = 0.0
        Lb = np.zeros((1, 20), np.float32)
        Lb[0, 3] = 1.0
        Lb[0, 5] = 1.0
        g = jax.grad(lambda x: L.cross_entropy_with_logits(x, jnp.array(Lb), True))(
            jnp.array(X))
        want = np_ce_grad(X, Lb, is_mean=True)
        np.testing.assert_allclose(np.asarray(g), want, rtol=1e-4)
        # clamp engaged: -1/1e-20 clamped to 1e4... sign: -L/p is negative large
        # (not clamped; clamp is an upper bound). (1-L)/q for X=1 exercises it.

    def test_grad_upper_clamp(self):
        # X == 1 with label 0 -> grad = +1/1e-20 -> clamped at 1e4 (before /N)
        X = np.full((2, 3), 0.5, np.float32)
        X[0, 0] = 1.0
        Lb = np.zeros((2, 3), np.float32)
        g = jax.grad(lambda x: L.cross_entropy_with_logits(x, jnp.array(Lb), False))(
            jnp.array(X))
        want = np_ce_grad(X, Lb, is_mean=False)
        np.testing.assert_allclose(np.asarray(g), want, rtol=1e-5)
        assert np.asarray(g)[0, 0] == pytest.approx(1e4 / 2)

    def test_weighted_matches(self):
        rng = np.random.RandomState(2)
        X = rng.uniform(0, 1, (1, 21)).astype(np.float32)
        Lb = (rng.rand(1, 21) > 0.7).astype(np.float32)
        W = rng.uniform(0, 1, (1, 21)).astype(np.float32)
        got = float(L.weighted_cross_entropy_with_logits(
            jnp.array(X), jnp.array(Lb), jnp.array(W), True))
        want = np_ce_with_logits(X, Lb, W, is_mean=True)
        assert got == pytest.approx(want, rel=1e-5)
        g = jax.grad(lambda x: L.weighted_cross_entropy_with_logits(
            x, jnp.array(Lb), jnp.array(W), True))(jnp.array(X))
        np.testing.assert_allclose(np.asarray(g), np_ce_grad(X, Lb, W, True),
                                   rtol=1e-4)

    def test_min_entropy(self):
        rng = np.random.RandomState(3)
        X = rng.uniform(0, 1, (16, 5)).astype(np.float32)
        Lb = np.array([[1, 0, 0, 1, 0]], np.float32)
        got = float(L.min_entropy_loss(jnp.array(X), jnp.array(Lb)))
        p = np.maximum(X, 1e-20)
        want = (-(p * np.log(p))[:, [0, 3]]).sum() / (16 * 2)
        assert got == pytest.approx(want, rel=1e-5)


class TestRoiPool:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_numpy(self, seed):
        rng = np.random.RandomState(seed)
        H, W, C = 23, 31, 8
        feat = rng.randn(H, W, C).astype(np.float32)
        n = 12
        im_h, im_w = H * 8, W * 8  # rois live in image coords, clipped to image
        x1 = rng.uniform(0, im_w - 10, n)
        y1 = rng.uniform(0, im_h - 10, n)
        x2 = np.minimum(x1 + rng.uniform(8, 150, n), im_w - 1)
        y2 = np.minimum(y1 + rng.uniform(8, 120, n), im_h - 1)
        rois = np.stack([np.zeros(n), x1, y1, x2, y2], axis=1).astype(np.float32)
        got = np.asarray(roi_pool(jnp.array(feat), jnp.array(rois),
                                  pooled_h=7, pooled_w=7, spatial_scale=0.125,
                                  chunk=4))
        want = np_roi_pool(feat, rois, 7, 7, 0.125)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_tiny_and_out_of_bounds_rois(self):
        rng = np.random.RandomState(4)
        feat = rng.randn(10, 10, 4).astype(np.float32)
        rois = np.array([
            [0, 0, 0, 0, 0],          # degenerate
            [0, 70, 70, 79, 79],      # fully outside (scale 1/8 -> beyond map)
            [0, 0, 0, 79, 79],        # full image
        ], dtype=np.float32)
        got = np.asarray(roi_pool(jnp.array(feat), jnp.array(rois),
                                  pooled_h=7, pooled_w=7, spatial_scale=0.125,
                                  chunk=1))
        want = np_roi_pool(feat, rois, 7, 7, 0.125)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_roi_align_runs_and_is_reasonable(self):
        rng = np.random.RandomState(5)
        feat = np.tile(np.arange(16, dtype=np.float32)[:, None, None], (1, 16, 2))
        rois = np.array([[0, 0, 0, 127, 127]], dtype=np.float32)
        out = np.asarray(roi_align(jnp.array(feat), jnp.array(rois),
                                   pooled_h=4, pooled_w=4, spatial_scale=0.125,
                                   sampling_ratio=2))
        assert out.shape == (1, 4, 4, 2)
        # feature increases linearly in y -> pooled rows must be increasing
        col = out[0, :, 0, 0]
        assert np.all(np.diff(col) > 0)

    def test_roi_feature_boost_grad(self):
        feat = jnp.ones((3, 2, 2, 4))
        scores = jnp.array([1.0, 2.0, 0.5])

        def f(x):
            return jnp.sum(roi_feature_boost(x, scores) ** 2)

        g = jax.grad(f)(feat)
        # d/dx (x*s)^2 = 2*x*s^2
        np.testing.assert_allclose(np.asarray(g[1]), 2 * 1 * 4.0)
        np.testing.assert_allclose(np.asarray(g[2]), 2 * 1 * 0.25)


class TestSpatialEntropy:
    def _np_reference(self, rois_pred, cls_prob, rois, labels_oh):
        n = rois_pred.shape[0]
        boxes = np.floor(rois[:, 1:5])
        # iou with +1 convention, diag forced 1
        from nafwebsod_tpu.ops.boxes import bbox_overlaps
        j = bbox_overlaps(boxes, boxes)
        np.fill_diagonal(j, 1.0)
        with np.errstate(divide='ignore', invalid='ignore'):
            e = -(rois_pred * np.log(rois_pred))
        e = np.nan_to_num(e, nan=0.0, posinf=0.0, neginf=0.0)
        d = j @ e
        d = np.where(d >= 0, d, 0.01 * d)
        with np.errstate(divide='ignore', invalid='ignore'):
            g = np.where(d != 0, e / d, 0.0)
        hat = e * g
        hat_sum = hat.sum(axis=0, keepdims=True)
        y_norm = (np.log(n) - np.log(cls_prob)) * cls_prob
        norm = np.clip(hat_sum / y_norm, 0, 1)
        cwn = norm * (1 - labels_oh)
        return 1 - cwn, cwn

    def test_matches_numpy(self):
        rng = np.random.RandomState(7)
        R, C = 32, 20
        alpha_cls = rng.dirichlet(np.ones(C), R).astype(np.float32)
        alpha_det = rng.dirichlet(np.ones(R), C).T.astype(np.float32)
        rois_pred = alpha_cls * alpha_det
        cls_prob = rois_pred.sum(axis=0, keepdims=True)
        x1 = rng.uniform(0, 100, R)
        y1 = rng.uniform(0, 100, R)
        rois = np.stack([np.zeros(R), x1, y1, x1 + rng.uniform(5, 60, R),
                         y1 + rng.uniform(5, 60, R)], axis=1).astype(np.float32)
        labels_oh = np.zeros((1, C), np.float32)
        labels_oh[0, [2, 5]] = 1
        cw, cwn = spatial_entropy_weights(
            jnp.array(rois_pred), jnp.array(cls_prob), jnp.array(rois),
            jnp.array(labels_oh))
        w_cw, w_cwn = self._np_reference(rois_pred.astype(np.float64),
                                         cls_prob.astype(np.float64),
                                         rois, labels_oh)
        np.testing.assert_allclose(np.asarray(cw), w_cw, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cwn), w_cwn, rtol=1e-4, atol=1e-5)
        # complementarity and gt-class protection
        np.testing.assert_allclose(np.asarray(cw) + np.asarray(cwn), 1.0)
        assert np.asarray(cwn)[0, 2] == 0.0 and np.asarray(cwn)[0, 5] == 0.0

    def test_padding_invariance(self):
        """Weights with padded rois must equal weights on the unpadded set."""
        rng = np.random.RandomState(8)
        R, C, PAD = 24, 10, 40
        alpha_cls = rng.dirichlet(np.ones(C), R).astype(np.float32)
        alpha_det = rng.dirichlet(np.ones(R), C).T.astype(np.float32)
        rois_pred = alpha_cls * alpha_det
        cls_prob = rois_pred.sum(axis=0, keepdims=True)
        x1 = rng.uniform(0, 100, R)
        y1 = rng.uniform(0, 100, R)
        rois = np.stack([np.zeros(R), x1, y1, x1 + rng.uniform(5, 60, R),
                         y1 + rng.uniform(5, 60, R)], axis=1).astype(np.float32)
        labels_oh = np.zeros((1, C), np.float32)
        labels_oh[0, 1] = 1

        cw0, cwn0 = spatial_entropy_weights(
            jnp.array(rois_pred), jnp.array(cls_prob), jnp.array(rois),
            jnp.array(labels_oh))

        rois_pad = np.concatenate([rois, np.zeros((PAD, 5), np.float32)])
        pred_pad = np.concatenate([rois_pred, np.zeros((PAD, C), np.float32)])
        mask = np.concatenate([np.ones(R), np.zeros(PAD)]).astype(bool)
        cw1, cwn1 = spatial_entropy_weights(
            jnp.array(pred_pad), jnp.array(cls_prob), jnp.array(rois_pad),
            jnp.array(labels_oh), valid_mask=jnp.array(mask))
        np.testing.assert_allclose(np.asarray(cw1), np.asarray(cw0),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(cwn1), np.asarray(cwn0),
                                   rtol=1e-5, atol=1e-6)

"""CPG/CSC tests: integral-image ring scores vs a numpy port of
csc_op.cu:CSCPool, per-class normalization, constraint polarity, and the
model-level CSC loss path (jax.grad replaces the reference's nested
backward-only net)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nafwebsod_tpu.models import detector
from nafwebsod_tpu.ops import cpg as cpg_ops


def _np_csc_scores(cpg_map, rois, fg, ctx_scale=1.8):
    h, w = cpg_map.shape
    binary = (cpg_map >= fg).astype(np.float64)
    ii = binary.cumsum(0).cumsum(1)

    def rect(y0, x0, y1, x1):
        a1 = ii[min(y1, h - 1), min(x1, w - 1)]
        a2 = ii[min(y1, h - 1), x0 - 1] if x0 - 1 >= 0 else 0
        a3 = ii[y0 - 1, min(x1, w - 1)] if y0 - 1 >= 0 else 0
        a4 = ii[y0 - 1, x0 - 1] if (x0 - 1 >= 0 and y0 - 1 >= 0) else 0
        return a1 - a2 - a3 + a4

    out = []
    for roi in rois:
        ws, hs, we, he = [int(round(v)) for v in roi[1:5]]
        if not (ws >= 0 and hs >= 0 and ws < we and hs < he and
                we < w and he < h):
            out.append(cpg_ops.KMIN_SCORE)
            continue
        wr, hr = we - ws, he - hs
        wc, hc = (we + ws) / 2.0, (he + hs) / 2.0
        wi, hi = wr / ctx_scale, hr / ctx_scale
        wo, ho = wr * ctx_scale, hr * ctx_scale
        wsi, hsi = int(round(wc - wi / 2)), int(round(hc - hi / 2))
        wei, hei = int(round(wc + wi / 2)), int(round(hc + hi / 2))
        wso, hso = int(round(max(wc - wo / 2, 0))), int(round(max(hc - ho / 2, 0)))
        weo = int(round(min(wc + wo / 2, w - 1)))
        heo = int(round(min(hc + ho / 2, h - 1)))
        area = (he - hs + 1) * (we - ws + 1)
        area_i = (hei - hsi + 1) * (wei - wsi + 1)
        area_o = (heo - hso + 1) * (weo - wso + 1)
        af = max(area - area_i, 1)
        ac = max(area_o - area, 1)
        s_roi = rect(hs, ws, he, we)
        s_in = rect(hsi, wsi, hei, wei)
        s_out = rect(hso, wso, heo, weo)
        out.append((s_roi - s_in) / np.sqrt(af) - (s_out - s_roi) / np.sqrt(ac))
    return np.array(out, np.float32)


class TestCSCScores:
    def test_matches_numpy(self):
        rng = np.random.RandomState(0)
        H, W = 40, 48
        cpg_map = rng.rand(H, W).astype(np.float32)
        rois = np.array([
            [0, 5, 5, 30, 30],
            [0, 0, 0, 47, 39],    # malformed: we==W-1 ok but he==39<h ok
            [0, 10, 12, 46, 38],
            [0, -2, 3, 20, 20],   # malformed: negative start
            [0, 20, 20, 47, 39],
        ], np.float32)
        got = np.asarray(cpg_ops.csc_scores_one_class(
            jnp.asarray(cpg_map), jnp.asarray(rois), 0.5))
        expect = _np_csc_scores(cpg_map, rois, 0.5)
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)
        assert got[3] == cpg_ops.KMIN_SCORE

    def test_normalize_class(self):
        s = jnp.asarray([2.0, -4.0, 1.0, cpg_ops.KMIN_SCORE])
        n = np.asarray(cpg_ops._normalize_class(s))
        np.testing.assert_allclose(n, [1.0, -1.0, 0.5, -1.0], rtol=1e-6)
        # all-nonpositive -> all ones (csc_op.cu:443-447)
        s2 = jnp.asarray([-1.0, -2.0, 0.0])
        # max_v == 0 -> fall through to ones
        np.testing.assert_allclose(np.asarray(cpg_ops._normalize_class(s2)),
                                   [1.0, 1.0, 1.0])

    def test_constraint_polarity(self):
        rp = jnp.asarray(np.ones((3, 2), np.float32))
        w = jnp.asarray(np.array([[0.5, -0.25], [1.0, 0.0], [-1.0, 2.0]],
                                 np.float32))
        pos = np.asarray(cpg_ops.csc_constraint(rp, w, True))
        neg = np.asarray(cpg_ops.csc_constraint(rp, w, False))
        np.testing.assert_allclose(pos, [[0.5, 0], [1, 0], [0, 2]])
        np.testing.assert_allclose(neg, [[0, 0.25], [0, 0], [1, 0]])


class TestCSCIntegration:
    def _batch(self, cur_iter=0.0):
        rng = np.random.RandomState(0)
        R = 8
        x1 = rng.uniform(0, 20, R)
        y1 = rng.uniform(0, 20, R)
        labels = np.zeros((1, 4), np.float32)
        labels[0, [0, 2]] = 1
        return {
            'image': jnp.asarray(rng.randn(1, 48, 48, 3).astype(np.float32)),
            'rois': jnp.asarray(np.stack(
                [np.zeros(R), x1, y1, x1 + 15, y1 + 15], 1).astype(
                    np.float32)),
            'obn_scores': jnp.asarray(rng.rand(R, 1).astype(np.float32)),
            'labels_oh': jnp.asarray(labels),
            'valid_mask': jnp.ones((R,), bool),
            'cur_iter': jnp.asarray(cur_iter),
        }

    def test_forward_train_csc(self):
        spec = detector.ModelSpec(
            num_classes=5, hidden_dim=16, webly_on=False,
            webly_entropy=False, box_head='vgg16_2fc', csc=True,
            cpg_tau=0.0)
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        total, aux = detector.forward_train(spec, params, self._batch(),
                                            jax.random.PRNGKey(1))
        assert np.isfinite(float(total))
        assert 'loss_cls_pos' in aux and 'loss_cls_neg' in aux

        # grads reach the head through the constrained path
        grads = jax.grad(lambda p: detector.forward_train(
            spec, p, self._batch(), jax.random.PRNGKey(1))[0])(params)
        assert float(jnp.abs(grads['fc8c_w']).max()) > 0

    def test_past_max_iter_reduces_to_plain_ce(self):
        from nafwebsod_tpu.ops import losses as loss_ops
        spec = detector.ModelSpec(
            num_classes=5, hidden_dim=16, webly_on=False,
            webly_entropy=False, box_head='vgg16_2fc', csc=True,
            csc_max_iter=100)
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        batch = self._batch(cur_iter=1000.0)
        total, aux = detector.forward_train(spec, params, batch,
                                            jax.random.PRNGKey(1))
        # W == 1 -> pos branch is the plain CE; neg contributes ~0
        assert float(aux['loss_cls_neg']) == pytest.approx(0.0, abs=1e-6)
        spec_plain = detector.ModelSpec(
            num_classes=5, hidden_dim=16, webly_on=False,
            webly_entropy=False, box_head='vgg16_2fc')
        total_plain, aux_plain = detector.forward_train(
            spec_plain, params, batch, jax.random.PRNGKey(1))
        assert float(aux['loss_cls_pos']) == pytest.approx(
            float(aux_plain['loss_cls']), rel=1e-5)


class TestCSCWeightsScatter:
    def test_class_zero_not_clobbered_by_padding(self):
        """Padded class_idx slots (-1) must not alias foreground class 0:
        the old maximum(ci, 0) scatter overwrote class 0's blended weights
        with the padding's 1.0 (round-4 review finding, reproduced)."""
        rng = np.random.RandomState(0)
        R, C, max_gt = 8, 4, 4
        # concentrated saliency blob: the aligned roi scores POSITIVE
        # (frame density >> context ring), so _normalize_class leaves the
        # all-ones fallback and produces real per-roi weights
        m0 = np.zeros((48, 48), np.float32)
        m0[8:28, 8:28] = 1.0
        maps = jnp.asarray(np.stack([m0] * max_gt))
        rois = np.stack([np.zeros(R),
                         rng.uniform(0, 20, R), rng.uniform(0, 20, R),
                         rng.uniform(24, 46, R), rng.uniform(24, 46, R)],
                        1).astype(np.float32)
        rois[0] = [0, 8, 8, 27, 27]  # aligned with the blob
        labels = np.zeros((1, C), np.float32)
        labels[0, 0] = 1  # ONLY gt class 0
        cls_prob = jnp.asarray(np.full((1, C), 0.9, np.float32))
        class_idx = jnp.asarray(np.array([0, -1, -1, -1], np.int32))
        class_keep = jnp.asarray(np.array([True, False, False, False]))

        w, _, _ = cpg_ops.csc_weights(
            maps, class_idx, class_keep, jnp.asarray(rois),
            jnp.asarray(labels), cls_prob)
        w = np.asarray(w)
        # class 0 must carry REAL blended weights, not the padding's 1.0
        assert not np.allclose(w[:, 0], 1.0)
        # untouched classes stay at the default 1.0
        np.testing.assert_allclose(w[:, 1:], 1.0)

        # and the weights must equal the single-class computation
        raw = cpg_ops.csc_scores_one_class(maps[0], jnp.asarray(rois),
                                           0.1, 1.8)
        norm = cpg_ops._normalize_class(raw)
        want = 0.9 * np.asarray(norm) + 0.1
        np.testing.assert_allclose(w[:, 0], want, rtol=1e-6)

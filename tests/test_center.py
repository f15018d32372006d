"""Center-loss tests: forward value / feature gradient vs a numpy port of
center_loss_op.cu, the periodic center-update rule, and model integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nafwebsod_tpu.models import detector
from nafwebsod_tpu.ops import center
from nafwebsod_tpu.parallel import mesh as mesh_lib
from nafwebsod_tpu.parallel import train_step as ts
from nafwebsod_tpu.solver import sgd


def _case(seed=0, R=12, C1=4, M=3, D=6, K=2):
    rng = np.random.RandomState(seed)
    labels = np.zeros((1, C1 - 1), np.float32)
    labels[0, [0, 2]] = 1
    rois_pred = rng.rand(R, C1 - 1).astype(np.float32)
    feats = rng.randn(R, D).astype(np.float32)
    cf = rng.randn(C1 - 1, M, D).astype(np.float32)
    return labels, rois_pred, feats, cf, K


class TestCenterLoss:
    def test_forward_matches_numpy(self):
        labels, rois_pred, feats, cf, K = _case()
        loss, deltas = center.center_loss(
            jnp.asarray(labels), jnp.asarray(rois_pred), jnp.asarray(feats),
            jnp.asarray(cf), K)

        # numpy port (center_loss_op.cu:118-244)
        Cm1, M, D = cf.shape
        dot, num_gt = 0.0, 0
        for c in range(Cm1):
            if labels[0, c] < 0.5:
                continue
            num_gt += 1
            order = np.argsort(-rois_pred[:, c], kind='stable')[:K]
            dmin = np.inf
            for m in range(M):
                dm = sum(np.sum((feats[r] - cf[c, m]) ** 2) for r in order)
                dmin = min(dmin, dm)
            dot += dmin
        expect = dot / num_gt / K / D / 2
        assert float(loss) == pytest.approx(expect, rel=1e-5)

    def test_feature_gradient(self):
        """Autodiff must give dF_rk = g * D_ck / (num_gt*K*D)
        (center_loss_op.cu:515-527)."""
        labels, rois_pred, feats, cf, K = _case()

        grad = np.asarray(jax.grad(lambda f: center.center_loss(
            jnp.asarray(labels), jnp.asarray(rois_pred), f,
            jnp.asarray(cf), K)[0])(jnp.asarray(feats)))

        Cm1, M, D = cf.shape
        num_gt = int((labels[0] >= 0.5).sum())
        expect = np.zeros_like(feats)
        for c in range(Cm1):
            if labels[0, c] < 0.5:
                continue
            order = np.argsort(-rois_pred[:, c], kind='stable')[:K]
            dists = [sum(np.sum((feats[r] - cf[c, m]) ** 2) for r in order)
                     for m in range(M)]
            m_star = int(np.argmin(dists))
            for r in order:
                expect[r] += (feats[r] - cf[c, m_star]) / (num_gt * K * D)
        np.testing.assert_allclose(grad, expect, rtol=1e-4, atol=1e-6)

    def test_center_update_rule(self):
        labels, rois_pred, feats, cf, K = _case()
        _, deltas = center.center_loss(
            jnp.asarray(labels), jnp.asarray(rois_pred), jnp.asarray(feats),
            jnp.asarray(cf), K)
        accum = {'center_dcf': jnp.zeros_like(jnp.asarray(cf)),
                 'center_ndcf': jnp.zeros(cf.shape[:2], jnp.float32)}
        # not an update iteration: centers unchanged, accumulators grow
        cf1, accum1 = center.center_update(jnp.asarray(cf), accum, deltas,
                                           jnp.int32(1), K, update=4)
        np.testing.assert_array_equal(np.asarray(cf1), cf)
        assert float(jnp.abs(accum1['center_dcf']).max()) > 0
        # update iteration: CF -= lr * dcf / (ndcf*K + 1); accum resets
        cf2, accum2 = center.center_update(cf1, accum1, deltas,
                                           jnp.int32(4), K, update=4, lr=0.5)
        dcf = np.asarray(accum1['center_dcf']) + np.asarray(
            deltas['center_dcf'])
        ndcf = np.asarray(accum1['center_ndcf']) + np.asarray(
            deltas['center_ndcf'])
        expect = cf - 0.5 * dcf / (ndcf * K + 1)[:, :, None]
        np.testing.assert_allclose(np.asarray(cf2), expect, rtol=1e-5)
        assert float(jnp.abs(accum2['center_dcf']).max()) == 0


class TestCenterIntegration:
    def test_train_step_moves_centers(self):
        spec = detector.ModelSpec(
            num_classes=5, hidden_dim=16, webly_on=False,
            webly_entropy=False, box_head='vgg16_2fc', center_loss=True,
            center_loss_number=3, center_loss_top_k=2)
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        assert params['center_feature'].shape == (4, 3, 16)

        hp = sgd.SGDHyperParams(iter_size=1)
        trainable = detector.trainable_param_names(spec, params)
        assert 'center_feature' not in trainable
        mults = sgd.freeze_mults(sgd.param_multipliers(params, trainable))
        state = sgd.init_state(params, hp)
        state['center_dcf'] = jnp.zeros_like(params['center_feature'])
        state['center_ndcf'] = jnp.zeros((4, 3), jnp.float32)

        step = ts.make_train_step(spec, hp, mults, mesh_lib.make_mesh(1),
                                  donate=False, center_update_period=2)
        rng = np.random.RandomState(0)
        R = 8
        x1 = rng.uniform(0, 30, R)
        y1 = rng.uniform(0, 30, R)
        blob = {
            'data': rng.randn(1, 48, 48, 3).astype(np.float32),
            'rois': np.stack([np.zeros(R), x1, y1, x1 + 10, y1 + 10],
                             1).astype(np.float32),
            'obn_scores': rng.rand(R, 1).astype(np.float32),
            'labels_oh': np.array([[1, 0, 1, 0]], np.float32),
            'valid_mask': np.ones(R, bool),
        }
        batch = ts.stack_minibatches([blob], size_bucket=16)
        cf0 = np.asarray(params['center_feature'])
        rngs = ts.device_rngs(jax.random.PRNGKey(1), 1)
        # step 1: accumulate only
        params, state, loss, aux = step(params, state, batch,
                                        np.float32(1e-5), rngs)
        assert 'loss_center' in aux and np.isfinite(float(loss))
        np.testing.assert_array_equal(np.asarray(params['center_feature']),
                                      cf0)
        # step 2 (period 2): centers move
        params, state, loss, aux = step(params, state, batch,
                                        np.float32(1e-5), rngs)
        assert not np.allclose(np.asarray(params['center_feature']), cf0)

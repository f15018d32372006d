"""Solver tests: Caffe-style ACM SGD semantics vs a numpy reference
(acm_weightdecay_momentum_sgd_op.h:33-127, optimizer_wsl.py:75-137) and the
LR policy schedules (lr_policy.py:28-131)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nafwebsod_tpu.core.config import cfg, reset_cfg
from nafwebsod_tpu.solver import sgd
from nafwebsod_tpu.utils import lr_policy


def _params():
    rng = np.random.RandomState(0)
    return {
        'fc_w': jnp.array(rng.randn(4, 3).astype(np.float32)),
        'fc_b': jnp.array(rng.randn(3).astype(np.float32)),
        'conv1_1_w': jnp.array(rng.randn(2, 2).astype(np.float32)),
    }


def _grads(seed=1):
    rng = np.random.RandomState(seed)
    return {
        'fc_w': jnp.array(rng.randn(4, 3).astype(np.float32)),
        'fc_b': jnp.array(rng.randn(3).astype(np.float32)),
        'conv1_1_w': jnp.array(rng.randn(2, 2).astype(np.float32)),
    }


HP = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)


class TestMultipliers:
    def test_bias_and_lrm10(self):
        m = sgd.param_multipliers(['fc_w', 'fc_b', 'x_lrm10_w', '_lrm10_y_b'])
        assert m['fc_w'] == (1.0, 1.0)
        assert m['fc_b'] == (2.0, 0.0)        # bias: 2x lr, no decay
        assert m['x_lrm10_w'] == (10.0, 1.0)  # _lrm10_ infix: 10x lr
        assert m['_lrm10_y_b'] == (20.0, 0.0)

    def test_frozen_excluded(self):
        m = sgd.param_multipliers(['fc_w', 'conv1_1_w'], trainable={'fc_w'})
        assert m['conv1_1_w'] == (0.0, 0.0)


class TestCaffeMomentum:
    def test_two_steps_vs_numpy(self):
        params = _params()
        mults = sgd.freeze_mults(sgd.param_multipliers(params))
        state = sgd.init_state(params, HP)
        lr = 0.01

        ref_p = {k: np.asarray(v).copy() for k, v in params.items()}
        ref_v = {k: np.zeros_like(np.asarray(v)) for k, v in params.items()}
        for seed in (1, 2):
            g = _grads(seed)
            params, state = sgd.update(params, g, state, lr, HP, mults)
            for name in ref_p:
                lr_mult = 2.0 if name.endswith('_b') else 1.0
                wd = 0.0 if name.endswith('_b') else HP.weight_decay
                gg = np.asarray(g[name]) + wd * ref_p[name]
                # Caffe: v = mu*v + lr*lr_mult*g; p -= v (NOT p -= lr*v)
                ref_v[name] = HP.momentum * ref_v[name] + lr * lr_mult * gg
                ref_p[name] = ref_p[name] - ref_v[name]
        for name in ref_p:
            np.testing.assert_allclose(np.asarray(params[name]), ref_p[name],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(state['momentum'][name]),
                                       ref_v[name], rtol=1e-5, atol=1e-6)

    def test_frozen_param_untouched_even_by_decay(self):
        params = _params()
        mults = sgd.freeze_mults(sgd.param_multipliers(
            params, trainable={'fc_w', 'fc_b'}))
        state = sgd.init_state(params, HP)
        before = np.asarray(params['conv1_1_w']).copy()
        params, state = sgd.update(params, _grads(), state, 0.1, HP, mults)
        np.testing.assert_array_equal(np.asarray(params['conv1_1_w']), before)


class TestIterSize:
    def test_accumulation_fires_every_k(self):
        hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0, iter_size=2)
        params = _params()
        mults = sgd.freeze_mults(sgd.param_multipliers(params))
        state = sgd.init_state(params, hp)
        p0 = {k: np.asarray(v).copy() for k, v in params.items()}
        g1, g2 = _grads(1), _grads(2)

        params, state = sgd.update(params, g1, state, 0.01, hp, mults)
        for k in p0:  # micro-iter 1: no visible update
            np.testing.assert_array_equal(np.asarray(params[k]), p0[k])

        params, state = sgd.update(params, g2, state, 0.01, hp, mults)
        for k in p0:  # micro-iter 2: update with the mean gradient
            lr_mult = 2.0 if k.endswith('_b') else 1.0
            mean_g = (np.asarray(g1[k]) + np.asarray(g2[k])) / 2.0
            expect = p0[k] - 0.01 * lr_mult * mean_g
            np.testing.assert_allclose(np.asarray(params[k]), expect,
                                       rtol=1e-5, atol=1e-6)
        # accumulator reset after firing
        assert float(jnp.abs(state['grad_acc']['fc_w']).max()) == 0.0


class TestMomentumCorrection:
    def test_scale(self):
        params = _params()
        state = sgd.init_state(params, HP)
        state['momentum'] = {k: jnp.ones_like(v) for k, v in params.items()}
        state = sgd.scale_momentum(state, np.float32(0.1))
        assert np.allclose(np.asarray(state['momentum']['fc_w']), 0.1)

    def test_scale_passes_non_float_buffers_through(self):
        """An integer buffer must not be scaled-and-truncated (mirrors the
        init_state _buf dtype guard; ADVICE r4)."""
        params = _params()
        state = sgd.init_state(params, HP)
        state['momentum'] = dict(state['momentum'])
        state['momentum']['counter'] = jnp.asarray([3, 7], jnp.int32)
        state = sgd.scale_momentum(state, np.float32(0.1))
        out = np.asarray(state['momentum']['counter'])
        assert out.dtype == np.int32
        np.testing.assert_array_equal(out, [3, 7])

    def test_band_logic(self):
        reset_cfg()
        # inside the 1.1 band -> no correction; outside -> ratio
        assert sgd.momentum_correction_factor(cfg, 0.00105, 0.001) is None
        assert sgd.momentum_correction_factor(cfg, 0.0001, 0.001) == pytest.approx(0.1)
        assert sgd.momentum_correction_factor(cfg, 0.01, 0.001) == pytest.approx(10.0)


class TestLRPolicy:
    def setup_method(self, _):
        reset_cfg()
        cfg.SOLVER.LR_POLICY = 'steps_with_decay'
        cfg.SOLVER.BASE_LR = 0.001
        cfg.SOLVER.GAMMA = 0.1
        cfg.SOLVER.STEPS = [0, 150000]
        cfg.SOLVER.MAX_ITER = 200000
        cfg.SOLVER.WARM_UP_ITERS = 500
        cfg.SOLVER.WARM_UP_FACTOR = 1.0 / 3.0

    def teardown_method(self, _):
        reset_cfg()

    def test_flagship_schedule(self):
        # warmup start: factor 1/3
        assert lr_policy.get_lr_at_iter(0) == pytest.approx(0.001 / 3.0)
        # post warmup flat
        assert lr_policy.get_lr_at_iter(1000) == pytest.approx(0.001)
        # after the 150k step: x0.1
        assert lr_policy.get_lr_at_iter(150000) == pytest.approx(0.0001)
        assert lr_policy.get_lr_at_iter(199999) == pytest.approx(0.0001)

    def test_warmup_linear(self):
        lr250 = lr_policy.get_lr_at_iter(250)
        expect = 0.001 * ((1.0 / 3.0) * 0.5 + 0.5)
        assert lr250 == pytest.approx(expect)

    def test_steps_with_lrs(self):
        cfg.SOLVER.LR_POLICY = 'steps_with_lrs'
        cfg.SOLVER.STEPS = [0, 100, 200]
        cfg.SOLVER.LRS = [0.01, 0.001, 0.0001]
        cfg.SOLVER.WARM_UP_ITERS = 0
        assert lr_policy.get_lr_at_iter(50) == pytest.approx(0.01)
        assert lr_policy.get_lr_at_iter(150) == pytest.approx(0.001)
        assert lr_policy.get_lr_at_iter(250) == pytest.approx(0.0001)

    def test_cosine_decay(self):
        # reference policy names and formulas (lr_policy.py:96-110):
        # cosine_decay = BASE_LR * 0.5 * (cos(pi * iter/MAX_ITER) + 1)
        cfg.SOLVER.LR_POLICY = 'cosine_decay'
        cfg.SOLVER.WARM_UP_ITERS = 0
        assert lr_policy.get_lr_at_iter(0) == pytest.approx(0.001)
        assert lr_policy.get_lr_at_iter(100000) == pytest.approx(0.0005)
        assert lr_policy.get_lr_at_iter(200000) == pytest.approx(0.0, abs=1e-12)

    def test_exp_decay(self):
        # exp_decay = BASE_LR * GAMMA ** (iter/MAX_ITER); GAMMA is the
        # final/initial LR ratio
        cfg.SOLVER.LR_POLICY = 'exp_decay'
        cfg.SOLVER.WARM_UP_ITERS = 0
        assert lr_policy.get_lr_at_iter(0) == pytest.approx(0.001)
        assert lr_policy.get_lr_at_iter(100000) == pytest.approx(0.001 * 0.1 ** 0.5)
        assert lr_policy.get_lr_at_iter(200000) == pytest.approx(0.0001)

    def test_unknown_policy_raises(self):
        cfg.SOLVER.LR_POLICY = 'cosine'  # pre-round-4 non-reference name
        with pytest.raises(NotImplementedError):
            lr_policy.get_lr_at_iter(0)

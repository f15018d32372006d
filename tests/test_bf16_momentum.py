"""TPU.BF16_MOMENTUM: bf16-stored momentum buffers (opt-in).

The Caffe-momentum update (acm_weightdecay_momentum_sgd_op.h:33-127) is
HBM-bound at flagship shapes; storing the buffers in bf16 halves their
read+write traffic. The update math stays fp32 — the buffer is upcast
before the multiply and the fresh ``v`` is rounded once on store — so the
ONLY deviation from the reference op is that one rounding per step
(documented in PARITY.md, default off). On-disk checkpoints carry fp32
momentum in the reference pkl schema either way.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nafwebsod_tpu.solver import sgd


def _setup(momentum_dtype, iter_size=1, seed=0):
    rng = np.random.RandomState(seed)
    params = {
        'fc_w': jnp.asarray(rng.randn(16, 8), jnp.float32),
        'fc_b': jnp.asarray(rng.randn(8), jnp.float32),
    }
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005,
                            iter_size=iter_size,
                            momentum_dtype=momentum_dtype)
    mults = sgd.freeze_mults(sgd.param_multipliers(params))
    state = sgd.init_state(params, hp)
    return params, hp, mults, state


def _grads(seed):
    rng = np.random.RandomState(100 + seed)
    return {'fc_w': jnp.asarray(rng.randn(16, 8) * 0.1, jnp.float32),
            'fc_b': jnp.asarray(rng.randn(8) * 0.1, jnp.float32)}


@pytest.mark.smoke
class TestBf16Momentum:
    def test_buffers_stored_bf16_update_math_fp32(self):
        params, hp, mults, state = _setup('bfloat16')
        p32, hp32, _, s32 = _setup('float32')
        for step in range(3):
            params, state = sgd.update(params, _grads(step), state,
                                       jnp.float32(0.01), hp, mults)
            p32, s32 = sgd.update(p32, _grads(step), s32,
                                  jnp.float32(0.01), hp32, mults)
            for k, v in state['momentum'].items():
                assert v.dtype == jnp.bfloat16, k
        # drift is bounded by bf16 rounding of v (one rounding per store)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(params[k]), np.asarray(p32[k]),
                rtol=0, atol=3e-4, err_msg=k)

    def test_first_step_momentum_is_rounded_v(self):
        """Step 1 from zero momentum: v = lr*lr_mult*(g + wd*p) in fp32,
        stored as bf16(v) exactly."""
        params, hp, mults, state = _setup('bfloat16')
        g = _grads(0)
        new_p, new_s = sgd.update(params, g, state, jnp.float32(0.01),
                                  hp, mults)
        v = 0.01 * 1.0 * (np.asarray(g['fc_w']) +
                          0.0005 * np.asarray(params['fc_w']))
        np.testing.assert_array_equal(
            np.asarray(new_s['momentum']['fc_w']),
            v.astype(jnp.bfloat16))
        # the PARAM update used the unrounded fp32 v
        np.testing.assert_allclose(
            np.asarray(new_p['fc_w']),
            np.asarray(params['fc_w']) - v, rtol=1e-6)

    def test_float32_default_bit_identical_to_before(self):
        """momentum_dtype='float32' must be the reference formulation
        exactly (the astype calls are identities)."""
        params, hp, mults, state = _setup('float32')
        g = _grads(0)
        new_p, new_s = sgd.update(params, g, state, jnp.float32(0.01),
                                  hp, mults)
        v = 0.01 * (np.asarray(g['fc_w']) +
                    0.0005 * np.asarray(params['fc_w']))
        np.testing.assert_allclose(np.asarray(new_s['momentum']['fc_w']),
                                   v.astype(np.float32), rtol=1e-6)
        assert new_s['momentum']['fc_w'].dtype == jnp.float32

    def test_iter_size_accumulator_stays_fp32(self):
        params, hp, mults, state = _setup('bfloat16', iter_size=2)
        assert state['grad_acc']['fc_w'].dtype == jnp.float32
        for step in range(2):
            params, state = sgd.update(params, _grads(step), state,
                                       jnp.float32(0.01), hp, mults)
        assert state['momentum']['fc_w'].dtype == jnp.bfloat16
        assert float(jnp.abs(state['momentum']['fc_w']).sum()) > 0

    def test_scale_momentum_preserves_dtype(self):
        _, _, _, state = _setup('bfloat16')
        state['momentum'] = {k: v + 1 for k, v in state['momentum'].items()}
        scaled = sgd.scale_momentum(state, jnp.float32(0.1))
        for k, v in scaled['momentum'].items():
            assert v.dtype == jnp.bfloat16, k
            np.testing.assert_allclose(np.asarray(v, np.float32), 0.1,
                                       rtol=1e-2)


class TestEngineBf16Momentum:
    def test_checkpoint_fp32_and_resume(self, tmp_path):
        """Engine run with the knob: snapshots carry fp32 momentum in the
        reference schema; AUTO_RESUME rounds back into bf16 buffers."""
        from nafwebsod_tpu.core.config import cfg, reset_cfg
        from nafwebsod_tpu.engine import train as train_engine
        from nafwebsod_tpu.utils import checkpoint as ckpt

        import fixtures
        reset_cfg()
        try:
            info = fixtures.make_coco_dataset(str(tmp_path), n_images=4)
            fixtures.apply_tiny_webly_train_cfg(cfg, info,
                                                str(tmp_path / 'out'))
            cfg.TPU.BF16_MOMENTUM = True

            checkpoints, losses = train_engine.train_model(max_iters=2)
            assert all(np.isfinite(losses))
            blobs, _ = ckpt.load_weights_pkl(checkpoints['final'])
            moms = {k: v for k, v in blobs.items()
                    if k.endswith('_momentum')}
            assert moms, 'snapshot carries momentum blobs'
            for k, v in moms.items():
                assert np.asarray(v).dtype == np.float32, k
            # resume continues from the fp32 blobs
            cfg.TRAIN.AUTO_RESUME = True
            import os
            os.remove(checkpoints['final'])
            checkpoints, losses = train_engine.train_model(max_iters=4)
            assert all(np.isfinite(losses))
        finally:
            reset_cfg()

    def test_rejected_with_sharded_layouts(self, tmp_path):
        from nafwebsod_tpu.core.config import cfg, reset_cfg
        from nafwebsod_tpu.engine import train as train_engine
        reset_cfg()
        try:
            cfg.MODEL.NUM_CLASSES = 21
            cfg.MODEL.TYPE = 'generalized_wsl'
            cfg.MODEL.CONV_BODY = 'VGG16.add_VGG16_conv5_body_origin'
            cfg.FAST_RCNN.ROI_BOX_HEAD = (
                'webly_heads.add_VGG16_roi_2fc_noise_head')
            cfg.WSL.WSL_ON = True
            cfg.WEBLY.WEBLY_ON = True
            cfg.TPU.BF16_MOMENTUM = True
            cfg.TPU.ZERO_OPT = True
            cfg.OUTPUT_DIR = str(tmp_path)
            with pytest.raises(ValueError, match='BF16_MOMENTUM'):
                train_engine.train_model()
        finally:
            reset_cfg()

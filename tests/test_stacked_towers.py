"""TPU.STACKED_TOWERS: pre-stacked dual noise-aware fc towers.

The stacked layout (``fc6s_w`` (roi_dim, 2H) concat / ``fc7s_w`` (2, H, H)
stack, ``detector.stack_tower_params``) runs the clean+noisy towers as one
fused GEMM pair with zero per-step weight concat. It must be numerically
equivalent to the per-tower layout (same math, same dropout draws — the
stacked branch splits the tower keys exactly like ``heads._fc_tower``), and
the ON-DISK checkpoint schema must stay the reference per-tower pkl: the
engine splits at save and joins at load (webly_heads.py:463-502 is the
per-tower parity anchor).
"""

import numpy as np
import pytest

import jax

from nafwebsod_tpu.core.config import cfg, reset_cfg
from nafwebsod_tpu.models import detector
from nafwebsod_tpu.parallel import mesh as mesh_lib
from nafwebsod_tpu.parallel import train_step as ts
from nafwebsod_tpu.solver import sgd
from nafwebsod_tpu.utils import checkpoint as ckpt

import fixtures

SPEC = detector.ModelSpec(num_classes=21, hidden_dim=64,
                          compute_dtype='bfloat16')


class TestLayoutTransform:
    def test_roundtrip(self):
        rng = np.random.RandomState(0)
        tree = {
            'fc6_w': rng.randn(32, 8).astype(np.float32),
            '_[noisy]_fc6_w': rng.randn(32, 8).astype(np.float32),
            'fc6_b': rng.randn(8).astype(np.float32),
            '_[noisy]_fc6_b': rng.randn(8).astype(np.float32),
            'fc7_w': rng.randn(8, 8).astype(np.float32),
            '_[noisy]_fc7_w': rng.randn(8, 8).astype(np.float32),
            'fc7_b': rng.randn(8).astype(np.float32),
            '_[noisy]_fc7_b': rng.randn(8).astype(np.float32),
            'conv1_1_w': rng.randn(3, 3, 3, 4).astype(np.float32),
        }
        stacked = detector.stack_tower_params(tree)
        assert stacked['fc6s_w'].shape == (32, 16)
        assert stacked['fc6s_b'].shape == (16,)
        assert stacked['fc7s_w'].shape == (2, 8, 8)
        assert stacked['fc7s_b'].shape == (2, 8)
        assert 'fc6_w' not in stacked and 'conv1_1_w' in stacked
        np.testing.assert_array_equal(stacked['fc6s_w'][:, :8],
                                      tree['fc6_w'])
        np.testing.assert_array_equal(stacked['fc7s_w'][1],
                                      tree['_[noisy]_fc7_w'])
        back = detector.unstack_tower_params(stacked)
        assert set(back) == set(tree)
        for k in tree:
            np.testing.assert_array_equal(back[k], tree[k], err_msg=k)

    def test_partial_pairs_pass_through(self):
        tree = {'fc6_w': np.ones((4, 2), np.float32)}
        assert detector.stack_tower_params(tree) == tree

    def test_fill_missing_with_zeros(self):
        # a checkpoint whose noisy tower was shared-init aliased carries no
        # noisy momentum — stacking must treat it as zeros
        tree = {'fc6_w': np.ones((4, 2), np.float32)}
        stacked = detector.stack_tower_params(tree,
                                              fill_missing_with_zeros=True)
        assert stacked['fc6s_w'].shape == (4, 4)
        np.testing.assert_array_equal(stacked['fc6s_w'][:, 2:],
                                      np.zeros((4, 2)))


def _blob(seed, H=48, W=64, R=16):
    rng = np.random.RandomState(seed)
    x1 = rng.uniform(0, W - 20, R)
    y1 = rng.uniform(0, H - 20, R)
    labels = np.zeros((1, 20), np.float32)
    labels[0, rng.randint(0, 20, 2)] = 1
    return {
        'data': (rng.randn(1, H, W, 3) * 10).astype(np.float32),
        'rois': np.stack([np.zeros(R), x1, y1,
                          np.minimum(x1 + rng.uniform(8, 40, R), W - 1),
                          np.minimum(y1 + rng.uniform(8, 40, R), H - 1)],
                         1).astype(np.float32),
        'obn_scores': rng.uniform(0.5, 1.5, (R, 1)).astype(np.float32),
        'labels_oh': labels,
        'valid_mask': np.ones(R, bool),
    }


def _run_steps(spec, stacked, n_steps=3, n_dev=2, iter_size=1):
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    if stacked:
        params = detector.stack_tower_params(params)
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005,
                            iter_size=iter_size)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    if stacked:
        # stacked names keep the suffix-driven multipliers of the towers
        assert mults['fc6s_w'] == (1.0, 1.0)
        assert mults['fc6s_b'] == (2.0, 0.0)
    mults = sgd.freeze_mults(mults)
    state = sgd.init_state(params, hp)
    m = mesh_lib.make_mesh(n_dev)
    step = ts.make_train_step(spec, hp, mults, m, donate=False)
    batch = ts.stack_minibatches([_blob(i) for i in range(n_dev)],
                                 size_bucket=16)
    rngs = ts.device_rngs(jax.random.PRNGKey(1), n_dev)
    losses = []
    for _ in range(n_steps):
        params, state, loss, _ = step(params, state, batch,
                                      np.float32(0.001), rngs)
        losses.append(float(loss))
    if stacked:
        params = detector.unstack_tower_params(
            {k: np.asarray(v) for k, v in params.items()})
        state = dict(state)
        state['momentum'] = detector.unstack_tower_params(
            {k: np.asarray(v) for k, v in state['momentum'].items()})
    return params, state, losses


@pytest.mark.smoke
class TestStepParity:
    def test_three_steps_match_per_tower_layout(self):
        p_plain, s_plain, l_plain = _run_steps(SPEC, stacked=False)
        p_st, s_st, l_st = _run_steps(SPEC, stacked=True)
        np.testing.assert_allclose(l_plain, l_st, rtol=2e-5)
        assert set(p_plain) == set(p_st)
        for k in p_plain:
            np.testing.assert_allclose(
                np.asarray(p_plain[k]), np.asarray(p_st[k]),
                rtol=1e-4, atol=1e-6, err_msg=k)
        for k in s_plain['momentum']:
            np.testing.assert_allclose(
                np.asarray(s_plain['momentum'][k]),
                np.asarray(s_st['momentum'][k]),
                rtol=1e-4, atol=1e-7, err_msg=k)


@pytest.fixture()
def stacked_train_cfg(tmp_path):
    reset_cfg()
    info = fixtures.make_coco_dataset(str(tmp_path), n_images=4)
    fixtures.apply_tiny_webly_train_cfg(cfg, info, str(tmp_path / 'out'))
    cfg.TRAIN.SNAPSHOT_ITERS = 2
    cfg.TPU.STACKED_TOWERS = True
    yield info
    reset_cfg()


class TestEngineCheckpointSchema:
    def test_on_disk_schema_is_per_tower(self, stacked_train_cfg):
        from nafwebsod_tpu.engine import train as train_engine
        checkpoints, losses = train_engine.train_model()
        assert all(np.isfinite(losses))
        blobs, saved_cfg = ckpt.load_weights_pkl(checkpoints['final'])
        names = {ckpt.unscope_name(k) for k in blobs}
        # the reference per-tower blob names, never the stacked leaves
        for req in ('fc6_w', '_[noisy]_fc6_w', 'fc7_b', '_[noisy]_fc7_b',
                    'fc6_w_momentum', '_[noisy]_fc6_w_momentum'):
            assert req in names, req
        assert not any(n.startswith('fc6s_') or n.startswith('fc7s_')
                       for n in names)

    def test_resume_roundtrip(self, stacked_train_cfg):
        """AUTO_RESUME joins the per-tower snapshot back into the stacked
        layout (incl. momentum) and keeps training."""
        from nafwebsod_tpu.core.config import cfg as _cfg
        from nafwebsod_tpu.engine import train as train_engine
        train_engine.train_model(max_iters=2)
        _cfg.TRAIN.AUTO_RESUME = True
        checkpoints, losses = train_engine.train_model(max_iters=4)
        assert all(np.isfinite(losses))
        assert 'final' in checkpoints

    def test_tensor_sharding_rejected(self, stacked_train_cfg):
        from nafwebsod_tpu.core.config import cfg as _cfg
        from nafwebsod_tpu.engine import train as train_engine
        # m=1 is truthy in the step dispatch and must be rejected too
        _cfg.TPU.TENSOR_SHARDING = 1
        with pytest.raises(ValueError, match='STACKED_TOWERS'):
            train_engine.train_model()

    def test_fpn_body_rejected(self, stacked_train_cfg):
        """The FPN head path consumes per-tower names (_fpn_head_tower ->
        heads._fc_tower), so STACKED_TOWERS must refuse FPN bodies."""
        from nafwebsod_tpu.core.config import cfg as _cfg
        from nafwebsod_tpu.engine import train as train_engine
        _cfg.MODEL.CONV_BODY = 'FPN.add_fpn_ResNet18_conv5_body'
        _cfg.FPN.FPN_ON = True
        _cfg.FPN.DIM = 16
        with pytest.raises(ValueError, match='STACKED_TOWERS'):
            train_engine.train_model()

    def test_zero_and_roi_sharding_rejected(self, stacked_train_cfg):
        """STACKED_TOWERS is plain-DP only (PARITY.md): the ZeRO and
        RoI-sharded combinations are unvalidated and must be refused, not
        silently accepted (ADVICE r4)."""
        from nafwebsod_tpu.core.config import cfg as _cfg
        from nafwebsod_tpu.engine import train as train_engine
        _cfg.TPU.ZERO_OPT = True
        with pytest.raises(ValueError, match='STACKED_TOWERS'):
            train_engine.train_model()
        _cfg.TPU.ZERO_OPT = False
        _cfg.TPU.ROI_SHARDING = True
        with pytest.raises(ValueError, match='STACKED_TOWERS'):
            train_engine.train_model()

"""TPU.SHADOW_BF16 pre-cast shadow weights (parallel/train_step.init_shadow).

The shadow path must be numerically IDENTICAL to the plain path: every
shadowed leaf is consumed via ``w.astype(x.dtype)`` in the forward (a no-op
once pre-cast) and its gradient arrives in bf16 either way (via the cast VJP
on the plain path, directly on the shadow path) before the fp32 convert the
solver consumes.
"""

import numpy as np

import jax
import jax.numpy as jnp

from nafwebsod_tpu.models import detector
from nafwebsod_tpu.parallel import mesh as mesh_lib
from nafwebsod_tpu.parallel import train_step as ts
from nafwebsod_tpu.solver import sgd

SPEC = detector.ModelSpec(num_classes=21, hidden_dim=64,
                          compute_dtype='bfloat16')


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


def _run_steps(spec, use_shadow, fused_grads, n_steps=2, n_dev=2,
               iter_size=1):
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005,
                            iter_size=iter_size)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.freeze_mults(sgd.param_multipliers(params, trainable))
    state = sgd.init_state(params, hp)
    if use_shadow:
        shadow = ts.init_shadow(spec, params)
        assert shadow, 'flagship bf16 spec must yield shadow leaves'
        state['shadow'] = shadow
    m = mesh_lib.make_mesh(n_dev)
    step = ts.make_train_step(spec, hp, mults, m, donate=False,
                              fused_grads=fused_grads)
    batch = ts.stack_minibatches([_blob(i) for i in range(n_dev)],
                                 size_bucket=16)
    rngs = ts.device_rngs(jax.random.PRNGKey(1), n_dev)
    losses = []
    for i in range(n_steps):
        params, state, loss, _ = step(params, state, batch,
                                      np.float32(0.001), rngs)
        losses.append(float(loss))
    return params, state, losses


class TestShadowNames:
    def test_flagship_names(self):
        params = detector.init_params(SPEC, jax.random.PRNGKey(0))
        names = detector.shadow_weight_names(SPEC, params)
        assert 'fc6_w' in names and '_[noisy]_fc7_w' in names
        assert 'conv5_3_w' in names
        # biases and logit layers are never shadowed (fc8 biases are added
        # in fp32 via out_dtype)
        assert 'fc6_b' not in names and 'fc8c_w' not in names

    def test_fp32_spec_has_none(self):
        spec = detector.ModelSpec(num_classes=21, hidden_dim=64)
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        assert detector.shadow_weight_names(spec, params) == frozenset()

    def test_non_flagship_body_has_none(self):
        spec = detector.ModelSpec(num_classes=21, hidden_dim=64,
                                  compute_dtype='bfloat16',
                                  conv_body='vgg_cnn_m_c5')
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        assert detector.shadow_weight_names(spec, params) == frozenset()


class TestShadowStepParity:
    def _assert_identical(self, fused_grads, iter_size=1):
        p_plain, s_plain, l_plain = _run_steps(
            SPEC, use_shadow=False, fused_grads=fused_grads,
            iter_size=iter_size)
        p_sh, s_sh, l_sh = _run_steps(
            SPEC, use_shadow=True, fused_grads=fused_grads,
            iter_size=iter_size)
        assert l_plain == l_sh
        for k in p_plain:
            np.testing.assert_array_equal(
                np.asarray(p_plain[k]), np.asarray(p_sh[k]), err_msg=k)
        # the carried shadow equals the fresh cast of the new masters
        for k, v in s_sh['shadow'].items():
            np.testing.assert_array_equal(
                np.asarray(v),
                np.asarray(p_sh[k].astype(jnp.bfloat16)), err_msg=k)

    def test_fused_allreduce_path(self):
        self._assert_identical(fused_grads=True)

    def test_per_leaf_path(self):
        self._assert_identical(fused_grads=False)

    def test_iter_size_accumulation(self):
        self._assert_identical(fused_grads=True, iter_size=2)

    def test_frozen_shadow_carried_not_recast(self):
        """Frozen conv-body shadows must be the SAME buffers across steps
        (carried through, not recomputed) while trainable fc shadows track
        the updated masters."""
        params = detector.init_params(SPEC, jax.random.PRNGKey(0))
        hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0,
                                iter_size=1)
        trainable = detector.trainable_param_names(SPEC, params)
        mults = sgd.freeze_mults(sgd.param_multipliers(params, trainable))
        state = sgd.init_state(params, hp)
        state['shadow'] = ts.init_shadow(SPEC, params)
        m = mesh_lib.make_mesh(1)
        step = ts.make_train_step(SPEC, hp, mults, m, donate=False)
        batch = ts.stack_minibatches([_blob(0)], size_bucket=16)
        rngs = ts.device_rngs(jax.random.PRNGKey(1), 1)
        sh0 = {k: np.asarray(v) for k, v in state['shadow'].items()}
        new_params, new_state, _, _ = step(params, state, batch,
                                           np.float32(0.01), rngs)
        np.testing.assert_array_equal(
            np.asarray(new_state['shadow']['conv1_1_w']), sh0['conv1_1_w'])
        assert not np.array_equal(
            np.asarray(new_state['shadow']['fc6_w']), sh0['fc6_w'])

    def test_multi_step_scan_carries_shadow(self):
        """TPU.STEPS_PER_CALL: the scan driver threads the shadow through
        the carry and matches K chained single steps exactly."""
        K, n_dev = 2, 2
        params = detector.init_params(SPEC, jax.random.PRNGKey(0))
        hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005,
                                iter_size=1)
        trainable = detector.trainable_param_names(SPEC, params)
        mults = sgd.freeze_mults(sgd.param_multipliers(params, trainable))
        state = sgd.init_state(params, hp)
        state['shadow'] = ts.init_shadow(SPEC, params)
        m = mesh_lib.make_mesh(n_dev)
        single = ts.make_train_step(SPEC, hp, mults, m, donate=False)
        multi = ts.make_multi_train_step(SPEC, hp, mults, m, donate=False)

        batch = ts.stack_minibatches([_blob(i) for i in range(n_dev)],
                                     size_bucket=16)
        rngs = ts.device_rngs(jax.random.PRNGKey(1), n_dev)
        batches = jax.tree.map(lambda x: np.stack([x] * K), batch)
        lrs = np.full((K,), 0.001, np.float32)
        factors = np.ones((K,), np.float32)
        rngsK = jnp.stack([rngs] * K)

        p1, s1 = params, state
        for _ in range(K):
            p1, s1, _, _ = single(p1, s1, batch, np.float32(0.001), rngs)
        pK, sK, _, _ = multi(params, state, batches, lrs, factors, rngsK)
        for k in p1:
            np.testing.assert_array_equal(
                np.asarray(p1[k]), np.asarray(pK[k]), err_msg=k)

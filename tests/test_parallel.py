"""Data-parallel training-step tests on the virtual 8-device CPU mesh
(SURVEY.md §4: multi-device testing without a cluster)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nafwebsod_tpu.models import detector
from nafwebsod_tpu.parallel import mesh as mesh_lib
from nafwebsod_tpu.parallel import train_step as ts
from nafwebsod_tpu.solver import sgd

# narrow head: full-width fc towers are too slow for the 1-core CPU CI box
SPEC = detector.ModelSpec(num_classes=21, hidden_dim=64)


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


def _setup(num_devices):
    params = detector.init_params(SPEC, jax.random.PRNGKey(0))
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(SPEC, params)
    mults = sgd.freeze_mults(sgd.param_multipliers(params, trainable))
    state = sgd.init_state(params, hp)
    m = mesh_lib.make_mesh(num_devices)
    step = ts.make_train_step(SPEC, hp, mults, m, donate=False)
    return params, hp, mults, state, m, step


class TestMeshTrainStep:
    def test_eight_device_step(self):
        assert len(jax.devices()) >= 8, 'conftest must force 8 CPU devices'
        params, hp, mults, state, m, step = _setup(8)
        batch = ts.stack_minibatches([_blob(i) for i in range(8)],
                                     size_bucket=16)
        rngs = ts.device_rngs(jax.random.PRNGKey(1), 8)
        p0 = np.asarray(params['fc8c_w']).copy()
        new_params, new_state, loss, aux = step(
            params, state, batch, np.float32(0.001), rngs)
        assert np.isfinite(float(loss))
        assert 'loss_cls' in aux
        # heads updated, frozen conv body untouched
        assert not np.allclose(np.asarray(new_params['fc8c_w']), p0)
        np.testing.assert_array_equal(np.asarray(new_params['conv1_1_w']),
                                      np.asarray(params['conv1_1_w']))

    def test_dp_grad_is_mean_over_devices(self):
        """A replicated batch over 8 devices must produce the same update as
        a single-device step on one image (gradient all-reduce = mean)."""
        params, hp, mults, state, m8, step8 = _setup(8)
        m1 = mesh_lib.make_mesh(1)
        step1 = ts.make_train_step(SPEC, hp, mults, m1, donate=False)

        blob = _blob(0)
        batch8 = ts.stack_minibatches([blob] * 8, size_bucket=16)
        batch1 = ts.stack_minibatches([blob], size_bucket=16)
        rng0 = jax.random.PRNGKey(2)
        rngs8 = jnp.stack([rng0] * 8)  # same dropout on every device
        rngs1 = rng0[None]

        state1 = sgd.init_state(params, hp)
        p8, _, loss8, _ = step8(params, state, batch8, np.float32(0.001), rngs8)
        p1, _, loss1, _ = step1(params, state1, batch1, np.float32(0.001),
                                rngs1)
        assert float(loss8) == pytest.approx(float(loss1), rel=1e-4)
        # batch-8 vs batch-1 convs accumulate in different orders; the update
        # must agree to float32 noise, not bit-for-bit
        np.testing.assert_allclose(np.asarray(p8['fc8c_w']),
                                   np.asarray(p1['fc8c_w']),
                                   rtol=1e-2, atol=5e-5)

    def test_overfit_tiny(self):
        """Loss decreases over a few steps on a fixed image (the reference's
        'overfit 10 images' strategy, SURVEY.md §4)."""
        params, hp, mults, state, m, step = _setup(1)
        blob = _blob(3)
        blob['data'] = blob['data'] / 10.0  # unit-scale pixels: random-init
        # VGG activations stay bounded so SGD descends instead of saturating
        batch = ts.stack_minibatches([blob], size_bucket=16)
        rngs = ts.device_rngs(jax.random.PRNGKey(100), 1)  # fixed dropout mask
        losses = []
        for _ in range(10):
            params, state, loss, _ = step(params, state, batch,
                                          np.float32(1e-5), rngs)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        assert all(b <= a + 1e-6 for a, b in zip(losses, losses[1:]))


class TestStackMinibatches:
    def test_pads_to_common_bucket(self):
        blobs = [_blob(0, H=40, W=50), _blob(1, H=48, W=30)]
        batch = ts.stack_minibatches(blobs, size_bucket=16)
        assert batch['image'].shape == (2, 1, 48, 64, 3)  # max H/W -> bucket 16
        # original pixels preserved
        np.testing.assert_array_equal(
            batch['image'][0, 0, :40, :50], blobs[0]['data'][0])
        assert batch['image'][0, 0, 40:].sum() == 0

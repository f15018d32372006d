"""Multi-host data-parallel glue (parallel/multihost.py).

A true multi-process run needs pod hardware; here the helpers are exercised
two ways on the virtual 8-device mesh:
  * single-process identity — every helper must be a no-op passthrough so
    the dev-rig path is byte-identical to before;
  * forced-multihost branches — ``is_multihost`` monkeypatched True with
    process_count 1, where local data == global data, so the real
    ``make_array_from_process_local_data`` / ``process_allgather`` /
    key-data round-trip code runs and the resulting global arrays must
    drive the jitted DP step to the same numbers as the plain numpy path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nafwebsod_tpu.models import detector
from nafwebsod_tpu.parallel import mesh as mesh_lib
from nafwebsod_tpu.parallel import multihost as mh
from nafwebsod_tpu.parallel import train_step as ts
from nafwebsod_tpu.solver import sgd

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


class TestSingleProcessIdentity:
    def test_shard_roidb_passthrough(self):
        roidb = [{'i': i} for i in range(10)]
        assert mh.shard_roidb(roidb) is roidb

    def test_shard_roidb_strided(self):
        roidb = list(range(10))
        assert mh.shard_roidb(roidb, rank=1, world=4) == [1, 5, 9]
        shards = [mh.shard_roidb(roidb, rank=r, world=3) for r in range(3)]
        assert sorted(sum(shards, [])) == roidb

    def test_canvas_and_batch_identity(self):
        assert mh.global_canvas(48, 64) == (48, 64)
        batch = {'image': np.zeros((2, 1, 4, 6, 3))}
        assert mh.form_global_batch(None, batch) is batch
        rngs = jax.random.split(jax.random.PRNGKey(0), 4)
        assert mh.local_device_rngs(rngs, 2, 2) is rngs
        assert mh.form_global_rngs(None, rngs) is rngs

    def test_local_device_count(self):
        assert mh.local_device_count(8) == 8


class TestForcedMultihostBranches:
    """process_count == 1 but is_multihost forced True: local == global, so
    the real multi-process code paths run end to end."""

    @pytest.fixture
    def forced(self, monkeypatch):
        monkeypatch.setattr(mh, 'is_multihost', lambda: True)

    def test_global_canvas_allgather(self, forced):
        assert mh.global_canvas(48, 64) == (48, 64)

    def test_pad_batch_images(self):
        im = np.arange(2 * 1 * 3 * 4 * 3, dtype=np.float32).reshape(
            2, 1, 3, 4, 3)
        out = mh.pad_batch_images({'image': im}, 5, 6)['image']
        assert out.shape == (2, 1, 5, 6, 3)
        np.testing.assert_array_equal(out[:, :, :3, :4], im)
        assert out[:, :, 3:].sum() == 0 and out[:, :, :, 4:].sum() == 0
        # already-matching canvas passes through untouched
        same = mh.pad_batch_images({'image': im}, 3, 4)['image']
        assert same is im

    def test_step_on_formed_global_batch_matches_numpy_path(self, forced):
        n_dev = 8
        assert len(jax.devices()) >= n_dev
        params = detector.init_params(SPEC, jax.random.PRNGKey(0))
        hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005,
                                iter_size=1)
        trainable = detector.trainable_param_names(SPEC, params)
        mults = sgd.freeze_mults(sgd.param_multipliers(params, trainable))
        state = sgd.init_state(params, hp)
        m = mesh_lib.make_mesh(n_dev)
        step = ts.make_train_step(SPEC, hp, mults, m, donate=False)
        batch = ts.stack_minibatches([_blob(i) for i in range(n_dev)],
                                     size_bucket=16)
        rngs = ts.device_rngs(jax.random.PRNGKey(1), n_dev)

        p_np, _, loss_np, _ = step(params, state, batch,
                                   np.float32(0.001), rngs)

        gbatch = mh.form_global_batch(m, batch)
        for v in gbatch.values():
            assert isinstance(v, jax.Array)
        grngs = mh.form_global_rngs(m, mh.local_device_rngs(rngs, 1, n_dev))
        p_g, _, loss_g, _ = step(params, state, gbatch,
                                 np.float32(0.001), grngs)
        assert float(loss_np) == float(loss_g)
        for k in p_np:
            np.testing.assert_array_equal(np.asarray(p_np[k]),
                                          np.asarray(p_g[k]), err_msg=k)

    def test_typed_key_roundtrip(self, forced):
        n_dev = 8
        m = mesh_lib.make_mesh(n_dev)
        keys = jax.random.split(jax.random.key(7, impl='threefry2x32'),
                                n_dev)
        g = mh.form_global_rngs(m, mh.local_device_rngs(keys, 1, n_dev))
        assert jnp.issubdtype(g.dtype, jax.dtypes.prng_key)
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(g)),
            np.asarray(jax.random.key_data(keys)))

    def test_window_layout(self, forced):
        """STEPS_PER_CALL layout: (w, n_dev, ...) leaves shard on axis 1."""
        w, n_dev = 2, 8
        m = mesh_lib.make_mesh(n_dev)
        arr = np.arange(w * n_dev * 3, dtype=np.float32).reshape(w, n_dev, 3)
        g = mh.form_global_batch(m, {'x': arr}, batch_axis=1)['x']
        np.testing.assert_array_equal(np.asarray(g), arr)
        rngs = jax.random.split(jax.random.PRNGKey(3), w * n_dev)
        local = mh.local_device_rngs(rngs, w, n_dev)
        g = mh.form_global_rngs(
            m, np.asarray(local).reshape(w, n_dev, 2), batch_axis=1)
        np.testing.assert_array_equal(
            np.asarray(g).reshape(w * n_dev, 2), np.asarray(rngs))

"""The lax.scan multi-step driver (TPU.STEPS_PER_CALL) must be bit-equivalent
to the same sequence of single-step calls."""

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _example_inputs
from nafwebsod_tpu.models import detector
from nafwebsod_tpu.parallel import mesh as mesh_lib
from nafwebsod_tpu.parallel import train_step as ts
from nafwebsod_tpu.solver import sgd


def test_multi_step_matches_single_steps():
    n_dev, k = 2, 3
    spec = detector.ModelSpec(num_classes=21, hidden_dim=32)
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    mults = sgd.freeze_mults(sgd.param_multipliers(
        params, detector.trainable_param_names(spec, params)))
    opt_state = sgd.init_state(params, hp)
    mesh = mesh_lib.make_mesh(n_dev)
    step = ts.make_train_step(spec, hp, mults, mesh, donate=False)
    multi = ts.make_multi_train_step(spec, hp, mults, mesh, donate=False)

    blob_sets = []
    for j in range(k * n_dev):
        image, rois, obn, valid, labels = _example_inputs(
            H=64, W=64, R=16, seed=j)
        blob_sets.append({'data': image, 'rois': rois, 'obn_scores': obn,
                          'valid_mask': valid, 'labels_oh': labels})
    flat = ts.stack_minibatches(blob_sets, size_bucket=32)
    flat['cur_iter'] = np.repeat(np.arange(k, dtype=np.float32), n_dev)
    rngs = ts.device_rngs(jax.random.PRNGKey(1), k * n_dev)
    lrs = np.asarray([1e-4, 1e-4, 1e-5], np.float32)
    factors = np.asarray([1.0, 1.0, 0.1], np.float32)

    # single-step path
    p1, s1 = params, opt_state
    losses1 = []
    for j in range(k):
        if factors[j] != 1.0:
            s1 = sgd.scale_momentum(s1, np.float32(factors[j]))
        batch_j = {key: v[j * n_dev:(j + 1) * n_dev]
                   for key, v in flat.items()}
        p1, s1, loss, _ = step(p1, s1, batch_j, lrs[j],
                               rngs[j * n_dev:(j + 1) * n_dev])
        losses1.append(float(loss))

    # scan path
    batch = {key: np.asarray(v).reshape((k, n_dev) + np.asarray(v).shape[1:])
             for key, v in flat.items()}
    p2, s2, losses2, aux2 = multi(
        params, opt_state, batch, lrs, factors,
        rngs.reshape((k, n_dev) + rngs.shape[1:]))

    np.testing.assert_allclose(np.asarray(losses2), losses1, rtol=1e-6)
    for name in p1:
        np.testing.assert_allclose(
            np.asarray(p2[name]), np.asarray(p1[name]), rtol=1e-6,
            atol=1e-7, err_msg=name)
    for name in s1['momentum']:
        np.testing.assert_allclose(
            np.asarray(s2['momentum'][name]),
            np.asarray(s1['momentum'][name]), rtol=1e-6, atol=1e-8,
            err_msg=name)
    # aux streams are per-step arrays
    for v in aux2.values():
        assert np.asarray(v).shape[0] == k

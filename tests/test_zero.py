"""ZeRO-1 sharded-optimizer DP step (parallel/zero.py): must match the
replicated-solver data-parallel step numerically — same forward, same
Caffe momentum semantics, the state merely sharded (virtual 8-device CPU
mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nafwebsod_tpu.models import detector
from nafwebsod_tpu.parallel import mesh as mesh_lib
from nafwebsod_tpu.parallel import train_step as ts
from nafwebsod_tpu.parallel import zero
from nafwebsod_tpu.solver import sgd

N_DEV = 8


def _blobs(num_classes, n, r=32, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        x1 = rng.uniform(0, 30, r)
        y1 = rng.uniform(0, 30, r)
        labels = np.zeros((1, num_classes - 1), np.float32)
        labels[0, rng.randint(0, num_classes - 1, 2)] = 1
        out.append({
            'data': rng.randn(1, 48, 48, 3).astype(np.float32),
            'rois': np.stack(
                [np.zeros(r), x1, y1, x1 + rng.uniform(8, 17, r),
                 y1 + rng.uniform(8, 17, r)], 1).astype(np.float32),
            'obn_scores': rng.rand(r, 1).astype(np.float32) + 1,
            'labels_oh': labels,
            'valid_mask': np.arange(r) < r - 3,
        })
    return out


def test_zero_step_matches_replicated_dp():
    spec = detector.ModelSpec(num_classes=5, hidden_dim=16,
                              compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)

    batch = ts.stack_minibatches(_blobs(spec.num_classes, N_DEV),
                                 size_bucket=16)
    rngs = ts.device_rngs(jax.random.PRNGKey(1), N_DEV)

    mesh = mesh_lib.make_mesh(N_DEV)
    dp_step = ts.make_train_step(spec, hp, mults, mesh, donate=False)
    zero_step = zero.make_zero_train_step(spec, hp, mults, mesh, params)

    p_dp, s_dp = params, sgd.init_state(params, hp)
    p_z, s_z = params, zero.init_state(params, hp, mesh)
    for k in range(3):
        lr = np.float32(1e-3 if k < 2 else 5e-4)
        p_dp, s_dp, loss_dp, _ = dp_step(p_dp, s_dp, batch, lr, rngs)
        p_z, s_z, loss_z, _ = zero_step(p_z, s_z, batch, lr, rngs)
        np.testing.assert_allclose(float(loss_z), float(loss_dp),
                                   rtol=2e-5, err_msg='step %d' % k)

    for name in ('fc6_w', 'fc7_b', 'fc8c_w', 'noisy_fc8d_w',
                 '_[noisy]_fc6_w'):
        np.testing.assert_allclose(np.asarray(p_z[name]),
                                   np.asarray(p_dp[name]),
                                   rtol=1e-4, atol=1e-7, err_msg=name)
    # frozen conv body stays put under both
    np.testing.assert_array_equal(np.asarray(p_z['conv1_1_w']),
                                  np.asarray(params['conv1_1_w']))


def test_zero_momentum_is_sharded():
    spec = detector.ModelSpec(num_classes=5, hidden_dim=16,
                              compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    mesh = mesh_lib.make_mesh(N_DEV)
    state = zero.init_state(params, hp, mesh)
    mom = state['momentum']['flat']
    assert mom.shape[0] % N_DEV == 0
    # each device holds 1/n of the vector
    shard_shapes = {s.data.shape for s in mom.addressable_shards}
    assert shard_shapes == {(mom.shape[0] // N_DEV,)}
    # momentum correction machinery applies unchanged
    scaled = sgd.scale_momentum(state, np.float32(0.5))
    assert scaled['momentum']['flat'].shape == mom.shape


def test_zero_iter_size_matches_replicated_dp():
    """iter_size=2: the SHARDED grad accumulator must reproduce the
    replicated solver's accumulate-then-fire semantics — params move only
    on every 2nd micro-iteration, and match the DP step throughout."""
    spec = detector.ModelSpec(num_classes=5, hidden_dim=16,
                              compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=2)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)

    batch = ts.stack_minibatches(_blobs(spec.num_classes, N_DEV),
                                 size_bucket=16)
    rngs = ts.device_rngs(jax.random.PRNGKey(1), N_DEV)

    mesh = mesh_lib.make_mesh(N_DEV)
    dp_step = ts.make_train_step(spec, hp, mults, mesh, donate=False)
    zero_step = zero.make_zero_train_step(spec, hp, mults, mesh, params)

    p_dp, s_dp = params, sgd.init_state(params, hp)
    p_z, s_z = params, zero.init_state(params, hp, mesh)
    assert 'grad_acc' in s_z
    for k in range(4):
        lr = np.float32(1e-3)
        p_dp, s_dp, loss_dp, _ = dp_step(p_dp, s_dp, batch, lr, rngs)
        p_z, s_z, loss_z, _ = zero_step(p_z, s_z, batch, lr, rngs)
        np.testing.assert_allclose(float(loss_z), float(loss_dp),
                                   rtol=2e-5, err_msg='step %d' % k)
        if k == 0:
            # first micro-iteration only accumulates: no param movement
            np.testing.assert_array_equal(np.asarray(p_z['fc6_w']),
                                          np.asarray(params['fc6_w']))
        for name in ('fc6_w', 'fc7_b', 'fc8c_w', '_[noisy]_fc6_w'):
            np.testing.assert_allclose(
                np.asarray(p_z[name]), np.asarray(p_dp[name]),
                rtol=1e-4, atol=1e-7, err_msg='%s step %d' % (name, k))


def test_zero_center_loss_matches_replicated_dp():
    """Center loss under ZeRO-1: CF is frozen through the flat momentum
    update (lr_mult == wd == 0), the dCF/ndCF deltas psum like the DP
    step, and the periodic center move fires identically — params AND
    centers must track the replicated DP step through an update
    boundary."""
    spec = detector.ModelSpec(
        num_classes=5, hidden_dim=16, webly_on=False, webly_entropy=False,
        box_head='vgg16_2fc', center_loss=True, center_loss_number=3,
        center_loss_top_k=2, compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    assert 'center_feature' not in trainable
    mults = sgd.param_multipliers(params, trainable)

    batch = ts.stack_minibatches(_blobs(spec.num_classes, N_DEV),
                                 size_bucket=16)
    rngs = ts.device_rngs(jax.random.PRNGKey(1), N_DEV)

    mesh = mesh_lib.make_mesh(N_DEV)
    dp_step = ts.make_train_step(spec, hp, mults, mesh, donate=False,
                                 center_update_period=2)
    zero_step = zero.make_zero_train_step(spec, hp, mults, mesh, params,
                                          center_update_period=2)

    p_dp, s_dp = params, sgd.init_state(params, hp)
    s_dp['center_dcf'] = jnp.zeros_like(params['center_feature'])
    s_dp['center_ndcf'] = jnp.zeros(
        params['center_feature'].shape[:2], jnp.float32)
    p_z, s_z = params, zero.init_state(params, hp, mesh)
    assert 'center_dcf' in s_z

    cf0 = np.asarray(params['center_feature'])
    for k in range(3):
        lr = np.float32(1e-3)
        p_dp, s_dp, loss_dp, aux_dp = dp_step(p_dp, s_dp, batch, lr, rngs)
        p_z, s_z, loss_z, aux_z = zero_step(p_z, s_z, batch, lr, rngs)
        np.testing.assert_allclose(float(loss_z), float(loss_dp),
                                   rtol=2e-5, err_msg='step %d' % k)
        np.testing.assert_allclose(
            float(aux_z['loss_center']), float(aux_dp['loss_center']),
            rtol=2e-5, err_msg='loss_center step %d' % k)
        np.testing.assert_allclose(
            np.asarray(p_z['center_feature']),
            np.asarray(p_dp['center_feature']),
            rtol=1e-4, atol=1e-7, err_msg='center_feature step %d' % k)
        np.testing.assert_allclose(
            np.asarray(s_z['center_dcf']), np.asarray(s_dp['center_dcf']),
            rtol=1e-4, atol=1e-6, err_msg='center_dcf step %d' % k)
        if k == 0:
            # before the period-2 boundary: centers have not moved yet
            np.testing.assert_array_equal(
                np.asarray(p_z['center_feature']), cf0)
    # the update boundary fired inside the loop: centers moved under both
    assert not np.allclose(np.asarray(p_z['center_feature']), cf0)
    for name in ('fc6_w', 'fc7_b', 'fc8c_w'):
        np.testing.assert_allclose(np.asarray(p_z[name]),
                                   np.asarray(p_dp[name]),
                                   rtol=1e-4, atol=1e-7, err_msg=name)


def test_zero_momentum_checkpoint_roundtrip():
    """flat sharded momentum <-> reference per-param dict, exact."""
    spec = detector.ModelSpec(num_classes=5, hidden_dim=16,
                              compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    mesh = mesh_lib.make_mesh(N_DEV)
    rng = np.random.RandomState(0)
    mom_dict = {k: rng.randn(*np.asarray(v).shape).astype(np.float32)
                for k, v in params.items()}
    state = zero.momentum_from_dict(params, hp, mesh, mom_dict)
    back = zero.momentum_to_dict(params, state)
    assert set(back) == set(mom_dict)
    for k in mom_dict:
        np.testing.assert_array_equal(back[k], mom_dict[k])


def test_zero_multi_step_matches_sequential():
    """Scan-of-K ZeRO window == K host-driven single steps, including an
    in-window momentum-correction factor."""
    spec = detector.ModelSpec(num_classes=5, hidden_dim=16,
                              compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    mesh = mesh_lib.make_mesh(N_DEV)

    K = 3
    batches = [ts.stack_minibatches(_blobs(spec.num_classes, N_DEV, seed=s),
                                    size_bucket=16) for s in range(K)]
    stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
    rngs = jnp.stack([ts.device_rngs(jax.random.PRNGKey(10 + s), N_DEV)
                      for s in range(K)])
    lrs = jnp.asarray([1e-3, 1e-3, 5e-4], jnp.float32)
    factors = jnp.asarray([1.0, 1.0, 0.5], jnp.float32)

    single = zero.make_zero_train_step(spec, hp, mults, mesh, params)
    p_ref, s_ref = params, zero.init_state(params, hp, mesh)
    ref_losses = []
    for k in range(K):
        s_ref = dict(s_ref)
        s_ref['momentum'] = {
            'flat': s_ref['momentum']['flat'] * factors[k]}
        p_ref, s_ref, loss, _ = single(p_ref, s_ref,
                                       {kk: v[k] for kk, v in
                                        stacked.items()},
                                       lrs[k], rngs[k])
        ref_losses.append(float(loss))

    multi = zero.make_zero_multi_train_step(spec, hp, mults, mesh, params)
    p_m, s_m, losses, _ = multi(params, zero.init_state(params, hp, mesh),
                                stacked, lrs, factors, rngs)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_losses),
                               rtol=1e-5)
    for name in ('fc6_w', 'fc7_b', 'fc8c_w'):
        np.testing.assert_allclose(np.asarray(p_m[name]),
                                   np.asarray(p_ref[name]),
                                   rtol=1e-5, atol=1e-7, err_msg=name)
    np.testing.assert_allclose(np.asarray(s_m['momentum']['flat']),
                               np.asarray(s_ref['momentum']['flat']),
                               rtol=1e-5, atol=1e-7)

"""Pipeline parallelism (parallel/pipeline.py): the 2-stage body|head
GPipe schedule must reproduce the data-parallel mean-loss step over the
same microbatches (virtual CPU mesh; dropout off for bit-level parity)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nafwebsod_tpu.models import detector
from nafwebsod_tpu.parallel import pipeline
from nafwebsod_tpu.solver import sgd


def _one_image(num_classes, r=64, seed=0):
    rng = np.random.RandomState(seed)
    x1 = rng.uniform(0, 30, r)
    y1 = rng.uniform(0, 30, r)
    labels = np.zeros((1, num_classes - 1), np.float32)
    labels[0, [0, 2]] = 1
    return {
        'image': jnp.asarray(rng.randn(1, 48, 48, 3).astype(np.float32)),
        'rois': jnp.asarray(np.stack(
            [np.zeros(r), x1, y1, x1 + rng.uniform(8, 17, r),
             y1 + rng.uniform(8, 17, r)], 1).astype(np.float32)),
        'obn_scores': jnp.asarray(rng.rand(r, 1).astype(np.float32) + 1),
        'labels_oh': jnp.asarray(labels),
        'valid_mask': jnp.asarray(np.arange(r) < r - 5),
    }


def _stack(images):
    return {k: jnp.stack([b[k] for b in images]) for k in images[0]}


def _specs():
    yield detector.ModelSpec(num_classes=5, hidden_dim=16, webly_on=False,
                             webly_entropy=False, box_head='vgg16_2fc',
                             compute_dtype='float32')
    yield detector.ModelSpec(num_classes=5, hidden_dim=16,
                             compute_dtype='float32')  # webly + entropy


@pytest.mark.parametrize('spec_idx', [0, 1])
def test_pipeline_step_matches_mean_loss_step(spec_idx):
    spec = list(_specs())[spec_idx]
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    imgs = [_one_image(spec.num_classes, seed=s) for s in (0, 3, 4)]

    def mean_loss(p):
        totals = [detector.forward_train(spec, p, b, None)[0] for b in imgs]
        return sum(totals) / len(imgs)

    ref_loss, ref_grads = jax.value_and_grad(mean_loss)(params)

    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    opt_state = sgd.init_state(params, hp)
    ref_upd, _ = sgd.update(params, ref_grads, opt_state, np.float32(1e-3),
                            hp, sgd.freeze_mults(mults))

    mesh = pipeline.make_pipe_mesh()
    step = pipeline.make_pipeline_step(spec, hp, mults, mesh, dropout=False)
    p2, s2, loss, aux = step(params, opt_state, _stack(imgs),
                             np.float32(1e-3), jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    keys = ['fc6_w', 'fc6_b', 'fc7_w', 'fc8c_w', 'fc8d_w']
    if spec.is_webly:
        keys += ['_[noisy]_fc6_w', 'noisy_fc8c_w']
    for k in keys:
        np.testing.assert_allclose(np.asarray(p2[k]), np.asarray(ref_upd[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    # frozen body params must not move
    np.testing.assert_array_equal(np.asarray(p2['conv1_1_w']),
                                  np.asarray(params['conv1_1_w']))


def test_pipeline_center_loss_matches_mean_loss_step():
    """Center loss through the pipeline: per-microbatch dCF/ndCF deltas
    must SUM over ticks (stage-0 zeros psum'd away) and the periodic
    center move must fire exactly like the DP tail."""
    from nafwebsod_tpu.ops import center as center_ops

    spec = detector.ModelSpec(
        num_classes=5, hidden_dim=16, webly_on=False, webly_entropy=False,
        box_head='vgg16_2fc', center_loss=True, center_loss_number=3,
        center_loss_top_k=2, compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    imgs = [_one_image(spec.num_classes, seed=s) for s in (0, 3, 4)]
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    frozen = sgd.freeze_mults(mults)

    def ref_loss_fn(p):
        outs = [detector.forward_train(spec, p, b, None) for b in imgs]
        total = sum(t for t, _ in outs) / len(imgs)
        deltas = {k: sum(a[k] for _, a in outs)
                  for k in ('__center_dcf', '__center_ndcf')}
        return total, deltas

    mesh = pipeline.make_pipe_mesh()
    step = pipeline.make_pipeline_step(spec, hp, mults, mesh, dropout=False,
                                       center_update_period=2)
    opt0 = sgd.init_state(params, hp)
    opt0['center_dcf'] = jnp.zeros_like(params['center_feature'])
    opt0['center_ndcf'] = jnp.zeros(
        params['center_feature'].shape[:2], jnp.float32)

    cf0 = np.asarray(params['center_feature'])
    p_ref, s_ref = params, dict(opt0)
    accum = {'center_dcf': opt0['center_dcf'],
             'center_ndcf': opt0['center_ndcf']}
    p_pp, s_pp = params, opt0
    batch = _stack(imgs)
    for k in range(3):
        lr = np.float32(1e-3)
        (ref_loss, deltas), ref_grads = jax.value_and_grad(
            ref_loss_fn, has_aux=True)(p_ref)
        p_ref, s_ref = sgd.update(p_ref, ref_grads, s_ref, lr, hp, frozen)
        cf, accum = center_ops.center_update(
            p_ref['center_feature'], accum,
            {'center_dcf': deltas['__center_dcf'],
             'center_ndcf': deltas['__center_ndcf']},
            s_ref['it'], spec.center_loss_top_k, update=2)
        p_ref = dict(p_ref)
        p_ref['center_feature'] = cf

        p_pp, s_pp, loss, aux = step(p_pp, s_pp, batch, lr,
                                     jax.random.PRNGKey(1))
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5,
                                   err_msg='step %d' % k)
        assert not any(n.startswith('__') for n in aux)
        np.testing.assert_allclose(
            np.asarray(p_pp['center_feature']),
            np.asarray(p_ref['center_feature']),
            rtol=1e-4, atol=1e-7, err_msg='center_feature step %d' % k)
        np.testing.assert_allclose(
            np.asarray(s_pp['center_dcf']), np.asarray(accum['center_dcf']),
            rtol=1e-4, atol=1e-6, err_msg='center_dcf step %d' % k)
        if k == 0:
            np.testing.assert_array_equal(
                np.asarray(p_pp['center_feature']), cf0)
    assert not np.allclose(np.asarray(p_pp['center_feature']), cf0)
    for name in ('fc6_w', 'fc7_b', 'fc8c_w'):
        np.testing.assert_allclose(np.asarray(p_pp[name]),
                                   np.asarray(p_ref[name]),
                                   rtol=1e-4, atol=1e-6, err_msg=name)


def test_pipeline_step_learns_with_dropout():
    spec = list(_specs())[1]
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    opt_state = sgd.init_state(params, hp)
    mesh = pipeline.make_pipe_mesh()
    step = pipeline.make_pipeline_step(spec, hp, mults, mesh)
    batch = _stack([_one_image(spec.num_classes, seed=5),
                    _one_image(spec.num_classes, seed=6)])
    rng = jax.random.PRNGKey(7)
    losses = []
    for i in range(6):
        params, opt_state, loss, _ = step(params, opt_state, batch,
                                          np.float32(5e-4),
                                          jax.random.fold_in(rng, i))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_pipeline_rejects_trainable_body():
    spec = detector.ModelSpec(num_classes=5, hidden_dim=16,
                              compute_dtype='float32',
                              freeze_conv_body=False)
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0, iter_size=1)
    with pytest.raises(NotImplementedError):
        pipeline.make_pipeline_step(spec, hp, {}, pipeline.make_pipe_mesh())


def test_pipeline_rejects_unsupported_branches():
    spec = detector.ModelSpec(num_classes=5, hidden_dim=16, csc=True,
                              webly_on=False, box_head='vgg16_2fc')
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0, iter_size=1)
    with pytest.raises(NotImplementedError):
        pipeline.make_pipeline_step(spec, hp, {}, pipeline.make_pipe_mesh())


def test_pipeline_multi_step_matches_chained_single_steps():
    """scan-of-K pipeline driver == K sequential single pipeline steps."""
    spec = list(_specs())[1]
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    opt_state = sgd.init_state(params, hp)
    mesh = pipeline.make_pipe_mesh()

    K = 3
    batches = [_stack([_one_image(spec.num_classes, seed=10 * k),
                       _one_image(spec.num_classes, seed=10 * k + 1)])
               for k in range(K)]
    rngs = jax.random.split(jax.random.PRNGKey(9), K)
    lrs = np.asarray([1e-3, 1e-3, 5e-4], np.float32)
    factors = np.asarray([1.0, 1.0, 0.5], np.float32)

    step = pipeline.make_pipeline_step(spec, hp, mults, mesh)
    p_ref, s_ref = params, opt_state
    ref_losses = []
    for k in range(K):
        s_ref = sgd.scale_momentum(s_ref, factors[k])
        p_ref, s_ref, loss, _ = step(p_ref, s_ref, batches[k], lrs[k],
                                     rngs[k])
        ref_losses.append(float(loss))

    multi = pipeline.make_pipeline_multi_step(spec, hp, mults, mesh)
    stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
    p_m, s_m, losses, aux = multi(params, opt_state, stacked,
                                  jnp.asarray(lrs), jnp.asarray(factors),
                                  rngs)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_losses),
                               rtol=1e-5)
    for k in ('fc6_w', 'fc7_w', 'fc8c_w'):
        np.testing.assert_allclose(np.asarray(p_m[k]), np.asarray(p_ref[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def _family_specs():
    base = dict(num_classes=5, hidden_dim=16, webly_on=False,
                webly_entropy=False, box_head='vgg16_2fc',
                compute_dtype='float32')
    yield 'oicr', detector.ModelSpec(oicr=True, **base)
    yield 'cmil', detector.ModelSpec(cmil=True, **base)
    yield 'min_entropy', detector.ModelSpec(min_entropy_loss=True, **base)
    yield 'context', detector.ModelSpec(
        **{**base, 'box_head': 'vgg16_context_2fc'})


@pytest.mark.parametrize('name,spec', list(_family_specs()),
                         ids=[n for n, _ in _family_specs()])
def test_pipeline_ladder_and_context_match_mean_loss(name, spec):
    """The newly admitted families through the 2-stage pipe == the mean-loss
    step (context's three streams cross the pipe as one concat buffer)."""
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    imgs = [_one_image(spec.num_classes, seed=s) for s in (0, 3)]

    def mean_loss(p):
        totals = [detector.forward_train(spec, p, b, None)[0] for b in imgs]
        return sum(totals) / len(imgs)

    ref_loss, ref_grads = jax.value_and_grad(mean_loss)(params)

    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    opt_state = sgd.init_state(params, hp)
    ref_upd, _ = sgd.update(params, ref_grads, opt_state, np.float32(1e-3),
                            hp, sgd.freeze_mults(mults))

    mesh = pipeline.make_pipe_mesh()
    step = pipeline.make_pipeline_step(spec, hp, mults, mesh, dropout=False)
    p2, s2, loss, aux = step(params, opt_state, _stack(imgs),
                             np.float32(1e-3), jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    for k in sorted(params):
        np.testing.assert_allclose(np.asarray(p2[k]),
                                   np.asarray(ref_upd[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_pipeline_supervised_matches_mean_loss_step():
    """Supervised Fast R-CNN 2fc head through the 2-stage pipe: stage 0
    pools the same flat RoI features, stage 1 runs
    detector.fast_rcnn_tail_losses — must equal the DP mean-loss step."""
    spec = detector.ModelSpec(
        num_classes=4, box_head='vgg16_2fc', webly_on=False,
        webly_entropy=False, hidden_dim=16, supervised=True,
        freeze_conv_body=True, compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))

    def _supervised_image(seed):
        rng = np.random.RandomState(seed)
        r, c = 64, spec.num_classes
        x1 = rng.uniform(0, 20, r)
        y1 = rng.uniform(0, 20, r)
        return {
            'image': jnp.asarray(
                rng.randn(1, 48, 48, 3).astype(np.float32)),
            'rois': jnp.asarray(np.stack(
                [np.zeros(r), x1, y1, x1 + 16, y1 + 16],
                1).astype(np.float32)),
            'obn_scores': jnp.asarray(np.ones((r, 1), np.float32)),
            'labels_int32': jnp.asarray(
                rng.randint(0, c, r).astype(np.int32)),
            'bbox_targets': jnp.asarray(
                rng.randn(r, 4 * c).astype(np.float32)),
            'bbox_inside_weights': jnp.asarray(
                (rng.rand(r, 4 * c) > 0.8).astype(np.float32)),
            'bbox_outside_weights': jnp.asarray(
                np.ones((r, 4 * c), np.float32)),
            'valid_mask': jnp.asarray(np.arange(r) < r - 5),
        }

    imgs = [_supervised_image(s) for s in (0, 3)]

    def mean_loss(p):
        totals = [detector.forward_train(spec, p, b, None)[0] for b in imgs]
        return sum(totals) / len(imgs)

    ref_loss, ref_grads = jax.value_and_grad(mean_loss)(params)

    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    opt_state = sgd.init_state(params, hp)
    ref_upd, _ = sgd.update(params, ref_grads, opt_state, np.float32(1e-3),
                            hp, sgd.freeze_mults(mults))

    mesh = pipeline.make_pipe_mesh()
    step = pipeline.make_pipeline_step(spec, hp, mults, mesh, dropout=False)
    p2, s2, loss, aux = step(params, opt_state, _stack(imgs),
                             np.float32(1e-3), jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    assert 'loss_bbox' in aux
    for k in sorted(params):
        np.testing.assert_allclose(np.asarray(p2[k]),
                                   np.asarray(ref_upd[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)

"""Tensor (hidden-dim) parallelism (parallel/tensor_shard.py): the
Megatron-style column/row-parallel fc towers must match the unsharded
detector.forward_train numerically, both TP-only (1x8) and composed with
data parallelism (2x4), on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from nafwebsod_tpu.models import detector
from nafwebsod_tpu.parallel import tensor_shard as tsh
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


def test_param_pspec_rules():
    assert tsh.param_pspec('fc6_w') == P(None, tsh.MODEL_AXIS)
    assert tsh.param_pspec('_[noisy]_fc6_w') == P(None, tsh.MODEL_AXIS)
    assert tsh.param_pspec('fc6_b') == P(tsh.MODEL_AXIS)
    assert tsh.param_pspec('fc7_w') == P(tsh.MODEL_AXIS, None)
    assert tsh.param_pspec('_[noisy]_fc7_w') == P(tsh.MODEL_AXIS, None)
    # replicated: fc7 bias (post-psum add), logit layers, conv body
    assert tsh.param_pspec('fc7_b') == P()
    assert tsh.param_pspec('fc8c_w') == P()
    assert tsh.param_pspec('conv1_1_w') == P()


@pytest.mark.parametrize('spec_idx', [0, 1])
def test_tp_step_matches_unsharded(spec_idx):
    """1 data row x 8 hidden shards: one TP step == the unsharded step."""
    spec = list(_specs())[spec_idx]
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    img = _one_image(spec.num_classes)

    (ref_loss, _), ref_grads = jax.value_and_grad(
        lambda p: detector.forward_train(spec, p, img, None),
        has_aux=True)(params)

    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    opt_state = sgd.init_state(params, hp)
    ref_upd, _ = sgd.update(params, ref_grads, opt_state, np.float32(1e-3),
                            hp, sgd.freeze_mults(mults))

    mesh = tsh.make_tp_mesh(n_model=8, n_data=1)
    step = tsh.make_tp_train_step(spec, hp, mults, mesh, params,
                                  dropout=False)
    p2, s2, loss, aux = step(params, opt_state, _stack([img]),
                             np.float32(1e-3), jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    keys = ['fc6_w', 'fc6_b', 'fc7_w', 'fc7_b', 'fc8c_w', 'fc8d_w']
    if spec.is_webly:
        keys += ['_[noisy]_fc6_w', '_[noisy]_fc7_w', 'noisy_fc8c_w']
    for k in keys:
        np.testing.assert_allclose(np.asarray(p2[k]), np.asarray(ref_upd[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_tp_dp_composed_matches_two_image_mean():
    """2 data rows x 4 hidden shards == the mean-loss step over 2 images."""
    spec = list(_specs())[1]
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    imgs = [_one_image(spec.num_classes, seed=3),
            _one_image(spec.num_classes, seed=4)]

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

    mesh = tsh.make_tp_mesh(n_model=4, n_data=2)
    step = tsh.make_tp_train_step(spec, hp, mults, mesh, params,
                                  dropout=False)
    p2, s2, loss, aux = step(params, opt_state, _stack(imgs),
                             np.float32(1e-3), jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    for k in ('fc6_w', 'fc7_w', 'fc8c_w', '_[noisy]_fc6_w', 'fc8d_w'):
        np.testing.assert_allclose(np.asarray(p2[k]), np.asarray(ref_upd[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_tp_step_learns_with_dropout():
    spec = list(_specs())[1]
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    opt_state = sgd.init_state(params, hp)
    mesh = tsh.make_tp_mesh(n_model=4, n_data=2)
    step = tsh.make_tp_train_step(spec, hp, mults, mesh, params)
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


def test_tp_rejects_unsupported_branches():
    # CSC re-runs the towers unsharded in its CPG inner vjp; so does the
    # deeplab seg branch — both stay out of the TP scope (the RoI-sharded
    # step threads them)
    for bad in (detector.ModelSpec(num_classes=5, hidden_dim=16, csc=True,
                                   webly_on=False, box_head='vgg16_2fc'),
                detector.ModelSpec(num_classes=5, hidden_dim=16,
                                   mask_on=True, mask_head='deeplab',
                                   cpg=True, webly_on=False,
                                   box_head='vgg16_2fc')):
        params = detector.init_params(bad, jax.random.PRNGKey(0))
        with pytest.raises(NotImplementedError):
            tsh.forward_train_tp(bad, params, _one_image(bad.num_classes),
                                 None)


def test_tp_rejects_indivisible_hidden():
    spec = detector.ModelSpec(num_classes=5, hidden_dim=12,
                              compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        tsh.check_divisibility(params, 8)


def test_tp_multi_step_matches_chained_single_steps():
    """scan-of-K TP driver == K sequential single TP steps."""
    spec = list(_specs())[1]
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    opt_state = sgd.init_state(params, hp)
    mesh = tsh.make_tp_mesh(n_model=4, n_data=2)

    K = 3
    batches = [_stack([_one_image(spec.num_classes, seed=10 * k),
                       _one_image(spec.num_classes, seed=10 * k + 1)])
               for k in range(K)]
    rngs = jax.random.split(jax.random.PRNGKey(9), K)
    lrs = np.asarray([1e-3, 1e-3, 5e-4], np.float32)
    factors = np.asarray([1.0, 1.0, 0.5], np.float32)

    step = tsh.make_tp_train_step(spec, hp, mults, mesh, params)
    p_ref, s_ref = params, opt_state
    ref_losses = []
    for k in range(K):
        s_ref = sgd.scale_momentum(s_ref, factors[k])
        p_ref, s_ref, loss, _ = step(p_ref, s_ref, batches[k], lrs[k],
                                     rngs[k])
        ref_losses.append(float(loss))

    multi = tsh.make_tp_multi_train_step(spec, hp, mults, mesh, params)
    stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
    p_m, s_m, losses, aux = multi(params, opt_state, stacked,
                                  jnp.asarray(lrs), jnp.asarray(factors),
                                  rngs)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_losses),
                               rtol=1e-5)
    for k in ('fc6_w', 'fc7_w', 'fc8c_w'):
        np.testing.assert_allclose(np.asarray(p_m[k]), np.asarray(p_ref[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_tp_center_loss_matches_unsharded():
    """Center loss under TP (2 data rows x 4 hidden shards): the dCF/ndCF
    deltas must SUM over the data axis and the periodic center move must
    fire exactly like the DP tail (train_step._step_body semantics); the
    scan-of-K driver must carry the accumulators identically."""
    from nafwebsod_tpu.ops import center as center_ops

    spec = detector.ModelSpec(
        num_classes=5, hidden_dim=16, webly_on=False, webly_entropy=False,
        box_head='vgg16_2fc', center_loss=True, center_loss_number=3,
        center_loss_top_k=2, compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    imgs = [_one_image(spec.num_classes, seed=3),
            _one_image(spec.num_classes, seed=4)]
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    assert 'center_feature' not in trainable
    mults = sgd.param_multipliers(params, trainable)
    frozen = sgd.freeze_mults(mults)

    def ref_loss_fn(p):
        outs = [detector.forward_train(spec, p, b, None) for b in imgs]
        total = sum(t for t, _ in outs) / len(imgs)
        deltas = {k: sum(a[k] for _, a in outs)
                  for k in ('__center_dcf', '__center_ndcf')}
        return total, deltas

    mesh = tsh.make_tp_mesh(n_model=4, n_data=2)
    step = tsh.make_tp_train_step(spec, hp, mults, mesh, params,
                                  dropout=False, center_update_period=2)
    opt0 = sgd.init_state(params, hp)
    opt0['center_dcf'] = jnp.zeros_like(params['center_feature'])
    opt0['center_ndcf'] = jnp.zeros(
        params['center_feature'].shape[:2], jnp.float32)

    cf0 = np.asarray(params['center_feature'])
    p_ref, s_ref = params, dict(opt0)
    accum = {'center_dcf': opt0['center_dcf'],
             'center_ndcf': opt0['center_ndcf']}
    p_tp, s_tp = params, opt0
    batch = _stack(imgs)
    K = 3
    lrs = np.asarray([1e-3, 1e-3, 5e-4], np.float32)
    tp_losses, tp_snapshots = [], []
    for k in range(K):
        # reference: mean grads over the 2 images + the DP center tail
        (ref_loss, deltas), ref_grads = jax.value_and_grad(
            ref_loss_fn, has_aux=True)(p_ref)
        p_ref, s_ref = sgd.update(p_ref, ref_grads, s_ref, lrs[k], hp,
                                  frozen)
        cf, accum = center_ops.center_update(
            p_ref['center_feature'], accum,
            {'center_dcf': deltas['__center_dcf'],
             'center_ndcf': deltas['__center_ndcf']},
            s_ref['it'], spec.center_loss_top_k, update=2)
        p_ref = dict(p_ref)
        p_ref['center_feature'] = cf

        p_tp, s_tp, loss, aux = step(p_tp, s_tp, batch, lrs[k],
                                     jax.random.PRNGKey(1))
        tp_losses.append(float(loss))
        tp_snapshots.append(np.asarray(p_tp['center_feature']))
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5,
                                   err_msg='step %d' % k)
        assert not any(n.startswith('__') for n in aux)
        np.testing.assert_allclose(
            np.asarray(p_tp['center_feature']),
            np.asarray(p_ref['center_feature']),
            rtol=1e-4, atol=1e-7, err_msg='center_feature step %d' % k)
        np.testing.assert_allclose(
            np.asarray(s_tp['center_dcf']),
            np.asarray(accum['center_dcf']),
            rtol=1e-4, atol=1e-6, err_msg='center_dcf step %d' % k)
        if k == 0:
            np.testing.assert_array_equal(
                np.asarray(p_tp['center_feature']), cf0)
    assert not np.allclose(np.asarray(p_tp['center_feature']), cf0)
    for name in ('fc6_w', 'fc7_b', 'fc8c_w'):
        np.testing.assert_allclose(np.asarray(p_tp[name]),
                                   np.asarray(p_ref[name]),
                                   rtol=1e-4, atol=1e-6, err_msg=name)

    # scan-of-K driver carries the center accumulators identically
    multi = tsh.make_tp_multi_train_step(spec, hp, mults, mesh, params,
                                         dropout=False,
                                         center_update_period=2)
    stacked = {k: jnp.stack([batch[k]] * K) for k in batch}
    p_m, s_m, losses, _ = multi(params, opt0, stacked, jnp.asarray(lrs),
                                jnp.ones((K,), jnp.float32),
                                jnp.stack([jax.random.PRNGKey(1)] * K))
    np.testing.assert_allclose(np.asarray(losses), np.asarray(tp_losses),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_m['center_feature']),
                               tp_snapshots[-1], rtol=1e-5, atol=1e-7)


def _supervised_batch(num_classes=4, r=64, seed=0):
    """Precomputed-proposal Fast R-CNN blobs (data/fast_rcnn.py schema)."""
    rng = np.random.RandomState(seed)
    x1 = rng.uniform(0, 20, r)
    y1 = rng.uniform(0, 20, r)
    return {
        'image': jnp.asarray(rng.randn(1, 48, 48, 3).astype(np.float32)),
        'rois': jnp.asarray(np.stack(
            [np.zeros(r), x1, y1, x1 + 16, y1 + 16], 1).astype(np.float32)),
        'obn_scores': jnp.asarray(np.ones((r, 1), np.float32)),
        'labels_int32': jnp.asarray(
            rng.randint(0, num_classes, r).astype(np.int32)),
        'bbox_targets': jnp.asarray(
            rng.randn(r, 4 * num_classes).astype(np.float32)),
        'bbox_inside_weights': jnp.asarray(
            (rng.rand(r, 4 * num_classes) > 0.8).astype(np.float32)),
        'bbox_outside_weights': jnp.asarray(
            np.ones((r, 4 * num_classes), np.float32)),
        'valid_mask': jnp.asarray(np.arange(r) < r - 5),
    }


def _supervised_spec():
    return detector.ModelSpec(
        num_classes=4, box_head='vgg16_2fc', webly_on=False,
        webly_entropy=False, hidden_dim=16, supervised=True,
        freeze_conv_body=True, compute_dtype='float32')


def test_tp_supervised_matches_unsharded():
    """Supervised Fast R-CNN 2fc head under TP (8 hidden shards): same
    towers, tail switched to detector.fast_rcnn_tail_losses — one TP step
    must equal the unsharded step."""
    spec = _supervised_spec()
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    batch = _supervised_batch(spec.num_classes)

    (ref_loss, ref_aux), ref_grads = jax.value_and_grad(
        lambda p: detector.forward_train(spec, p, batch, None),
        has_aux=True)(params)

    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    opt_state = sgd.init_state(params, hp)
    ref_upd, _ = sgd.update(params, ref_grads, opt_state, np.float32(1e-3),
                            hp, sgd.freeze_mults(mults))

    mesh = tsh.make_tp_mesh(n_model=8, n_data=1)
    step = tsh.make_tp_train_step(spec, hp, mults, mesh, params,
                                  dropout=False)
    p2, s2, loss, aux = step(params, opt_state, _stack([batch]),
                             np.float32(1e-3), jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    for k in ('loss_cls', 'loss_bbox', 'accuracy_cls'):
        np.testing.assert_allclose(float(aux[k]), float(ref_aux[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)
    for k in ('fc6_w', 'fc6_b', 'fc7_w', 'fc7_b', 'cls_score_w',
              'cls_score_b', 'bbox_pred_w', 'bbox_pred_b'):
        np.testing.assert_allclose(np.asarray(p2[k]), np.asarray(ref_upd[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_tp_rejects_supervised_variants_outside_scope():
    """mask/keypoint/res5 supervised variants stay on the DP step
    (end-to-end Faster R-CNN itself IS admitted — tower injection)."""
    base = dict(num_classes=4, box_head='vgg16_2fc', webly_on=False,
                webly_entropy=False, hidden_dim=16, supervised=True,
                freeze_conv_body=True)
    for bad in (dict(mask_on=True), dict(keypoints_on=True),
                dict(box_head='res5_head')):
        spec = detector.ModelSpec(**{**base, **bad})
        # the gate fires before params are touched
        with pytest.raises(NotImplementedError):
            tsh.forward_train_tp(spec, {},
                                 _supervised_batch(spec.num_classes), None)


def _family_specs():
    """The families check_scope newly admits (round 3): everything
    downstream of the towers runs detector.wsl_tail_losses unchanged."""
    base = dict(num_classes=5, hidden_dim=16, webly_on=False,
                webly_entropy=False, box_head='vgg16_2fc',
                compute_dtype='float32')
    yield 'oicr', detector.ModelSpec(oicr=True, **base)
    yield 'pcl_device', detector.ModelSpec(pcl=True, pcl_device=True, **base)
    yield 'cmil', detector.ModelSpec(cmil=True, **base)
    yield 'min_entropy', detector.ModelSpec(min_entropy_loss=True, **base)
    yield 'context', detector.ModelSpec(
        **{**base, 'box_head': 'vgg16_context_2fc'})
    # fcn MIL mask branch (round-3 continuation): replicated conv feats +
    # replicated mask tower, row-local loss — identical on every model
    # rank like the fc8 heads (the deeplab branch stays rejected: its CPG
    # inner vjp re-runs the towers unsharded)
    yield 'seg_fcn', detector.ModelSpec(mask_on=True, mask_head='fcn',
                                        mask_num_convs=2, mask_resolution=7,
                                        **base)


@pytest.mark.parametrize('name,spec', list(_family_specs()),
                         ids=[n for n, _ in _family_specs()])
def test_tp_ladder_and_context_match_unsharded(name, spec):
    """8 hidden shards x 1 data row: one TP step == the unsharded step for
    the OICR / PCL / C-MIL / min-entropy / context / fcn-mask families."""
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    img = _one_image(spec.num_classes)

    (ref_loss, _), ref_grads = jax.value_and_grad(
        lambda p: detector.forward_train(spec, p, img, None),
        has_aux=True)(params)

    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    opt_state = sgd.init_state(params, hp)
    ref_upd, _ = sgd.update(params, ref_grads, opt_state, np.float32(1e-3),
                            hp, sgd.freeze_mults(mults))

    mesh = tsh.make_tp_mesh(n_model=8, n_data=1)
    step = tsh.make_tp_train_step(spec, hp, mults, mesh, params,
                                  dropout=False)
    p2, s2, loss, aux = step(params, opt_state, _stack([img]),
                             np.float32(1e-3), jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    for k in sorted(params):
        np.testing.assert_allclose(np.asarray(p2[k]),
                                   np.asarray(ref_upd[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_tp_faster_rcnn_matches_unsharded():
    """End-to-end Faster R-CNN (RPN in-graph) under TP: the unsharded
    forward runs with the hidden-sharded tower injected
    (detector.forward_train(tower_fn=...)) — one TP step must equal the
    unsharded step (rng=None: deterministic proposal sampling, no
    dropout)."""
    spec = detector.ModelSpec(
        num_classes=4, hidden_dim=32, supervised=True, faster_rcnn=True,
        conv_body='vgg16_c5', box_head='vgg16_2fc', webly_on=False,
        webly_entropy=False, dilation=2, freeze_conv_body=False, freeze_at=0,
        rpn_stride=8, rpn_sizes=(16, 32), rpn_pre_nms_top_n=96,
        rpn_post_nms_top_n=16, rpn_test_pre_nms_top_n=96,
        rpn_test_post_nms_top_n=8, frcnn_batch_size=16,
        frcnn_fg_fraction=0.5, compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    gt = np.zeros((4, 4), np.float32)
    gt[0] = [12, 12, 44, 44]
    gc = np.zeros((4,), np.int32)
    gc[0] = 2
    gv = np.zeros((4,), bool)
    gv[0] = True
    batch = {
        'image': jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32)),
        'rois': jnp.zeros((1, 5), jnp.float32),
        'obn_scores': jnp.ones((1, 1), jnp.float32),
        'valid_mask': jnp.zeros((1,), bool),
        'gt_boxes': jnp.asarray(gt), 'gt_classes': jnp.asarray(gc),
        'gt_valid': jnp.asarray(gv),
        'im_info': jnp.asarray([64.0, 64.0, 1.0], jnp.float32),
    }

    (ref_loss, ref_aux), ref_grads = jax.value_and_grad(
        lambda p: detector.forward_train(spec, p, batch, None),
        has_aux=True)(params)

    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    opt_state = sgd.init_state(params, hp)
    ref_upd, _ = sgd.update(params, ref_grads, opt_state, np.float32(1e-3),
                            hp, sgd.freeze_mults(mults))

    mesh = tsh.make_tp_mesh(n_model=8, n_data=1)
    step = tsh.make_tp_train_step(spec, hp, mults, mesh, params,
                                  dropout=False)
    p2, s2, loss, aux = step(params, opt_state, _stack([batch]),
                             np.float32(1e-3), jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    for k in ('loss_cls', 'loss_bbox', 'loss_rpn_cls', 'loss_rpn_bbox'):
        np.testing.assert_allclose(float(aux[k]), float(ref_aux[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)
    # sharded towers, replicated RPN head + outputs + trainable conv body
    for k in ('fc6_w', 'fc7_w', 'cls_score_w', 'bbox_pred_w',
              'conv_rpn_w', 'rpn_cls_logits_w', 'conv5_3_w'):
        np.testing.assert_allclose(np.asarray(p2[k]), np.asarray(ref_upd[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)

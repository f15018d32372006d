"""RoI-dimension sharding (parallel/roi_shard.py): the sharded forward and
train step must match the unsharded detector.forward_train numerically on
the virtual 8-device CPU mesh (SURVEY.md §2.3 / §5.7 — the proposal-axis
'tensor parallel' analogue)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nafwebsod_tpu.models import detector
from nafwebsod_tpu.parallel import roi_shard
from nafwebsod_tpu.solver import sgd


def _batch(num_classes, r=64, seed=0):
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
        'valid_mask': jnp.asarray(np.arange(r) < r - 5),  # incl. padding
    }


def _specs():
    yield detector.ModelSpec(num_classes=5, hidden_dim=16, webly_on=False,
                             webly_entropy=False, box_head='vgg16_2fc',
                             compute_dtype='float32')
    yield detector.ModelSpec(num_classes=5, hidden_dim=16,
                             compute_dtype='float32')  # webly + entropy


@pytest.mark.parametrize('spec_idx', [0, 1])
def test_sharded_forward_matches_unsharded(spec_idx):
    spec = list(_specs())[spec_idx]
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    batch = _batch(spec.num_classes)

    ref_loss, ref_aux = detector.forward_train(spec, params, batch, None)

    mesh = roi_shard.make_roi_mesh(8)
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(roi_shard.AXIS))

    @jax.jit
    def fwd(params, batch):
        specs = {'image': P(), 'rois': P(roi_shard.AXIS),
                 'obn_scores': P(roi_shard.AXIS),
                 'valid_mask': P(roi_shard.AXIS), 'labels_oh': P()}
        return jax.shard_map(
            lambda p, b: roi_shard.forward_train_roi_sharded(spec, p, b,
                                                             None),
            mesh=mesh, in_specs=(P(), specs), out_specs=(P(), P()),
            check_vma=False,
        )(params, batch)

    with mesh:
        loss, aux = fwd(params, batch)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    for k in ('loss_cls', 'accuracy_cls'):
        np.testing.assert_allclose(float(aux[k]), float(ref_aux[k]),
                                   rtol=2e-5, atol=1e-6)
    if spec.is_webly:
        np.testing.assert_allclose(float(aux['loss_cls_noise']),
                                   float(ref_aux['loss_cls_noise']),
                                   rtol=2e-5)


def test_sharded_step_grads_match_unsharded():
    spec = detector.ModelSpec(num_classes=5, hidden_dim=16,
                              compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    batch = _batch(spec.num_classes, seed=3)

    (_, _), ref_grads = jax.value_and_grad(
        lambda p: detector.forward_train(spec, p, batch, None),
        has_aux=True)(params)

    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    opt_state = sgd.init_state(params, hp)
    mesh = roi_shard.make_roi_mesh(8)
    step = roi_shard.make_roi_sharded_train_step(spec, hp, mults, mesh)

    p2, s2, loss, aux = step(params, opt_state, batch, np.float32(1e-3),
                             None)
    assert np.isfinite(float(loss))

    # re-derive the sharded grads from the SGD update (momentum state holds
    # v = mu*0 + lr*(g + wd*p) after one step) and compare the head weights
    ref_upd, _ = sgd.update(params, ref_grads, opt_state, np.float32(1e-3),
                            hp, sgd.freeze_mults(mults))
    for k in ('fc8c_w', 'fc8d_w', 'fc6_w', 'noisy_fc8c_w'):
        np.testing.assert_allclose(np.asarray(p2[k]),
                                   np.asarray(ref_upd[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_sharded_step_learns():
    spec = detector.ModelSpec(num_classes=5, hidden_dim=16,
                              compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    opt_state = sgd.init_state(params, hp)
    mesh = roi_shard.make_roi_mesh(8)
    step = roi_shard.make_roi_sharded_train_step(spec, hp, mults, mesh)
    batch = _batch(spec.num_classes, seed=4)
    rng = jax.random.PRNGKey(7)
    losses = []
    for i in range(6):
        params, opt_state, loss, _ = step(params, opt_state, batch,
                                          np.float32(5e-4),
                                          jax.random.fold_in(rng, i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_sharded_rejects_unsupported_branches():
    """Specs outside the sharded-step scope raise at the gate (CSC and the
    seg heads are ADMITTED by this step — standalone CPG, host-path PCL,
    and C-MIL+mask are not)."""
    base = dict(num_classes=5, hidden_dim=16, webly_on=False,
                box_head='vgg16_2fc')
    for bad in (detector.ModelSpec(cpg=True, **base),           # standalone CPG
                detector.ModelSpec(pcl=True, oicr=True,
                                   pcl_device=False, **base),   # host-path PCL
                detector.ModelSpec(cmil=True, mask_on=True,
                                   mask_head='fcn', **base)):   # C-MIL + mask
        params = detector.init_params(bad, jax.random.PRNGKey(0))
        with pytest.raises(NotImplementedError):
            roi_shard.forward_train_roi_sharded(
                bad, params, _batch(bad.num_classes), None)


def _family_specs():
    """Families the RoI-sharded step admits beyond plain WSDDN/webly
    (round-3 widening): OICR ladder, min-entropy, context head, plus the
    gathered-table PCL(device) and C-MIL ladders."""
    base = dict(num_classes=5, hidden_dim=16, webly_on=False,
                webly_entropy=False, box_head='vgg16_2fc',
                compute_dtype='float32')
    yield 'oicr', detector.ModelSpec(oicr=True, **base)
    yield 'min_entropy', detector.ModelSpec(min_entropy_loss=True, **base)
    yield 'context', detector.ModelSpec(
        **{**base, 'box_head': 'vgg16_context_2fc'})
    yield 'pcl', detector.ModelSpec(pcl=True, pcl_device=True, **base)
    yield 'cmil', detector.ModelSpec(cmil=True, **base)
    yield 'center', detector.ModelSpec(center_loss=True,
                                       center_loss_number=3,
                                       center_loss_top_k=2, **base)


@pytest.mark.parametrize('name,spec', list(_family_specs()),
                         ids=[n for n, _ in _family_specs()])
def test_sharded_family_forward_matches_unsharded(name, spec):
    """RoI-sharded OICR / min-entropy / context forward == unsharded
    (global seed argmax + psum'd SoftmaxWithLossN normalizers; the
    context head's global RoI softmax)."""
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    batch = dict(_batch(spec.num_classes, seed=5))
    if spec.is_context:
        batch['im_hw'] = jnp.asarray([48, 48], jnp.int32)
    if spec.cmil:
        batch['cur_iter'] = jnp.asarray(120.0, jnp.float32)

    ref_loss, ref_aux = detector.forward_train(spec, params, batch, None)

    mesh = roi_shard.make_roi_mesh(8)
    from jax.sharding import PartitionSpec as P

    specs = {'image': P(), 'rois': P(roi_shard.AXIS),
             'obn_scores': P(roi_shard.AXIS),
             'valid_mask': P(roi_shard.AXIS), 'labels_oh': P()}
    if spec.is_context:
        specs['im_hw'] = P()
    if spec.cmil:
        specs['cur_iter'] = P()

    @jax.jit
    def fwd(params, batch):
        return jax.shard_map(
            lambda p, b: roi_shard.forward_train_roi_sharded(spec, p, b,
                                                             None),
            mesh=mesh, in_specs=(P(), specs), out_specs=(P(), P()),
            check_vma=False,
        )(params, batch)

    with mesh:
        loss, aux = fwd(params, batch)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    for k in ref_aux:
        # center deltas ('__center_dcf' etc.) are arrays
        np.testing.assert_allclose(np.asarray(aux[k]),
                                   np.asarray(ref_aux[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)


def test_sharded_oicr_step_grads_match_unsharded():
    """The ladder's custom-VJP loss must stay consistent with the step's
    pmean-of-inflated-grads convention: one OICR step == the unsharded
    update, including the cls_score{k} refinement classifiers."""
    spec = detector.ModelSpec(num_classes=5, hidden_dim=16, oicr=True,
                              webly_on=False, webly_entropy=False,
                              box_head='vgg16_2fc', compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    batch = _batch(spec.num_classes, seed=6)

    (_, _), ref_grads = jax.value_and_grad(
        lambda p: detector.forward_train(spec, p, batch, None),
        has_aux=True)(params)

    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    opt_state = sgd.init_state(params, hp)
    mesh = roi_shard.make_roi_mesh(8)
    step = roi_shard.make_roi_sharded_train_step(spec, hp, mults, mesh)
    p2, s2, loss, aux = step(params, opt_state, batch, np.float32(1e-3),
                             None)
    assert np.isfinite(float(loss))
    assert 'loss_cls3' in aux

    ref_upd, _ = sgd.update(params, ref_grads, opt_state, np.float32(1e-3),
                            hp, sgd.freeze_mults(mults))
    for k in ('fc8c_w', 'fc8d_w', 'fc6_w', 'cls_score1_w', 'cls_score2_w',
              'cls_score3_w'):
        np.testing.assert_allclose(np.asarray(p2[k]),
                                   np.asarray(ref_upd[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


@pytest.mark.parametrize('family', ['pcl', 'cmil'])
def test_sharded_gathered_ladder_step_grads_match_unsharded(family):
    """The PCL / C-MIL ladders run replicated on differentiably-gathered
    class-dim tables: the all_gather transpose's n-fold inflation must
    cancel against the step's outer pmean so one sharded step == the
    unsharded update, including the cls_score{k} refinement towers."""
    spec = dict(_family_specs())[family]
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    batch = dict(_batch(spec.num_classes, seed=11))
    if spec.cmil:
        batch['cur_iter'] = jnp.asarray(120.0, jnp.float32)

    (_, _), ref_grads = jax.value_and_grad(
        lambda p: detector.forward_train(spec, p, batch, None),
        has_aux=True)(params)

    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    opt_state = sgd.init_state(params, hp)
    mesh = roi_shard.make_roi_mesh(8)
    step = roi_shard.make_roi_sharded_train_step(spec, hp, mults, mesh)
    p2, s2, loss, aux = step(params, opt_state, batch, np.float32(1e-3),
                             None)
    assert np.isfinite(float(loss))
    assert 'loss_cls{}'.format(spec.refine_k) in aux

    ref_upd, _ = sgd.update(params, ref_grads, opt_state, np.float32(1e-3),
                            hp, sgd.freeze_mults(mults))
    names = ['fc8c_w', 'fc8d_w', 'fc6_w'] + [
        'cls_score{}_w'.format(k) for k in range(1, spec.refine_k + 1)]
    for k in names:
        np.testing.assert_allclose(np.asarray(p2[k]),
                                   np.asarray(ref_upd[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_sharded_center_step_matches_unsharded():
    """Center loss under RoI sharding: the global top-k is re-selected from
    gathered per-device candidates, the tower grads match the unsharded
    update, and the period-1 center tail moves CF by the reference rule
    from the (replicated) deltas."""
    spec = dict(_family_specs())['center']
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    batch = dict(_batch(spec.num_classes, seed=13))
    batch['cur_iter'] = jnp.asarray(0.0, jnp.float32)

    ((_, ref_aux), ref_grads) = jax.value_and_grad(
        lambda p: detector.forward_train(spec, p, batch, None),
        has_aux=True)(params)

    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    opt_state = sgd.init_state(params, hp)
    cf = np.asarray(params['center_feature'])
    opt_state['center_dcf'] = jnp.zeros_like(params['center_feature'])
    opt_state['center_ndcf'] = jnp.zeros(cf.shape[:2], jnp.float32)
    mesh = roi_shard.make_roi_mesh(8)
    step = roi_shard.make_roi_sharded_train_step(spec, hp, mults, mesh,
                                                 center_update_period=1)
    p2, s2, loss, aux = step(params, opt_state, batch, np.float32(1e-3),
                             None)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(aux['loss_center']),
                               float(ref_aux['loss_center']), rtol=2e-5)

    ref_upd, _ = sgd.update(params, ref_grads, opt_state, np.float32(1e-3),
                            hp, sgd.freeze_mults(mults))
    for k in ('fc8c_w', 'fc8d_w', 'fc6_w'):
        np.testing.assert_allclose(np.asarray(p2[k]),
                                   np.asarray(ref_upd[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)

    # period-1 tail: CF -= 0.5 * dCF / (ndCF * K + 1) with the fresh deltas
    dcf = np.asarray(ref_aux['__center_dcf'])
    ndcf = np.asarray(ref_aux['__center_ndcf'])
    expect = cf - 0.5 * dcf / (ndcf * spec.center_loss_top_k + 1.0)[..., None]
    np.testing.assert_allclose(np.asarray(p2['center_feature']), expect,
                               rtol=1e-5, atol=1e-7)
    # and the accumulators reset after firing
    assert float(np.abs(np.asarray(s2['center_ndcf'])).max()) == 0.0


def test_sharded_multi_step_matches_chained_single_steps():
    """scan-of-K RoI-sharded driver == K host-driven single steps,
    including an in-window momentum-correction factor (the
    TPU.STEPS_PER_CALL contract the other sharded steps already honor)."""
    spec = detector.ModelSpec(num_classes=5, hidden_dim=16, oicr=True,
                              webly_on=False, webly_entropy=False,
                              box_head='vgg16_2fc', compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    mesh = roi_shard.make_roi_mesh(8)

    K = 3
    batches = [_batch(spec.num_classes, seed=20 + k) for k in range(K)]
    rngs = jax.random.split(jax.random.PRNGKey(9), K)
    lrs = jnp.asarray([1e-3, 1e-3, 5e-4], jnp.float32)
    factors = jnp.asarray([1.0, 1.0, 0.5], jnp.float32)

    single = roi_shard.make_roi_sharded_train_step(spec, hp, mults, mesh)
    p_ref, s_ref = params, sgd.init_state(params, hp)
    ref_losses = []
    for k in range(K):
        s_ref = sgd.scale_momentum(s_ref, factors[k])
        p_ref, s_ref, loss, _ = single(p_ref, s_ref, batches[k], lrs[k],
                                       rngs[k])
        ref_losses.append(float(loss))

    multi = roi_shard.make_roi_sharded_multi_train_step(spec, hp, mults,
                                                        mesh)
    stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
    p_m, s_m, losses, _ = multi(params, sgd.init_state(params, hp),
                                stacked, lrs, factors, rngs)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(ref_losses),
                               rtol=1e-5)
    for name in ('fc6_w', 'fc8c_w', 'cls_score1_w'):
        np.testing.assert_allclose(np.asarray(p_m[name]),
                                   np.asarray(p_ref[name]),
                                   rtol=1e-4, atol=1e-6, err_msg=name)


def test_roi_shard_supervised_matches_unsharded():
    """Supervised Fast R-CNN 2fc head with the RoI axis sharded: the
    psum-normalized losses (fast_rcnn_losses_sharded) and the step's
    parameter update must match the unsharded detector.forward_train."""
    spec = detector.ModelSpec(
        num_classes=4, box_head='vgg16_2fc', webly_on=False,
        webly_entropy=False, hidden_dim=16, supervised=True,
        freeze_conv_body=True, compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    r, c = 64, spec.num_classes
    x1 = rng.uniform(0, 20, r)
    y1 = rng.uniform(0, 20, r)
    batch = {
        'image': jnp.asarray(rng.randn(1, 48, 48, 3).astype(np.float32)),
        'rois': jnp.asarray(np.stack(
            [np.zeros(r), x1, y1, x1 + 16, y1 + 16], 1).astype(np.float32)),
        'obn_scores': jnp.asarray(np.ones((r, 1), np.float32)),
        'labels_int32': jnp.asarray(rng.randint(0, c, r).astype(np.int32)),
        'bbox_targets': jnp.asarray(rng.randn(r, 4 * c).astype(np.float32)),
        'bbox_inside_weights': jnp.asarray(
            (rng.rand(r, 4 * c) > 0.8).astype(np.float32)),
        'bbox_outside_weights': jnp.asarray(
            np.ones((r, 4 * c), np.float32)),
        'valid_mask': jnp.asarray(np.arange(r) < r - 5),
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

    mesh = roi_shard.make_roi_mesh(8)
    step = roi_shard.make_roi_sharded_train_step(spec, hp, mults, mesh)
    p2, s2, loss, aux = step(params, opt_state, batch, np.float32(1e-3),
                             None)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    for k in ('loss_cls', 'loss_bbox', 'accuracy_cls'):
        np.testing.assert_allclose(float(aux[k]), float(ref_aux[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)
    for k in ('fc6_w', 'fc7_w', 'cls_score_w', 'cls_score_b',
              'bbox_pred_w', 'bbox_pred_b'):
        np.testing.assert_allclose(np.asarray(p2[k]),
                                   np.asarray(ref_upd[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_roi_shard_fcn_mask_matches_unsharded():
    """The WSL fcn MIL mask branch under RoI sharding: the mask head runs
    on the local pooled rows and the AveragedLoss normalization is psum'd
    — one step must match the unsharded mask_loss_cls and the mask-tower
    parameter update."""
    spec = detector.ModelSpec(num_classes=5, hidden_dim=16, webly_on=False,
                              webly_entropy=False, box_head='vgg16_2fc',
                              mask_on=True, mask_head='fcn',
                              mask_num_convs=2, mask_resolution=7,
                              compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    batch = dict(_batch(spec.num_classes, seed=17))
    batch['cur_iter'] = jnp.zeros(())

    (ref_loss, ref_aux), ref_grads = jax.value_and_grad(
        lambda p: detector.forward_train(spec, p, batch, None),
        has_aux=True)(params)

    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    opt_state = sgd.init_state(params, hp)
    ref_upd, _ = sgd.update(params, ref_grads, opt_state, np.float32(1e-3),
                            hp, sgd.freeze_mults(mults))

    mesh = roi_shard.make_roi_mesh(8)
    step = roi_shard.make_roi_sharded_train_step(spec, hp, mults, mesh)
    p2, s2, loss, aux = step(params, opt_state, batch, np.float32(1e-3),
                             None)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    for k in ('loss_cls', 'mask_loss_cls', 'accuracy_cls'):
        np.testing.assert_allclose(float(aux[k]), float(ref_aux[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)
    for k in ('fc6_w', 'fc8c_w', 'fc8d_w', '_[mask]_fcn1_w',
              '_[mask]_fcn2_w', 'mask_fcn_logits_w'):
        if k not in p2:
            continue
        np.testing.assert_allclose(np.asarray(p2[k]),
                                   np.asarray(ref_upd[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_roi_shard_deeplab_matches_unsharded():
    """The WSL deeplab seg branch under RoI sharding: CPG pseudo-labels
    come from the image-vjp of the SHARDED forward (psum'd raw gradients,
    the CSC machinery), the image-level ASPP/CRF losses run replicated —
    one step must match the unsharded update including the ASPP towers."""
    spec = detector.ModelSpec(num_classes=5, hidden_dim=16, webly_on=False,
                              webly_entropy=False, box_head='vgg16_2fc',
                              mask_on=True, mask_head='deeplab',
                              cpg=True, max_gt_cpg=2,
                              compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    batch = dict(_batch(spec.num_classes, seed=19))
    batch['cur_iter'] = jnp.zeros(())

    (ref_loss, ref_aux), ref_grads = jax.value_and_grad(
        lambda p: detector.forward_train(spec, p, batch, None),
        has_aux=True)(params)

    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    opt_state = sgd.init_state(params, hp)
    ref_upd, _ = sgd.update(params, ref_grads, opt_state, np.float32(1e-3),
                            hp, sgd.freeze_mults(mults))

    mesh = roi_shard.make_roi_mesh(8)
    step = roi_shard.make_roi_sharded_train_step(spec, hp, mults, mesh)
    p2, s2, loss, aux = step(params, opt_state, batch, np.float32(1e-3),
                             None)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    for k in ('loss_cls', 'mask_seed_loss', 'mask_constraint_loss',
              'accuracy_cls'):
        np.testing.assert_allclose(float(aux[k]), float(ref_aux[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)
    # the box towers see sharded rows; the ASPP towers train replicated
    for k in ('fc6_w', 'fc8c_w', 'fc8d_w', 'fc6_1_w', 'fc7_1_w',
              'mask_fc8_1_w', 'mask_fc8_4_w'):
        np.testing.assert_allclose(np.asarray(p2[k]),
                                   np.asarray(ref_upd[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_roi_shard_csc_matches_unsharded():
    """CSC under RoI sharding: the CPG saliency comes from the image-vjp
    of the SHARDED forward (raw per-seed grads psum'd before the
    channel-max, /n for the exact CPGScale keep gate), contrastive scores
    live on local roi rows with pmax/pmin class normalization — one step
    must match the unsharded CSC step."""
    spec = detector.ModelSpec(num_classes=5, hidden_dim=16, webly_on=False,
                              webly_entropy=False, box_head='vgg16_2fc',
                              csc=True, cpg=True, max_gt_cpg=2,
                              compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    batch = _batch(spec.num_classes, seed=5)
    batch['cur_iter'] = jnp.zeros(())

    (ref_loss, ref_aux), ref_grads = jax.value_and_grad(
        lambda p: detector.forward_train(spec, p, batch, None),
        has_aux=True)(params)

    hp = sgd.SGDHyperParams(momentum=0.9, weight_decay=0.0005, iter_size=1)
    trainable = detector.trainable_param_names(spec, params)
    mults = sgd.param_multipliers(params, trainable)
    opt_state = sgd.init_state(params, hp)
    ref_upd, _ = sgd.update(params, ref_grads, opt_state, np.float32(1e-3),
                            hp, sgd.freeze_mults(mults))

    mesh = roi_shard.make_roi_mesh(8)
    step = roi_shard.make_roi_sharded_train_step(spec, hp, mults, mesh)
    p2, s2, loss, aux = step(params, opt_state, batch, np.float32(1e-3),
                             None)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    for k in ('loss_cls_pos', 'loss_cls_neg', 'accuracy_cls'):
        np.testing.assert_allclose(float(aux[k]), float(ref_aux[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)
    for k in ('fc6_w', 'fc7_w', 'fc8c_w', 'fc8d_w'):
        np.testing.assert_allclose(np.asarray(p2[k]),
                                   np.asarray(ref_upd[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)

    # past CSC_MAX_ITER the constraint deactivates (w == 1): pos CE ==
    # the plain CE and neg goes to the all-ones-weight value, matching
    # the unsharded inactive branch
    late = dict(batch)
    late['cur_iter'] = jnp.asarray(float(spec.csc_max_iter), jnp.float32)
    ref_late, ref_aux_late = detector.forward_train(spec, params, late,
                                                    None)
    _, _, loss_late, aux_late = step(params, opt_state, late,
                                     np.float32(1e-3), None)
    np.testing.assert_allclose(float(loss_late), float(ref_late),
                               rtol=2e-5)

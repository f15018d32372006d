"""RoI-dimension sharding — the TPU-native "tensor parallel" analogue.

The reference's only long axis is the proposal count (up to
TRAIN.BATCH_SIZE_PER_IM = 2048 RoIs/image, configs/flickr_voc/
na_wsddn_V-16-C5_1x.yaml:30): the RoI features materialize as
(R, 25088) -> fc6 -> (R, 4096) activations, the memory and FLOP hot spot
(SURVEY.md §5.7). This module shards that axis over the device mesh with
explicit XLA collectives, instead of replicating the whole tower per
device as the data-parallel step does:

  * each device pools and runs the fc towers on R/n local RoIs;
  * the RoI-dimension softmax (alpha_det) becomes a pmax/psum softmax;
  * the image-level class score is a psum of local partial sums;
  * the spatial-entropy weighting's J@E matvec computes local IoU ROWS
    against an all-gathered (R, 5) rois / (R, C) entropy table — the only
    gathered tensors are small;
  * parameter gradients are psum-reduced.

Numerics match the unsharded forward to fp32 summation-order tolerance
(pinned by tests/test_roi_shard.py on the virtual 8-device CPU mesh).
Supported for the plain WSDDN and webly noise-aware heads (the refinement
ladders / context / CSC / mask branches keep the data-parallel path).
Enable with TPU.ROI_SHARDING (mesh axis 'roi').
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nafwebsod_tpu.models import detector, heads
from nafwebsod_tpu.parallel.mesh import shard_map_compat as _shard_map
from nafwebsod_tpu.ops import losses as loss_ops
from nafwebsod_tpu.ops.jbox import iou_matrix
from nafwebsod_tpu.solver import sgd

AXIS = 'roi'


def make_roi_mesh(num_devices=None):
    """1-D mesh over the RoI axis."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def _two_stream_sharded(fc8c, fc8d, valid_local, axis):
    """alpha_cls (local, class softmax) x alpha_det (GLOBAL RoI softmax via
    pmax/psum) -> local rows of rois_pred (heads._two_stream semantics)."""
    alpha_cls = jax.nn.softmax(fc8c, axis=1)
    neg_inf = jnp.finfo(fc8d.dtype).min
    if valid_local is not None:
        fc8d = jnp.where(valid_local[:, None], fc8d, neg_inf)
    # stability shift only — softmax grads are invariant to it, and
    # jax.nn.softmax stop-gradients its own max the same way (pmax has no
    # differentiation rule)
    m = jax.lax.pmax(
        jnp.max(jax.lax.stop_gradient(fc8d), axis=0), axis)   # (C,)
    z = jnp.exp(fc8d - m[None, :])
    denom = jax.lax.psum(jnp.sum(z, axis=0), axis)         # (C,)
    alpha_det = z / denom[None, :]
    rois_pred = alpha_cls * alpha_det
    if valid_local is not None:
        rois_pred = rois_pred * valid_local[:, None]
    return rois_pred


def wsl_outputs_sharded(params, fc7_local, valid_local, axis, prefix=''):
    fc8c = heads._fc(fc7_local, params, prefix + 'fc8c',
                     out_dtype=jnp.float32)
    fc8d = heads._fc(fc7_local, params, prefix + 'fc8d',
                     out_dtype=jnp.float32)
    rois_pred = _two_stream_sharded(fc8c, fc8d, valid_local, axis)
    return {'fc8c': fc8c, 'fc8d': fc8d, 'rois_pred': rois_pred}


def webly_outputs_sharded(params, fc7_clean, fc7_noisy, valid_local, axis,
                          prefix=''):
    out = wsl_outputs_sharded(params, fc7_clean, valid_local, axis, prefix)
    noisy_c = heads._fc(fc7_noisy, params, prefix + 'noisy_fc8c',
                        out_dtype=jnp.float32)
    noisy_d = heads._fc(fc7_noisy, params, prefix + 'noisy_fc8d',
                        out_dtype=jnp.float32)
    out['rois_pred_noise'] = _two_stream_sharded(
        out['fc8c'] + noisy_c, out['fc8d'] + noisy_d, valid_local, axis)
    return out


def cls_pred_sharded(rois_pred_local, axis):
    """Image score = global sum over RoIs (wsl_heads.py:227)."""
    return jax.lax.psum(
        jnp.sum(rois_pred_local, axis=0, keepdims=True), axis)


def spatial_entropy_weights_sharded(rois_pred_local, cls_prob, rois_local,
                                    labels_oh, valid_local, axis):
    """Sharded ops/entropy.spatial_entropy_weights: local IoU ROWS against
    the all-gathered global rois; hat-E column sums psum-reduced."""
    rl = rois_pred_local.shape[0]
    valid = valid_local.astype(rois_pred_local.dtype)
    n_valid = jax.lax.psum(jnp.sum(valid), axis)

    rois_g = jax.lax.all_gather(rois_local, axis, tiled=True)     # (R, 5)
    valid_g = jax.lax.all_gather(valid, axis, tiled=True)         # (R,)

    # local rows of J (int-truncated coords, exact-1 diagonal at the
    # global index of each local roi — ops/jbox.roi_iou semantics)
    boxes_l = jnp.floor(rois_local[:, 1:5]).astype(jnp.float32)
    boxes_g = jnp.floor(rois_g[:, 1:5]).astype(jnp.float32)
    j = iou_matrix(boxes_l, boxes_g)                              # (Rl, R)
    gid = jax.lax.axis_index(axis) * rl + jnp.arange(rl)
    diag = gid[:, None] == jnp.arange(rois_g.shape[0])[None, :]
    j = jnp.where(diag, 1.0, j)
    j = j * valid[:, None] * valid_g[None, :]

    logp = jnp.log(rois_pred_local)
    e = -(rois_pred_local * logp)
    e = jnp.where(jnp.isnan(e), 0.0, e)
    e = jnp.where(jnp.isinf(e), 0.0, e) * valid[:, None]          # (Rl, C)
    e_g = jax.lax.all_gather(e, axis, tiled=True)                 # (R, C)

    d = j @ e_g                                                   # (Rl, C)
    d = jnp.where(d >= 0, d, 0.01 * d)
    g = jnp.where(d != 0, e / d, 0.0)
    hat_e = e * g
    hat_e_sum = jax.lax.psum(jnp.sum(hat_e, axis=0, keepdims=True), axis)

    log_y = jnp.log(jnp.maximum(cls_prob, 1e-20))
    y_norm = (jnp.log(n_valid) - log_y) * cls_prob
    norm = jnp.where(y_norm != 0, hat_e_sum / y_norm, 0.0)
    norm = jnp.clip(norm, 0.0, 1.0)
    class_weight_noise = norm * (1.0 - labels_oh)
    class_weight = 1.0 - class_weight_noise
    return (jax.lax.stop_gradient(class_weight),
            jax.lax.stop_gradient(class_weight_noise))


def forward_train_roi_sharded(spec, params, batch, rng, axis=AXIS):
    """Per-device training forward on the local RoI shard. ``batch`` holds
    the REPLICATED image/labels and the LOCAL rois/obn_scores/valid_mask.
    Returns (total_loss, aux) — both replicated (psum-reduced)."""
    # base gate shared with the tensor-parallel / pipeline steps (an inline
    # copy had drifted: it missed is_fpn, fused_noise_tower, and the
    # box-head whitelist, letting unsupported specs crash mid-trace) — plus
    # the RoI-dim-specific exclusions: the ladders need the full RoI-RoI
    # IoU matrix and min-entropy/context need cross-shard reductions this
    # forward does not implement (the TP/pipeline steps admit them)
    from nafwebsod_tpu.parallel.wsl_losses import check_scope
    check_scope(spec, extra_unsupported=(spec.refine_k, spec.is_context,
                                         spec.cmil, spec.min_entropy_loss))

    image = batch['image']
    rois = batch['rois']
    obn = batch['obn_scores']
    labels_oh = batch['labels_oh']
    valid = batch['valid_mask']
    if rng is not None:
        # per-device mask streams (different local rows)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

    fc7_clean, fc7_noisy, _ = detector._run_body_and_head(
        spec, params, image, rois, obn, train=True, rng=rng)

    losses, aux = {}, {}
    if spec.is_webly:
        out = webly_outputs_sharded(params, fc7_clean, fc7_noisy, valid,
                                    axis)
        cls_prob = cls_pred_sharded(out['rois_pred'], axis)
        cls_prob_noise = cls_pred_sharded(out['rois_pred_noise'], axis)
        if spec.webly_entropy:
            cw, cwn = spatial_entropy_weights_sharded(
                out['rois_pred'], cls_prob, rois, labels_oh, valid, axis)
        else:
            cw = jnp.ones_like(labels_oh)
            cwn = jnp.ones_like(labels_oh)
        losses['loss_cls'] = loss_ops.weighted_cross_entropy_with_logits(
            cls_prob, labels_oh, cw, spec.mean_loss)
        losses['loss_cls_noise'] = (
            loss_ops.weighted_cross_entropy_with_logits(
                cls_prob_noise, labels_oh, cwn, spec.mean_loss))
        aux['accuracy_cls'] = loss_ops.multilabel_accuracy(cls_prob,
                                                           labels_oh)
        aux['accuracy_cls_noise'] = loss_ops.multilabel_accuracy(
            cls_prob_noise, labels_oh)
    else:
        out = wsl_outputs_sharded(params, fc7_clean, valid, axis)
        cls_prob = cls_pred_sharded(out['rois_pred'], axis)
        losses['loss_cls'] = loss_ops.cross_entropy_with_logits(
            cls_prob, labels_oh, spec.mean_loss)
        aux['accuracy_cls'] = loss_ops.multilabel_accuracy(cls_prob,
                                                           labels_oh)

    total = sum(losses.values())
    aux.update(losses)
    return total, aux


def make_roi_sharded_train_step(spec, hp, mults, mesh, donate=False):
    """Jitted train step with RoIs sharded over the mesh axis 'roi':
    ``step(params, opt_state, batch, lr, rng) -> (params, opt_state, loss,
    aux)``. ``batch['rois'/'obn_scores'/'valid_mask']`` are global (R, ...)
    arrays sharded on axis 0; image/labels are replicated."""
    mults = sgd.freeze_mults(mults) if isinstance(mults, dict) else mults
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(AXIS))

    # check_vma=False: the FFI RoIPool's ffi_call declares plain
    # ShapeDtypeStructs (no vma annotation), and the psum-transpose
    # semantics under the legacy mode match the explicit grads psum below
    # (pinned exact vs the unsharded grads in tests/test_roi_shard.py)
    @partial(_shard_map, mesh=mesh,
             in_specs=(P(), {'image': P(), 'rois': P(AXIS),
                             'obn_scores': P(AXIS), 'valid_mask': P(AXIS),
                             'labels_oh': P()}, P()),
             out_specs=(P(), P(), P()))
    def grads_fn(params, batch, rng):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: forward_train_roi_sharded(spec, p, batch, rng),
            has_aux=True)(params)
        # under check_vma=False the psum transpose re-broadcasts loss
        # cotangents into every device's replica, so the device-local
        # grads SUM to n x the true gradient: pmean recovers it (pinned
        # exactly vs the unsharded grads in tests/test_roi_shard.py)
        grads = jax.lax.pmean(grads, AXIS)
        return loss, aux, grads

    def step(params, opt_state, batch, lr, rng):
        loss, aux, grads = grads_fn(params, batch, rng)
        params, opt_state = sgd.update(params, grads, opt_state, lr, hp,
                                       mults)
        return params, opt_state, loss, aux

    batch_shardings = {'image': repl, 'rois': shard, 'obn_scores': shard,
                       'valid_mask': shard, 'labels_oh': repl}
    return jax.jit(step,
                   in_shardings=(repl, repl, batch_shardings, repl, repl),
                   out_shardings=(repl, repl, repl, repl),
                   donate_argnums=(0, 1) if donate else ())

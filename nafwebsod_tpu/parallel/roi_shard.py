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
Supported for the plain WSDDN / webly noise-aware / CONTEXT heads with the
OICR / PCL(device) / C-MIL refinement ladders and min-entropy loss. OICR
stays fully sharded: seeds come from GLOBAL argmaxes (pmax +
first-occurrence pmin tie-break + one psum'd seed box per class), per-RoI
labeling is local rows vs the tiny seed table, and SoftmaxWithLossN
normalizes by psum'd weight-sum/count (softmax_with_loss_n_sharded).
PCL's clustering and C-MIL's clique growth span all RoIs but operate on
CLASS-dim (R, C)-scale tables — tiny next to the sharded (R, 25088)
towers — so those ladders all_gather the local refine/fc8 logits
DIFFERENTIABLY and run the unsharded target + loss ops replicated
(_refinement_losses_pcl_sharded, _cmil_losses_sharded). The supervised
precomputed-proposal Fast R-CNN 2fc head is admitted too: both of its
losses are valid-count-normalized per-row sums, sharded by psum'ing the
local numerators and the count (fast_rcnn_losses_sharded). CSC runs fully
sharded (_csc_losses_sharded): the CPG saliency is the image-vjp of the
SHARDED forward with the raw per-seed gradients psum'd across the shard
before the channel-max, contrastive scores stay on local roi rows, and
the per-class [-1,1] normalization takes its max/min via pmax/pmin.
The WSL seg heads are admitted too (the last family that was DP-only):
the fcn MIL mask branch pools/classifies LOCAL rows with a psum-normalized
AveragedLoss (mask_losses_sharded), and the deeplab branch reuses the CSC
image-vjp machinery for its CPG pseudo-labels while the image-level
ASPP/DeeplabUtility/CRF losses run replicated (_deeplab_losses_sharded).
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


def softmax_with_loss_n_sharded(logits, labels, roi_weights, axis):
    """``ops/losses.softmax_with_loss_n`` over RoIs sharded on ``axis``:
    forward normalizes by the GLOBAL weight sum, the hand-written backward
    by the GLOBAL count of nonzero-weight rows (the reference op's
    intentional asymmetry, softmax_with_loss_n_op.cc:209-360).

    The backward multiplies by the axis size: the caller's grads_fn runs
    under check_vma=False where every NON-custom psum transposes to a
    psum (n-fold inflating each device's grads) and recovers the truth
    with one outer ``pmean`` — a custom VJP blocks that transpose, so it
    must bake the n factor in itself to stay consistent (pinned vs the
    unsharded ladder in tests/test_roi_shard.py)."""
    return _swln_sharded(logits, labels, roi_weights, axis)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _swln_sharded(logits, labels, roi_weights, axis):
    logp = jax.nn.log_softmax(logits, axis=1)
    picked = logp[jnp.arange(logits.shape[0]), labels]
    total_w = jax.lax.psum(jnp.sum(roi_weights), axis)
    loss = jax.lax.psum(-jnp.sum(roi_weights * picked), axis)
    return jnp.where(total_w != 0, loss / total_w, 0.0)


def _swln_sharded_fwd(logits, labels, roi_weights, axis):
    return (_swln_sharded(logits, labels, roi_weights, axis),
            (logits, labels, roi_weights))


def _swln_sharded_bwd(axis, res, g):
    logits, labels, roi_weights = res
    r, c = logits.shape
    p = jax.nn.softmax(logits, axis=1)
    onehot = jax.nn.one_hot(labels, c, dtype=p.dtype)
    count = jax.lax.psum(jnp.sum(roi_weights != 0), axis)
    n = jax.lax.psum(jnp.ones((), p.dtype), axis)  # axis size
    scale = jnp.where(count > 0, g * n / count, 0.0)
    return roi_weights[:, None] * (p - onehot) * scale, None, None


_swln_sharded.defvjp(_swln_sharded_fwd, _swln_sharded_bwd)


def fast_rcnn_losses_sharded(spec, logits, bbox_pred, batch, valid_local,
                             axis):
    """Sharded ``detector._fast_rcnn_losses`` (fast_rcnn_heads.py:75-93)
    over the RoI axis: both losses are per-row sums normalized by the
    valid-RoI count, so the local numerators and the count psum across the
    shard. Plain autodiff (no custom VJP) — under the caller's
    check_vma=False shard_map the psum transposes re-broadcast and the
    outer grads ``pmean`` recovers the truth, like every other
    non-custom-VJP loss here."""
    labels = batch['labels_int32']
    v = valid_local.astype(jnp.float32)
    n = jnp.maximum(jax.lax.psum(jnp.sum(v), axis), 1.0)
    logp = jax.nn.log_softmax(logits, axis=1)
    picked = logp[jnp.arange(logits.shape[0]), labels] * v
    loss_cls = -jax.lax.psum(jnp.sum(picked), axis) / n
    # smooth-L1 (beta=1) of inside_weights * (pred - target), scaled by
    # outside_weights — ops/losses.smooth_l1_loss semantics
    d = batch['bbox_inside_weights'] * (bbox_pred - batch['bbox_targets'])
    ad = jnp.abs(d)
    elem = jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)
    elem = elem * batch['bbox_outside_weights'] * v[:, None]
    loss_bbox = jax.lax.psum(jnp.sum(elem), axis) / n
    acc = jax.lax.psum(
        jnp.sum((jnp.argmax(logits, 1) == labels) * v), axis) / n
    losses = {'loss_cls': loss_cls, 'loss_bbox': loss_bbox}
    aux = dict(losses)
    aux['accuracy_cls'] = acc
    return loss_cls + loss_bbox, aux


def _normalize_class_sharded(scores_local, axis):
    """``ops/cpg._normalize_class`` with the per-class max/min spanning the
    GLOBAL RoI axis (pmax/pmin over the shard): normalization to [-1, 1]
    per csc_op.cu:410-448."""
    from nafwebsod_tpu.ops.cpg import KMIN_SCORE
    is_min = scores_local == KMIN_SCORE
    max_v = jnp.maximum(jax.lax.pmax(jnp.max(scores_local), axis), 0.0)
    min_v = jnp.minimum(
        jax.lax.pmin(jnp.min(jnp.where(is_min, 0.0, scores_local)), axis),
        0.0)

    def pos_neg(s):
        return jnp.where(is_min, -1.0,
                         jnp.where(s > 0, s / max_v, s / (-min_v)))

    def pos_only(s):
        return jnp.where(is_min, -1.0, s / max_v)

    return jnp.where(
        (max_v > 0) & (min_v < 0), pos_neg(scores_local),
        jnp.where((max_v > 0) & (min_v == 0), pos_only(scores_local),
                  jnp.ones_like(scores_local)))


def _csc_losses_sharded(spec, params, out, image, rois_local, obn_local,
                        labels_oh, valid_local, cls_prob, cur_iter, rng,
                        im_hw, axis):
    """Sharded CSC branch (detector.wsl_tail_losses `spec.csc` arm): CPG
    saliency via the image-vjp of the SHARDED two-stream forward (raw
    gradients psum'd across the RoI shard before the channel-max — see
    ``cpg_maps(grad_reduce=...)``), per-RoI contrastive scores on the
    local rows with pmax/pmin class normalization, polar-split rois_pred
    -> psum'd image scores -> CE vs labels / zeros."""
    from dataclasses import replace as dc_replace

    from nafwebsod_tpu.ops import cpg as cpg_ops

    unfrozen = dc_replace(spec, freeze_conv_body=False, freeze_at=0,
                          csc=False, cpg=False)
    # CSC weights are constants downstream (stop_gradient on w) — the CPG
    # computation must be opaque to the outer training grad (same Pallas
    # pool-backward JVP argument as the unsharded branch)
    params_sg = jax.tree.map(jax.lax.stop_gradient, params)
    n = jax.lax.psum(jnp.ones(()), axis)

    def cls_prob_fn(im):
        fc7l, _, _ = detector._run_body_and_head(
            unfrozen, params_sg, im, rois_local, obn_local, train=True,
            rng=rng, im_hw=im_hw)
        o = wsl_outputs_sharded(params_sg, fc7l, valid_local, axis)
        return cls_pred_sharded(o['rois_pred'], axis)

    active = cur_iter < spec.csc_max_iter

    def compute_w(_):
        maps, idx, keep = cpg_ops.cpg_maps(
            cls_prob_fn, image, labels_oh,
            jax.lax.stop_gradient(cls_prob), tau=spec.cpg_tau,
            max_gt=spec.max_gt_cpg,
            grad_reduce=lambda g: jax.lax.psum(g, axis) / n)
        w, _, _ = cpg_ops.csc_weights(
            maps, idx, keep, rois_local, labels_oh,
            jax.lax.stop_gradient(cls_prob),
            fg_threshold=spec.csc_fg_threshold, context_scale=1.8,
            valid_mask=valid_local,
            normalize_fn=lambda s: _normalize_class_sharded(s, axis))
        return w

    w = jax.lax.cond(
        active, compute_w,
        lambda _: jnp.ones((rois_local.shape[0], spec.num_classes - 1),
                           jnp.float32), None)
    w = jax.lax.stop_gradient(w)
    pos = cls_pred_sharded(
        cpg_ops.csc_constraint(out['rois_pred'], w, True), axis)
    neg = cls_pred_sharded(
        cpg_ops.csc_constraint(out['rois_pred'], w, False), axis)
    losses = {
        'loss_cls_pos': loss_ops.cross_entropy_with_logits(
            pos, labels_oh, spec.mean_loss),
        'loss_cls_neg': loss_ops.cross_entropy_with_logits(
            neg, jnp.zeros_like(labels_oh), spec.mean_loss),
    }
    aux = {'accuracy_cls': loss_ops.multilabel_accuracy(pos, labels_oh)}
    return losses, aux


def mask_losses_sharded(spec, params, feat, rois_local, rois_pred_local,
                        labels_oh, valid_local, axis):
    """Sharded ``wsl_tail_losses`` fcn-mask arm (add_seg_losses,
    wsl_seg_heads.py:169-191): the MIL mask CE is per-RoI — MaskUtility's
    weights/labels are row-local — so the mask head runs on the LOCAL
    pooled rows and only the AveragedLoss normalization goes global
    (psum'd numerator / psum'd valid count)."""
    from nafwebsod_tpu.models import seg_head
    from nafwebsod_tpu.ops import seg as seg_ops
    pooled = detector._mask_pooled(spec, params, feat, rois_local)
    mask_logits = detector._apply_mask_head(spec, params, pooled)
    mask_w, _, mask_labels = seg_ops.mask_utility(
        jax.lax.stop_gradient(rois_pred_local), rois_local, labels_oh)
    cls_logits = jnp.max(mask_logits, axis=(1, 2))        # (R_local, C-1)
    xent = seg_head.weighted_sigmoid_cross_entropy_with_logits(
        cls_logits, mask_labels, mask_w)
    num = jax.lax.psum(jnp.sum(xent * valid_local), axis)
    den = jax.lax.psum(jnp.sum(valid_local.astype(xent.dtype)), axis)
    return spec.mask_loss_weight * num / jnp.maximum(den, 1.0)


def _deeplab_losses_sharded(spec, params, feat, image, rois_local,
                            obn_local, labels_oh, valid_local, cls_prob,
                            cur_iter, rng_local, rng_repl, im_hw, axis):
    """Sharded ``wsl_tail_losses`` deeplab arm (add_deeplab_losses,
    wsl_seg_heads.py:288-370): the CPG saliency is the image-vjp of the
    SHARDED two-stream forward — the same ``cpg_maps(grad_reduce=psum/n)``
    machinery as ``_csc_losses_sharded`` — while everything downstream
    (ASPP head on the replicated conv features, DeeplabUtility targets,
    CRF-consistency) is image-level and runs replicated; its parameter
    gradients are identical per device, which the step's outer pmean
    preserves. ``rng_repl`` is the PRE-fold_in key: the deeplab head's
    dropout must draw the SAME masks on every device for the branch to
    stay replicated (the folded ``rng_local`` serves the inner forward's
    local rows)."""
    from dataclasses import replace as dc_replace

    from nafwebsod_tpu.models import seg_head
    from nafwebsod_tpu.ops import cpg as cpg_ops

    unfrozen = dc_replace(spec, freeze_conv_body=False, freeze_at=0,
                          csc=False, cpg=False, mask_on=False)
    # CPG maps are stop-gradient'd constants downstream — the inner vjp
    # must stay opaque to the outer training grad (same Pallas
    # pool-backward JVP argument as the CSC branches)
    params_sg = jax.tree.map(jax.lax.stop_gradient, params)
    n = jax.lax.psum(jnp.ones(()), axis)

    def cls_prob_fn(im):
        fc7l, _, _ = detector._run_body_and_head(
            unfrozen, params_sg, im, rois_local, obn_local, train=True,
            rng=rng_local, im_hw=im_hw)
        f7m = fc7l[0] if spec.is_context else fc7l
        o = wsl_outputs_sharded(params_sg, f7m, valid_local, axis)
        return cls_pred_sharded(o['rois_pred'], axis)

    maps, idx, keep = cpg_ops.cpg_maps(
        cls_prob_fn, image, labels_oh, jax.lax.stop_gradient(cls_prob),
        tau=spec.cpg_tau, max_gt=spec.max_gt_cpg,
        grad_reduce=lambda g: jax.lax.psum(g, axis) / n)
    # scatter the selected-class maps into the (1, C-1, H, W) cpg tensor
    # (the unsharded wsl_tail_losses deeplab arm does the same)
    cpg_full = jnp.zeros(
        (1, spec.num_classes - 1) + maps.shape[1:], jnp.float32)
    cpg_full = cpg_full.at[0, jnp.maximum(idx, 0)].set(
        jnp.where(keep[:, None, None], maps, 0.0))
    mask_fc8 = seg_head.deeplab_head_forward(
        params, feat, freeze_body=spec.freeze_conv_body, train=True,
        rng=rng_repl)
    sw_active = (cur_iter < spec.cpg_max_iter
                 if spec.cpg_max_iter > 0 else None)
    dl = seg_head.deeplab_losses(
        mask_fc8, jax.lax.stop_gradient(cpg_full), labels_oh,
        jax.lax.stop_gradient(cls_prob), image, tau=spec.cpg_tau,
        cpg_sw_active=sw_active)
    return {'mask_seed_loss': dl['mask_seed_loss'],
            'mask_constraint_loss': dl['mask_constraint_loss']}


def min_entropy_loss_sharded(rois_pred_local, labels_oh, valid_local, axis):
    """Sharded ``ops/losses.min_entropy_loss`` (min_entropy_loss_op.cc:7-46):
    per-class entropy sums and the valid-RoI count psum across the axis."""
    p = jnp.maximum(rois_pred_local, loss_ops.KLOG_THRESHOLD)
    ent = -p * jnp.log(p) * valid_local.astype(p.dtype)[:, None]
    per_class = jax.lax.psum(jnp.sum(ent, axis=0), axis)        # (C,)
    r_count = jax.lax.psum(
        jnp.sum(valid_local.astype(p.dtype)), axis)
    gt = labels_oh[0]
    num = jnp.sum(per_class * gt)
    count = jnp.maximum(jnp.sum(gt) * r_count, 1.0)
    return num / count


def center_loss_sharded(labels_oh, rois_pred_local, features_local, cf,
                        top_k, valid_local, axis):
    """``ops/center.center_loss`` over sharded RoIs: each device selects its
    LOCAL per-class top-k candidates (scores + feature rows), the (n*K, D)
    candidate table — tiny next to the sharded (R, D) feature matrix — is
    all_gather'd, and the GLOBAL top-k is re-selected from the merged
    candidates before the shared (C-1, K, D) center tail
    (ops/center.center_loss_from_selected) runs replicated. Exact vs the
    unsharded op: every global top-k row is contained in its device's local
    top-k, and the device-major merge order preserves lax.top_k's
    first-occurrence (lowest global row index) tie-break."""
    from nafwebsod_tpu.ops import center as center_ops
    cm1 = rois_pred_local.shape[1]
    gt = labels_oh[0] >= 0.5
    scores = rois_pred_local
    if valid_local is not None:
        scores = jnp.where(valid_local[:, None], scores, -jnp.inf)
    k = top_k
    sc_l, idx_l = jax.lax.top_k(scores.T, k)              # (C-1, K)
    f_l = features_local[jax.lax.stop_gradient(idx_l)]    # (C-1, K, D)
    sc_g = jax.lax.all_gather(sc_l, axis)                 # (n, C-1, K)
    f_g = jax.lax.all_gather(f_l, axis)                   # (n, C-1, K, D)
    n = sc_g.shape[0]
    d = f_g.shape[-1]
    sc_m = jnp.transpose(sc_g, (1, 0, 2)).reshape(cm1, n * k)
    f_m = jnp.transpose(f_g, (1, 0, 2, 3)).reshape(cm1, n * k, d)
    _, sel = jax.lax.top_k(sc_m, k)                       # (C-1, K)
    f_sel = jnp.take_along_axis(
        f_m, jax.lax.stop_gradient(sel)[:, :, None], axis=1)
    return center_ops.center_loss_from_selected(gt, f_sel, cf, top_k)


def _roi_label_sharded(prev_local, rois_local, labels_oh, valid_local,
                       class_weights, axis):
    """``ops/refine.roi_label`` with the RoIs sharded on ``axis`` — the
    OICR settings only (fg 0.5 / bg [−1, 0.5), uncapped, top_k=1;
    roi_label_op.cc semantics; the C-MIL capped variant stays on the
    unsharded paths). Seeds are GLOBAL argmaxes chosen sequentially per
    gt class with global de-dup: pmax finds each class's best score,
    the owner resolves first-occurrence ties by global row index (pmin),
    and one psum broadcasts the 4-vector seed box; every other step is
    local rows vs the (C, 4) seed table."""
    rl, num_class_s = prev_local.shape
    num_class = labels_oh.shape[1]
    offset = num_class_s - num_class
    fg_scores = prev_local[:, offset:]
    gt = labels_oh[0]
    valid = valid_local.astype(bool)
    gid = jax.lax.axis_index(axis) * rl + jnp.arange(rl)
    int_max = jnp.iinfo(jnp.int32).max

    masked = jnp.where(valid[:, None], fg_scores, -jnp.inf)
    chosen = jnp.zeros((rl,), bool)
    seed_boxes, seed_gidx, seed_cls, seed_ok = [], [], [], []
    for c_i in range(num_class):
        col = jnp.where(chosen, -jnp.inf, masked[:, c_i])
        li = jnp.argmax(col)
        lmax = col[li]
        gmax = jax.lax.pmax(lmax, axis)
        cand = jnp.where(lmax == gmax, gid[li].astype(jnp.int32), int_max)
        gidx = jax.lax.pmin(cand, axis)
        ok = (gt[c_i] > 0) & jnp.isfinite(gmax)
        owns = gid[li].astype(jnp.int32) == gidx
        chosen = chosen.at[li].set(chosen[li] | (ok & owns))
        box = jnp.where(ok & owns,
                        jnp.floor(rois_local[li, 1:5]).astype(jnp.float32),
                        0.0)
        seed_boxes.append(jax.lax.psum(box, axis))
        seed_gidx.append(gidx)
        seed_cls.append(c_i)
        seed_ok.append(ok)
    seed_boxes = jnp.stack(seed_boxes)                     # (C, 4)
    seed_gidx = jnp.stack(seed_gidx)                       # (C,)
    seed_cls = jnp.asarray(seed_cls, jnp.int32)
    seed_valid = jnp.stack(seed_ok)                        # (C,)

    # local IoU rows vs the seed table with roi_iou semantics
    # (int-truncated coords, exact-1 self-IoU at the seed's own row)
    boxes_l = jnp.floor(rois_local[:, 1:5]).astype(jnp.float32)
    iou_to_seeds = iou_matrix(boxes_l, seed_boxes)         # (Rl, C)
    self_row = gid[:, None].astype(jnp.int32) == seed_gidx[None, :]
    iou_to_seeds = jnp.where(self_row, 1.0, iou_to_seeds)
    iou_to_seeds = jnp.where(seed_valid[None, :], iou_to_seeds, -jnp.inf)

    best = jnp.argmax(iou_to_seeds, axis=1)
    max_iou = jnp.max(iou_to_seeds, axis=1)
    assign_c = seed_cls[best]
    assign_w = class_weights[assign_c]

    is_fg = max_iou >= 0.5
    is_bg = (max_iou >= -1.0) & (max_iou < 0.5)
    labels = jnp.where(is_fg, assign_c + 1,
                       jnp.where(is_bg, 0, assign_c + 1)).astype(jnp.int32)
    weights = jnp.where(is_fg | is_bg, assign_w, 0.0)
    labels = jnp.where(valid, labels, 0)
    weights = jnp.where(valid, weights, 0.0)
    weights = jnp.where(jnp.sum(seed_valid) == 0, 0.0, weights)
    return labels, weights


def _refinement_losses_sharded(spec, params, fc7_local, rois_local, out,
                               cls_prob, labels_oh, valid_local, axis):
    """The OICR refinement ladder over sharded RoIs
    (detector._refinement_losses' RoILabel + SoftmaxWithLossN branch,
    wsl_heads.py:456-607; PCL/C-MIL keep the unsharded paths — their
    pseudo-labeling clusters/cliques span all RoIs)."""
    sg = jax.lax.stop_gradient
    c = spec.num_classes
    losses = {}
    prev = sg(out['rois_pred'])
    cw = sg(cls_prob[0])
    for k in range(1, spec.refine_k + 1):
        lbl, w = _roi_label_sharded(prev, rois_local, labels_oh,
                                    valid_local, cw, axis)
        logits = heads.refine_score(params, fc7_local, k)
        loss_k = softmax_with_loss_n_sharded(logits, lbl, w, axis)
        if not spec.mean_loss:
            loss_k = loss_k * float(c - 1)
        losses['loss_cls{}'.format(k)] = loss_k
        prev = sg(jax.nn.softmax(logits, axis=1))
    return losses


def _refinement_losses_pcl_sharded(spec, params, fc7_local, rois_local, out,
                                   labels_oh, valid_local, axis):
    """PCL proposal-cluster ladder over sharded RoIs (the PCL branch of
    detector._refinement_losses; pcl.py + pcl_loss_op.cc). The clustering
    and PCLLoss act on (R, C)-scale tables — tiny next to the sharded fc
    towers — so each stage's LOCAL refine softmax is all_gather'd
    DIFFERENTIABLY and the unsharded device-target + custom-VJP loss code
    runs replicated on every device. The gather's psum_scatter transpose
    re-shards the loss cotangent onto local rows; because each device
    contributes an identical replicated copy, the summed grads inflate
    n-fold exactly like the plain psums under check_vma=False — recovered
    by grads_fn's outer pmean (pinned vs the unsharded grads in
    tests/test_roi_shard.py). Requires the device pseudo-labeling path
    (WSL.PCL_DEVICE — a host callback cannot run inside shard_map; the
    shared check_scope enforces this)."""
    from nafwebsod_tpu.ops import refine as refine_ops
    sg = jax.lax.stop_gradient
    losses = {}
    rois_g = jax.lax.all_gather(rois_local, axis, tiled=True)
    valid_g = jax.lax.all_gather(valid_local, axis,
                                 tiled=True).astype(bool)
    prev = jax.lax.all_gather(sg(out['rois_pred']), axis, tiled=True)
    n_valid = jnp.sum(valid_g.astype(jnp.float32))
    for k in range(1, spec.refine_k + 1):
        logits_l = heads.refine_score(params, fc7_local, k)
        probs_g = jax.lax.all_gather(jax.nn.softmax(logits_l, axis=1),
                                     axis, tiled=True)
        targets = refine_ops.pcl_targets_device(
            sg(rois_g[:, 1:5]), prev, labels_oh, sg(probs_g), valid_g)
        losses['loss_cls{}'.format(k)] = refine_ops.pcl_loss_full(
            probs_g, *targets, n_valid)
        prev = sg(probs_g)
    return losses


def _cmil_losses_sharded(spec, params, fc7_local, rois_local, labels_oh,
                         valid_local, cur_iter, axis):
    """C-MIL continuation branch over sharded RoIs (heads.cmil_outputs +
    the C-MIL settings of detector._refinement_losses; roi_merge_op.cc).
    The clique growth and merged two-stream act on (R, C) logits: fc8c /
    fc8d / cls_score{k} are computed on LOCAL fc7 rows (sharded GEMMs),
    all_gather'd differentiably, and the UNSHARDED ops (roi_merge,
    heads._two_stream, roi_label, softmax_with_loss_n) run replicated on
    the gathered tables — same inflate-then-pmean gradient convention as
    the PCL ladder above. Returns the full (losses, aux) for the branch:
    C-MIL's image loss comes from the MERGED two-stream, so the caller
    skips the sharded main two-stream entirely (mirrors wsl_tail_losses'
    cmil dispatch)."""
    from nafwebsod_tpu.ops import refine as refine_ops
    from nafwebsod_tpu.ops.jbox import roi_iou
    sg = jax.lax.stop_gradient
    c = spec.num_classes
    fc8c = jax.lax.all_gather(
        heads._fc(fc7_local, params, 'fc8c', out_dtype=jnp.float32),
        axis, tiled=True)
    fc8d = jax.lax.all_gather(
        heads._fc(fc7_local, params, 'fc8d', out_dtype=jnp.float32),
        axis, tiled=True)
    rois_g = jax.lax.all_gather(rois_local, axis, tiled=True)
    valid_g = jax.lax.all_gather(valid_local, axis,
                                 tiled=True).astype(bool)

    lam = refine_ops.cmil_lambda(
        cur_iter, spec.size_epoch, max(spec.max_iter // spec.size_epoch, 1))
    cmil_rois_pred = heads._two_stream(fc8c, fc8d, valid_g)
    obn = jnp.max(cmil_rois_pred, axis=1, keepdims=True)
    iou = roi_iou(rois_g)
    mc, md, _, _, merged_valid = refine_ops.roi_merge(
        obn, iou, fc8c, fc8d, lam, valid_g)
    rois_pred = heads._two_stream(mc, md, merged_valid)
    cls_prob = heads.cls_pred(rois_pred)
    losses = {'loss_cls': loss_ops.cross_entropy_with_logits(
        cls_prob, labels_oh, spec.mean_loss)}
    aux = {'accuracy_cls': loss_ops.multilabel_accuracy(cls_prob,
                                                        labels_oh)}

    # ladder with the C-MIL RoILabel settings (wsl_heads.py:525-531)
    label_kwargs = dict(fg_thresh=0.6, bg_thresh_hi=0.4, bg_thresh_lo=0.1,
                        num_pos=32, num_neg=96)
    prev = sg(cmil_rois_pred)
    cw = sg(cls_prob[0])
    for k in range(1, spec.refine_k + 1):
        lbl, w = refine_ops.roi_label(prev, iou, labels_oh,
                                      valid_mask=valid_g, class_weights=cw,
                                      **label_kwargs)
        logits_g = jax.lax.all_gather(
            heads.refine_score(params, fc7_local, k), axis, tiled=True)
        loss_k = loss_ops.softmax_with_loss_n(logits_g, lbl, w)
        if not spec.mean_loss:
            loss_k = loss_k * float(c - 1)
        losses['loss_cls{}'.format(k)] = loss_k
        prev = sg(jax.nn.softmax(logits_g, axis=1))

    if spec.min_entropy_loss:
        # the unsharded tail feeds the MERGED rois_pred with the original
        # valid mask (wsl_tail_losses min-entropy branch)
        losses['loss_entropy'] = 0.1 * loss_ops.min_entropy_loss(
            rois_pred, labels_oh, valid_g)
    return losses, aux


def forward_train_roi_sharded(spec, params, batch, rng, axis=AXIS):
    """Per-device training forward on the local RoI shard. ``batch`` holds
    the REPLICATED image/labels and the LOCAL rois/obn_scores/valid_mask
    (plus a replicated 'im_hw' for the context head's ring clipping).
    Returns (total_loss, aux) — both replicated (psum-reduced)."""
    # base gate shared with the tensor-parallel / pipeline steps (an inline
    # copy had drifted: it missed is_fpn, fused_noise_tower, and the
    # box-head whitelist, letting unsupported specs crash mid-trace).
    # The OICR ladder, context head, and min-entropy run with cross-shard
    # reductions; the PCL(device) and C-MIL ladders run replicated on
    # differentiably-gathered class-dim tables (see the module docstring).
    from nafwebsod_tpu.parallel.wsl_losses import check_scope
    # center loss is admitted: this step threads the dCF/ndCF accumulators
    # through the opt state like the TP/pipeline/ZeRO steps (the C-MIL
    # combinations stay excluded — merged global scores vs local features).
    # The supervised Fast R-CNN 2fc head is admitted: both its losses are
    # valid-count-normalized row sums (fast_rcnn_losses_sharded). The WSL
    # seg heads are admitted too (mask_losses_sharded /
    # _deeplab_losses_sharded) — this is the only sharded step that
    # threads them.
    check_scope(spec, allow_center=not spec.cmil, allow_supervised=True,
                allow_csc=True, allow_seg=not spec.cmil,
                extra_unsupported=(spec.cmil and spec.mask_on,))

    image = batch['image']
    rois = batch['rois']
    obn = batch['obn_scores']
    valid = batch['valid_mask']
    rng_repl = rng  # un-folded: replicated branches (deeplab head dropout)
    if rng is not None:
        # per-device mask streams (different local rows)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

    fc7_clean, fc7_noisy, feat = detector._run_body_and_head(
        spec, params, image, rois, obn, train=True, rng=rng,
        im_hw=batch.get('im_hw'))
    fc7_main = fc7_clean[0] if spec.is_context else fc7_clean

    if spec.supervised:
        # supervised Fast R-CNN: logits/deltas on the local rows, losses
        # psum-normalized by the global valid count
        logits, bbox_pred = detector._fast_rcnn_outputs(spec, params,
                                                        fc7_main)
        total, aux = fast_rcnn_losses_sharded(spec, logits, bbox_pred,
                                              batch, valid, axis)
        return total, aux

    labels_oh = batch['labels_oh']

    losses, aux = {}, {}
    if spec.cmil:
        # the C-MIL branch replaces the main two-stream: its image loss
        # comes from the MERGED logits (ladder + min-entropy included)
        losses, aux = _cmil_losses_sharded(
            spec, params, fc7_main, rois, labels_oh, valid,
            batch.get('cur_iter', jnp.zeros(())), axis)
        total = sum(losses.values())
        aux.update(losses)
        return total, aux
    if spec.is_context:
        # context two-stream (heads.wsl_context_outputs): fc8c from the
        # plain stream, fc8d = FC(frame) - FC(context) with shared
        # 'fc8d_frame' weights; the RoI softmax goes global
        fc7, fc7_frame, fc7_ctx = fc7_clean
        fc8c = heads._fc(fc7, params, 'fc8c', out_dtype=jnp.float32)
        fc8d = (heads._fc(fc7_frame, params, 'fc8d_frame',
                          out_dtype=jnp.float32) -
                heads._fc(fc7_ctx, params, 'fc8d_frame',
                          out_dtype=jnp.float32))
        rois_pred = _two_stream_sharded(fc8c, fc8d, valid, axis)
        out = {'fc8c': fc8c, 'fc8d': fc8d, 'rois_pred': rois_pred}
        cls_prob = cls_pred_sharded(rois_pred, axis)
        losses['loss_cls'] = loss_ops.cross_entropy_with_logits(
            cls_prob, labels_oh, spec.mean_loss)
        aux['accuracy_cls'] = loss_ops.multilabel_accuracy(cls_prob,
                                                           labels_oh)
    elif spec.is_webly:
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
        out = wsl_outputs_sharded(params, fc7_main, valid, axis)
        cls_prob = cls_pred_sharded(out['rois_pred'], axis)
        if spec.csc:
            # CSC replaces the plain CE with the pos/neg constrained pair
            # (wsl_tail_losses `spec.csc` arm, sharded)
            csc_losses, csc_aux = _csc_losses_sharded(
                spec, params, out, image, rois, obn, labels_oh, valid,
                cls_prob, batch.get('cur_iter', jnp.zeros(())), rng,
                batch.get('im_hw'), axis)
            losses.update(csc_losses)
            aux.update(csc_aux)
        else:
            losses['loss_cls'] = loss_ops.cross_entropy_with_logits(
                cls_prob, labels_oh, spec.mean_loss)
            aux['accuracy_cls'] = loss_ops.multilabel_accuracy(cls_prob,
                                                               labels_oh)

    if spec.refine_k:
        if spec.pcl:
            losses.update(_refinement_losses_pcl_sharded(
                spec, params, fc7_main, rois, out, labels_oh, valid, axis))
        else:
            losses.update(_refinement_losses_sharded(
                spec, params, fc7_main, rois, out, cls_prob, labels_oh,
                valid, axis))

    if spec.mask_on and spec.mask_head == 'deeplab':
        # deeplab seg branch (wsl_tail_losses deeplab arm, sharded): CPG
        # via the sharded image-vjp, ASPP/CRF losses replicated
        losses.update(_deeplab_losses_sharded(
            spec, params, feat, image, rois, obn, labels_oh, valid,
            cls_prob, batch.get('cur_iter', jnp.zeros(())), rng, rng_repl,
            batch.get('im_hw'), axis))
    elif spec.mask_on:
        # fcn MIL mask branch: local pooled rows, psum-normalized CE
        losses['mask_loss_cls'] = mask_losses_sharded(
            spec, params, feat, rois, out['rois_pred'], labels_oh, valid,
            axis)

    if spec.min_entropy_loss:
        # weight 0.1 (wsl_heads.py:279-290 get_loss_gradients_weighted)
        losses['loss_entropy'] = 0.1 * min_entropy_loss_sharded(
            out['rois_pred'], labels_oh, valid, axis)

    if spec.center_loss:
        # mirror wsl_tail_losses' center branch: CSC_MAX_ITER gate, 0.4096
        # grad weight, '__'-prefixed deltas for the step's center tail
        loss_center, deltas = center_loss_sharded(
            labels_oh, out['rois_pred'], fc7_main.astype(jnp.float32),
            params['center_feature'], spec.center_loss_top_k, valid, axis)
        active = batch.get('cur_iter', jnp.zeros(())) < spec.csc_max_iter
        loss_center = jnp.where(active, loss_center, 0.0)
        losses['loss_center'] = 0.4096 * loss_center
        gate = jnp.where(active, 1.0, 0.0)
        aux['__center_dcf'] = gate * deltas['center_dcf']
        aux['__center_ndcf'] = gate * deltas['center_ndcf']

    total = sum(losses.values())
    aux.update(losses)
    return total, aux


def _make_grads_fn(spec, mesh):
    """The shard_map'd loss/grad computation shared by the single-step and
    scan-of-K drivers.

    check_vma=False: the FFI RoIPool's ffi_call declares plain
    ShapeDtypeStructs (no vma annotation), and the psum-transpose
    semantics under the legacy mode match the explicit grads pmean below
    (pinned exact vs the unsharded grads in tests/test_roi_shard.py)."""
    batch_specs = {'image': P(), 'rois': P(AXIS), 'obn_scores': P(AXIS),
                   'valid_mask': P(AXIS)}
    if spec.supervised:
        # per-RoI supervised targets shard with their rows
        for k in ('labels_int32', 'bbox_targets', 'bbox_inside_weights',
                  'bbox_outside_weights'):
            batch_specs[k] = P(AXIS)
    else:
        batch_specs['labels_oh'] = P()
    if spec.is_context:
        batch_specs['im_hw'] = P()  # true-canvas ring clipping
    if spec.cmil or spec.center_loss or spec.csc or spec.mask_on:
        # C-MIL continuation lambda(t) / center-loss + CSC CSC_MAX_ITER
        # gate / the deeplab CPGSW cur_iter cutoff
        batch_specs['cur_iter'] = P()

    @partial(_shard_map, mesh=mesh,
             in_specs=(P(), batch_specs, P()),
             out_specs=(P(), P(), P(), P()))
    def grads_fn(params, batch, rng):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: forward_train_roi_sharded(spec, p, batch, rng),
            has_aux=True)(params)
        # under check_vma=False the psum transpose re-broadcasts loss
        # cotangents into every device's replica, so the device-local
        # grads SUM to n x the true gradient: pmean recovers it (pinned
        # exactly vs the unsharded grads in tests/test_roi_shard.py)
        grads = jax.lax.pmean(grads, AXIS)
        # '__'-prefixed aux entries are the center dCF/ndCF deltas
        # (train_step._step_body contract) — already replicated here (one
        # image per step), consumed by the step's center tail
        deltas = {k: v for k, v in aux.items() if k.startswith('__')}
        aux = {k: v for k, v in aux.items() if not k.startswith('__')}
        return loss, aux, deltas, grads

    return grads_fn


def _batch_shardings(spec, mesh, scan=False):
    lead = (None,) if scan else ()
    repl = NamedSharding(mesh, P(*lead))
    shard = NamedSharding(mesh, P(*(lead + (AXIS,))))
    out = {'image': repl, 'rois': shard, 'obn_scores': shard,
           'valid_mask': shard}
    if spec.supervised:
        for k in ('labels_int32', 'bbox_targets', 'bbox_inside_weights',
                  'bbox_outside_weights'):
            out[k] = shard
    else:
        out['labels_oh'] = repl
    if spec.is_context:
        out['im_hw'] = repl
    if spec.cmil or spec.center_loss or spec.csc or spec.mask_on:
        out['cur_iter'] = repl
    return out


def make_roi_sharded_train_step(spec, hp, mults, mesh, donate=False,
                                center_update_period=128):
    """Jitted train step with RoIs sharded over the mesh axis 'roi':
    ``step(params, opt_state, batch, lr, rng) -> (params, opt_state, loss,
    aux)``. ``batch['rois'/'obn_scores'/'valid_mask']`` are global (R, ...)
    arrays sharded on axis 0; image/labels are replicated. With
    ``spec.center_loss`` the opt state carries the replicated dCF/ndCF
    accumulators and the step applies the shared center tail (one image
    per step, so the default period stays the reference's 128 images)."""
    mults = sgd.freeze_mults(mults) if isinstance(mults, dict) else mults
    repl = NamedSharding(mesh, P())
    grads_fn = _make_grads_fn(spec, mesh)

    def step(params, opt_state, batch, lr, rng):
        loss, aux, deltas, grads = grads_fn(params, batch, rng)
        params, opt_state = sgd.update(params, grads, opt_state, lr, hp,
                                       mults)
        if spec.center_loss:
            from nafwebsod_tpu.parallel.wsl_losses import center_tail
            params, opt_state = center_tail(spec, params, opt_state,
                                            deltas, center_update_period)
        return params, opt_state, loss, aux

    return jax.jit(step,
                   in_shardings=(repl, repl, _batch_shardings(spec, mesh),
                                 repl, repl),
                   out_shardings=(repl, repl, repl, repl),
                   donate_argnums=(0, 1) if donate else ())


def make_roi_sharded_multi_train_step(spec, hp, mults, mesh, donate=False,
                                      center_update_period=128):
    """K chained RoI-sharded steps per device call via ``lax.scan``
    (TPU.STEPS_PER_CALL; the same dispatch-amortization contract as
    ``train_step.make_multi_train_step``): ``multi(params, opt_state,
    batches, lrs, factors, rngs)`` with every batch leaf stacked
    (K, ...) — rois/obn/valid sharded on their RoI axis — ``lrs`` /
    ``factors`` (K,) and ``rngs`` (K,) keys; momentum-correction factors
    apply in-graph before each step (``sgd.scale_momentum``)."""
    mults = sgd.freeze_mults(mults) if isinstance(mults, dict) else mults
    repl = NamedSharding(mesh, P())
    grads_fn = _make_grads_fn(spec, mesh)

    def multi(params, opt_state, batches, lrs, factors, rngs):
        def one(carry, xs):
            p, s = carry
            batch, lr, factor, rng = xs
            s = sgd.scale_momentum(s, factor)
            loss, aux, deltas, grads = grads_fn(p, batch, rng)
            p, s = sgd.update(p, grads, s, lr, hp, mults)
            if spec.center_loss:
                from nafwebsod_tpu.parallel.wsl_losses import center_tail
                p, s = center_tail(spec, p, s, deltas,
                                   center_update_period)
            return (p, s), (loss, aux)

        (p, s), (losses, auxs) = jax.lax.scan(
            one, (params, opt_state), (batches, lrs, factors, rngs))
        return p, s, losses, auxs

    return jax.jit(
        multi,
        in_shardings=(repl, repl, _batch_shardings(spec, mesh, scan=True),
                      repl, repl, repl),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1) if donate else ())

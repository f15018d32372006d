"""In-graph (device) RPN machinery for end-to-end Faster R-CNN.

TPU-native replacements for the reference's host ``net.Python`` ops and
loader-side target builders, redesigned for static shapes and XLA:

  * ``shifted_anchors``     — anchor enumeration over the feature grid
    (``detectron/ops/generate_proposals.py:83-100``) as a traced constant.
  * ``bbox_transform``      — device box decoding, numerics of
    ``detectron/utils/boxes.py:bbox_transform`` (+1 convention, exp clip).
  * ``rpn_targets``         — per-anchor labels/regression targets
    (``detectron/roi_data/rpn.py:131-230``) computed on device from padded
    gt boxes, with jax-RNG fg/bg subsampling. DEVIATION (PARITY.md): bg
    anchors are subsampled WITHOUT replacement (the reference's
    ``npr.randint`` samples with replacement and can label fewer uniques).
  * ``generate_proposals``  — decode + clip + min-size filter + top-k +
    fixed-capacity device NMS (``detectron/ops/generate_proposals.py:30-197``
    semantics over ``ops/jbox.nms``).
  * ``proposal_labels``     — fg/bg proposal sampling with expanded
    per-class bbox targets (``detectron/ops/generate_proposal_labels.py`` +
    ``detectron/roi_data/fast_rcnn.py:132-230``), gt boxes appended to the
    candidate pool as the reference's roidb does.

All functions are pure and statically shaped; padding rows ride validity
masks. Host-side equivalents (used by the data loader / tests as golden
references) live in ``ops/rpn.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nafwebsod_tpu.ops import jbox

BBOX_XFORM_CLIP = float(np.log(1000. / 16.))


def shifted_anchors(feat_h, feat_w, stride, base_anchors):
    """All anchors at all grid positions -> (H*W*A, 4), rows ordered
    (H, W, A) slowest-to-fastest, matching the (H, W, A)-flattened RPN
    conv outputs."""
    base = jnp.asarray(base_anchors, jnp.float32)          # (A, 4)
    sx = jnp.arange(feat_w, dtype=jnp.float32) * stride
    sy = jnp.arange(feat_h, dtype=jnp.float32) * stride
    gx, gy = jnp.meshgrid(sx, sy)                          # (H, W) each
    shifts = jnp.stack([gx, gy, gx, gy], axis=-1).reshape(-1, 4)
    return (shifts[:, None, :] + base[None, :, :]).reshape(-1, 4)


def bbox_transform(boxes, deltas, weights=(1.0, 1.0, 1.0, 1.0)):
    """Decode (N, 4) deltas onto (N, 4) boxes (device twin of
    ops/boxes.bbox_transform for the single-class case)."""
    w = boxes[:, 2] - boxes[:, 0] + 1.0
    h = boxes[:, 3] - boxes[:, 1] + 1.0
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h
    wx, wy, ww, wh = weights
    dx, dy = deltas[:, 0] / wx, deltas[:, 1] / wy
    dw = jnp.minimum(deltas[:, 2] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(deltas[:, 3] / wh, BBOX_XFORM_CLIP)
    pcx, pcy = dx * w + cx, dy * h + cy
    pw, ph = jnp.exp(dw) * w, jnp.exp(dh) * h
    return jnp.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                      pcx + 0.5 * pw - 1.0, pcy + 0.5 * ph - 1.0], axis=1)


def bbox_transform_inv(boxes, gt_boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    """Encode gt boxes relative to example boxes (device twin of
    ops/boxes.bbox_transform_inv)."""
    ew = boxes[:, 2] - boxes[:, 0] + 1.0
    eh = boxes[:, 3] - boxes[:, 1] + 1.0
    ecx = boxes[:, 0] + 0.5 * ew
    ecy = boxes[:, 1] + 0.5 * eh
    gw = gt_boxes[:, 2] - gt_boxes[:, 0] + 1.0
    gh = gt_boxes[:, 3] - gt_boxes[:, 1] + 1.0
    gcx = gt_boxes[:, 0] + 0.5 * gw
    gcy = gt_boxes[:, 1] + 0.5 * gh
    wx, wy, ww, wh = weights
    return jnp.stack([wx * (gcx - ecx) / ew, wy * (gcy - ecy) / eh,
                      ww * jnp.log(gw / ew), wh * jnp.log(gh / eh)], axis=1)


def _random_rank(rng, candidate_mask):
    """0-based random rank among candidates (non-candidates get a huge rank).
    Used to reproduce the reference's random subsampling deterministically
    under jit: `rank < quota` selects a uniform random subset."""
    n = candidate_mask.shape[0]
    u = jax.random.uniform(rng, (n,))
    key = jnp.where(candidate_mask, u, 2.0)  # non-candidates sort last
    order = jnp.argsort(key)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return rank


def rpn_targets(anchors, gt_boxes, gt_valid, im_h, im_w, rng,
                straddle_thresh=0.0, positive_overlap=0.7,
                negative_overlap=0.3, fg_fraction=0.5, batch_size=256,
                reg_weights=(1.0, 1.0, 1.0, 1.0)):
    """Per-anchor RPN training targets on device (roi_data/rpn.py:131-230).

    anchors: (N, 4) static; gt_boxes: (G, 4) padded; gt_valid: (G,) bool;
    im_h/im_w: traced scalars (true image extent inside the padded canvas).
    Returns (labels (N,) in {-1, 0, 1}, bbox_targets (N, 4),
    inside_w (N, 4), outside_w (N, 4)).
    """
    n = anchors.shape[0]
    if straddle_thresh >= 0:
        inside = ((anchors[:, 0] >= -straddle_thresh) &
                  (anchors[:, 1] >= -straddle_thresh) &
                  (anchors[:, 2] < im_w + straddle_thresh) &
                  (anchors[:, 3] < im_h + straddle_thresh))
    else:
        inside = jnp.ones((n,), bool)
    gv = gt_valid.astype(bool)

    ov = jbox.iou_matrix(anchors, gt_boxes)                # (N, G)
    ov = jnp.where(inside[:, None] & gv[None, :], ov, 0.0)
    a2g_argmax = jnp.argmax(ov, axis=1)
    a2g_max = jnp.max(ov, axis=1)
    # per-gt best anchor(s), ties included (the reference's
    # `ov == gt_to_anchor_max` quirk applies only where a gt exists)
    g2a_max = jnp.max(ov, axis=0)                          # (G,)
    forced_fg = jnp.any((ov == g2a_max[None, :]) & gv[None, :], axis=1)
    fg = inside & (forced_fg | (a2g_max >= positive_overlap))
    fg = fg & jnp.any(gv)

    # fg quota: static num_fg, random subset when over quota
    num_fg = int(fg_fraction * batch_size)
    r1, r2 = jax.random.split(rng)
    fg = fg & (_random_rank(r1, fg) < num_fg)
    n_fg = jnp.sum(fg)

    # DEVIATION (documented in PARITY.md): bg candidates EXCLUDE anchors
    # already chosen fg. The reference assigns labels in passes
    # (roi_data/rpn.py) where the bg pass `labels[enable_inds] = 0` can
    # demote a forced-positive (gt-best) anchor whose IoU sits below
    # RPN_NEGATIVE_OVERLAP — losing a small gt's only positive to a random
    # draw. Keeping forced positives is intentional here.
    bg_cand = inside & (a2g_max < negative_overlap) & ~fg
    num_bg = batch_size - n_fg                             # traced
    bg = bg_cand & (_random_rank(r2, bg_cand) < num_bg)

    labels = jnp.where(fg, 1, jnp.where(bg, 0, -1)).astype(jnp.int32)
    gt_for_anchor = gt_boxes[a2g_argmax]
    targets = bbox_transform_inv(anchors, gt_for_anchor, reg_weights)
    targets = jnp.where(fg[:, None], targets, 0.0)
    inside_w = jnp.where(fg[:, None], 1.0, 0.0) * jnp.ones((1, 4))
    num_examples = jnp.maximum(jnp.sum(labels >= 0), 1).astype(jnp.float32)
    outside_w = jnp.where((labels >= 0)[:, None],
                          1.0 / num_examples, 0.0) * jnp.ones((1, 4))
    return labels, targets, inside_w, outside_w


def retinanet_targets(anchors, gt_boxes, gt_classes, gt_valid,
                      positive_overlap=0.5, negative_overlap=0.4):
    """Per-anchor RetinaNet classification/regression targets on device
    (``detectron/roi_data/retinanet.py:182-240``). No subsampling — focal
    loss consumes every non-ignored anchor.

    Returns (labels (N,) int32 with 0 bg / c fg / -1 ignore,
    bbox_targets (N, 4), fg_mask (N,) post-bg-overwrite fg anchors,
    num_fg () = pre-overwrite fg count + 1, the reference's normalizer).
    """
    gv = gt_valid.astype(bool)
    ov = jbox.iou_matrix(anchors, gt_boxes)
    ov = jnp.where(gv[None, :], ov, 0.0)
    a2g_argmax = jnp.argmax(ov, axis=1)
    a2g_max = jnp.max(ov, axis=1)
    g2a_max = jnp.max(ov, axis=0)
    forced = jnp.any((ov == g2a_max[None, :]) & gv[None, :], axis=1)
    fg_pre = (forced | (a2g_max >= positive_overlap)) & jnp.any(gv)
    cls = jnp.where(gv[a2g_argmax], gt_classes[a2g_argmax], 0)

    bg = a2g_max < negative_overlap
    # reference order: fg labels assigned, fg_inds/num_fg captured, THEN
    # bg overwrites (a forced anchor with tiny IoU can be demoted)
    labels = jnp.where(bg, 0, jnp.where(fg_pre, cls, -1)).astype(jnp.int32)
    fg_post = fg_pre & ~bg

    targets = bbox_transform_inv(anchors, gt_boxes[a2g_argmax])
    targets = jnp.where(fg_pre[:, None], targets, 0.0)
    num_fg = jnp.sum(fg_pre).astype(jnp.float32) + 1.0
    return labels, targets, fg_post, num_fg


def generate_proposals(scores, deltas, anchors, im_h, im_w, im_scale, *,
                       pre_nms_top_n=6000, post_nms_top_n=1000,
                       nms_thresh=0.7, min_size=0.0):
    """Device GenerateProposals. scores: (N,) objectness probabilities in
    anchor order; deltas: (N, 4); anchors: (N, 4). Returns
    (proposals (P, 4), scores (P,), valid (P,)) with P = post_nms_top_n.
    """
    n = scores.shape[0]
    k = min(pre_nms_top_n, n) if pre_nms_top_n > 0 else n
    top_scores, idx = jax.lax.top_k(scores, k)
    boxes = bbox_transform(anchors[idx], deltas[idx])
    boxes = jbox.clip_boxes(boxes, im_h, im_w)

    # min-size + center-inside filter (generate_proposals.py:_filter_boxes):
    # sizes measured in ORIGINAL image pixels via im_scale
    ms = jnp.maximum(min_size, 1.0)
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    ok = ((w / im_scale + 1.0 >= ms) & (h / im_scale + 1.0 >= ms) &
          (boxes[:, 0] + (w + 1.0) / 2.0 < im_w) &
          (boxes[:, 1] + (h + 1.0) / 2.0 < im_h))
    masked_scores = jnp.where(ok, top_scores, -jnp.inf)

    post = min(post_nms_top_n, k)  # small images: fewer anchors than budget
    keep_mask, _ = jbox.nms(boxes, masked_scores, nms_thresh,
                            max_output=post)
    kept_scores = jnp.where(keep_mask, masked_scores, -jnp.inf)
    final_scores, final_idx = jax.lax.top_k(kept_scores, post)
    valid = jnp.isfinite(final_scores)
    proposals = jnp.where(valid[:, None], boxes[final_idx], 0.0)
    return proposals, jnp.where(valid, final_scores, 0.0), valid


def proposal_labels(rng, proposals, prop_valid, gt_boxes, gt_classes,
                    gt_valid, *, rois_per_image=512, fg_fraction=0.25,
                    fg_thresh=0.5, bg_thresh_hi=0.5, bg_thresh_lo=0.0,
                    num_classes=81, cls_agnostic_bbox_reg=False,
                    bbox_reg_weights=(10., 10., 5., 5.)):
    """Device GenerateProposalLabels + roi_data/fast_rcnn sampling.

    Appends the gt boxes to the proposal pool (json_dataset's roidb merge),
    computes max overlaps vs gt, samples fg/bg to a fixed ``rois_per_image``
    budget, and emits the supervised box-head blobs.

    Returns dict with rois (R, 5), labels_int32 (R,), bbox_targets (R, 4K),
    bbox_inside_weights, bbox_outside_weights, valid_mask.
    """
    pool = jnp.concatenate([proposals, gt_boxes], axis=0)       # (P+G, 4)
    pool_valid = jnp.concatenate([prop_valid, gt_valid.astype(bool)])
    m = pool.shape[0]
    gv = gt_valid.astype(bool)

    ov = jbox.iou_matrix(pool, gt_boxes)
    ov = jnp.where(pool_valid[:, None] & gv[None, :], ov, 0.0)
    max_ov = jnp.max(ov, axis=1)
    gt_assign = jnp.argmax(ov, axis=1)
    cls_of = jnp.where(gv[gt_assign], gt_classes[gt_assign], 0)

    fg_cand = pool_valid & (max_ov >= fg_thresh)
    num_fg = int(round(fg_fraction * rois_per_image))
    r1, r2 = jax.random.split(rng)
    fg = fg_cand & (_random_rank(r1, fg_cand) < num_fg)
    n_fg = jnp.sum(fg)

    bg_cand = (pool_valid & (max_ov < bg_thresh_hi) &
               (max_ov >= bg_thresh_lo) & ~fg)
    bg = bg_cand & (_random_rank(r2, bg_cand) < (rois_per_image - n_fg))

    # compact the selected rows into a fixed (rois_per_image,) block:
    # fg first (score 2), then bg (score 1), everything else drops out
    sel_key = jnp.where(fg, 2.0, jnp.where(bg, 1.0, 0.0))
    # stabilize ordering within groups by index
    sel_key = sel_key - jnp.arange(m, dtype=jnp.float32) * 1e-9
    _, take = jax.lax.top_k(sel_key, min(rois_per_image, m))
    taken_fg = fg[take]
    taken_bg = bg[take]
    valid = taken_fg | taken_bg

    boxes = jnp.where(valid[:, None], pool[take], 0.0)
    labels = jnp.where(taken_fg, cls_of[take], 0).astype(jnp.int32)

    t4 = bbox_transform_inv(pool[take], gt_boxes[gt_assign[take]],
                            bbox_reg_weights)
    t4 = jnp.where(taken_fg[:, None], t4, 0.0)
    num_reg = 2 if cls_agnostic_bbox_reg else num_classes
    reg_cls = jnp.where(taken_fg,
                        (jnp.ones_like(labels) if cls_agnostic_bbox_reg
                         else labels), 0)
    onehot = jax.nn.one_hot(reg_cls, num_reg) * taken_fg[:, None]  # (R, K)
    bbox_targets = (onehot[:, :, None] * t4[:, None, :]).reshape(
        -1, 4 * num_reg)
    bbox_inside = (onehot[:, :, None] *
                   jnp.ones((1, 1, 4))).reshape(-1, 4 * num_reg)
    bbox_outside = bbox_inside

    r = boxes.shape[0]
    rois = jnp.concatenate([jnp.zeros((r, 1)), boxes], axis=1)
    out = {
        'rois': rois.astype(jnp.float32),
        'labels_int32': labels,
        'bbox_targets': bbox_targets.astype(jnp.float32),
        'bbox_inside_weights': bbox_inside.astype(jnp.float32),
        'bbox_outside_weights': bbox_outside.astype(jnp.float32),
        'valid_mask': valid,
        # assigned gt index per sampled roi (keypoint/mask targets)
        'gt_assignment': jnp.where(valid, gt_assign[take], 0).astype(
            jnp.int32),
    }
    if r < rois_per_image:  # pool smaller than the budget: pad
        pad = rois_per_image - r
        out = {k: jnp.concatenate(
            [v, jnp.zeros((pad,) + v.shape[1:], v.dtype)]) for k, v in
            out.items()}
    return out

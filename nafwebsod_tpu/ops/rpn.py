"""RPN proposal machinery: anchor generation + GenerateProposals.

Capability parity with ``detectron/modeling/generate_anchors.py`` (the
classic Faster R-CNN anchor enumeration, matlab-matched) and
``detectron/ops/generate_proposals.py`` (GenerateProposalsOp: shift anchors
over the feature grid, decode deltas, clip, min-size filter, top-K, loose
NMS). Host-side numpy like the reference's ``net.Python`` op — this runs in
the input/inference pipeline, not inside the jitted step.
"""

import numpy as np

from nafwebsod_tpu.ops import boxes as box_utils


# --------------------------------------------------------------------------- #
# generate_anchors (generate_anchors.py:59-119)
# --------------------------------------------------------------------------- #

def generate_anchors(stride=16, sizes=(32, 64, 128, 256, 512),
                     aspect_ratios=(0.5, 1, 2)):
    return _generate_anchors(
        stride,
        np.array(sizes, dtype=np.float64) / stride,
        np.array(aspect_ratios, dtype=np.float64))


def _whctrs(anchor):
    w = anchor[2] - anchor[0] + 1
    h = anchor[3] - anchor[1] + 1
    return w, h, anchor[0] + 0.5 * (w - 1), anchor[1] + 0.5 * (h - 1)


def _mkanchors(ws, hs, x_ctr, y_ctr):
    ws = ws[:, None]
    hs = hs[:, None]
    return np.hstack((x_ctr - 0.5 * (ws - 1), y_ctr - 0.5 * (hs - 1),
                      x_ctr + 0.5 * (ws - 1), y_ctr + 0.5 * (hs - 1)))


def _generate_anchors(base_size, scales, aspect_ratios):
    anchor = np.array([1, 1, base_size, base_size], dtype=np.float64) - 1
    w, h, x_ctr, y_ctr = _whctrs(anchor)
    size_ratios = w * h / aspect_ratios
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * aspect_ratios)
    anchors = _mkanchors(ws, hs, x_ctr, y_ctr)
    out = []
    for i in range(anchors.shape[0]):
        w, h, x_ctr, y_ctr = _whctrs(anchors[i])
        out.append(_mkanchors(w * scales, h * scales, x_ctr, y_ctr))
    return np.vstack(out).astype(np.float32)


# --------------------------------------------------------------------------- #
# GenerateProposals (generate_proposals.py:30-197)
# --------------------------------------------------------------------------- #

def shifted_anchors(height, width, feat_stride, anchors):
    """All anchors at all (H, W) grid positions -> (H*W*A, 4), rows ordered
    (H, W, A) slowest-to-fastest."""
    shift_x = np.arange(0, width) * feat_stride
    shift_y = np.arange(0, height) * feat_stride
    shift_x, shift_y = np.meshgrid(shift_x, shift_y, copy=False)
    shifts = np.vstack((shift_x.ravel(), shift_y.ravel(),
                        shift_x.ravel(), shift_y.ravel())).transpose()
    all_anchors = anchors[None, :, :] + shifts[:, None, :]
    return all_anchors.reshape((-1, 4)).astype(np.float32)


def _filter_boxes(boxes, min_size, im_info):
    im_scale = im_info[2]
    ws_orig = (boxes[:, 2] - boxes[:, 0]) / im_scale + 1
    hs_orig = (boxes[:, 3] - boxes[:, 1]) / im_scale + 1
    min_size = max(min_size, 1)
    ws = boxes[:, 2] - boxes[:, 0] + 1
    hs = boxes[:, 3] - boxes[:, 1] + 1
    x_ctr = boxes[:, 0] + ws / 2.0
    y_ctr = boxes[:, 1] + hs / 2.0
    return np.where((ws_orig >= min_size) & (hs_orig >= min_size) &
                    (x_ctr < im_info[1]) & (y_ctr < im_info[0]))[0]


def rpn_targets(im_height, im_width, all_anchors, gt_boxes, rng=None,
                straddle_thresh=0.0, positive_overlap=0.7,
                negative_overlap=0.3, fg_fraction=0.5, batch_size=256,
                reg_weights=(1.0, 1.0, 1.0, 1.0)):
    """Per-anchor RPN training targets (roi_data/rpn.py:131-230).

    Returns (labels (-1 ignore / 0 bg / 1 fg), bbox_targets (N, 4),
    inside_weights, outside_weights), all over the full anchor set.
    """
    rng = rng or np.random
    total = all_anchors.shape[0]
    if straddle_thresh >= 0:
        inside = np.where(
            (all_anchors[:, 0] >= -straddle_thresh) &
            (all_anchors[:, 1] >= -straddle_thresh) &
            (all_anchors[:, 2] < im_width + straddle_thresh) &
            (all_anchors[:, 3] < im_height + straddle_thresh))[0]
    else:
        inside = np.arange(total)
    anchors = all_anchors[inside]
    n = len(inside)

    labels = np.full((n,), -1, np.int32)
    anchor_to_gt_argmax = np.zeros((n,), np.int64)
    if len(gt_boxes) > 0:
        ov = box_utils.bbox_overlaps(anchors.astype(np.float32),
                                     gt_boxes.astype(np.float32))
        anchor_to_gt_argmax = ov.argmax(axis=1)
        anchor_to_gt_max = ov[np.arange(n), anchor_to_gt_argmax]
        gt_to_anchor_max = ov.max(axis=0)
        # fg: per-gt best anchors (incl. ties) + anchors above the threshold
        labels[np.where(ov == gt_to_anchor_max)[0]] = 1
        labels[anchor_to_gt_max >= positive_overlap] = 1
    else:
        anchor_to_gt_max = np.zeros((n,), np.float32)

    num_fg = int(fg_fraction * batch_size)
    fg_inds = np.where(labels == 1)[0]
    if len(fg_inds) > num_fg:
        labels[rng.choice(fg_inds, len(fg_inds) - num_fg, replace=False)] = -1
    fg_inds = np.where(labels == 1)[0]

    num_bg = batch_size - len(fg_inds)
    bg_inds = np.where(anchor_to_gt_max < negative_overlap)[0]
    if len(bg_inds) > num_bg:
        bg_inds = bg_inds[rng.randint(len(bg_inds), size=num_bg)]
    labels[bg_inds] = 0

    bbox_targets = np.zeros((n, 4), np.float32)
    if len(gt_boxes) > 0 and len(fg_inds) > 0:
        bbox_targets[fg_inds] = box_utils.bbox_transform_inv(
            anchors[fg_inds], gt_boxes[anchor_to_gt_argmax[fg_inds]],
            reg_weights)
    inside_w = np.zeros((n, 4), np.float32)
    inside_w[labels == 1] = 1.0
    outside_w = np.zeros((n, 4), np.float32)
    num_examples = max(np.sum(labels >= 0), 1)
    outside_w[labels >= 0] = 1.0 / num_examples

    def unmap(x, fill):
        out = np.full((total,) + x.shape[1:], fill, x.dtype)
        out[inside] = x
        return out

    return (unmap(labels, -1), unmap(bbox_targets, 0.0),
            unmap(inside_w, 0.0), unmap(outside_w, 0.0))


def generate_proposals(scores, bbox_deltas, im_info, anchors, spatial_scale,
                       pre_nms_top_n=6000, post_nms_top_n=300,
                       nms_thresh=0.7, min_size=0,
                       reg_weights=(1.0, 1.0, 1.0, 1.0)):
    """One image. scores: (A, H, W); bbox_deltas: (4A, H, W); im_info:
    (height, width, scale). Returns (proposals (N, 4), scores (N, 1))."""
    feat_stride = 1.0 / spatial_scale
    a = scores.shape[0]
    height, width = scores.shape[-2:]
    all_anchors = shifted_anchors(height, width, feat_stride, anchors)

    bbox_deltas = bbox_deltas.transpose((1, 2, 0)).reshape((-1, 4))
    scores = scores.transpose((1, 2, 0)).reshape((-1, 1))

    if pre_nms_top_n <= 0 or pre_nms_top_n >= len(scores):
        order = np.argsort(-scores.squeeze(-1))
    else:
        inds = np.argpartition(-scores.squeeze(-1),
                               pre_nms_top_n)[:pre_nms_top_n]
        order = inds[np.argsort(-scores[inds].squeeze(-1))]
    bbox_deltas = bbox_deltas[order]
    all_anchors = all_anchors[order]
    scores = scores[order]

    proposals = box_utils.bbox_transform(all_anchors, bbox_deltas,
                                         reg_weights)
    proposals = box_utils.clip_tiled_boxes(proposals, im_info[:2])
    keep = _filter_boxes(proposals, min_size, im_info)
    proposals = proposals[keep]
    scores = scores[keep]

    if nms_thresh > 0:
        keep = box_utils.nms(
            np.hstack((proposals, scores)).astype(np.float32), nms_thresh)
        if post_nms_top_n > 0:
            keep = keep[:post_nms_top_n]
        keep = np.asarray(keep, dtype=np.int64)
        proposals = proposals[keep]
        scores = scores[keep]
    return proposals.astype(np.float32), scores.astype(np.float32)

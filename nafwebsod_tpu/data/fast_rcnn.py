"""Supervised Fast R-CNN minibatch blobs.

Capability parity with ``detectron/roi_data/fast_rcnn.py:108-230`` (the
upstream path, used by MODEL.TYPE generalized_rcnn): fg/bg RoI sampling by
overlap thresholds with FG_FRACTION, class labels, and expanded per-class
bbox regression targets with inside/outside weights; plus
``roidb_wsl.add_bbox_regression_targets`` (roidb.py equivalent lives here):
compact (class, tx, ty, tw, th) targets for rois with overlap >=
TRAIN.BBOX_THRESH.
"""

import numpy as np

from nafwebsod_tpu.core.config import cfg
from nafwebsod_tpu.ops import boxes as box_ops


def compute_bbox_regression_targets(entry):
    """Compact (R, 5) [class, tx, ty, tw, th] targets
    (ref roidb_wsl.py:124-161)."""
    rois = entry['boxes']
    overlaps = entry['max_overlaps']
    labels = entry['max_classes']
    gt_inds = np.where((entry['gt_classes'] > 0) & (entry['is_crowd'] == 0))[0]
    targets = np.zeros((rois.shape[0], 5), dtype=np.float32)
    if len(gt_inds) == 0:
        return targets
    ex_inds = np.where(overlaps >= cfg.TRAIN.BBOX_THRESH)[0]
    if len(ex_inds) == 0:
        return targets
    ex_gt_overlaps = box_ops.bbox_overlaps(
        rois[ex_inds].astype(np.float32),
        rois[gt_inds].astype(np.float32))
    gt_assignment = ex_gt_overlaps.argmax(axis=1)
    gt_rois = rois[gt_inds[gt_assignment]]
    ex_rois = rois[ex_inds]
    targets[ex_inds, 0] = labels[ex_inds]
    targets[ex_inds, 1:] = box_ops.bbox_transform_inv(
        ex_rois, gt_rois, cfg.MODEL.BBOX_REG_WEIGHTS)
    return targets


def add_bbox_regression_targets(roidb):
    for entry in roidb:
        entry['bbox_targets'] = compute_bbox_regression_targets(entry)


def _expand_bbox_targets(bbox_target_data, num_classes):
    """Compact (R, 5) -> (R, 4K) one-class-hot targets + inside weights
    (ref fast_rcnn.py:212-230)."""
    num_reg = 2 if cfg.MODEL.CLS_AGNOSTIC_BBOX_REG else num_classes
    clss = bbox_target_data[:, 0]
    bbox_targets = np.zeros((clss.size, 4 * num_reg), np.float32)
    bbox_inside = np.zeros(bbox_targets.shape, np.float32)
    inds = np.where(clss > 0)[0]
    for ind in inds:
        cls = int(clss[ind]) if not cfg.MODEL.CLS_AGNOSTIC_BBOX_REG else 1
        start = 4 * cls
        bbox_targets[ind, start:start + 4] = bbox_target_data[ind, 1:]
        bbox_inside[ind, start:start + 4] = (1.0, 1.0, 1.0, 1.0)
    return bbox_targets, bbox_inside


def sample_rois(entry, im_scale, rng=None, pad_to=None):
    """fg/bg sampled supervised RoIs (ref fast_rcnn.py:132-210). Returns a
    blob dict with fixed-size padding when ``pad_to`` is set."""
    rng = rng or np.random
    num_classes = cfg.MODEL.NUM_CLASSES
    rois_per_image = int(cfg.TRAIN.BATCH_SIZE_PER_IM)
    fg_per_image = int(np.round(cfg.TRAIN.FG_FRACTION * rois_per_image))
    max_overlaps = entry['max_overlaps']

    fg_inds = np.where(max_overlaps >= cfg.TRAIN.FG_THRESH)[0]
    fg_n = int(min(fg_per_image, fg_inds.size))
    if fg_inds.size > 0:
        fg_inds = rng.choice(fg_inds, size=fg_n, replace=False)
    bg_inds = np.where((max_overlaps < cfg.TRAIN.BG_THRESH_HI) &
                       (max_overlaps >= cfg.TRAIN.BG_THRESH_LO))[0]
    bg_n = int(min(rois_per_image - fg_n, bg_inds.size))
    if bg_inds.size > 0:
        bg_inds = rng.choice(bg_inds, size=bg_n, replace=False)

    keep = np.append(fg_inds, bg_inds).astype(np.int64)
    labels = entry['max_classes'][keep].copy()
    labels[fg_n:] = 0
    boxes = entry['boxes'][keep]

    if 'bbox_targets' not in entry:
        entry['bbox_targets'] = compute_bbox_regression_targets(entry)
    bbox_targets, bbox_inside = _expand_bbox_targets(
        entry['bbox_targets'][keep, :], num_classes)
    bbox_outside = (bbox_inside > 0).astype(np.float32)

    rois = boxes * im_scale
    rois = np.hstack([np.zeros((rois.shape[0], 1), np.float32),
                      rois.astype(np.float32)])

    n = rois.shape[0]
    valid = np.ones((n,), bool)
    if pad_to is not None and n < pad_to:
        pad = pad_to - n

        def padz(x, shape1):
            return np.vstack([x, np.zeros((pad, shape1), x.dtype)])
        rois = padz(rois, 5)
        bbox_targets = padz(bbox_targets, bbox_targets.shape[1])
        bbox_inside = padz(bbox_inside, bbox_inside.shape[1])
        bbox_outside = padz(bbox_outside, bbox_outside.shape[1])
        labels = np.concatenate([labels, np.zeros((pad,), labels.dtype)])
        valid = np.concatenate([valid, np.zeros((pad,), bool)])

    return {
        'rois': rois.astype(np.float32),
        'labels_int32': labels.astype(np.int32),
        'bbox_targets': bbox_targets,
        'bbox_inside_weights': bbox_inside,
        'bbox_outside_weights': bbox_outside,
        'valid_mask': valid,
    }

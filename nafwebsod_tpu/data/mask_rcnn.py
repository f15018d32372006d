"""Supervised Mask R-CNN training blobs + loss.

Capability parity with ``detectron/roi_data/mask_rcnn.py:37-110``
(add_mask_rcnn_blobs: per-fg-roi M x M binary mask targets rasterized from
the best-overlapping gt polygon, class-specific expansion, -1 ignore labels)
and ``mask_rcnn_heads.add_mask_rcnn_losses:96-105`` (SigmoidCrossEntropyLoss
over the target vector with -1 entries ignored).
"""

import numpy as np

import jax
import jax.numpy as jnp

from nafwebsod_tpu.ops import boxes as box_utils
from nafwebsod_tpu.utils import segms as segm_utils


def add_mask_rcnn_blobs(sampled_boxes, labels_int32, segms, gt_classes,
                        is_crowd, im_scale, M=14, cls_specific=True,
                        num_classes=None):
    """Returns (mask_rois (Nfg, 5), masks_int32 (Nfg, M*M[*C]),
    roi_has_mask)."""
    polys_gt_inds = np.where((gt_classes > 0) & (~is_crowd))[0]
    polys_gt = [segms[i] for i in polys_gt_inds]
    fg_inds = np.where(labels_int32 > 0)[0]
    roi_has_mask = (labels_int32 > 0).astype(np.int32)

    if fg_inds.shape[0] > 0 and len(polys_gt) > 0:
        mask_class_labels = labels_int32[fg_inds]
        masks = np.zeros((fg_inds.shape[0], M ** 2), np.int32)
        boxes_from_polys = segm_utils.polys_to_boxes(polys_gt)
        rois_fg = sampled_boxes[fg_inds]
        ov = box_utils.bbox_overlaps(rois_fg.astype(np.float32),
                                     boxes_from_polys.astype(np.float32))
        fg_polys_inds = np.argmax(ov, axis=1)
        for i in range(rois_fg.shape[0]):
            mask = segm_utils.polys_to_mask_wrt_box(
                polys_gt[fg_polys_inds[i]], rois_fg[i], M)
            masks[i] = (mask > 0).astype(np.int32).reshape(M ** 2)
    else:
        # no fg: one bg roi with an all -1 (ignore) mask (ref :77-89)
        bg_inds = np.where(labels_int32 == 0)[0]
        rois_fg = sampled_boxes[bg_inds[:1]].reshape(1, -1)
        masks = -np.ones((1, M ** 2), np.int32)
        mask_class_labels = np.zeros((1,), np.int32)
        roi_has_mask[0] = 1

    if cls_specific:
        masks = _expand_to_class_specific(masks, mask_class_labels,
                                          num_classes, M)

    rois_fg = rois_fg * im_scale
    rois5 = np.hstack([np.zeros((rois_fg.shape[0], 1), np.float32),
                       rois_fg.astype(np.float32)])
    return rois5, masks, roi_has_mask


def _expand_to_class_specific(masks, labels, num_classes, M):
    """(N, M^2) -> (N, C*M^2) with -1 everywhere except the roi's class slot
    (roi_data/mask_rcnn.py:_expand_to_class_specific_mask_targets)."""
    out = -np.ones((masks.shape[0], num_classes * M ** 2), np.int32)
    for i in range(masks.shape[0]):
        cls = int(labels[i])
        if cls > 0:
            out[i, cls * M ** 2:(cls + 1) * M ** 2] = masks[i]
    return out


def mask_rcnn_loss(mask_logits, masks_int32, loss_weight=1.0):
    """SigmoidCrossEntropyLoss with -1 ignore entries, normalized by the
    non-ignored count (Caffe2 semantics). mask_logits: (N, Mh, Mw, C) or
    flattened; masks_int32: matching flattened targets."""
    logits = mask_logits.reshape(masks_int32.shape[0], -1)
    # class-specific targets order is (C, M, M); logits are NHWC -> move C
    if mask_logits.ndim == 4:
        logits = jnp.moveaxis(mask_logits, -1, 1).reshape(
            masks_int32.shape[0], -1)
    t = masks_int32.astype(jnp.float32)
    valid = masks_int32 >= 0
    x = logits
    elem = jnp.maximum(x, 0) - x * jnp.maximum(t, 0) + jnp.log1p(
        jnp.exp(-jnp.abs(x)))
    loss = jnp.sum(jnp.where(valid, elem, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)
    return loss_weight * loss

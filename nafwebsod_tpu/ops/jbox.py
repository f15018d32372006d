"""Device-side (JAX) box operations: IoU matrices and on-device NMS.

TPU-native equivalents of the reference's native ops:
  * ``iou_matrix``   — ``detectron/ops/roi_iou_op.cu`` semantics available via
    ``roi_iou`` (int-truncated coords, unit diagonal) and a float variant.
  * ``nms``          — ``detectron/utils/cython_nms.pyx`` greedy NMS as a
    fixed-capacity jittable kernel (suppression at IoU >= thresh, +1 areas).

All functions are pure, statically-shaped and jittable; padding rows are
handled via score masking (padded entries carry score = -inf).
"""

from functools import partial

import jax
import jax.numpy as jnp


def iou_matrix(boxes_a, boxes_b):
    """Pairwise IoU with the Detectron +1 convention. (N,4) x (M,4) -> (N,M)."""
    ax1, ay1, ax2, ay2 = jnp.split(boxes_a, 4, axis=1)  # (N,1)
    bx1, by1, bx2, by2 = [b[None, :, 0] for b in jnp.split(boxes_b, 4, axis=1)]  # (1,M)
    iw = jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1) + 1.0
    ih = jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1) + 1.0
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    area_a = (ax2 - ax1 + 1.0) * (ay2 - ay1 + 1.0)
    area_b = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0)
    union = area_a + area_b - inter
    return jnp.where(inter > 0, inter / union, 0.0)


def roi_iou(rois):
    """N x N IoU of 5-col rois, matching ``RoIIoU`` (roi_iou_op.cu:28-62):
    coordinates are truncated to integers and the diagonal is exactly 1.0."""
    boxes = jnp.floor(rois[:, 1:5]).astype(jnp.float32)  # int-cast semantics
    j = iou_matrix(boxes, boxes)
    n = rois.shape[0]
    eye = jnp.eye(n, dtype=bool)
    return jnp.where(eye, 1.0, j)


@partial(jax.jit, static_argnames=('max_output',))
def nms(boxes, scores, iou_threshold, max_output=None):
    """Greedy NMS on device. Returns (keep_mask, order) where keep_mask marks
    surviving boxes in their original positions.

    Matches cython_nms.nms semantics: process boxes in score-descending
    order; a box is suppressed when its IoU with any earlier kept box
    is >= iou_threshold. Padded boxes must carry score = -inf.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)  # stable descending
    sboxes = boxes[order]
    svalid = jnp.isfinite(scores[order])
    iou = iou_matrix(sboxes, sboxes)
    row_idx = jnp.arange(n)

    def body(i, suppressed):
        # If box i (in sorted order) is alive, suppress all later boxes
        # overlapping it at >= threshold.
        alive_i = jnp.logical_not(suppressed[i]) & svalid[i]
        sup_row = (iou[i] >= iou_threshold) & (row_idx > i)
        return jnp.where(alive_i, suppressed | sup_row, suppressed)

    suppressed = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), dtype=bool))
    keep_sorted = jnp.logical_not(suppressed) & svalid
    if max_output is not None and max_output < n:
        rank = jnp.cumsum(keep_sorted.astype(jnp.int32)) - 1
        keep_sorted = keep_sorted & (rank < max_output)
    keep_mask = jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)
    return keep_mask, order


@partial(jax.jit, static_argnames=('max_keep', 'limit'))
def multiclass_nms_limit(boxes, scores, iou_threshold, score_threshold,
                         max_keep, limit):
    """Class-batched greedy NMS + cross-class detection cap, fully on device.

    One jitted program replaces the reference's per-class host loop
    (``detectron/core/test_wsl.py:803-870`` protocol): every foreground class
    runs its score gate and greedy suppression in lockstep, then a single
    ``top_k`` applies the DETECTIONS_PER_IM threshold-with-ties cap across
    classes.

    Args:
      boxes:  (C, R, 4) per-class xyxy boxes (tile the shared proposals for
              models without bbox regression).
      scores: (C, R) per-class scores; padded rows must carry ``-inf``.
      iou_threshold / score_threshold: traced scalars (a grid-search sweep
              over them reuses one compiled program).
      max_keep: static per-class survivor capacity. Each greedy iteration
              keeps exactly one box per class, so ``max_keep`` iterations
              bound the loop; any box beyond per-class rank ``max_keep``
              can only re-enter the global top-``limit`` on an exact score
              tie (deviation noted in PARITY.md).
      limit:  static cross-class cap (cfg.TEST.DETECTIONS_PER_IM; 0 = off).

    Returns (keep_idx (C, max_keep) int32 into the R axis, keep_scores
    (C, max_keep) f32, keep (C, max_keep) bool). Survivors are emitted in
    score-descending order per class; dead slots have idx -1 / score -inf.
    """
    c, r = scores.shape
    gated = jnp.where(scores > score_threshold, scores, -jnp.inf)
    cls_idx = jnp.arange(c)

    def step(i, state):
        alive, kidx, kscore = state
        best = jnp.argmax(alive, axis=1)                       # (C,)
        best_score = alive[cls_idx, best]
        found = jnp.isfinite(best_score)
        winner = boxes[cls_idx, best][:, None, :]              # (C, 1, 4)
        # IoU row of each class winner vs that class's boxes (+1 areas);
        # the winner removes itself via its unit self-overlap.
        iw = (jnp.minimum(winner[..., 2], boxes[..., 2]) -
              jnp.maximum(winner[..., 0], boxes[..., 0]) + 1.0)
        ih = (jnp.minimum(winner[..., 3], boxes[..., 3]) -
              jnp.maximum(winner[..., 1], boxes[..., 1]) + 1.0)
        inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
        area_w = ((winner[..., 2] - winner[..., 0] + 1.0) *
                  (winner[..., 3] - winner[..., 1] + 1.0))
        area_b = ((boxes[..., 2] - boxes[..., 0] + 1.0) *
                  (boxes[..., 3] - boxes[..., 1] + 1.0))
        ov = inter / (area_w + area_b - inter)
        dead = (ov >= iou_threshold) & found[:, None]
        alive = jnp.where(dead, -jnp.inf, alive)
        kidx = kidx.at[:, i].set(jnp.where(found, best, -1))
        kscore = kscore.at[:, i].set(best_score)
        return alive, kidx, kscore

    _, keep_idx, keep_scores = jax.lax.fori_loop(
        0, max_keep, step,
        (gated,
         jnp.full((c, max_keep), -1, jnp.int32),
         jnp.full((c, max_keep), -jnp.inf, jnp.float32)))

    keep = jnp.isfinite(keep_scores)
    if limit > 0 and c * max_keep > limit:
        # kth-largest survivor score == the reference's image_thresh; the
        # >= comparison keeps ties exactly as the host protocol does.
        kth = jax.lax.top_k(keep_scores.reshape(-1), limit)[0][limit - 1]
        keep = keep & (keep_scores >= kth)
    return keep_idx, keep_scores, keep


def clip_boxes(boxes, height, width):
    """Clip (…,4) xyxy boxes to [0, dim-1]."""
    x1 = jnp.clip(boxes[..., 0], 0.0, width - 1.0)
    y1 = jnp.clip(boxes[..., 1], 0.0, height - 1.0)
    x2 = jnp.clip(boxes[..., 2], 0.0, width - 1.0)
    y2 = jnp.clip(boxes[..., 3], 0.0, height - 1.0)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def flip_boxes(boxes, im_width):
    """Horizontal flip of (…,4) xyxy boxes (matches boxes.py:flip_boxes)."""
    x1 = im_width - boxes[..., 2] - 1.0
    x2 = im_width - boxes[..., 0] - 1.0
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)

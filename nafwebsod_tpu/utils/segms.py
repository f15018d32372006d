"""Segmentation mask utilities.

Capability parity with ``detectron/utils/segms.py``: COCO polygon <-> binary
mask conversion (cv2 rasterization instead of pycocotools), crop-to-box
rasterization for mask targets, polygon flipping, and RLE-free mask IoU.
"""

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def polys_to_mask(polygons, height, width):
    """COCO polygon list -> (H, W) binary mask (segms.polys_to_mask)."""
    mask = np.zeros((height, width), np.uint8)
    for poly in polygons:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
    return mask.astype(np.float32)


def polys_to_mask_wrt_box(polygons, box, M):
    """Rasterize polygons inside `box` into an (M, M) mask
    (segms.polys_to_mask_wrt_box) — the mask-target generator."""
    w = max(box[2] - box[0], 1e-5)
    h = max(box[3] - box[1], 1e-5)
    mask = np.zeros((M, M), np.uint8)
    for poly in polygons:
        pts = np.asarray(poly, np.float64).reshape(-1, 2).copy()
        pts[:, 0] = (pts[:, 0] - box[0]) * M / w
        pts[:, 1] = (pts[:, 1] - box[1]) * M / h
        cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
    return mask.astype(np.float32)


def polys_to_boxes(polys):
    """Tight bounding boxes around polygon lists (segms.polys_to_boxes)."""
    boxes = np.zeros((len(polys), 4), np.float32)
    for i, poly in enumerate(polys):
        pts = np.concatenate([np.asarray(p, np.float64).reshape(-1, 2)
                              for p in poly])
        boxes[i] = [pts[:, 0].min(), pts[:, 1].min(),
                    pts[:, 0].max(), pts[:, 1].max()]
    return boxes


def flip_segms(segms, height, width):
    """Left/right flip polygon segmentations (segms.flip_segms)."""
    out = []
    for segm in segms:
        flipped = []
        for poly in segm:
            p = np.asarray(poly, np.float64).copy()
            p[0::2] = width - p[0::2] - 1
            flipped.append(p.tolist())
        out.append(flipped)
    return out


def mask_iou(a, b):
    """IoU of two binary masks."""
    inter = np.logical_and(a > 0.5, b > 0.5).sum()
    union = np.logical_or(a > 0.5, b > 0.5).sum()
    return inter / union if union else 0.0

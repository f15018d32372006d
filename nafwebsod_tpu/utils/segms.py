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


def is_poly(segm):
    """Polygon-list segmentation vs COCO RLE dict (segms.py is_poly):
    crowd regions are RLE-encoded dicts, everything else is a list of
    coordinate lists."""
    return isinstance(segm, (list, tuple))


def segm_to_mask(segm, height, width):
    """Any COCO segmentation (polygon list OR crowd RLE dict) -> (H, W)
    float mask."""
    if is_poly(segm):
        return polys_to_mask(segm, height, width)
    return rle_to_mask(segm).astype(np.float32)


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
    """Left/right flip segmentations (segms.flip_segms): polygon lists flip
    coordinate-wise; crowd RLE dicts flip via mask decode/flip/re-encode
    (the upstream _flip_rle path)."""
    out = []
    for segm in segms:
        if not is_poly(segm):
            mask = rle_to_mask(segm)[:, ::-1]
            out.append(mask_to_rle(np.ascontiguousarray(mask)))
            continue
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


# --------------------------------------------------------------------------- #
# COCO-compatible RLE (pycocotools maskApi.c rleEncode/rleToString semantics,
# reimplemented in numpy so detections.pkl segms are consumable by the COCO
# API without a pycocotools dependency)
# --------------------------------------------------------------------------- #

def _rle_counts_to_string(cnts):
    """LEB128-ish 6-bit packing with delta coding (maskApi.c rleToString)."""
    s = bytearray()
    for i, x in enumerate(cnts):
        x = int(x)
        if i > 2:
            x -= int(cnts[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            s.append(c + 48)
    return bytes(s)


def _rle_string_to_counts(s):
    cnts = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k + 5)
            k += 1
        if len(cnts) > 2:
            x += cnts[-2]
        cnts.append(x)
    return cnts


def mask_to_rle(mask):
    """Binary (H, W) mask -> COCO compressed RLE dict
    {'size': [H, W], 'counts': bytes} (column-major runs starting with the
    zero run, exactly pycocotools' layout)."""
    h, w = mask.shape
    flat = np.asarray(mask, np.uint8).flatten(order='F')
    # run-length over alternating values starting at 0
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    runs = np.diff(bounds)
    if flat.size and flat[0] == 1:
        runs = np.concatenate([[0], runs])
    return {'size': [int(h), int(w)],
            'counts': _rle_counts_to_string(runs)}


def rle_to_mask(rle):
    """Inverse of mask_to_rle."""
    h, w = rle['size']
    counts = rle['counts']
    if isinstance(counts, str):
        # compressed counts arrive as str when the RLE came through json
        counts = _rle_string_to_counts(counts.encode('utf-8'))
    elif isinstance(counts, (bytes, bytearray)):
        counts = _rle_string_to_counts(bytes(counts))
    flat = np.zeros((h * w,), np.uint8)
    pos = 0
    val = 0
    for c in counts:
        flat[pos:pos + c] = val
        pos += c
        val = 1 - val
    return flat.reshape((w, h)).T

"""Host-side (numpy) box operations.

Capability parity with the reference's ``detectron/utils/boxes.py`` and the
Cython kernels ``cython_bbox.pyx`` / ``cython_nms.pyx``. All box math uses
the Detectron legacy "+ 1" width/height convention (w = x2 - x1 + 1) so that
IoU, NMS, and VOC evaluation match the reference numerically; behavior is
matched (golden tests in tests/test_boxes.py), the implementation is this
repo's own — centered on the ``_wh``/``_centers`` decomposition helpers and
fully vectorized voting. These run on the host in the eval pipeline;
device-side equivalents live in ``ops/jbox.py``.
"""

import numpy as np

# Clip exp() in box decoding (reference config BBOX_XFORM_CLIP).
BBOX_XFORM_CLIP = np.log(1000. / 16.)


# --------------------------------------------------------------------------- #
# geometry primitives (the +1 convention lives here and only here)
# --------------------------------------------------------------------------- #


def _wh(boxes):
    """1-based widths/heights of (N, 4) xyxy boxes."""
    return (boxes[:, 2] - boxes[:, 0] + 1.0,
            boxes[:, 3] - boxes[:, 1] + 1.0)


def _centers(boxes):
    """(w, h, cx, cy) decomposition with 1-based sizes."""
    w, h = _wh(boxes)
    return w, h, boxes[:, 0] + 0.5 * w, boxes[:, 1] + 0.5 * h


def boxes_area(boxes):
    w, h = _wh(boxes)
    return w * h


def bbox_overlaps(boxes, query_boxes):
    """IoU matrix between (N, 4) and (K, 4) boxes with the +1 convention
    (reference: ``detectron/utils/cython_bbox.pyx``)."""
    b = np.ascontiguousarray(boxes, dtype=np.float64)
    q = np.ascontiguousarray(query_boxes, dtype=np.float64)
    iw = (np.minimum(b[:, None, 2], q[None, :, 2]) -
          np.maximum(b[:, None, 0], q[None, :, 0]) + 1).clip(min=0)
    ih = (np.minimum(b[:, None, 3], q[None, :, 3]) -
          np.maximum(b[:, None, 1], q[None, :, 1]) + 1).clip(min=0)
    inter = iw * ih
    union = boxes_area(b)[:, None] + boxes_area(q)[None, :] - inter
    with np.errstate(divide='ignore', invalid='ignore'):
        return np.where(inter > 0, inter / union, 0.0)


# --------------------------------------------------------------------------- #
# format conversion / filtering / clipping
# --------------------------------------------------------------------------- #


def xywh_to_xyxy(xywh):
    """(x, y, w, h) -> (x1, y1, x2, y2) with the +1 convention."""
    if isinstance(xywh, (list, tuple)):
        assert len(xywh) == 4
        x1, y1, w, h = xywh
        return (x1, y1, x1 + np.maximum(0., w - 1.), y1 + np.maximum(0., h - 1.))
    if isinstance(xywh, np.ndarray):
        far = xywh[:, 0:2] + np.maximum(0, xywh[:, 2:4] - 1)
        return np.hstack((xywh[:, 0:2], far))
    raise TypeError('Argument xywh must be a list, tuple, or numpy array.')


def xyxy_to_xywh(xyxy):
    if isinstance(xyxy, (list, tuple)):
        assert len(xyxy) == 4
        x1, y1, x2, y2 = xyxy
        return (x1, y1, x2 - x1 + 1, y2 - y1 + 1)
    if isinstance(xyxy, np.ndarray):
        return np.hstack((xyxy[:, 0:2], xyxy[:, 2:4] - xyxy[:, 0:2] + 1))
    raise TypeError('Argument xyxy must be a list, tuple, or numpy array.')


def filter_small_boxes(boxes, min_size):
    """Indices of boxes with BOTH 1-based sides strictly > min_size."""
    w, h = _wh(boxes)
    return np.where((w > min_size) & (h > min_size))[0]


def clip_boxes_to_image(boxes, height, width):
    out = boxes.copy()
    out[:, [0, 2]] = out[:, [0, 2]].clip(0., width - 1.)
    out[:, [1, 3]] = out[:, [1, 3]].clip(0., height - 1.)
    return out


def clip_xyxy_to_image(x1, y1, x2, y2, height, width):
    return (np.clip(x1, 0., width - 1.), np.clip(y1, 0., height - 1.),
            np.clip(x2, 0., width - 1.), np.clip(y2, 0., height - 1.))


def clip_tiled_boxes(boxes, im_shape):
    """Clip boxes tiled as (N, 4*num_classes) to an image's bounds
    (in place, like the reference)."""
    assert boxes.shape[1] % 4 == 0
    hi = (im_shape[1] - 1, im_shape[0] - 1)  # (x max, y max)
    for col in range(4):
        boxes[:, col::4] = boxes[:, col::4].clip(0, hi[col % 2])
    return boxes


# --------------------------------------------------------------------------- #
# box regression encode/decode and test-time coordinate transforms
# --------------------------------------------------------------------------- #


def bbox_transform(boxes, deltas, weights=(1.0, 1.0, 1.0, 1.0)):
    """Decode per-class (dx, dy, dw, dh) deltas (N, 4*C) onto (N, 4) boxes
    (Fast R-CNN box decoding; exp clipped at BBOX_XFORM_CLIP)."""
    if boxes.shape[0] == 0:
        return np.zeros((0, deltas.shape[1]), dtype=deltas.dtype)

    boxes = boxes.astype(deltas.dtype, copy=False)
    w, h, cx, cy = (v[:, None] for v in _centers(boxes))
    wx, wy, ww, wh = weights

    pred_cx = (deltas[:, 0::4] / wx) * w + cx
    pred_cy = (deltas[:, 1::4] / wy) * h + cy
    pred_w = np.exp(np.minimum(deltas[:, 2::4] / ww, BBOX_XFORM_CLIP)) * w
    pred_h = np.exp(np.minimum(deltas[:, 3::4] / wh, BBOX_XFORM_CLIP)) * h

    out = np.zeros(deltas.shape, dtype=deltas.dtype)
    out[:, 0::4] = pred_cx - 0.5 * pred_w
    out[:, 1::4] = pred_cy - 0.5 * pred_h
    out[:, 2::4] = pred_cx + 0.5 * pred_w - 1
    out[:, 3::4] = pred_cy + 0.5 * pred_h - 1
    return out


def bbox_transform_inv(boxes, gt_boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    """Encode gt boxes relative to example boxes as (dx, dy, dw, dh)."""
    ew, eh, ecx, ecy = _centers(boxes)
    gw, gh, gcx, gcy = _centers(gt_boxes)
    wx, wy, ww, wh = weights
    return np.stack([wx * (gcx - ecx) / ew,
                     wy * (gcy - ecy) / eh,
                     ww * np.log(gw / ew),
                     wh * np.log(gh / eh)], axis=1)


def expand_boxes(boxes, scale):
    """Scale boxes about their centers (0-based sizes, mask upsampling)."""
    half = (boxes[:, 2:4] - boxes[:, 0:2]) * (0.5 * scale)
    center = (boxes[:, 2:4] + boxes[:, 0:2]) * 0.5
    out = np.zeros(boxes.shape)
    out[:, 0:2] = center - half
    out[:, 2:4] = center + half
    return out


def flip_boxes(boxes, im_width):
    out = boxes.copy()
    out[:, 0::4] = im_width - boxes[:, 2::4] - 1
    out[:, 2::4] = im_width - boxes[:, 0::4] - 1
    return out


def aspect_ratio(boxes, aspect_ratio_val):
    """Width-relative aspect ratio transformation."""
    out = boxes.copy()
    out[:, 0::4] *= aspect_ratio_val
    out[:, 2::4] *= aspect_ratio_val
    return out


def unique_boxes(boxes, scale=1.0):
    """Indices of unique boxes after quantizing coords by ``scale``."""
    digits = np.round(boxes * scale).dot([1, 1e3, 1e6, 1e9])
    _, index = np.unique(digits, return_index=True)
    return np.sort(index)


# --------------------------------------------------------------------------- #
# NMS family
# --------------------------------------------------------------------------- #


def nms(dets, thresh):
    """Greedy NMS matching ``cython_nms.nms``: score-descending order,
    +1 areas, suppression at IoU >= thresh. Returns kept indices.

    Dispatches to the native C++ kernel (native/box_ops.cpp, the rebuild's
    equivalent of the compiled Cython module) when available."""
    from nafwebsod_tpu import native
    if dets.shape[0] > 0 and native.available():
        return native.nms(dets, thresh)
    return _nms_numpy(dets, thresh)


def _nms_numpy(dets, thresh):
    if dets.shape[0] == 0:
        return []
    areas = boxes_area(dets)
    order = dets[:, 4].argsort()[::-1]
    keep = []
    while order.size > 0:
        i, rest = order[0], order[1:]
        keep.append(i)
        # IoU of the winner vs the remainder in the dets dtype (the cython
        # kernel works in the input dtype; borderline >= thresh decisions
        # must not shift with a precision change)
        iw = (np.minimum(dets[i, 2], dets[rest, 2]) -
              np.maximum(dets[i, 0], dets[rest, 0]) + 1).clip(min=0)
        ih = (np.minimum(dets[i, 3], dets[rest, 3]) -
              np.maximum(dets[i, 1], dets[rest, 1]) + 1).clip(min=0)
        inter = iw * ih
        ov = inter / (areas[i] + areas[rest] - inter)
        order = rest[ov < thresh]
    return keep


def soft_nms(dets, sigma=0.5, overlap_thresh=0.3, score_thresh=0.001,
             method='linear'):
    """Soft-NMS (Bodla et al., https://arxiv.org/abs/1704.04503) matching
    ``cython_nms.soft_nms``: iterative max-selection with linear/gaussian/hard
    score decay and pruning below ``score_thresh``.

    Returns (rescored_dets, kept_original_indices). Dispatches to the native
    C++ kernel when available."""
    if dets.shape[0] == 0:
        return dets, []

    methods = {'hard': 0, 'linear': 1, 'gaussian': 2}
    assert method in methods, 'Unknown soft_nms method: {}'.format(method)

    from nafwebsod_tpu import native
    if native.available():
        return native.soft_nms(dets, sigma, overlap_thresh, score_thresh,
                               method)
    m = methods[method]

    boxes = dets.copy().astype(np.float32)
    n = boxes.shape[0]
    inds = np.arange(n)

    i = 0
    while i < n:
        # swap the max-scoring remaining box into position i
        maxpos = i + np.argmax(boxes[i:n, 4])
        boxes[[i, maxpos]] = boxes[[maxpos, i]]
        inds[[i, maxpos]] = inds[[maxpos, i]]

        tx1, ty1, tx2, ty2 = boxes[i, :4]
        area_i = (tx2 - tx1 + 1) * (ty2 - ty1 + 1)

        pos = i + 1
        while pos < n:
            x1, y1, x2, y2, s = boxes[pos]
            iw = min(tx2, x2) - max(tx1, x1) + 1
            ih = min(ty2, y2) - max(ty1, y1) + 1
            if iw > 0 and ih > 0:
                area = (x2 - x1 + 1) * (y2 - y1 + 1)
                ov = iw * ih / (area_i + area - iw * ih)
                if m == 1:
                    weight = 1 - ov if ov > overlap_thresh else 1.0
                elif m == 2:
                    weight = np.exp(-(ov * ov) / sigma)
                else:
                    weight = 0.0 if ov > overlap_thresh else 1.0
                boxes[pos, 4] = weight * boxes[pos, 4]
                if boxes[pos, 4] < score_thresh:
                    # discard: move last remaining box into this slot
                    boxes[pos] = boxes[n - 1]
                    inds[pos] = inds[n - 1]
                    n -= 1
                    pos -= 1
            pos += 1
        i += 1

    return boxes[:n], inds[:n]


# --------------------------------------------------------------------------- #
# box voting
# --------------------------------------------------------------------------- #


def box_voting(top_dets, all_dets, thresh, scoring_method='ID', beta=1.0):
    """Bounding-box voting (Gidaris & Komodakis,
    https://arxiv.org/abs/1505.01749): each surviving detection's box becomes
    the score-weighted average of all detections overlapping it at
    IoU >= thresh, with the reference's score re-estimation menu
    (boxes.py:262-313) — vectorized over the whole top-det set instead of a
    per-box Python loop."""
    out = top_dets.copy()
    all_boxes = all_dets[:, :4]
    scores = all_dets[:, 4]
    votes = bbox_overlaps(top_dets[:, :4], all_boxes) >= thresh  # (K, N)

    w = votes * scores[None, :]                                  # (K, N)
    w_sum = w.sum(axis=1)
    out[:, :4] = (w @ all_boxes) / w_sum[:, None]

    counts = votes.sum(axis=1)
    if scoring_method == 'ID':
        pass  # identity: keep the NMS-survivor scores
    elif scoring_method == 'TEMP_AVG':
        # temperature-rescaled two-way softmax over (p, 1-p), averaged:
        # exp(log(p / max(p, 1-p)) / beta) == (p / max(p, 1-p))**(1/beta)
        p = np.stack([scores, 1.0 - scores])                      # (2, N)
        t = (p / np.max(p, axis=0, keepdims=True)) ** (1.0 / beta)
        p_temp = t[0] / t.sum(axis=0)                             # (N,)
        out[:, 4] = (votes * p_temp[None, :]).sum(axis=1) / counts
    elif scoring_method == 'AVG':
        out[:, 4] = w_sum / counts
    elif scoring_method == 'IOU_AVG':
        ov = bbox_overlaps(top_dets[:, :4], all_boxes) * votes
        out[:, 4] = (ov * scores[None, :]).sum(axis=1) / ov.sum(axis=1)
    elif scoring_method == 'GENERALIZED_AVG':
        pw = votes * scores[None, :] ** beta
        out[:, 4] = (pw.sum(axis=1) / counts) ** (1.0 / beta)
    elif scoring_method == 'QUASI_SUM':
        out[:, 4] = w_sum / counts.astype(float) ** beta
    else:
        raise NotImplementedError(
            'Unknown scoring method {}'.format(scoring_method))
    return out

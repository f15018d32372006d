"""Host-side (numpy) box operations.

Capability parity with the reference's ``detectron/utils/boxes.py`` and the
Cython kernels ``cython_bbox.pyx`` / ``cython_nms.pyx``: all box math uses the
Detectron legacy "+ 1" width/height convention (w = x2 - x1 + 1) so that IoU,
NMS, and VOC evaluation match the reference numerically. These run on the host
in the eval pipeline; device-side equivalents live in ``ops/jbox.py``.
"""

import numpy as np

# Clip exp() in bbox_transform (reference config BBOX_XFORM_CLIP).
BBOX_XFORM_CLIP = np.log(1000. / 16.)


def boxes_area(boxes):
    w = boxes[:, 2] - boxes[:, 0] + 1
    h = boxes[:, 3] - boxes[:, 1] + 1
    return w * h


def unique_boxes(boxes, scale=1.0):
    """Return indices of unique boxes after quantizing coords by `scale`."""
    v = np.array([1, 1e3, 1e6, 1e9])
    hashes = np.round(boxes * scale).dot(v)
    _, index = np.unique(hashes, return_index=True)
    return np.sort(index)


def xywh_to_xyxy(xywh):
    """(x, y, w, h) -> (x1, y1, x2, y2) with the +1 convention."""
    if isinstance(xywh, (list, tuple)):
        assert len(xywh) == 4
        x1, y1 = xywh[0], xywh[1]
        x2 = x1 + np.maximum(0., xywh[2] - 1.)
        y2 = y1 + np.maximum(0., xywh[3] - 1.)
        return (x1, y1, x2, y2)
    elif isinstance(xywh, np.ndarray):
        return np.hstack(
            (xywh[:, 0:2], xywh[:, 0:2] + np.maximum(0, xywh[:, 2:4] - 1))
        )
    raise TypeError('Argument xywh must be a list, tuple, or numpy array.')


def xyxy_to_xywh(xyxy):
    if isinstance(xyxy, (list, tuple)):
        assert len(xyxy) == 4
        x1, y1 = xyxy[0], xyxy[1]
        return (x1, y1, xyxy[2] - x1 + 1, xyxy[3] - y1 + 1)
    elif isinstance(xyxy, np.ndarray):
        return np.hstack((xyxy[:, 0:2], xyxy[:, 2:4] - xyxy[:, 0:2] + 1))
    raise TypeError('Argument xyxy must be a list, tuple, or numpy array.')


def filter_small_boxes(boxes, min_size):
    w = boxes[:, 2] - boxes[:, 0] + 1
    h = boxes[:, 3] - boxes[:, 1] + 1
    return np.where((w > min_size) & (h > min_size))[0]


def clip_boxes_to_image(boxes, height, width):
    boxes = boxes.copy()
    boxes[:, [0, 2]] = np.minimum(width - 1., np.maximum(0., boxes[:, [0, 2]]))
    boxes[:, [1, 3]] = np.minimum(height - 1., np.maximum(0., boxes[:, [1, 3]]))
    return boxes


def clip_xyxy_to_image(x1, y1, x2, y2, height, width):
    x1 = np.minimum(width - 1., np.maximum(0., x1))
    y1 = np.minimum(height - 1., np.maximum(0., y1))
    x2 = np.minimum(width - 1., np.maximum(0., x2))
    y2 = np.minimum(height - 1., np.maximum(0., y2))
    return x1, y1, x2, y2


def clip_tiled_boxes(boxes, im_shape):
    """Clip boxes tiled as (N, 4*num_classes) to an image's bounds."""
    assert boxes.shape[1] % 4 == 0
    boxes[:, 0::4] = np.maximum(np.minimum(boxes[:, 0::4], im_shape[1] - 1), 0)
    boxes[:, 1::4] = np.maximum(np.minimum(boxes[:, 1::4], im_shape[0] - 1), 0)
    boxes[:, 2::4] = np.maximum(np.minimum(boxes[:, 2::4], im_shape[1] - 1), 0)
    boxes[:, 3::4] = np.maximum(np.minimum(boxes[:, 3::4], im_shape[0] - 1), 0)
    return boxes


def bbox_transform(boxes, deltas, weights=(1.0, 1.0, 1.0, 1.0)):
    """Apply (dx, dy, dw, dh) deltas to boxes (Fast R-CNN box decoding)."""
    if boxes.shape[0] == 0:
        return np.zeros((0, deltas.shape[1]), dtype=deltas.dtype)

    boxes = boxes.astype(deltas.dtype, copy=False)
    widths = boxes[:, 2] - boxes[:, 0] + 1.0
    heights = boxes[:, 3] - boxes[:, 1] + 1.0
    ctr_x = boxes[:, 0] + 0.5 * widths
    ctr_y = boxes[:, 1] + 0.5 * heights

    wx, wy, ww, wh = weights
    dx = deltas[:, 0::4] / wx
    dy = deltas[:, 1::4] / wy
    dw = deltas[:, 2::4] / ww
    dh = deltas[:, 3::4] / wh

    dw = np.minimum(dw, BBOX_XFORM_CLIP)
    dh = np.minimum(dh, BBOX_XFORM_CLIP)

    pred_ctr_x = dx * widths[:, np.newaxis] + ctr_x[:, np.newaxis]
    pred_ctr_y = dy * heights[:, np.newaxis] + ctr_y[:, np.newaxis]
    pred_w = np.exp(dw) * widths[:, np.newaxis]
    pred_h = np.exp(dh) * heights[:, np.newaxis]

    pred_boxes = np.zeros(deltas.shape, dtype=deltas.dtype)
    pred_boxes[:, 0::4] = pred_ctr_x - 0.5 * pred_w
    pred_boxes[:, 1::4] = pred_ctr_y - 0.5 * pred_h
    pred_boxes[:, 2::4] = pred_ctr_x + 0.5 * pred_w - 1
    pred_boxes[:, 3::4] = pred_ctr_y + 0.5 * pred_h - 1
    return pred_boxes


def bbox_transform_inv(boxes, gt_boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    """Encode gt boxes relative to anchor boxes as (dx, dy, dw, dh) targets."""
    ex_widths = boxes[:, 2] - boxes[:, 0] + 1.0
    ex_heights = boxes[:, 3] - boxes[:, 1] + 1.0
    ex_ctr_x = boxes[:, 0] + 0.5 * ex_widths
    ex_ctr_y = boxes[:, 1] + 0.5 * ex_heights

    gt_widths = gt_boxes[:, 2] - gt_boxes[:, 0] + 1.0
    gt_heights = gt_boxes[:, 3] - gt_boxes[:, 1] + 1.0
    gt_ctr_x = gt_boxes[:, 0] + 0.5 * gt_widths
    gt_ctr_y = gt_boxes[:, 1] + 0.5 * gt_heights

    wx, wy, ww, wh = weights
    targets_dx = wx * (gt_ctr_x - ex_ctr_x) / ex_widths
    targets_dy = wy * (gt_ctr_y - ex_ctr_y) / ex_heights
    targets_dw = ww * np.log(gt_widths / ex_widths)
    targets_dh = wh * np.log(gt_heights / ex_heights)
    return np.vstack((targets_dx, targets_dy, targets_dw, targets_dh)).transpose()


def expand_boxes(boxes, scale):
    w_half = (boxes[:, 2] - boxes[:, 0]) * .5
    h_half = (boxes[:, 3] - boxes[:, 1]) * .5
    x_c = (boxes[:, 2] + boxes[:, 0]) * .5
    y_c = (boxes[:, 3] + boxes[:, 1]) * .5

    w_half *= scale
    h_half *= scale

    boxes_exp = np.zeros(boxes.shape)
    boxes_exp[:, 0] = x_c - w_half
    boxes_exp[:, 2] = x_c + w_half
    boxes_exp[:, 1] = y_c - h_half
    boxes_exp[:, 3] = y_c + h_half
    return boxes_exp


def flip_boxes(boxes, im_width):
    boxes_flipped = boxes.copy()
    boxes_flipped[:, 0::4] = im_width - boxes[:, 2::4] - 1
    boxes_flipped[:, 2::4] = im_width - boxes[:, 0::4] - 1
    return boxes_flipped


def aspect_ratio(boxes, aspect_ratio_val):
    """Width-relative aspect ratio transformation."""
    boxes_ar = boxes.copy()
    boxes_ar[:, 0::4] = aspect_ratio_val * boxes[:, 0::4]
    boxes_ar[:, 2::4] = aspect_ratio_val * boxes[:, 2::4]
    return boxes_ar


def bbox_overlaps(boxes, query_boxes):
    """IoU matrix between (N,4) and (K,4) boxes with the +1 convention
    (reference: ``detectron/utils/cython_bbox.pyx``)."""
    boxes = np.ascontiguousarray(boxes, dtype=np.float64)
    query_boxes = np.ascontiguousarray(query_boxes, dtype=np.float64)
    area_q = (query_boxes[:, 2] - query_boxes[:, 0] + 1) * \
             (query_boxes[:, 3] - query_boxes[:, 1] + 1)
    iw = np.minimum(boxes[:, 2:3], query_boxes[None, :, 2]) - \
        np.maximum(boxes[:, 0:1], query_boxes[None, :, 0]) + 1
    ih = np.minimum(boxes[:, 3:4], query_boxes[None, :, 3]) - \
        np.maximum(boxes[:, 1:2], query_boxes[None, :, 1]) + 1
    iw = np.maximum(iw, 0)
    ih = np.maximum(ih, 0)
    inter = iw * ih
    area_b = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    union = area_b[:, None] + area_q[None, :] - inter
    with np.errstate(divide='ignore', invalid='ignore'):
        overlaps = np.where(inter > 0, inter / union, 0.0)
    return overlaps


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
    x1 = dets[:, 0]
    y1 = dets[:, 1]
    x2 = dets[:, 2]
    y2 = dets[:, 3]
    scores = dets[:, 4]

    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]

    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        inds = np.where(ovr < thresh)[0]
        order = order[inds + 1]
    return keep


def soft_nms(dets, sigma=0.5, overlap_thresh=0.3, score_thresh=0.001,
             method='linear'):
    """Soft-NMS (Bodla et al., https://arxiv.org/abs/1704.04503) matching
    ``cython_nms.soft_nms``: iterative max-selection with linear/gaussian/hard
    score decay and pruning below `score_thresh`.

    Returns (rescored_dets, kept_original_indices). Dispatches to the native
    C++ kernel when available.
    """
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
    N = boxes.shape[0]
    inds = np.arange(N)

    i = 0
    while i < N:
        # swap the max-scoring remaining box into position i
        maxpos = i + np.argmax(boxes[i:N, 4])
        boxes[[i, maxpos]] = boxes[[maxpos, i]]
        inds[[i, maxpos]] = inds[[maxpos, i]]

        tx1, ty1, tx2, ty2 = boxes[i, :4]
        area_i = (tx2 - tx1 + 1) * (ty2 - ty1 + 1)

        pos = i + 1
        while pos < N:
            x1, y1, x2, y2, s = boxes[pos]
            area = (x2 - x1 + 1) * (y2 - y1 + 1)
            iw = min(tx2, x2) - max(tx1, x1) + 1
            ih = min(ty2, y2) - max(ty1, y1) + 1
            if iw > 0 and ih > 0:
                ov = iw * ih / (area_i + area - iw * ih)
                if m == 1:  # linear
                    weight = 1 - ov if ov > overlap_thresh else 1.0
                elif m == 2:  # gaussian
                    weight = np.exp(-(ov * ov) / sigma)
                else:  # hard nms
                    weight = 0.0 if ov > overlap_thresh else 1.0
                boxes[pos, 4] = weight * boxes[pos, 4]
                if boxes[pos, 4] < score_thresh:
                    # discard: move last remaining box into this slot
                    boxes[pos] = boxes[N - 1]
                    inds[pos] = inds[N - 1]
                    N -= 1
                    pos -= 1
            pos += 1
        i += 1

    return boxes[:N], inds[:N]


def box_voting(top_dets, all_dets, thresh, scoring_method='ID', beta=1.0):
    """Bounding-box voting (Gidaris & Komodakis, https://arxiv.org/abs/1505.01749):
    each surviving detection's box becomes the score-weighted average of all
    detections overlapping it at IoU >= thresh; optional score re-estimation."""
    top_dets_out = top_dets.copy()
    top_boxes = top_dets[:, :4]
    all_boxes = all_dets[:, :4]
    all_scores = all_dets[:, 4]
    top_to_all_overlaps = bbox_overlaps(top_boxes, all_boxes)
    for k in range(top_dets_out.shape[0]):
        inds_to_vote = np.where(top_to_all_overlaps[k] >= thresh)[0]
        boxes_to_vote = all_boxes[inds_to_vote, :]
        ws = all_scores[inds_to_vote]
        top_dets_out[k, :4] = np.average(boxes_to_vote, axis=0, weights=ws)
        if scoring_method == 'ID':
            pass
        elif scoring_method == 'TEMP_AVG':
            P = np.vstack((ws, 1.0 - ws))
            P_max = np.max(P, axis=0)
            X = np.log(P / P_max)
            X_exp = np.exp(X / beta)
            P_temp = X_exp / np.sum(X_exp, axis=0)
            top_dets_out[k, 4] = P_temp[0].mean()
        elif scoring_method == 'AVG':
            top_dets_out[k, 4] = ws.mean()
        elif scoring_method == 'IOU_AVG':
            P = ws
            ws = top_to_all_overlaps[k, inds_to_vote]
            top_dets_out[k, 4] = np.average(P, weights=ws)
        elif scoring_method == 'GENERALIZED_AVG':
            top_dets_out[k, 4] = np.mean(ws ** beta) ** (1.0 / beta)
        elif scoring_method == 'QUASI_SUM':
            top_dets_out[k, 4] = ws.sum() / float(len(ws)) ** beta
        else:
            raise NotImplementedError(
                'Unknown scoring method {}'.format(scoring_method)
            )
    return top_dets_out

"""Visualization: detection rendering + periodic training dumps.

Capability parity with ``detectron/utils/vis.py`` (``vis_one_image``: draw
class boxes above a score threshold) and ``detectron/utils/webly_vis.py``
(``vis_training``: periodic dumps of the input image, per-RoI score heatmaps
and entropy/class-weight summaries every ``WSL.SAMPLE_ITER`` iterations).
Uses cv2 only — no display required.
"""

import os

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

_GOLDEN_RATIO = 0.618033988749895


def distinct_color(idx):
    """Deterministic distinct BGR color per class id (colormap.py analogue)."""
    h = (idx * _GOLDEN_RATIO) % 1.0
    hsv = np.uint8([[[int(h * 179), 200, 255]]])
    return tuple(int(v) for v in cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)[0, 0])


# COCO 17-keypoint skeleton (pairs of keypoint indices in the standard
# nose/eyes/ears/shoulders/elbows/wrists/hips/knees/ankles ordering), the
# connection set the reference derives in vis.py:kp_connections:47-65.
COCO_KP_SKELETON = (
    (1, 3), (2, 4), (0, 1), (0, 2),          # face
    (5, 7), (7, 9), (6, 8), (8, 10),         # arms
    (11, 13), (13, 15), (12, 14), (14, 16),  # legs
    (5, 6), (11, 12), (5, 11), (6, 12),      # torso
)


def vis_mask(im, mask, color, alpha=0.4, border=True):
    """Alpha-blend a binary mask over the image and trace its contour
    (vis.py:vis_mask:97-118 semantics)."""
    out = im.astype(np.float32)
    idx = mask.astype(bool)
    out[idx] = (1.0 - alpha) * out[idx] + alpha * np.float32(color)
    out = out.astype(np.uint8)
    if border:
        contours, _ = cv2.findContours(
            mask.astype(np.uint8), cv2.RETR_EXTERNAL,
            cv2.CHAIN_APPROX_SIMPLE)[-2:]
        cv2.drawContours(out, contours, -1, color, 1, cv2.LINE_AA)
    return out


def vis_keypoints(im, kps, kp_thresh=2.0, skeleton=None):
    """Draw one instance's keypoints + skeleton (vis.py:vis_keypoints
    protocol: joints above the logit threshold get dots; both-visible
    skeleton edges get lines). ``kps``: (4, K) rows (x, y, logit, prob)."""
    out = im.copy()
    k = kps.shape[1]
    if skeleton is None and k == 17:
        skeleton = COCO_KP_SKELETON
    vis_j = kps[2] > kp_thresh
    for a, b in (skeleton or ()):
        if a < k and b < k and vis_j[a] and vis_j[b]:
            cv2.line(out, (int(kps[0, a]), int(kps[1, a])),
                     (int(kps[0, b]), int(kps[1, b])),
                     distinct_color(7 + a), 2, cv2.LINE_AA)
    for j in range(k):
        if vis_j[j]:
            cv2.circle(out, (int(kps[0, j]), int(kps[1, j])), 3,
                       distinct_color(j), -1, cv2.LINE_AA)
    return out


def vis_one_image(im, cls_boxes, segms=None, keypoints=None, thresh=0.5,
                  kp_thresh=2.0, class_names=None, output_name=None):
    """Render per-class detections with optional instance masks and
    keypoints (vis.py:vis_one_image protocol). cls_boxes is the per-class
    list of (N, 5) [x1 y1 x2 y2 score] arrays; ``segms`` the matching
    per-class RLE lists; ``keypoints`` the per-class (N, 4, K) arrays.
    Returns the drawn image; writes ``output_name`` when given."""
    out = im.copy()
    for c, dets in enumerate(cls_boxes):
        if c == 0 or dets is None or len(dets) == 0:
            continue
        for k, det in enumerate(dets):
            score = float(det[4])
            if score < thresh:
                continue
            x1, y1, x2, y2 = [int(v) for v in det[:4]]
            color = distinct_color(c)
            if segms is not None and len(segms[c]) > k:
                from nafwebsod_tpu.utils.segms import rle_to_mask
                out = vis_mask(out, rle_to_mask(segms[c][k]), color)
            cv2.rectangle(out, (x1, y1), (x2, y2), color, 2)
            name = class_names[c] if class_names else str(c)
            label = '{} {:.2f}'.format(name, score)
            cv2.putText(out, label, (x1, max(y1 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.45, color, 1)
            if keypoints is not None and len(keypoints[c]) > k:
                out = vis_keypoints(out, np.asarray(keypoints[c][k]),
                                    kp_thresh)
    if output_name:
        os.makedirs(os.path.dirname(output_name) or '.', exist_ok=True)
        cv2.imwrite(output_name, out)
    return out


def roi_score_heatmap(im_shape, rois, roi_scores):
    """Accumulate per-RoI scores into an image-space heatmap
    (webly_vis.py:get_heatmap analogue)."""
    h, w = im_shape[:2]
    heat = np.zeros((h, w), np.float32)
    for roi, s in zip(rois, roi_scores):
        x1, y1, x2, y2 = [int(v) for v in roi[-4:]]
        x1, y1 = max(x1, 0), max(y1, 0)
        x2, y2 = min(x2, w - 1), min(y2, h - 1)
        if x2 > x1 and y2 > y1:
            heat[y1:y2 + 1, x1:x2 + 1] += float(s)
    if heat.max() > 0:
        heat /= heat.max()
    return heat


def vis_training(output_dir, cur_iter, image, rois, rois_pred, labels_oh,
                 class_weights=None, pixel_means=None):
    """Periodic training dump (webly_vis.py:vis_training:18-66): the
    de-meaned input image plus a per-gt-class RoI score heatmap."""
    os.makedirs(output_dir, exist_ok=True)
    im = np.asarray(image)
    if im.ndim == 4:
        im = im[0]
    if pixel_means is not None:
        im = im + pixel_means
    im = np.clip(im, 0, 255).astype(np.uint8)
    cv2.imwrite(os.path.join(output_dir,
                             'iter{}_image.png'.format(cur_iter)), im)

    rois_pred = np.asarray(rois_pred)
    gt_classes = np.where(np.asarray(labels_oh)[0] > 0)[0]
    for c in gt_classes:
        heat = roi_score_heatmap(im.shape, np.asarray(rois), rois_pred[:, c])
        hm = cv2.applyColorMap((heat * 255).astype(np.uint8),
                               cv2.COLORMAP_JET)
        blend = cv2.addWeighted(im, 0.5, hm, 0.5, 0)
        cv2.imwrite(os.path.join(
            output_dir, 'iter{}_class{}_heat.png'.format(cur_iter, c)), blend)
    if class_weights is not None:
        np.savetxt(os.path.join(
            output_dir, 'iter{}_class_weights.txt'.format(cur_iter)),
            np.asarray(class_weights))


def _demean_image(image, pixel_means=None):
    im = np.asarray(image)
    if im.ndim == 4:
        im = im[0]
    if pixel_means is not None:
        im = im + pixel_means
    return np.clip(im, 0, 255).astype(np.uint8)


def vis_training_cpg(output_dir, cur_iter, image, cpg_maps, class_idx, keep,
                     pixel_means=None):
    """CPG saliency observability (cpg_vis.py:save_cpg:135-152): per active
    gt class, the [0,1]-normalized saliency map jet-colored and blended over
    the de-meaned input image."""
    os.makedirs(output_dir, exist_ok=True)
    im = _demean_image(image, pixel_means)
    maps = np.asarray(cpg_maps)
    class_idx = np.asarray(class_idx)
    keep = np.asarray(keep)
    for k in range(maps.shape[0]):
        if not keep[k]:
            continue
        m = maps[k]
        m = cv2.resize(m, (im.shape[1], im.shape[0]))
        hm = cv2.applyColorMap(
            (np.clip(m, 0, 1) * 255).astype(np.uint8), cv2.COLORMAP_JET)
        blend = cv2.addWeighted(im, 0.5, hm, 0.5, 0)
        cv2.imwrite(os.path.join(
            output_dir,
            'iter{}_class{}_cpg.png'.format(cur_iter, int(class_idx[k]))),
            blend)


def feat_map_vis(output_name, image, feat, pixel_means=None):
    """Channel-max conv-feature rendering (feat_vis.py:feat_map_draw:19-32):
    max over channels, [0,1]-normalize, jet colormap, blend over the image.
    ``feat`` is (1, H, W, C) or (H, W, C)."""
    os.makedirs(os.path.dirname(output_name) or '.', exist_ok=True)
    im = _demean_image(image, pixel_means)
    f = np.asarray(feat)
    if f.ndim == 4:
        f = f[0]
    m = f.max(axis=-1)
    if m.max() > m.min():
        m = (m - m.min()) / (m.max() - m.min())
    m = cv2.resize(m.astype(np.float32), (im.shape[1], im.shape[0]))
    hm = cv2.applyColorMap((m * 255).astype(np.uint8), cv2.COLORMAP_JET)
    blend = cv2.addWeighted(im, 0.5, hm, 0.5, 0)
    cv2.imwrite(output_name, blend)
    return blend


def vis_training_entropy(output_dir, cur_iter, image, rois, entropy_inter,
                         class_weight, class_weight_noise, labels_oh,
                         pixel_means=None):
    """Entropy/class-weight observability dump
    (webly_vis.py:save_entropy:18-66): per-gt-class heatmaps of the raw
    per-RoI entropy E and the spatially-normalized Ê, plus the per-class
    weight vectors and the y(logN - logy) normalizer as text — the paper's
    core mechanism made inspectable every WSL.SAMPLE_ITER."""
    os.makedirs(output_dir, exist_ok=True)
    im = np.asarray(image)
    if im.ndim == 4:
        im = im[0]
    if pixel_means is not None:
        im = im + pixel_means
    im = np.clip(im, 0, 255).astype(np.uint8)

    e = np.asarray(entropy_inter['E'])
    hat_e = np.asarray(entropy_inter['hatE'])
    rois = np.asarray(rois)
    gt_classes = np.where(np.asarray(labels_oh)[0] > 0)[0]
    for c in gt_classes:
        for tag, vals in (('E', e[:, c]), ('hatE', hat_e[:, c])):
            heat = roi_score_heatmap(im.shape, rois, vals)
            hm = cv2.applyColorMap((heat * 255).astype(np.uint8),
                                   cv2.COLORMAP_JET)
            blend = cv2.addWeighted(im, 0.5, hm, 0.5, 0)
            cv2.imwrite(os.path.join(
                output_dir,
                'iter{}_class{}_{}.png'.format(cur_iter, c, tag)), blend)
    header = 'class_weight / class_weight_noise / y_logN__logy'
    np.savetxt(
        os.path.join(output_dir,
                     'iter{}_entropy_weights.txt'.format(cur_iter)),
        np.vstack([np.asarray(class_weight)[0],
                   np.asarray(class_weight_noise)[0],
                   np.asarray(entropy_inter['y_logN__logy'])[0]]),
        header=header)

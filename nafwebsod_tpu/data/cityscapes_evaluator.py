"""Cityscapes instance-segmentation evaluation.

Capability parity with
``detectron/datasets/cityscapes_json_dataset_evaluator.py:36-97``, which
(a) writes the official cityscapesscripts submission layout — one
``<basename>pred.txt`` per image listing ``<png> <labelId> <score>`` rows
plus one binary instance PNG per detection under ``results/`` — and then
(b) shells out to
``cityscapesscripts.evaluation.evalInstanceLevelSemanticLabeling``.

The TPU rebuild keeps (a) byte-compatible (so the official tooling can be
run on the artifacts anywhere) and replaces (b) with a NATIVE transcription
of the official ``evalInstanceLevelSemanticLabeling`` protocol
(``official_instance_ap``): per class and overlap threshold
0.50:0.05:0.95, every (gt, pred) pair with IoU > threshold contributes —
the best-scoring match is the gt's TP and additional matches become FPs;
unmatched gts accumulate as hard false negatives; unmatched predictions
are dropped when mostly covered by ignore regions (crowd gts, gts under
``minRegionSize``, out-of-distance gts); AP integrates the full
precision-recall curve with the official [-0.5, 0, 0.5] recall
convolution (all-point average, NOT the COCO 101-point interpolation).
Depth-gated AP50m/AP100m use the official gating (distance <= 50/100 m,
minRegionSize 1000, prediction confidence >= 0.5) and are reported when
the gt carries per-instance distances (``entry['gt_med_dists']`` — the
official script reads them from the dataset's precomputed instance files;
COCO-style annotation jsons normally lack them, in which case -1 is
reported).
"""

import logging
import os
import uuid

import numpy as np

from nafwebsod_tpu.core.config import cfg

logger = logging.getLogger(__name__)

# The standard Cityscapes label ids for the 8 instance-level ("hasInstances")
# classes (cityscapesscripts labels.py table; same ids the reference writes
# via cityscapes_eval.name2label[clss].id).
NAME_TO_LABEL_ID = {
    'person': 24,
    'rider': 25,
    'car': 26,
    'truck': 27,
    'bus': 28,
    'train': 31,
    'motorcycle': 32,
    'bicycle': 33,
}


def write_instance_submission(json_dataset, all_boxes, all_segms,
                              output_dir, use_salt=True, image_ids=None):
    """Write the cityscapesscripts submission layout (ref :49-94): per image
    a ``<basename>pred.txt`` with one row per detection and the binary
    instance masks as ``results/<basename>_<class>_<k>.png``. Returns the
    list of written txt files.

    ``image_ids``: detection-time ids aligned with all_segms[cls][i] —
    without them the unfiltered roidb rebuild below must match the
    detection-time enumeration (it can differ when the train-set no-class
    filter dropped entries)."""
    import cv2

    from nafwebsod_tpu.utils import segms as segm_utils

    results_dir = os.path.join(output_dir, 'results')
    os.makedirs(results_dir, exist_ok=True)

    roidb = json_dataset.get_roidb()
    if image_ids is not None:
        by_id = {e['id']: e for e in roidb}
        roidb = [by_id[i] for i in image_ids]
    txt_files = []
    for i, entry in enumerate(roidb):
        basename = os.path.splitext(os.path.basename(entry['image']))[0]
        txtname = os.path.join(output_dir, basename + 'pred.txt')
        txt_files.append(txtname)
        with open(txtname, 'w') as fid:
            for j in range(1, len(all_segms)):
                clss = json_dataset.classes[j]
                label_id = NAME_TO_LABEL_ID.get(clss, j)
                rles = all_segms[j][i]
                boxes = np.asarray(all_boxes[j][i]).reshape(-1, 5)
                for k, rle in enumerate(rles):
                    mask = segm_utils.rle_to_mask(rle)
                    pngname = os.path.join(
                        'results',
                        '{}_{}_{}.png'.format(basename, clss, k))
                    fid.write('{} {} {}\n'.format(
                        pngname, label_id, boxes[k, -1]))
                    cv2.imwrite(os.path.join(output_dir, pngname),
                                mask.astype(np.uint8) * 255)
    return txt_files


OVERLAPS = np.arange(0.5, 1.0, 0.05)


def _match_class_image(gts, preds, overlap_th, min_region_size,
                       distance_th, distance_conf):
    """One image's contribution for one class at one overlap threshold,
    following evalInstanceLevelSemanticLabeling.evaluateMatches: returns
    (y_true, y_score, hard_fns). ``gts``: dicts with 'mask' (H, W) uint8,
    'ignore' (crowd), optional 'med_dist'; ``preds``: 'mask', 'score'."""
    # official gt gating: crowd -> ignore; pixelCount < minRegionSize ->
    # ignore; beyond the distance threshold -> ignore
    valid, ignored = [], []
    for g in gts:
        size = int(g['mask'].sum())
        dist = g.get('med_dist')
        far = (dist is not None and np.isfinite(distance_th) and
               dist > distance_th)
        if g.get('ignore') or size < min_region_size or far:
            ignored.append(g)
        else:
            valid.append(g)
    # official pred gating in the distance-limited settings
    preds = [p for p in preds if p['score'] >= distance_conf]

    y_true, y_score = [], []
    hard_fns = 0
    inter = np.zeros((len(valid), len(preds)))
    psize = np.array([int(p['mask'].sum()) for p in preds], np.float64)
    for gi, g in enumerate(valid):
        gm = g['mask'].astype(bool)
        for pi, p in enumerate(preds):
            inter[gi, pi] = np.logical_and(gm, p['mask']).sum()
    gsize = np.array([int(g['mask'].sum()) for g in valid], np.float64)

    matched_pred = np.zeros(len(preds), bool)
    for gi in range(len(valid)):
        cur_score = None
        for pi in range(len(preds)):
            union = gsize[gi] + psize[pi] - inter[gi, pi]
            ov = inter[gi, pi] / union if union > 0 else 0.0
            if ov > overlap_th:
                matched_pred[pi] = True
                conf = preds[pi]['score']
                if cur_score is None:
                    cur_score = conf
                else:
                    # a second match for this gt: the lower-scoring one is
                    # automatically a false positive (official :unmatched
                    # duplicate rule)
                    y_true.append(0.0)
                    y_score.append(min(cur_score, conf))
                    cur_score = max(cur_score, conf)
        if cur_score is None:
            hard_fns += 1
        else:
            y_true.append(1.0)
            y_score.append(cur_score)

    # unmatched predictions: FP unless mostly covered by ignore regions
    for pi in range(len(preds)):
        if matched_pred[pi]:
            continue
        pm = preds[pi]['mask'].astype(bool)
        ignore_px = 0.0
        for g in ignored:
            ignore_px += np.logical_and(pm, g['mask'].astype(bool)).sum()
        if psize[pi] > 0 and ignore_px / psize[pi] > overlap_th:
            continue
        y_true.append(0.0)
        y_score.append(preds[pi]['score'])
    return y_true, y_score, hard_fns


def _ap_from_curve(y_true, y_score, hard_fns):
    """Official all-point AP: ascending score sort, per-unique-threshold
    precision/recall, artificial (p=1, r=0) endpoint, and the
    [-0.5, 0, 0.5] recall convolution as integration weights."""
    y_true = np.asarray(y_true, np.float64)
    y_score = np.asarray(y_score, np.float64)
    if y_true.size == 0:
        return 0.0 if hard_fns > 0 else float('nan')
    order = np.argsort(y_score)
    ys = y_score[order]
    yt = y_true[order]
    cum = np.cumsum(yt)
    thresholds, uniq = np.unique(ys, return_index=True)
    nb = len(uniq) + 1
    precision = np.zeros(nb)
    recall = np.zeros(nb)
    n = len(ys)
    n_true = cum[-1]
    for i, idx in enumerate(uniq):
        below = cum[idx - 1] if idx > 0 else 0.0
        tp = n_true - below
        fp = (n - idx) - tp
        fn = below + hard_fns
        precision[i] = tp / (tp + fp) if tp + fp > 0 else 0.0
        recall[i] = tp / (tp + fn) if tp + fn > 0 else 0.0
    precision[-1] = 1.0
    recall[-1] = 0.0
    r_conv = np.append(np.append(recall[0], recall), 0.0)
    step_widths = np.convolve(r_conv, [-0.5, 0, 0.5], 'valid')
    return float(np.dot(precision, step_widths))


def official_instance_ap(gt_by_img_cls, pred_by_img_cls, classes, image_ids,
                         min_region_size=100, distance_th=float('inf'),
                         distance_conf=-float('inf'), overlaps=OVERLAPS):
    """Class-averaged AP per the official protocol. ``gt_by_img_cls`` /
    ``pred_by_img_cls``: (img_id, cls) -> instance dict lists. Returns
    (AP, AP at 0.5) averaged over classes that have any gt."""
    per_class_aps = []
    per_class_ap50 = []
    for cls in classes:
        has_gt = any(gt_by_img_cls.get((i, cls)) for i in image_ids)
        if not has_gt:
            continue
        aps = []
        for ov in overlaps:
            y_true, y_score, hard = [], [], 0
            for img in image_ids:
                t, s, h = _match_class_image(
                    gt_by_img_cls.get((img, cls), []),
                    pred_by_img_cls.get((img, cls), []),
                    ov, min_region_size, distance_th, distance_conf)
                y_true += t
                y_score += s
                hard += h
            aps.append(_ap_from_curve(y_true, y_score, hard))
        aps = np.asarray(aps)
        per_class_aps.append(np.nanmean(aps))
        per_class_ap50.append(aps[0])
    if not per_class_aps:
        return -1.0, -1.0
    return (float(np.nanmean(per_class_aps)),
            float(np.nanmean(per_class_ap50)))


def _instances_from_roidb(roidb):
    """(img_id, cls) -> gt instance dicts (mask / ignore / med_dist)."""
    from nafwebsod_tpu.utils import segms as segm_utils

    gt_by = {}
    for e in roidb:
        h, w = e['height'], e['width']
        dists = e.get('gt_med_dists')
        for ix, cls in enumerate(e['gt_classes']):
            if cls <= 0:
                continue
            poly = e['segms'][ix] if ix < len(e['segms']) else []
            if poly or not segm_utils.is_poly(poly):
                m = segm_utils.segm_to_mask(poly, h, w)
            else:
                m = np.zeros((h, w), np.uint8)
                x1, y1, x2, y2 = e['boxes'][ix].astype(int)
                m[y1:y2 + 1, x1:x2 + 1] = 1
            inst = {'mask': m.astype(np.uint8),
                    'ignore': bool(e['is_crowd'][ix])}
            if dists is not None:
                inst['med_dist'] = float(dists[ix])
            gt_by.setdefault((e['id'], int(cls)), []).append(inst)
    return gt_by


def _pred_instances(all_boxes, all_segms, image_ids, num_classes):
    from nafwebsod_tpu.utils import segms as segm_utils

    pred_by = {}
    for cls in range(1, num_classes):
        for i, img_id in enumerate(image_ids):
            rles = all_segms[cls][i]
            if not len(rles):
                continue
            scores = np.asarray(all_boxes[cls][i]).reshape(-1, 5)[:, 4]
            pred_by[(img_id, cls)] = [
                {'mask': segm_utils.rle_to_mask(r), 'score': float(s)}
                for r, s in zip(rles, scores)]
    return pred_by


def evaluate_masks(json_dataset, all_boxes, all_segms, output_dir,
                   use_salt=True, cleanup=False, image_ids=None):
    """Native cityscapes instance AP (+ submission files) per the official
    protocol. Returns {'AP', 'AP50', 'AP50m', 'AP100m'} (the depth-gated
    pair is -1 unless the gt carries per-instance distances)."""
    if cfg.CLUSTER.ON_CLUSTER:
        output_dir = '/tmp'
    sub_dir = os.path.join(output_dir, 'cityscapes_submission')
    if use_salt:
        sub_dir += '_{}'.format(uuid.uuid4())
    os.makedirs(sub_dir, exist_ok=True)
    write_instance_submission(json_dataset, all_boxes, all_segms, sub_dir,
                              image_ids=image_ids)
    logger.info('Wrote cityscapes submission files to %s', sub_dir)

    roidb = json_dataset.get_roidb(gt=True)
    if image_ids is None:
        image_ids = [e['id'] for e in roidb]
    else:
        image_ids = list(image_ids)
    num_classes = len(json_dataset.classes)
    classes = list(range(1, num_classes))
    gt_by = _instances_from_roidb(roidb)
    pred_by = _pred_instances(all_boxes, all_segms, image_ids, num_classes)

    ap, ap50 = official_instance_ap(gt_by, pred_by, classes, image_ids)
    res = {'AP': ap, 'AP50': ap50, 'AP50m': -1.0, 'AP100m': -1.0}
    has_dist = any('med_dist' in i for insts in gt_by.values()
                   for i in insts)
    if has_dist:
        # official distance settings: minRegionSizes [1000, 1000],
        # distanceThs [50, 100] meters, distanceConfs [0.5, 0.5]
        res['AP50m'], _ = official_instance_ap(
            gt_by, pred_by, classes, image_ids, min_region_size=1000,
            distance_th=50.0, distance_conf=0.5)
        res['AP100m'], _ = official_instance_ap(
            gt_by, pred_by, classes, image_ids, min_region_size=1000,
            distance_th=100.0, distance_conf=0.5)
    logger.info('Cityscapes instance segm results: %s', res)
    if cleanup:
        import shutil
        shutil.rmtree(sub_dir, ignore_errors=True)
    return res

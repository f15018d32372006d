"""COCO-protocol evaluation (pycocotools is unavailable; this implements
the COCOeval protocol natively).

Capability parity with ``detectron/datasets/json_dataset_evaluator.py``:
AP@[.5:.95], AP50, AP75, APs/APm/APl computed with greedy score-ordered
matching per (image, category), crowd/ignore handling, maxDets 100, and
101-point precision interpolation — the standard COCO recipe. The matching
machinery is generic over the similarity function, covering the bbox task
(xywh IoU), the segm task (RLE mask IoU), and the keypoints task (OKS).
"""

import logging

import numpy as np

logger = logging.getLogger(__name__)

IOU_THRS = np.linspace(0.5, 0.95, 10)
RECALL_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    'all': (0.0, 1e10),
    'small': (0.0, 32.0 ** 2),
    'medium': (32.0 ** 2, 96.0 ** 2),
    'large': (96.0 ** 2, 1e10),
}
MAX_DETS = 100


def _iou_xywh(dets, gts, iscrowd):
    """IoU between det and gt boxes in xywh; crowd gts use intersection /
    det-area (pycocotools semantics)."""
    n, m = len(dets), len(gts)
    ious = np.zeros((n, m))
    for j, g in enumerate(gts):
        gx1, gy1, gw, gh = g
        gx2, gy2 = gx1 + gw, gy1 + gh
        garea = gw * gh
        for i, d in enumerate(dets):
            dx1, dy1, dw, dh = d
            dx2, dy2 = dx1 + dw, dy1 + dh
            darea = dw * dh
            iw = min(dx2, gx2) - max(dx1, gx1)
            ih = min(dy2, gy2) - max(dy1, gy1)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = darea if iscrowd[j] else darea + garea - inter
            ious[i, j] = inter / union
    return ious


def _evaluate_img(dets, det_scores, gts, gt_ignore, iscrowd, area_rng,
                  iou_fn=None, det_areas=None, gt_areas=None):
    """Match one image's dets to gts across all IoU thresholds.

    ``iou_fn(dets, gts, iscrowd)``: similarity matrix (defaults to xywh box
    IoU); ``det_areas``/``gt_areas``: per-entry areas for the range filter
    (default: xywh box areas). ``dets``/``gts`` may be any per-entry
    sequences the iou_fn understands (boxes, RLEs, keypoint arrays).

    Returns (dt_matches, dt_ignore, dt_scores, n_gt) where dt_* have shape
    (T, D)."""
    iou_fn = iou_fn or _iou_xywh
    if gt_areas is None:
        gt_areas = (gts[:, 2] * gts[:, 3] if len(gts)
                    else np.zeros(0))
    gt_ig = gt_ignore | (gt_areas < area_rng[0]) | (gt_areas > area_rng[1])
    # sort gts: unignored first (pycocotools order)
    gt_order = np.argsort(gt_ig, kind='mergesort')
    if len(gts):
        gts = [gts[i] for i in gt_order] if isinstance(gts, list) \
            else gts[gt_order]
        gt_ig = gt_ig[gt_order]
        crowd = iscrowd[gt_order]
    else:
        crowd = iscrowd

    # sort dets by score desc, cap maxDets
    order = np.argsort(-det_scores, kind='mergesort')[:MAX_DETS]
    if len(dets):
        dets = [dets[i] for i in order] if isinstance(dets, list) \
            else dets[order]
        det_scores = det_scores[order]
        if det_areas is not None:
            det_areas = det_areas[order]

    T = len(IOU_THRS)
    D = len(dets)
    G = len(gts)
    dtm = np.zeros((T, D), dtype=np.int64)
    dt_ig = np.zeros((T, D), dtype=bool)
    if D and G:
        ious = iou_fn(dets, gts, crowd)
        for ti, t in enumerate(IOU_THRS):
            gtm = np.zeros(G, dtype=bool)
            for di in range(D):
                best_iou = min(t, 1 - 1e-10)
                best_g = -1
                for gi in range(G):
                    if gtm[gi] and not crowd[gi]:
                        continue
                    # stop at ignored gts once a real match was found
                    if best_g > -1 and not gt_ig[best_g] and gt_ig[gi]:
                        break
                    if ious[di, gi] < best_iou:
                        continue
                    best_iou = ious[di, gi]
                    best_g = gi
                if best_g == -1:
                    continue
                dtm[ti, di] = 1
                dt_ig[ti, di] = gt_ig[best_g]
                gtm[best_g] = True
    # unmatched dets outside the area range are ignored
    if D:
        if det_areas is None:
            det_areas = dets[:, 2] * dets[:, 3]
        out_rng = (det_areas < area_rng[0]) | (det_areas > area_rng[1])
        dt_ig = dt_ig | ((dtm == 0) & out_rng[None, :])
    n_gt = int(np.sum(~gt_ig))
    return dtm, dt_ig, det_scores, n_gt


def evaluate_bbox(gt_by_img_cat, det_by_img_cat, categories, image_ids,
                  iou_fn=None, area_ranges=None):
    """Compute COCO metrics over a generic similarity.

    gt_by_img_cat[(img, cat)] = dict(boxes (G,) items, ignore (G,),
        crowd (G,), optional areas (G,))
    det_by_img_cat[(img, cat)] = dict(boxes (D,) items, scores (D,),
        optional areas (D,))
    'boxes' entries are whatever ``iou_fn`` consumes (xywh arrays by
    default; RLE lists for segm; keypoint arrays for OKS — then 'areas'
    must be provided). Returns metric dict.
    """
    results = {}
    for area_name, area_rng in (area_ranges or AREA_RANGES).items():
        # per-category accumulation
        ap_per_cat = []
        for cat in categories:
            dtm_all, dtig_all, scores_all = [], [], []
            n_gt_total = 0
            for img in image_ids:
                gt = gt_by_img_cat.get((img, cat))
                dt = det_by_img_cat.get((img, cat))
                g_boxes = gt['boxes'] if gt else np.zeros((0, 4))
                g_ignore = gt['ignore'] if gt else np.zeros(0, bool)
                g_crowd = gt['crowd'] if gt else np.zeros(0, bool)
                d_boxes = dt['boxes'] if dt else np.zeros((0, 4))
                d_scores = dt['scores'] if dt else np.zeros(0)
                if len(g_boxes) == 0 and len(d_boxes) == 0:
                    continue
                dtm, dtig, ds, n_gt = _evaluate_img(
                    d_boxes, d_scores, g_boxes, g_ignore.astype(bool),
                    g_crowd.astype(bool), area_rng, iou_fn=iou_fn,
                    det_areas=(dt or {}).get('areas'),
                    gt_areas=(gt or {}).get('areas'))
                dtm_all.append(dtm)
                dtig_all.append(dtig)
                scores_all.append(ds)
                n_gt_total += n_gt
            if n_gt_total == 0:
                continue
            if dtm_all:
                dtm = np.concatenate(dtm_all, axis=1)
                dtig = np.concatenate(dtig_all, axis=1)
                scores = np.concatenate(scores_all)
            else:
                dtm = np.zeros((len(IOU_THRS), 0), np.int64)
                dtig = np.zeros((len(IOU_THRS), 0), bool)
                scores = np.zeros(0)
            order = np.argsort(-scores, kind='mergesort')
            dtm, dtig = dtm[:, order], dtig[:, order]
            ap_t = np.zeros(len(IOU_THRS))
            for ti in range(len(IOU_THRS)):
                keep = ~dtig[ti]
                tps = (dtm[ti][keep] == 1).astype(np.float64)
                fps = (dtm[ti][keep] == 0).astype(np.float64)
                tp = np.cumsum(tps)
                fp = np.cumsum(fps)
                rc = tp / n_gt_total
                pr = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
                # precision envelope + 101-pt interpolation
                for i in range(len(pr) - 1, 0, -1):
                    pr[i - 1] = max(pr[i - 1], pr[i])
                inds = np.searchsorted(rc, RECALL_THRS, side='left')
                q = np.zeros(len(RECALL_THRS))
                for ri, pi in enumerate(inds):
                    if pi < len(pr):
                        q[ri] = pr[pi]
                ap_t[ti] = np.mean(q)
            ap_per_cat.append(ap_t)
        if ap_per_cat:
            ap_arr = np.stack(ap_per_cat)  # (C, T)
            if area_name == 'all':
                results['AP'] = float(np.mean(ap_arr))
                results['AP50'] = float(np.mean(ap_arr[:, 0]))
                results['AP75'] = float(np.mean(ap_arr[:, 5]))
            else:
                results['AP' + area_name[0]] = float(np.mean(ap_arr))
        elif area_name == 'all':
            results.update({'AP': -1.0, 'AP50': -1.0, 'AP75': -1.0})
    return results


def evaluate_boxes(json_dataset, all_boxes, output_dir,
                   image_ids=None):
    """Evaluate class-indexed detections against a JsonDataset's gt."""
    roidb = json_dataset.get_roidb(gt=True)
    if image_ids is None:
        image_ids = [e['id'] for e in roidb]
    else:
        # detection-time ids: all_boxes[cls][i] is positionally aligned
        # with the roidb THE ENGINE iterated, which the train-set no-class
        # filter can make differ from the gt-only rebuild above (gt lookups
        # below are id-keyed, so extra/missing gt entries resolve correctly)
        image_ids = list(image_ids)
    gt_by_img_cat = {}
    for e in roidb:
        for cls in np.unique(e['gt_classes'][e['gt_classes'] > 0]):
            sel = e['gt_classes'] == cls
            boxes = e['boxes'][sel]
            xywh = np.stack([boxes[:, 0], boxes[:, 1],
                             boxes[:, 2] - boxes[:, 0] + 1,
                             boxes[:, 3] - boxes[:, 1] + 1], axis=1)
            gt_by_img_cat[(e['id'], int(cls))] = {
                'boxes': xywh,
                'ignore': e['is_crowd'][sel].astype(bool),
                'crowd': e['is_crowd'][sel].astype(bool),
            }
    det_by_img_cat = {}
    num_classes = len(json_dataset.classes)
    for cls in range(1, num_classes):
        for i, img_id in enumerate(image_ids):
            dets = all_boxes[cls][i]
            if isinstance(dets, list) or len(dets) == 0:
                continue
            xywh = np.stack([dets[:, 0], dets[:, 1],
                             dets[:, 2] - dets[:, 0] + 1,
                             dets[:, 3] - dets[:, 1] + 1], axis=1)
            det_by_img_cat[(img_id, cls)] = {
                'boxes': xywh, 'scores': dets[:, 4],
            }
    res = evaluate_bbox(gt_by_img_cat, det_by_img_cat,
                        list(range(1, num_classes)), image_ids)
    logger.info('COCO bbox results: %s', res)
    return res


# --------------------------------------------------------------------------- #
# segm task (mask IoU over decoded RLEs)
# --------------------------------------------------------------------------- #


def _mask_iou_fn(dets, gts, iscrowd):
    """dets/gts: lists of binary (H, W) masks (pre-decoded); crowd gts use
    intersection / det-area (pycocotools iou semantics)."""
    n, m = len(dets), len(gts)
    ious = np.zeros((n, m))
    for j, g in enumerate(gts):
        g = g.astype(bool)
        ga = g.sum()
        for i, d in enumerate(dets):
            d = d.astype(bool)
            inter = np.logical_and(d, g).sum()
            if inter == 0:
                continue
            da = d.sum()
            union = da if iscrowd[j] else da + ga - inter
            ious[i, j] = inter / union
    return ious


def gt_masks_by_img_cat(roidb):
    """(img_id, cls) -> gt mask dicts for the segm matching (shared by the
    COCO segm task and the cityscapes instance evaluator)."""
    from nafwebsod_tpu.utils import segms as segm_utils

    gt_by = {}
    for e in roidb:
        h, w = e['height'], e['width']
        for cls in np.unique(e['gt_classes'][e['gt_classes'] > 0]):
            sel = np.where(e['gt_classes'] == cls)[0]
            masks, areas = [], []
            for ix in sel:
                poly = e['segms'][ix] if ix < len(e['segms']) else []
                if poly or not segm_utils.is_poly(poly):
                    # non-empty polygon list OR crowd RLE dict (ignore)
                    m = segm_utils.segm_to_mask(poly, h, w)
                else:  # box-shaped gt mask fallback
                    m = np.zeros((h, w), np.uint8)
                    x1, y1, x2, y2 = e['boxes'][ix].astype(int)
                    m[y1:y2 + 1, x1:x2 + 1] = 1
                masks.append(m.astype(np.uint8))
                areas.append(float(m.sum()))
            gt_by[(e['id'], int(cls))] = {
                'boxes': masks,
                'areas': np.asarray(areas),
                'ignore': e['is_crowd'][sel].astype(bool),
                'crowd': e['is_crowd'][sel].astype(bool),
            }
    return gt_by


def det_masks_by_img_cat(all_boxes, all_segms, image_ids, num_classes):
    """(img_id, cls) -> decoded detection masks + scores (shared with the
    cityscapes evaluator)."""
    from nafwebsod_tpu.utils import segms as segm_utils

    det_by = {}
    for cls in range(1, num_classes):
        for i, img_id in enumerate(image_ids):
            rles = all_segms[cls][i]
            dets = all_boxes[cls][i]
            if not len(rles):
                continue
            masks = [segm_utils.rle_to_mask(r) for r in rles]
            det_by[(img_id, cls)] = {
                'boxes': masks,
                'scores': np.asarray(dets).reshape(-1, 5)[:, 4],
                'areas': np.asarray([float(m.sum()) for m in masks]),
            }
    return det_by


def evaluate_masks(json_dataset, all_boxes, all_segms, output_dir,
                   image_ids=None):
    """COCO segm AP: gt masks rasterized from roidb polygons, det masks
    decoded from the engine's RLEs (json_dataset_evaluator segm task)."""
    roidb = json_dataset.get_roidb(gt=True)
    if image_ids is None:
        image_ids = [e['id'] for e in roidb]
    else:
        # detection-time ids: all_boxes[cls][i] is positionally aligned
        # with the roidb THE ENGINE iterated, which the train-set no-class
        # filter can make differ from the gt-only rebuild above (gt lookups
        # below are id-keyed, so extra/missing gt entries resolve correctly)
        image_ids = list(image_ids)
    num_classes = len(json_dataset.classes)
    gt_by = gt_masks_by_img_cat(roidb)
    det_by = det_masks_by_img_cat(all_boxes, all_segms, image_ids,
                                  num_classes)
    res = evaluate_bbox(gt_by, det_by, list(range(1, num_classes)),
                        image_ids, iou_fn=_mask_iou_fn)
    logger.info('COCO segm results: %s', res)
    return res


# --------------------------------------------------------------------------- #
# keypoints task (OKS)
# --------------------------------------------------------------------------- #

# COCO person keypoint sigmas (pycocotools cocoeval.py); datasets with a
# different keypoint count fall back to uniform sigmas
COCO_KP_SIGMAS = np.array([
    .26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62,
    1.07, 1.07, .87, .87, .89, .89]) / 10.0


def _oks_fn_factory(num_keypoints):
    sigmas = (COCO_KP_SIGMAS if num_keypoints == 17
              else np.full((num_keypoints,), 0.05))
    var = (2 * sigmas) ** 2

    def oks(dets, gts, iscrowd):
        """dets: list of (3, K) [x, y, score]; gts: list of dicts with
        'kps' (K, 3) and 'area'."""
        n, m = len(dets), len(gts)
        ious = np.zeros((n, m))
        for j, g in enumerate(gts):
            kps = g['kps']
            vis = kps[:, 2] > 0
            k_count = int(vis.sum())
            for i, d in enumerate(dets):
                dx = d[0] - kps[:, 0]
                dy = d[1] - kps[:, 1]
                e = (dx ** 2 + dy ** 2) / var / (g['area'] + 1e-9) / 2.0
                if k_count > 0:
                    ious[i, j] = float(np.mean(np.exp(-e[vis])))
        return ious

    return oks


def evaluate_keypoints(json_dataset, all_boxes, all_keyps, output_dir,
                       image_ids=None):
    """COCO keypoints AP (OKS matching; person class = contiguous id 1)."""
    roidb = json_dataset.get_roidb(gt=True)
    if image_ids is None:
        image_ids = [e['id'] for e in roidb]
    else:
        # detection-time ids: all_boxes[cls][i] is positionally aligned
        # with the roidb THE ENGINE iterated, which the train-set no-class
        # filter can make differ from the gt-only rebuild above (gt lookups
        # below are id-keyed, so extra/missing gt entries resolve correctly)
        image_ids = list(image_ids)
    k = json_dataset.num_keypoints
    if not k:
        logger.info('dataset has no keypoint annotations; skipping')
        return {}
    gt_by, det_by = {}, {}
    for e in roidb:
        sel = np.where(e['gt_classes'] == 1)[0]
        if not len(sel):
            continue
        gts, areas = [], []
        for ix in sel:
            box = e['boxes'][ix]
            area = float((box[2] - box[0] + 1) * (box[3] - box[1] + 1))
            gts.append({'kps': e['gt_keypoints'][ix], 'area': area})
            areas.append(area)
        # gts with zero labeled keypoints are ignored (pycocotools k1==0)
        ignore = np.asarray(
            [float((g['kps'][:, 2] > 0).sum()) == 0 for g in gts])
        gt_by[(e['id'], 1)] = {
            'boxes': gts,
            'areas': np.asarray(areas),
            'ignore': ignore | e['is_crowd'][sel].astype(bool),
            'crowd': e['is_crowd'][sel].astype(bool),
        }
    for i, img_id in enumerate(image_ids):
        kp = all_keyps[1][i]
        dets = np.asarray(all_boxes[1][i]).reshape(-1, 5)
        if not len(kp):
            continue
        kp = np.asarray(kp)  # (R, 4, K)
        areas = (dets[:, 2] - dets[:, 0] + 1) * (dets[:, 3] - dets[:, 1] + 1)
        det_by[(img_id, 1)] = {
            'boxes': [kp[r] for r in range(len(kp))],
            'scores': dets[:, 4],
            'areas': areas,
        }
    res = evaluate_bbox(gt_by, det_by, [1], image_ids,
                        iou_fn=_oks_fn_factory(k))
    logger.info('COCO keypoints results: %s', res)
    return res

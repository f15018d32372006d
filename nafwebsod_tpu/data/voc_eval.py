"""PASCAL VOC detection evaluation: AP (07/12 metrics) and CorLoc.

Capability parity with ``detectron/datasets/voc_eval.py``:
  * ``voc_ap``          — 11-point VOC07 metric / area-under-PR (ref :56-85)
  * ``voc_eval``        — per-class AP with difficult-object handling,
                          greedy matching at IoU > ovthresh (ref :88-222)
  * ``voc_eval_corloc`` — CorLoc on positive images: only each image's
                          top-scoring detection counts; all-difficult images
                          skipped; returns (corloc, too_min_rate) (ref :225-354)

Both file-based entry points (VOCdevkit-format detection txt files, one per
class: "<image_id> <score> <x1> <y1> <x2> <y2>" in 1-based coords) and
in-memory equivalents are provided. Annotations come from VOC xml files or a
pre-parsed {image_id: [obj dicts]} mapping.
"""

import logging
import os
import xml.etree.ElementTree as ET

import numpy as np

from nafwebsod_tpu.utils.io import load_object, save_object

logger = logging.getLogger(__name__)


def parse_rec(filename):
    """Parse a PASCAL VOC xml annotation file into a list of object dicts."""
    tree = ET.parse(filename)
    objects = []
    for obj in tree.findall('object'):
        bbox = obj.find('bndbox')
        difficult = obj.find('difficult')
        truncated = obj.find('truncated')
        pose = obj.find('pose')
        objects.append({
            'name': obj.find('name').text,
            'pose': pose.text if pose is not None else '',
            'truncated': int(truncated.text) if truncated is not None else 0,
            'difficult': int(difficult.text) if difficult is not None else 0,
            'bbox': [int(float(bbox.find('xmin').text)),
                     int(float(bbox.find('ymin').text)),
                     int(float(bbox.find('xmax').text)),
                     int(float(bbox.find('ymax').text))],
        })
    return objects


def voc_ap(rec, prec, use_07_metric=False):
    """AP from a PR curve; VOC07 11-point interpolation when requested."""
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            if np.sum(rec >= t) == 0:
                p = 0
            else:
                p = np.max(prec[rec >= t])
            ap = ap + p / 11.0
        return ap
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1])


def _load_annots(annopath, imagesetfile, cachedir):
    """Read the image list and (cached) annotations."""
    with open(imagesetfile, 'r') as f:
        imagenames = [x.strip() for x in f.readlines()]
    os.makedirs(cachedir, exist_ok=True)
    imageset = os.path.splitext(os.path.basename(imagesetfile))[0]
    cachefile = os.path.join(cachedir, imageset + '_annots.pkl')
    if os.path.isfile(cachefile):
        recs = load_object(cachefile)
    else:
        recs = {name: parse_rec(annopath.format(name)) for name in imagenames}
        save_object(recs, cachefile)
    return imagenames, recs


def _class_gt(recs, imagenames, classname):
    """Per-image gt boxes/difficult flags for one class + positive count."""
    class_recs = {}
    npos = 0
    npos_im = 0
    for imagename in imagenames:
        objs = [o for o in recs[imagename] if o['name'] == classname]
        bbox = np.array([o['bbox'] for o in objs])
        difficult = np.array([o['difficult'] for o in objs]).astype(bool)
        npos += int(np.sum(~difficult))
        class_recs[imagename] = {
            'bbox': bbox,
            'difficult': difficult,
            'det': [False] * len(objs),
        }
        if objs:
            npos_im += min(1, int(np.sum(~difficult)))
    return class_recs, npos, npos_im


def _read_dets_file(detfile):
    if not os.path.exists(detfile):
        return [], np.zeros(0), np.zeros((0, 4))
    with open(detfile, 'r') as f:
        lines = [x.strip() for x in f.readlines() if x.strip()]
    if not lines:
        return [], np.zeros(0), np.zeros((0, 4))
    split = [x.split(' ') for x in lines]
    image_ids = [x[0] for x in split]
    confidence = np.array([float(x[1]) for x in split])
    bb = np.array([[float(z) for z in x[2:]] for x in split])
    return image_ids, confidence, bb


def _gt_overlaps(bb, bbgt):
    """IoU of one det box against all gt boxes (+1 convention)."""
    ixmin = np.maximum(bbgt[:, 0], bb[0])
    iymin = np.maximum(bbgt[:, 1], bb[1])
    ixmax = np.minimum(bbgt[:, 2], bb[2])
    iymax = np.minimum(bbgt[:, 3], bb[3])
    iw = np.maximum(ixmax - ixmin + 1.0, 0.0)
    ih = np.maximum(iymax - iymin + 1.0, 0.0)
    inters = iw * ih
    uni = ((bb[2] - bb[0] + 1.0) * (bb[3] - bb[1] + 1.0) +
           (bbgt[:, 2] - bbgt[:, 0] + 1.0) * (bbgt[:, 3] - bbgt[:, 1] + 1.0) -
           inters)
    return inters / uni, inters


def eval_class_dets(image_ids, confidence, bb, class_recs, npos,
                    ovthresh=0.5, use_07_metric=False):
    """Core AP computation on in-memory detections."""
    sorted_ind = np.argsort(-confidence)
    bb = bb[sorted_ind, :]
    image_ids = [image_ids[i] for i in sorted_ind]

    nd = len(image_ids)
    tp = np.zeros(nd)
    fp = np.zeros(nd)
    for d in range(nd):
        rec = class_recs[image_ids[d]]
        det_box = bb[d, :].astype(float)
        ovmax = -np.inf
        jmax = -1
        bbgt = rec['bbox'].astype(float)
        if bbgt.size > 0:
            overlaps, _ = _gt_overlaps(det_box, bbgt)
            ovmax = np.max(overlaps)
            jmax = int(np.argmax(overlaps))
        if ovmax > ovthresh:
            if not rec['difficult'][jmax]:
                if not rec['det'][jmax]:
                    tp[d] = 1.0
                    rec['det'][jmax] = True
                else:
                    fp[d] = 1.0
        else:
            fp[d] = 1.0

    fp = np.cumsum(fp)
    tp = np.cumsum(tp)
    recall = tp / float(npos) if npos > 0 else np.zeros_like(tp)
    precision = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    ap = voc_ap(recall, precision, use_07_metric)
    return recall, precision, ap


def voc_eval(detpath, annopath, imagesetfile, classname, cachedir,
             ovthresh=0.5, use_07_metric=False):
    """File-based AP evaluation (reference-compatible signature)."""
    imagenames, recs = _load_annots(annopath, imagesetfile, cachedir)
    class_recs, npos, _ = _class_gt(recs, imagenames, classname)
    image_ids, confidence, bb = _read_dets_file(detpath.format(classname))
    if len(image_ids) == 0:
        return np.zeros(0), np.zeros(0), 0.0
    return eval_class_dets(image_ids, confidence, bb, class_recs, npos,
                           ovthresh, use_07_metric)


def eval_class_corloc(image_ids, confidence, bb, class_recs, npos_im,
                      ovthresh=0.5):
    """Core CorLoc computation on in-memory detections (ref :297-354)."""
    sorted_ind = np.argsort(-confidence)
    bb = bb[sorted_ind, :]
    image_ids = [image_ids[i] for i in sorted_ind]

    t_ims, f_ims = set(), []
    too_min = 0
    for d in range(len(image_ids)):
        im = image_ids[d]
        if im in t_ims or im in f_ims:
            continue
        rec = class_recs[im]
        # images with no (non-difficult) gt of this class are skipped
        # entirely (ref :306-311: all_difficult stays True for empty lists)
        if rec['difficult'].size == 0 or rec['difficult'].all():
            continue
        det_box = bb[d, :].astype(float)
        overlaps, inters = _gt_overlaps(det_box, rec['bbox'].astype(float))
        if np.max(overlaps) > ovthresh:
            t_ims.add(im)
        else:
            f_ims.append(im)
            # diagnostic: would the det match under intersection/det-area?
            det_area = (det_box[2] - det_box[0] + 1.0) * \
                       (det_box[3] - det_box[1] + 1.0)
            if np.max(inters / det_area) > ovthresh:
                too_min += 1

    too_min_rate = (1.0 * too_min / len(f_ims)) if f_ims else 0.0
    corloc = 1.0 * len(t_ims) / npos_im if npos_im > 0 else 0.0
    return corloc, too_min_rate


def voc_eval_corloc(detpath, annopath, imagesetfile, classname, cachedir,
                    ovthresh=0.5, use_07_metric=False):
    """File-based CorLoc evaluation (reference-compatible signature)."""
    imagenames, recs = _load_annots(annopath, imagesetfile, cachedir)
    class_recs, _, npos_im = _class_gt(recs, imagenames, classname)
    image_ids, confidence, bb = _read_dets_file(detpath.format(classname))
    if len(image_ids) == 0:
        return 0.0, 0.0
    return eval_class_corloc(image_ids, confidence, bb, class_recs, npos_im,
                             ovthresh)

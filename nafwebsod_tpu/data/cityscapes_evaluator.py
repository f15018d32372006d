"""Cityscapes instance-segmentation evaluation.

Capability parity with
``detectron/datasets/cityscapes_json_dataset_evaluator.py:36-97``, which
(a) writes the official cityscapesscripts submission layout — one
``<basename>pred.txt`` per image listing ``<png> <labelId> <score>`` rows
plus one binary instance PNG per detection under ``results/`` — and then
(b) shells out to
``cityscapesscripts.evaluation.evalInstanceLevelSemanticLabeling``.

The TPU rebuild keeps (a) byte-compatible (so the official tooling can be
run on the artifacts anywhere) and replaces (b) with a native
instance-level AP evaluation over the same matching protocol: per class,
predictions sorted by confidence greedily match unmatched gt instances at
mask IoU > overlap for overlaps 0.50:0.05:0.95; crowd/ignore gt regions
absorb detections without counting as TP or FP. Deviation (PARITY.md): the
AP integral uses the COCO 101-point interpolation of the PR curve rather
than the official script's all-point average.
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
                              output_dir, use_salt=True):
    """Write the cityscapesscripts submission layout (ref :49-94): per image
    a ``<basename>pred.txt`` with one row per detection and the binary
    instance masks as ``results/<basename>_<class>_<k>.png``. Returns the
    list of written txt files."""
    import cv2

    from nafwebsod_tpu.utils import segms as segm_utils

    results_dir = os.path.join(output_dir, 'results')
    os.makedirs(results_dir, exist_ok=True)

    roidb = json_dataset.get_roidb()
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


def evaluate_masks(json_dataset, all_boxes, all_segms, output_dir,
                   use_salt=True, cleanup=False):
    """Native cityscapes instance AP (+ submission files). Returns the
    metric dict {'AP', 'AP50'} (class-averaged over overlaps / at 0.5)."""
    from nafwebsod_tpu.data import coco_evaluator
    from nafwebsod_tpu.utils import segms as segm_utils

    if cfg.CLUSTER.ON_CLUSTER:
        output_dir = '/tmp'
    sub_dir = os.path.join(output_dir, 'cityscapes_submission')
    if use_salt:
        sub_dir += '_{}'.format(uuid.uuid4())
    os.makedirs(sub_dir, exist_ok=True)
    write_instance_submission(json_dataset, all_boxes, all_segms, sub_dir)
    logger.info('Wrote cityscapes submission files to %s', sub_dir)

    # Native matching over the COCO-converted gt: same gt/det assembly as
    # the COCO segm task, but a single 'all' area range (cityscapes has no
    # size buckets; its distance-based AP50m/AP100m need depth and are not
    # computed — documented in PARITY.md).
    roidb = json_dataset.get_roidb(gt=True)
    image_ids = [e['id'] for e in roidb]
    num_classes = len(json_dataset.classes)
    gt_by, det_by = {}, {}
    for e in roidb:
        h, w = e['height'], e['width']
        for cls in np.unique(e['gt_classes'][e['gt_classes'] > 0]):
            sel = np.where(e['gt_classes'] == cls)[0]
            masks, areas = [], []
            for ix in sel:
                poly = e['segms'][ix] if ix < len(e['segms']) else []
                if poly:
                    m = segm_utils.polys_to_mask(poly, h, w)
                else:
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
    for cls in range(1, num_classes):
        for i, img_id in enumerate(image_ids):
            rles = all_segms[cls][i]
            if not len(rles):
                continue
            masks = [segm_utils.rle_to_mask(r) for r in rles]
            det_by[(img_id, cls)] = {
                'boxes': masks,
                'scores': np.asarray(all_boxes[cls][i]).reshape(-1, 5)[:, 4],
                'areas': np.asarray([float(m.sum()) for m in masks]),
            }
    res = coco_evaluator.evaluate_bbox(
        gt_by, det_by, list(range(1, num_classes)), image_ids,
        iou_fn=coco_evaluator._mask_iou_fn,
        area_ranges={'all': (0.0, 1e10)})
    res = {'AP': res.get('AP', -1.0), 'AP50': res.get('AP50', -1.0)}
    logger.info('Cityscapes instance segm results: %s', res)
    if cleanup:
        import shutil
        shutil.rmtree(sub_dir, ignore_errors=True)
    return res

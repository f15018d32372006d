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


def evaluate_masks(json_dataset, all_boxes, all_segms, output_dir,
                   use_salt=True, cleanup=False, image_ids=None):
    """Native cityscapes instance AP (+ submission files). Returns the
    metric dict {'AP', 'AP50'} (class-averaged over overlaps / at 0.5)."""
    from nafwebsod_tpu.data import coco_evaluator

    if cfg.CLUSTER.ON_CLUSTER:
        output_dir = '/tmp'
    sub_dir = os.path.join(output_dir, 'cityscapes_submission')
    if use_salt:
        sub_dir += '_{}'.format(uuid.uuid4())
    os.makedirs(sub_dir, exist_ok=True)
    write_instance_submission(json_dataset, all_boxes, all_segms, sub_dir,
                              image_ids=image_ids)
    logger.info('Wrote cityscapes submission files to %s', sub_dir)

    # Native matching over the COCO-converted gt: the gt/det assembly is
    # shared with the COCO segm task (coco_evaluator helpers), but with a
    # single 'all' area range (cityscapes has no size buckets; its
    # distance-based AP50m/AP100m need depth and are not computed —
    # documented in PARITY.md).
    roidb = json_dataset.get_roidb(gt=True)
    if image_ids is None:
        image_ids = [e['id'] for e in roidb]
    else:
        image_ids = list(image_ids)
    num_classes = len(json_dataset.classes)
    gt_by = coco_evaluator.gt_masks_by_img_cat(roidb)
    det_by = coco_evaluator.det_masks_by_img_cat(
        all_boxes, all_segms, image_ids, num_classes)
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

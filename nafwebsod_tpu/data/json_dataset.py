"""COCO-json dataset -> roidb, with WSL extensions.

Capability parity with ``detectron/datasets/json_dataset_wsl.py``:
  * roidb entries with boxes / obn_scores / gt_classes / gt_overlaps /
    is_crowd / box_to_gt_ind_map (ref :142-170)
  * gt annotation loading with sanitization, GT_MIN_AREA and 'ignore'
    filtering, and the webly "difficult/truncated-only image zeroing"
    (ref :185-221: if every object is difficult AND truncated, the image
    keeps no gt at all)
  * proposal pkl ingestion: sort by id, dedup via quantized hashing,
    min-size filter, score-descending sort, top-k limit (ref :493-566)
  * pseudo-gt injection from prior detections (USE_PSEUDO, ref :284-491)
  * class assignments (max_classes / max_overlaps) and the train-time
    no-class filter (ref :726-758)

gt_overlaps is a dense (N, num_classes) float array (the reference wraps it
in scipy.sparse; dense is simpler and small at this scale).
"""

import copy
import logging
import os

import numpy as np

from nafwebsod_tpu.core.config import cfg
from nafwebsod_tpu.data import catalog
from nafwebsod_tpu.data.coco_json import COCOJson
from nafwebsod_tpu.ops import boxes as box_utils
from nafwebsod_tpu.utils import segms as segm_utils
from nafwebsod_tpu.utils.io import load_object

logger = logging.getLogger(__name__)


class JsonDataset:
    def __init__(self, name):
        self.name = name
        self.image_directory = catalog.get_im_dir(name)
        self.image_prefix = ''
        self.COCO = COCOJson(catalog.get_ann_fn(name))
        self.debug = False
        category_ids = self.COCO.getCatIds()
        categories = [c['name'] for c in self.COCO.loadCats(category_ids)]
        self.category_to_id_map = dict(zip(categories, category_ids))
        self.classes = ['__background__'] + categories
        self.num_classes = len(self.classes)
        self.json_category_id_to_contiguous_id = {
            v: i + 1 for i, v in enumerate(category_ids)
        }
        self.contiguous_category_id_to_json_id = {
            v: k for k, v in self.json_category_id_to_contiguous_id.items()
        }
        # keypoint metadata (ref json_dataset.py _init_keypoints): present
        # when the category schema carries 'keypoints' (COCO person)
        cats = self.COCO.loadCats(category_ids)
        self.keypoints = cats[0].get('keypoints') if cats else None
        self.num_keypoints = len(self.keypoints) if self.keypoints else 0
        # left/right identity swap for horizontal flip
        # (keypoint_utils.get_keypoints flip map)
        self.keypoint_flip_map = np.arange(self.num_keypoints)
        if self.keypoints:
            name_to_idx = {n: i for i, n in enumerate(self.keypoints)}
            for i, n in enumerate(self.keypoints):
                if n.startswith('left_'):
                    twin = 'right_' + n[len('left_'):]
                elif n.startswith('right_'):
                    twin = 'left_' + n[len('right_'):]
                else:
                    continue
                if twin in name_to_idx:
                    self.keypoint_flip_map[i] = name_to_idx[twin]

    # ------------------------------------------------------------------ #

    def get_roidb(self, gt=False, proposal_file=None, min_proposal_size=20,
                  proposal_limit=-1, crowd_filter_thresh=0):
        assert gt is True or crowd_filter_thresh == 0, \
            'Crowd filter threshold must be 0 if gt annotations are not included'
        image_ids = sorted(self.COCO.getImgIds())
        roidb = copy.deepcopy(self.COCO.loadImgs(image_ids))
        for entry in roidb:
            self._prep_roidb_entry(entry)
        if gt:
            for entry in roidb:
                self._add_gt_annotations(entry)
        if cfg.USE_PSEUDO and 'test' not in self.name:
            pgt_roidb = copy.deepcopy(self.COCO.loadImgs(image_ids))
            for entry in pgt_roidb:
                self._prep_roidb_entry(entry)
            self._add_pseudo_gt_annotations(pgt_roidb, roidb)
            roidb = pgt_roidb
        if proposal_file is not None:
            self._add_proposals_from_file(
                roidb, proposal_file, min_proposal_size, proposal_limit,
                crowd_filter_thresh)
        _add_class_assignments(roidb)
        if gt:
            roidb = _filter_no_class(self.name, roidb)
        return roidb

    def _prep_roidb_entry(self, entry):
        entry['dataset_name'] = self.name
        im_path = os.path.join(self.image_directory,
                               self.image_prefix + entry['file_name'])
        entry['image'] = im_path
        entry['flipped'] = False
        entry['boxes'] = np.empty((0, 4), dtype=np.float32)
        entry['obn_scores'] = np.empty((0, 1), dtype=np.float32)
        entry['segms'] = []
        entry['gt_classes'] = np.empty((0,), dtype=np.int32)
        entry['seg_areas'] = np.empty((0,), dtype=np.float32)
        entry['gt_overlaps'] = np.empty((0, self.num_classes), dtype=np.float32)
        entry['is_crowd'] = np.empty((0,), dtype=bool)
        entry['box_to_gt_ind_map'] = np.empty((0,), dtype=np.int32)
        if self.num_keypoints:
            entry['gt_keypoints'] = np.empty(
                (0, self.num_keypoints, 3), dtype=np.float32)
            entry['kp_flip_map'] = self.keypoint_flip_map
        for k in ('date_captured', 'url', 'license', 'file_name'):
            entry.pop(k, None)

    def _add_gt_annotations(self, entry):
        objs = self.COCO.loadAnns(self.COCO.getAnnIds(imgIds=entry['id']))
        valid_objs = []
        valid_segms = []
        width, height = entry['width'], entry['height']
        # webly zeroing: if ALL objects are marked difficult AND truncated
        # (json key 'diffcult' as in the reference data), drop the image's gt
        all_difficult_truncated = True
        for obj in objs:
            # crowd regions are RLE dicts and pass through as-is; polygon
            # lists drop degenerate <3-point entries
            # (json_dataset_wsl.py:186-192)
            if 'segmentation' in obj and segm_utils.is_poly(
                    obj['segmentation']):
                obj['segmentation'] = [
                    p for p in obj['segmentation'] if len(p) >= 6]
            if obj.get('area', 0) < cfg.TRAIN.GT_MIN_AREA:
                continue
            if obj.get('ignore', 0) == 1:
                continue
            if obj.get('diffcult', None) == 0 or 'diffcult' not in obj:
                all_difficult_truncated = False
            if obj.get('truncated', None) == 0 or 'truncated' not in obj:
                all_difficult_truncated = False
            x1, y1, x2, y2 = box_utils.xywh_to_xyxy(obj['bbox'])
            x1, y1, x2, y2 = box_utils.clip_xyxy_to_image(
                x1, y1, x2, y2, height, width)
            if obj.get('area', 0) > 0 and x2 > x1 and y2 > y1:
                obj['clean_bbox'] = [x1, y1, x2, y2]
                valid_objs.append(obj)
                valid_segms.append(obj.get('segmentation', []))
        if all_difficult_truncated:
            valid_objs, valid_segms = [], []

        n = len(valid_objs)
        boxes = np.zeros((n, 4), dtype=np.float32)
        gt_classes = np.zeros((n,), dtype=np.int32)
        gt_overlaps = np.zeros((n, self.num_classes), dtype=np.float32)
        seg_areas = np.zeros((n,), dtype=np.float32)
        is_crowd = np.zeros((n,), dtype=bool)
        box_to_gt_ind_map = np.zeros((n,), dtype=np.int32)
        for ix, obj in enumerate(valid_objs):
            cls = self.json_category_id_to_contiguous_id[obj['category_id']]
            boxes[ix, :] = obj['clean_bbox']
            gt_classes[ix] = cls
            seg_areas[ix] = obj.get('area', 0)
            is_crowd[ix] = bool(obj.get('iscrowd', 0))
            box_to_gt_ind_map[ix] = ix
            if is_crowd[ix]:
                gt_overlaps[ix, :] = -1.0
            else:
                gt_overlaps[ix, cls] = 1.0
        entry['boxes'] = np.append(entry['boxes'], boxes, axis=0)
        entry['obn_scores'] = np.append(
            entry['obn_scores'], np.zeros((n, 1), np.float32), axis=0)
        entry['segms'].extend(valid_segms)
        entry['gt_classes'] = np.append(entry['gt_classes'], gt_classes)
        entry['seg_areas'] = np.append(entry['seg_areas'], seg_areas)
        entry['gt_overlaps'] = np.append(entry['gt_overlaps'], gt_overlaps,
                                         axis=0)
        entry['is_crowd'] = np.append(entry['is_crowd'], is_crowd)
        entry['box_to_gt_ind_map'] = np.append(
            entry['box_to_gt_ind_map'], box_to_gt_ind_map)
        if self.num_keypoints:
            kps = np.zeros((n, self.num_keypoints, 3), np.float32)
            for ix, obj in enumerate(valid_objs):
                raw = obj.get('keypoints')
                if raw:
                    kps[ix] = np.asarray(raw, np.float32).reshape(-1, 3)
            entry['gt_keypoints'] = np.append(
                entry['gt_keypoints'], kps, axis=0)

    def _add_pseudo_gt_annotations(self, roidb, gt_roidb):
        """Inject pseudo gt from prior detection pkls (self-training rounds).

        cfg.PSEUDO_PATH entries are detections.pkl files
        ({'all_boxes': [class][image] -> (n, 5)}); the top detection per
        image-level gt class becomes a pseudo box (ref :284-491, simplified:
        score-ranked top-1 per labeled class).
        """
        assert len(cfg.PSEUDO_PATH) > 0, 'USE_PSEUDO requires PSEUDO_PATH'
        all_dets = [load_object(p) for p in cfg.PSEUDO_PATH]
        for i, (entry, gt_entry) in enumerate(zip(roidb, gt_roidb)):
            labels = np.unique(
                gt_entry['gt_classes'][gt_entry['gt_classes'] > 0])
            boxes, classes = [], []
            for dets in all_dets:
                all_boxes = dets['all_boxes']
                for cls in labels:
                    cls_dets = all_boxes[cls][i]
                    if len(cls_dets) == 0:
                        continue
                    best = cls_dets[np.argmax(cls_dets[:, 4])]
                    boxes.append(best[:4])
                    classes.append(cls)
            n = len(boxes)
            if n == 0:
                # fall back to the image-level labels with full-image boxes
                for cls in labels:
                    boxes.append([0, 0, entry['width'] - 1,
                                  entry['height'] - 1])
                    classes.append(cls)
                n = len(boxes)
            boxes = np.asarray(boxes, dtype=np.float32).reshape(n, 4)
            gt_classes = np.asarray(classes, dtype=np.int32)
            gt_overlaps = np.zeros((n, self.num_classes), dtype=np.float32)
            gt_overlaps[np.arange(n), gt_classes] = 1.0
            entry['boxes'] = boxes
            entry['obn_scores'] = np.zeros((n, 1), np.float32)
            entry['gt_classes'] = gt_classes
            entry['gt_overlaps'] = gt_overlaps
            entry['seg_areas'] = np.zeros((n,), np.float32)
            entry['is_crowd'] = np.zeros((n,), bool)
            entry['box_to_gt_ind_map'] = np.arange(n, dtype=np.int32)

    def _add_proposals_from_file(self, roidb, proposal_file,
                                 min_proposal_size, top_k, crowd_thresh):
        logger.info('Loading proposals from: %s', proposal_file)
        proposals = load_object(proposal_file)
        id_field = 'indexes' if 'indexes' in proposals else 'ids'
        _sort_proposals(proposals, id_field)
        box_list, score_list = [], []
        for i, entry in enumerate(roidb):
            boxes = np.asarray(proposals['boxes'][i], dtype=np.float32)
            scores = np.asarray(proposals['scores'][i],
                                dtype=np.float32).reshape(-1, 1)
            assert entry['id'] == proposals[id_field][i]
            assert (boxes[:, 0] >= 0).all() and (boxes[:, 1] >= 0).all()
            assert (boxes[:, 2] >= boxes[:, 0]).all()
            assert (boxes[:, 3] >= boxes[:, 1]).all()
            assert (boxes[:, 2] < entry['width']).all(), entry['image']
            assert (boxes[:, 3] < entry['height']).all(), entry['image']
            keep = box_utils.unique_boxes(boxes)
            boxes, scores = boxes[keep, :], scores[keep]
            keep = box_utils.filter_small_boxes(boxes, min_proposal_size)
            boxes, scores = boxes[keep, :], scores[keep]
            order = np.argsort(-scores.flatten())
            boxes, scores = boxes[order, :], scores[order]
            if top_k > 0:
                boxes, scores = boxes[:top_k, :], scores[:top_k]
            box_list.append(boxes)
            score_list.append(scores)
        _merge_proposal_boxes_into_roidb(roidb, box_list, score_list)
        if crowd_thresh > 0:
            _filter_crowd_proposals(roidb, crowd_thresh)


# --------------------------------------------------------------------------- #
# module-level helpers (ref json_dataset_wsl.py:633-770)
# --------------------------------------------------------------------------- #

def _merge_proposal_boxes_into_roidb(roidb, box_list, score_list):
    assert len(box_list) == len(roidb)
    for i, entry in enumerate(roidb):
        boxes = box_list[i]
        scores = score_list[i]
        num_boxes = boxes.shape[0]
        gt_overlaps = np.zeros((num_boxes, entry['gt_overlaps'].shape[1]),
                               dtype=entry['gt_overlaps'].dtype)
        box_to_gt_ind_map = -np.ones((num_boxes,),
                                     dtype=entry['box_to_gt_ind_map'].dtype)
        gt_inds = np.where(entry['gt_classes'] > 0)[0]
        if len(gt_inds) > 0:
            gt_boxes = entry['boxes'][gt_inds, :]
            gt_classes = entry['gt_classes'][gt_inds]
            overlaps = box_utils.bbox_overlaps(
                boxes.astype(np.float32), gt_boxes.astype(np.float32))
            argmaxes = overlaps.argmax(axis=1)
            maxes = overlaps.max(axis=1)
            hit = np.where(maxes > 0)[0]
            gt_overlaps[hit, gt_classes[argmaxes[hit]]] = maxes[hit]
            box_to_gt_ind_map[hit] = gt_inds[argmaxes[hit]]
        entry['boxes'] = np.append(
            entry['boxes'], boxes.astype(entry['boxes'].dtype), axis=0)
        entry['obn_scores'] = np.append(
            entry['obn_scores'], scores.astype(np.float32).reshape(-1, 1),
            axis=0)
        entry['gt_classes'] = np.append(
            entry['gt_classes'], np.zeros((num_boxes,), dtype=np.int32))
        entry['seg_areas'] = np.append(
            entry['seg_areas'], np.zeros((num_boxes,), dtype=np.float32))
        entry['gt_overlaps'] = np.append(entry['gt_overlaps'], gt_overlaps,
                                         axis=0)
        entry['is_crowd'] = np.append(
            entry['is_crowd'], np.zeros((num_boxes,), dtype=bool))
        entry['box_to_gt_ind_map'] = np.append(
            entry['box_to_gt_ind_map'], box_to_gt_ind_map)


def _filter_crowd_proposals(roidb, crowd_thresh):
    """Mark proposals inside crowd regions with overlap -1 (excluded).

    Uses intersection-over-proposal-area against crowd boxes (the pycocotools
    'iscrowd' IoU definition)."""
    for entry in roidb:
        gt_overlaps = entry['gt_overlaps']
        crowd_inds = np.where(entry['is_crowd'] == 1)[0]
        non_gt_inds = np.where(entry['gt_classes'] == 0)[0]
        if len(crowd_inds) == 0 or len(non_gt_inds) == 0:
            continue
        crowd = entry['boxes'][crowd_inds, :]
        props = entry['boxes'][non_gt_inds, :]
        # iou with crowd flag: intersection / area(proposal)
        iw = (np.minimum(props[:, None, 2], crowd[None, :, 2]) -
              np.maximum(props[:, None, 0], crowd[None, :, 0]) + 1).clip(0)
        ih = (np.minimum(props[:, None, 3], crowd[None, :, 3]) -
              np.maximum(props[:, None, 1], crowd[None, :, 1]) + 1).clip(0)
        inter = iw * ih
        areas = ((props[:, 2] - props[:, 0] + 1) *
                 (props[:, 3] - props[:, 1] + 1))[:, None]
        ious = inter / np.maximum(areas, 1e-12)
        bad = np.where(ious.max(axis=1) > crowd_thresh)[0]
        gt_overlaps[non_gt_inds[bad], :] = -1


def _add_class_assignments(roidb):
    for entry in roidb:
        gt_overlaps = entry['gt_overlaps']
        if gt_overlaps.shape[0] == 0:
            entry['max_classes'] = np.zeros((0,), dtype=np.int32)
            entry['max_overlaps'] = np.zeros((0,), dtype=np.float32)
            continue
        entry['max_overlaps'] = gt_overlaps.max(axis=1)
        entry['max_classes'] = gt_overlaps.argmax(axis=1)
        zero_inds = np.where(entry['max_overlaps'] == 0)[0]
        assert all(entry['max_classes'][zero_inds] == 0)
        nonzero_inds = np.where(entry['max_overlaps'] > 0)[0]
        assert all(entry['max_classes'][nonzero_inds] != 0)


def _filter_no_class(name, roidb):
    """Drop train images with no class assignment at all (ref :744-758)."""
    if 'test' in name:
        return roidb
    new_roidb = [e for e in roidb if np.sum(e['max_classes']) != 0]
    logger.info('roidb filtered from %d to %d entries', len(roidb),
                len(new_roidb))
    return new_roidb


def _sort_proposals(proposals, id_field):
    order = np.argsort(proposals[id_field])
    for k in ('boxes', id_field, 'scores'):
        proposals[k] = [proposals[k][i] for i in order]

"""COCO-json dataset -> roidb, with WSL extensions.

Capability parity with ``detectron/datasets/json_dataset_wsl.py``:
  * roidb entries with boxes / obn_scores / gt_classes / gt_overlaps /
    is_crowd / box_to_gt_ind_map (ref :142-170 — the DICT SCHEMA is the
    preserved contract; minibatch/roidb/eval code reads these keys)
  * gt annotation loading with sanitization, GT_MIN_AREA and 'ignore'
    filtering, and the webly "difficult/truncated-only image zeroing"
    (ref :185-221: if every object is difficult AND truncated, the image
    keeps no gt at all)
  * proposal pkl ingestion: sort by id, dedup via quantized hashing,
    min-size filter, score-descending sort, top-k limit (ref :493-566)
  * pseudo-gt injection from prior detections (USE_PSEUDO, ref :284-491)
  * class assignments (max_classes / max_overlaps) and the train-time
    no-class filter (ref :726-758)

Internal design is NOT the reference's: instead of pre-sizing per-key
arrays on each entry and appending to them stage by stage, rows
accumulate in a columnar ``_Rows`` builder (one list per schema column)
and materialize into the entry dict in one shot — gt loading, pseudo-gt
injection, and proposal merging all emit rows through the same builder,
so the schema lives in exactly one table (``_SCHEMA``).

gt_overlaps is a dense (N, num_classes) float array (the reference wraps
it in scipy.sparse; dense is simpler and small at this scale).
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

# roidb column -> (dtype, trailing shape); num_classes / num_keypoints
# placeholders resolve per dataset. THIS is the reference's entry schema
# (json_dataset_wsl.py:142-170) — the preserved data contract.
_SCHEMA = {
    'boxes': (np.float32, (4,)),
    'obn_scores': (np.float32, (1,)),
    'gt_classes': (np.int32, ()),
    'seg_areas': (np.float32, ()),
    'gt_overlaps': (np.float32, ('num_classes',)),
    'is_crowd': (bool, ()),
    'box_to_gt_ind_map': (np.int32, ()),
}


class _Rows:
    """Columnar block accumulator for roidb box rows. Every ingestion
    stage (gt, pseudo-gt, proposals) emits row blocks here;
    ``merge_into`` materializes/extends the entry's arrays in one place.
    ``track_keypoints``: gt stages carry a keypoint row per box; the
    proposal stage does NOT (gt_keypoints stays aligned with gt indices,
    like the reference schema)."""

    def __init__(self, num_classes, num_keypoints=0, track_keypoints=True):
        self.num_classes = num_classes
        self.num_keypoints = num_keypoints
        self.blocks = {k: [] for k in _SCHEMA}
        self.segms = []
        self.kp_blocks = [] if (num_keypoints and track_keypoints) else None

    def add(self, box, cls=0, obn_score=0.0, area=0.0, crowd=False,
            gt_ind=-1, overlaps=None, segm=None, kps=None):
        """One box row. ``overlaps`` defaults to one-hot at ``cls`` for
        gt rows (-1 rows for crowds), all-zero for proposals."""
        if overlaps is None:
            overlaps = np.zeros(self.num_classes, np.float32)
            if crowd:
                overlaps[:] = -1.0
            elif cls > 0:
                overlaps[cls] = 1.0
        self.add_block(
            np.asarray(box, np.float32)[None],
            classes=np.asarray([cls]),
            obn_scores=np.asarray([obn_score]),
            areas=np.asarray([area]),
            crowds=np.asarray([crowd]),
            gt_inds=np.asarray([gt_ind]),
            overlaps=np.asarray(overlaps, np.float32)[None],
            segms=[[] if segm is None else segm],
            kps=None if kps is None else np.asarray(kps)[None])

    def add_block(self, boxes, classes=None, obn_scores=None, areas=None,
                  crowds=None, gt_inds=None, overlaps=None, segms=None,
                  kps=None):
        n = len(boxes)

        def fill(x, default, dtype):
            if x is None:
                return np.full((n,), default, dtype)
            return np.asarray(x).astype(dtype)

        b = self.blocks
        b['boxes'].append(np.asarray(boxes, np.float32).reshape(n, 4))
        b['obn_scores'].append(fill(obn_scores, 0.0, np.float32))
        b['gt_classes'].append(fill(classes, 0, np.int32))
        b['seg_areas'].append(fill(areas, 0.0, np.float32))
        b['is_crowd'].append(fill(crowds, False, bool))
        b['box_to_gt_ind_map'].append(fill(gt_inds, -1, np.int32))
        if overlaps is None:
            overlaps = np.zeros((n, self.num_classes), np.float32)
        b['gt_overlaps'].append(np.asarray(overlaps, np.float32))
        self.segms.extend([[] for _ in range(n)] if segms is None
                          else segms)
        if self.kp_blocks is not None:
            if kps is None:
                kps = np.zeros((n, self.num_keypoints, 3), np.float32)
            self.kp_blocks.append(np.asarray(kps, np.float32))

    def _empty(self, col):
        dtype, tail = _SCHEMA[col]
        tail = tuple(self.num_classes if t == 'num_classes' else t
                     for t in tail)
        return np.empty((0,) + tail, dtype=dtype)

    def arrays(self):
        out = {}
        for col in _SCHEMA:
            blocks = self.blocks[col]
            dtype, _ = _SCHEMA[col]
            out[col] = (np.concatenate(blocks).astype(dtype) if blocks
                        else self._empty(col))
        out['obn_scores'] = out['obn_scores'].reshape(-1, 1)
        return out

    def merge_into(self, entry, replace=False):
        arrays = self.arrays()
        for col, arr in arrays.items():
            if replace or col not in entry:
                entry[col] = arr
            else:
                entry[col] = np.concatenate([entry[col], arr], axis=0)
        if replace:
            entry['segms'] = list(self.segms)
        else:
            entry.setdefault('segms', []).extend(self.segms)
        if self.kp_blocks is not None:
            kp = (np.concatenate(self.kp_blocks) if self.kp_blocks
                  else np.empty((0, self.num_keypoints, 3), np.float32))
            if replace or 'gt_keypoints' not in entry:
                entry['gt_keypoints'] = kp
            else:
                entry['gt_keypoints'] = np.concatenate(
                    [entry['gt_keypoints'], kp], axis=0)


def _flip_map(keypoint_names):
    """left_*/right_* twin indices for horizontal flip
    (keypoint_utils.get_keypoints flip map)."""
    idx = {n: i for i, n in enumerate(keypoint_names)}
    out = np.arange(len(keypoint_names))
    for i, n in enumerate(keypoint_names):
        for pre, twin_pre in (('left_', 'right_'), ('right_', 'left_')):
            if n.startswith(pre):
                twin = twin_pre + n[len(pre):]
                if twin in idx:
                    out[i] = idx[twin]
    return out


class JsonDataset:
    def __init__(self, name):
        self.name = name
        self.image_directory = catalog.get_im_dir(name)
        self.image_prefix = catalog.get_im_prefix(name)
        self.COCO = COCOJson(catalog.get_ann_fn(name))
        self.debug = False
        cat_ids = self.COCO.getCatIds()
        cats = self.COCO.loadCats(cat_ids)
        names = [c['name'] for c in cats]
        self.category_to_id_map = dict(zip(names, cat_ids))
        self.classes = ['__background__'] + names
        self.num_classes = len(self.classes)
        self.json_category_id_to_contiguous_id = {
            cid: i + 1 for i, cid in enumerate(cat_ids)}
        self.contiguous_category_id_to_json_id = {
            i + 1: cid for i, cid in enumerate(cat_ids)}
        # keypoint metadata (ref json_dataset.py _init_keypoints): present
        # when the category schema carries 'keypoints' (COCO person)
        self.keypoints = cats[0].get('keypoints') if cats else None
        self.num_keypoints = len(self.keypoints) if self.keypoints else 0
        self.keypoint_flip_map = (_flip_map(self.keypoints)
                                  if self.keypoints
                                  else np.arange(0))

    # ------------------------------------------------------------------ #

    def get_roidb(self, gt=False, proposal_file=None, min_proposal_size=20,
                  proposal_limit=-1, crowd_filter_thresh=0):
        if crowd_filter_thresh > 0 and not gt:
            raise AssertionError(
                'Crowd filter threshold must be 0 if gt annotations are '
                'not included')
        roidb = self._blank_roidb()
        if gt:
            for entry in roidb:
                self._gt_rows(entry).merge_into(entry)
        if cfg.USE_PSEUDO and 'test' not in self.name:
            detection_sets = [load_object(p) for p in self._pseudo_paths()]
            pseudo = self._blank_roidb()
            for i, (blank, gt_entry) in enumerate(zip(pseudo, roidb)):
                self._pseudo_gt_rows(blank, gt_entry, detection_sets,
                                     i).merge_into(blank)
            roidb = pseudo
        if proposal_file is not None:
            self._merge_proposals(roidb, proposal_file, min_proposal_size,
                                  proposal_limit)
            if crowd_filter_thresh > 0:
                for entry in roidb:
                    _suppress_crowd_proposals(entry, crowd_filter_thresh)
        for entry in roidb:
            _assign_classes(entry)
        if gt and 'test' not in self.name:
            kept = [e for e in roidb if e['max_classes'].sum() != 0]
            logger.info('roidb filtered from %d to %d entries', len(roidb),
                        len(kept))
            return kept
        return roidb

    def _blank_roidb(self):
        """Fresh entries for every image: image path + empty schema
        columns, COCO bookkeeping keys dropped."""
        image_ids = sorted(self.COCO.getImgIds())
        roidb = copy.deepcopy(self.COCO.loadImgs(image_ids))
        empty = _Rows(self.num_classes, self.num_keypoints)
        for entry in roidb:
            entry['dataset_name'] = self.name
            entry['image'] = os.path.join(
                self.image_directory,
                self.image_prefix + entry['file_name'])
            entry['flipped'] = False
            empty.merge_into(entry, replace=True)
            if self.num_keypoints:
                entry['kp_flip_map'] = self.keypoint_flip_map
            for k in ('date_captured', 'url', 'license', 'file_name'):
                entry.pop(k, None)
        return roidb

    @staticmethod
    def _clean_box(obj, width, height):
        """Valid clipped xyxy box for one annotation, or None when the
        box is degenerate after clipping (ref :185-221)."""
        x1, y1, x2, y2 = box_utils.clip_xyxy_to_image(
            *box_utils.xywh_to_xyxy(obj['bbox']), height, width)
        if obj.get('area', 0) <= 0 or x2 <= x1 or y2 <= y1:
            return None
        return [x1, y1, x2, y2]

    def _gt_rows(self, entry):
        """Ground-truth rows for one image."""
        objs = self.COCO.loadAnns(self.COCO.getAnnIds(imgIds=entry['id']))
        width, height = entry['width'], entry['height']
        kept = []
        # webly zeroing: an image whose every (area/ignore-surviving)
        # object is marked difficult AND truncated keeps no gt at all
        # (json key 'diffcult' as in the reference data). The flag check
        # runs BEFORE box validity, like the reference: a degenerate-box
        # easy object still rescues the image.
        easy_seen = False
        for obj in objs:
            if obj.get('area', 0) < cfg.TRAIN.GT_MIN_AREA:
                continue
            if obj.get('ignore', 0) == 1:
                continue
            if obj.get('diffcult', 0) == 0 or obj.get('truncated', 0) == 0:
                easy_seen = True
            segm = obj.get('segmentation')
            if segm is not None and segm_utils.is_poly(segm):
                # polygon lists drop degenerate <3-point entries; crowd
                # RLE dicts pass through as-is (ref :186-192)
                segm = [p for p in segm if len(p) >= 6]
            box = self._clean_box(obj, width, height)
            if box is None:
                continue
            kept.append((obj, box, segm if segm is not None else []))

        rows = _Rows(self.num_classes, self.num_keypoints)
        if not easy_seen:
            return rows
        for ind, (obj, box, segm) in enumerate(kept):
            kps = None
            if self.num_keypoints and obj.get('keypoints'):
                kps = np.asarray(obj['keypoints'],
                                 np.float32).reshape(-1, 3)
            rows.add(
                box,
                cls=self.json_category_id_to_contiguous_id[
                    obj['category_id']],
                area=obj.get('area', 0),
                crowd=bool(obj.get('iscrowd', 0)),
                gt_ind=ind, segm=segm, kps=kps)
        return rows

    @staticmethod
    def _pseudo_paths():
        if not len(cfg.PSEUDO_PATH):
            raise AssertionError('USE_PSEUDO requires PSEUDO_PATH')
        return cfg.PSEUDO_PATH

    def _pseudo_gt_rows(self, entry, gt_entry, detection_sets, img_index):
        """Pseudo gt from prior detection pkls (self-training rounds):
        the top detection per image-level gt class becomes a pseudo box
        (ref :284-491, simplified: score-ranked top-1 per labeled class);
        images with no detections fall back to full-image boxes."""
        labels = np.unique(gt_entry['gt_classes'][gt_entry['gt_classes'] > 0])
        rows = _Rows(self.num_classes, self.num_keypoints)
        n_added = 0
        for dets in detection_sets:
            for cls in labels:
                cls_dets = dets['all_boxes'][cls][img_index]
                if len(cls_dets):
                    best = cls_dets[np.argmax(cls_dets[:, 4])]
                    rows.add(best[:4], cls=int(cls),
                             gt_ind=n_added)
                    n_added += 1
        if n_added == 0:
            full = [0, 0, entry['width'] - 1, entry['height'] - 1]
            for cls in labels:
                rows.add(full, cls=int(cls), gt_ind=n_added)
                n_added += 1
        return rows

    def _merge_proposals(self, roidb, proposal_file, min_size, top_k):
        logger.info('Loading proposals from: %s', proposal_file)
        proposals = load_object(proposal_file)
        id_field = 'indexes' if 'indexes' in proposals else 'ids'
        order = np.argsort(proposals[id_field])
        per_image = [
            (proposals[id_field][i],
             np.asarray(proposals['boxes'][i], np.float32),
             np.asarray(proposals['scores'][i], np.float32).ravel())
            for i in order]
        if len(per_image) != len(roidb):
            raise AssertionError('proposal file covers %d images, roidb '
                                 'has %d' % (len(per_image), len(roidb)))
        for entry, (pid, boxes, scores) in zip(roidb, per_image):
            _validate_proposal_boxes(entry, pid, boxes)
            for keep in (box_utils.unique_boxes(boxes),
                         box_utils.filter_small_boxes(boxes, min_size)):
                boxes, scores = boxes[keep], scores[keep]
            rank = np.argsort(-scores)
            if top_k > 0:
                rank = rank[:top_k]
            _merge_proposal_rows(entry, boxes[rank], scores[rank],
                                 self.num_classes, self.num_keypoints)


def _validate_proposal_boxes(entry, proposal_id, boxes):
    checks = (
        (entry['id'] == proposal_id, 'id mismatch'),
        ((boxes[:, :2] >= 0).all(), 'negative coordinates'),
        ((boxes[:, 2] >= boxes[:, 0]).all() and
         (boxes[:, 3] >= boxes[:, 1]).all(), 'inverted boxes'),
        ((boxes[:, 2] < entry['width']).all() and
         (boxes[:, 3] < entry['height']).all(), 'out of bounds'),
    )
    for ok, what in checks:
        if not ok:
            raise AssertionError('%s: %s' % (what, entry['image']))


def _merge_proposal_rows(entry, boxes, scores, num_classes, num_keypoints):
    """Append proposal rows: class 0, overlap row = max IoU against the
    entry's gt boxes scattered into the matched gt's class column
    (ref :633-686 semantics via the shared row builder)."""
    gt_inds = np.where(entry['gt_classes'] > 0)[0]
    n = boxes.shape[0]
    overlap_rows = np.zeros((n, num_classes), np.float32)
    matched_gt = np.full(n, -1, np.int32)
    if len(gt_inds) and n:
        ious = box_utils.bbox_overlaps(
            boxes.astype(np.float32),
            entry['boxes'][gt_inds].astype(np.float32))
        best = ious.argmax(axis=1)
        best_iou = ious.max(axis=1)
        hit = best_iou > 0
        cls_of_best = entry['gt_classes'][gt_inds][best]
        overlap_rows[hit, cls_of_best[hit]] = best_iou[hit]
        matched_gt[hit] = gt_inds[best[hit]]
    rows = _Rows(num_classes, num_keypoints, track_keypoints=False)
    rows.add_block(boxes, obn_scores=scores, gt_inds=matched_gt,
                   overlaps=overlap_rows)
    rows.merge_into(entry)


def _suppress_crowd_proposals(entry, crowd_thresh):
    """Mark proposals inside crowd regions with overlap -1 (excluded).

    Uses intersection-over-proposal-area against crowd boxes (the
    pycocotools 'iscrowd' IoU definition)."""
    crowd_sel = np.where(entry['is_crowd'] == 1)[0]
    prop_sel = np.where(entry['gt_classes'] == 0)[0]
    if not len(crowd_sel) or not len(prop_sel):
        return
    crowd = entry['boxes'][crowd_sel]
    props = entry['boxes'][prop_sel]
    iw = (np.minimum(props[:, None, 2], crowd[None, :, 2]) -
          np.maximum(props[:, None, 0], crowd[None, :, 0]) + 1).clip(0)
    ih = (np.minimum(props[:, None, 3], crowd[None, :, 3]) -
          np.maximum(props[:, None, 1], crowd[None, :, 1]) + 1).clip(0)
    areas = ((props[:, 2] - props[:, 0] + 1) *
             (props[:, 3] - props[:, 1] + 1))[:, None]
    frac = iw * ih / np.maximum(areas, 1e-12)
    covered = frac.max(axis=1) > crowd_thresh
    entry['gt_overlaps'][prop_sel[covered], :] = -1


def _assign_classes(entry):
    """max_classes / max_overlaps per box, with the reference's
    consistency invariants (ref :726-742)."""
    ov = entry['gt_overlaps']
    if not ov.shape[0]:
        entry['max_classes'] = np.zeros((0,), np.int32)
        entry['max_overlaps'] = np.zeros((0,), np.float32)
        return
    entry['max_overlaps'] = ov.max(axis=1)
    entry['max_classes'] = ov.argmax(axis=1)
    # background boxes must score 0; any positive-overlap box must carry
    # a foreground class
    bg = entry['max_overlaps'] == 0
    if (entry['max_classes'][bg] != 0).any():
        raise AssertionError('background box with nonzero class')
    if (entry['max_classes'][~bg & (entry['max_overlaps'] > 0)] == 0).any():
        raise AssertionError('foreground overlap assigned to background')

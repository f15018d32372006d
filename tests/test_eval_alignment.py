"""Regression tests for the round-4 review fixes: crowd-RLE handling,
detection/evaluation roidb alignment via explicit image_ids, the
BBOX_VOTE device-path capacity, and the loader get() timeout."""

import json
import os
import queue
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nafwebsod_tpu.data import coco_evaluator as ce
from nafwebsod_tpu.utils import segms as segm_utils


def _disk_mask(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.uint8)


class TestCrowdRLE:
    def test_flip_segms_rle(self):
        m = _disk_mask(20, 30, 9, 10, 5)
        rle = segm_utils.mask_to_rle(m)
        flipped = segm_utils.flip_segms([rle], 20, 30)[0]
        np.testing.assert_array_equal(
            segm_utils.rle_to_mask(flipped), m[:, ::-1])

    def test_rle_counts_as_str(self):
        m = _disk_mask(16, 16, 8, 8, 4)
        rle = segm_utils.mask_to_rle(m)
        as_str = {'size': rle['size'],
                  'counts': rle['counts'].decode('ascii')}
        np.testing.assert_array_equal(segm_utils.rle_to_mask(as_str), m)

    def test_segm_to_mask_dispatch(self):
        m = _disk_mask(16, 16, 8, 8, 4)
        rle = segm_utils.mask_to_rle(m)
        np.testing.assert_array_equal(segm_utils.segm_to_mask(rle, 16, 16),
                                      m.astype(np.float32))
        poly = [[2.0, 2.0, 10.0, 2.0, 10.0, 10.0, 2.0, 10.0]]
        box = segm_utils.segm_to_mask(poly, 16, 16)
        assert box[5, 5] == 1 and box[0, 14] == 0

    def test_crowd_annotation_roidb_flip_and_eval(self, tmp_path):
        """A dataset with an iscrowd=1 RLE annotation must load, flip, and
        evaluate (the crowd gt acts as an ignore region) without crashing —
        the reference tolerates RLE dicts (json_dataset_wsl.py:186-192)."""
        import fixtures
        from nafwebsod_tpu.core.config import cfg, reset_cfg
        from nafwebsod_tpu.data import catalog, roidb as roidb_lib
        from nafwebsod_tpu.data.json_dataset import JsonDataset

        reset_cfg()
        info = fixtures.make_coco_dataset(str(tmp_path), n_images=2)
        with open(info['ann_file']) as f:
            ann = json.load(f)
        im0 = ann['images'][0]
        h, w = im0['height'], im0['width']
        crowd_mask = np.zeros((h, w), np.uint8)
        crowd_mask[2:h // 2, 2:w // 2] = 1
        rle = segm_utils.mask_to_rle(crowd_mask)
        ann['annotations'].append({
            'id': 9999, 'image_id': im0['id'],
            'category_id': ann['annotations'][0]['category_id'],
            'bbox': [2, 2, w // 2 - 2, h // 2 - 2],
            'area': int(crowd_mask.sum()), 'iscrowd': 1,
            'segmentation': {'size': rle['size'],
                             'counts': rle['counts'].decode('ascii')},
        })
        with open(info['ann_file'], 'w') as f:
            json.dump(ann, f)

        catalog.register_dataset('crowd_fixture', info['image_dir'],
                                 info['ann_file'])
        ds = JsonDataset('crowd_fixture')
        roidb = ds.get_roidb(gt=True)
        assert any(e['is_crowd'].any() for e in roidb)

        # flip augmentation must handle the RLE entry (extends in place)
        n0 = len(roidb)
        roidb_lib.extend_with_flipped_entries(roidb, ds)
        assert len(roidb) == 2 * n0
        roidb = roidb[:n0]

        # segm eval: gt assembly must rasterize the crowd RLE as an
        # ignore region rather than crash
        num_classes = len(ds.classes)
        all_boxes = [[[] for _ in roidb] for _ in range(num_classes)]
        all_segms = [[[] for _ in roidb] for _ in range(num_classes)]
        for i, e in enumerate(roidb):
            hh, ww = e['height'], e['width']
            for cls in range(1, num_classes):
                sel = np.where((e['gt_classes'] == cls) & ~e['is_crowd'])[0]
                dets, rles = [], []
                for ix in sel:
                    x1, y1, x2, y2 = e['boxes'][ix]
                    dets.append([x1, y1, x2, y2, 1.0])
                    m = np.zeros((hh, ww), np.uint8)
                    m[int(y1):int(y2) + 1, int(x1):int(x2) + 1] = 1
                    rles.append(segm_utils.mask_to_rle(m))
                all_boxes[cls][i] = (np.asarray(dets, np.float32)
                                     if dets else [])
                all_segms[cls][i] = rles
        res = ce.evaluate_masks(ds, all_boxes, all_segms, str(tmp_path))
        assert res['AP50'] == pytest.approx(1.0)
        del cfg


class TestImageIdAlignment:
    def _one_gt(self, img_id, box):
        x1, y1, x2, y2 = box
        xywh = np.array([[x1, y1, x2 - x1 + 1, y2 - y1 + 1]], np.float64)
        return {'boxes': xywh, 'ignore': np.zeros(1, bool),
                'crowd': np.zeros(1, bool)}

    def test_explicit_ids_realign_detections(self):
        """all_boxes[cls][i] positions map onto the EXPLICIT id list; a
        gt-roidb rebuild that dropped/reordered entries must not shift the
        attribution."""
        gt_by = {
            (7, 1): self._one_gt(7, (10, 10, 30, 30)),
            (9, 1): self._one_gt(9, (50, 50, 80, 80)),
        }
        # detection-time enumeration was [5 (no gt), 7, 9]
        image_ids = [5, 7, 9]
        det = lambda b: {'boxes': np.array(
            [[b[0], b[1], b[2] - b[0] + 1, b[3] - b[1] + 1]], np.float64),
            'scores': np.array([0.9])}
        det_by = {(7, 1): det((10, 10, 30, 30)),
                  (9, 1): det((50, 50, 80, 80))}
        res = ce.evaluate_bbox(gt_by, det_by, [1], image_ids)
        assert res['AP50'] == pytest.approx(1.0)

    def test_evaluate_boxes_with_image_ids_kwarg(self, tmp_path):
        import fixtures
        from nafwebsod_tpu.core.config import reset_cfg
        from nafwebsod_tpu.data import catalog
        from nafwebsod_tpu.data.json_dataset import JsonDataset

        reset_cfg()
        info = fixtures.make_coco_dataset(str(tmp_path), n_images=3)
        catalog.register_dataset('align_fixture', info['image_dir'],
                                 info['ann_file'])
        ds = JsonDataset('align_fixture')
        roidb = ds.get_roidb(gt=True)
        num_classes = len(ds.classes)
        ids = [e['id'] for e in roidb]

        all_boxes = [[[] for _ in roidb] for _ in range(num_classes)]
        for i, e in enumerate(roidb):
            for cls in range(1, num_classes):
                sel = np.where(e['gt_classes'] == cls)[0]
                if len(sel):
                    b = e['boxes'][sel]
                    all_boxes[cls][i] = np.concatenate(
                        [b, np.ones((len(b), 1), np.float32)], axis=1)
        res = ce.evaluate_boxes(ds, all_boxes, str(tmp_path),
                                image_ids=ids)
        assert res['AP50'] == pytest.approx(1.0)
        # a WRONG rotation of the ids must tank the score (proves the
        # kwarg drives the alignment)
        res_bad = ce.evaluate_boxes(ds, all_boxes, str(tmp_path),
                                    image_ids=ids[1:] + ids[:1])
        assert res_bad['AP50'] < 0.99


class TestVoteDevicePathCapacity:
    def test_vote_keeps_survivors_beyond_limit(self):
        """With BBOX_VOTE on, the device NMS must NOT pre-truncate each
        class to DETECTIONS_PER_IM: survivors past the cap feed the voting
        pass first (test_wsl.py:843-858). Device path must equal the host
        protocol."""
        from nafwebsod_tpu.core.config import cfg, reset_cfg
        from nafwebsod_tpu.engine.test import box_results_with_nms_and_limit
        from nafwebsod_tpu.ops import boxes as box_utils

        reset_cfg()
        cfg.MODEL.NUM_CLASSES = 2
        cfg.TEST.NMS = 0.3
        cfg.TEST.SCORE_THRESH = 1e-6
        cfg.TEST.DETECTIONS_PER_IM = 3
        cfg.TEST.BBOX_VOTE.ENABLED = True
        cfg.TEST.BBOX_VOTE.VOTE_TH = 0.7
        cfg.TPU.ROI_PAD_MULTIPLE = 8
        rng = np.random.RandomState(0)
        r = 8
        # well-separated boxes: every one survives NMS
        x = np.arange(r, dtype=np.float32) * 60
        boxes1 = np.stack([x, np.full(r, 10, np.float32),
                           x + 40, np.full(r, 50, np.float32)], 1)
        scores = np.zeros((r, 2), np.float32)
        scores[:, 1] = rng.uniform(0.3, 0.9, r)
        boxes = np.tile(boxes1, (1, 2))

        _, _, cls_dev = box_results_with_nms_and_limit(scores, boxes)

        os.environ['NAFWEBSOD_HOST_NMS'] = '1'
        try:
            _, _, cls_host = box_results_with_nms_and_limit(scores, boxes)
        finally:
            del os.environ['NAFWEBSOD_HOST_NMS']
        got = np.asarray(cls_dev[1]).reshape(-1, 5)
        want = np.asarray(cls_host[1]).reshape(-1, 5)
        np.testing.assert_allclose(
            got[np.lexsort(got.T)], want[np.lexsort(want.T)], rtol=1e-6)
        del cfg


def test_loader_get_timeout():
    """RoIDataLoader.get(timeout=...) raises queue.Empty when the loader
    threads produce nothing in time (instead of blocking forever)."""
    from nafwebsod_tpu.data.loader import RoIDataLoader

    loader = RoIDataLoader.__new__(RoIDataLoader)  # no threads started
    import queue as q
    from nafwebsod_tpu.utils.coordinator import Coordinator
    loader._minibatch_queue = q.Queue(maxsize=2)
    loader.coordinator = Coordinator()
    with pytest.raises(queue.Empty):
        loader.get(timeout=1.5)
    loader._minibatch_queue.put({'x': 1})
    assert loader.get(timeout=1.5) == {'x': 1}

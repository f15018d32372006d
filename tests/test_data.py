"""Data layer tests: roidb construction, proposals, minibatch, loader, and
VOC AP/CorLoc golden cases."""

import numpy as np
import pytest

from nafwebsod_tpu.core.config import cfg, reset_cfg
from nafwebsod_tpu.data import catalog
from nafwebsod_tpu.data.json_dataset import JsonDataset
from nafwebsod_tpu.data.roidb import combined_roidb_for_training
from nafwebsod_tpu.data import voc_eval as VE

import fixtures


@pytest.fixture(autouse=True)
def fresh_cfg():
    reset_cfg()
    cfg.MODEL.NUM_CLASSES = len(fixtures.CLASSES) + 1
    cfg.TRAIN.BATCH_SIZE_PER_IM = 16
    cfg.TRAIN.SCALES = (64,)
    cfg.TRAIN.MAX_SIZE = 120
    cfg.TRAIN.CROWD_FILTER_THRESH = 0.0
    yield
    reset_cfg()


class TestCatalog:
    # every name the reference's dataset_catalog.py registers
    # (dataset_catalog.py:50-260) must resolve here too
    REFERENCE_NAMES = [
        'cityscapes_fine_instanceonly_seg_train',
        'cityscapes_fine_instanceonly_seg_val',
        'cityscapes_fine_instanceonly_seg_test',
        'coco_2014_train', 'coco_2014_val', 'coco_2014_minival',
        'coco_2014_valminusminival', 'coco_2015_test', 'coco_2015_test-dev',
        'coco_2017_test', 'coco_2017_test-dev',
        'coco_stuff_train', 'coco_stuff_val',
        'keypoints_coco_2014_train', 'keypoints_coco_2014_val',
        'keypoints_coco_2014_minival', 'keypoints_coco_2014_valminusminival',
        'keypoints_coco_2015_test', 'keypoints_coco_2015_test-dev',
        'voc_2007_train', 'voc_2007_val', 'voc_2007_trainval',
        'voc_2007_test', 'voc_2007_train_noisy', 'voc_2007_val_noisy',
        'voc_2012_train', 'voc_2012_val', 'voc_2012_trainval',
        'voc_2012_test',
        'flickr_voc', 'flickr_clean', 'flickr_coco',
    ]

    def test_reference_name_space_is_covered(self):
        for name in self.REFERENCE_NAMES:
            assert catalog.get_im_dir(name)
            assert catalog.get_ann_fn(name)

    def test_2017_test_reuses_2015_images_with_prefix(self):
        assert catalog.get_im_prefix('coco_2017_test') == 'COCO_test2015_'
        assert catalog.get_im_prefix('coco_2015_test') == ''
        assert catalog.get_im_prefix('flickr_voc') == ''


@pytest.fixture()
def dataset(tmp_path):
    info = fixtures.make_coco_dataset(str(tmp_path))
    catalog.register_dataset('synth_train', info['image_dir'],
                             info['ann_file'])
    return info


class TestJsonDataset:
    def test_roidb_gt_and_proposals(self, dataset):
        ds = JsonDataset('synth_train')
        roidb = ds.get_roidb(gt=True, proposal_file=dataset['prop_file'],
                             min_proposal_size=20)
        assert len(roidb) == dataset['n_images']
        e = roidb[0]
        assert e['boxes'].shape[0] > 1          # gt + proposals
        assert e['gt_classes'][0] > 0           # gt first
        assert (e['gt_classes'][1:] == 0).all()  # proposals class 0
        assert e['obn_scores'].shape == (e['boxes'].shape[0], 1)
        # the gt-aligned proposal got max_overlap ~1 with the gt class
        # (proposals are re-sorted by score, so find it by overlap)
        prop_overlaps = e['max_overlaps'][1:]
        j = int(np.argmax(prop_overlaps)) + 1
        assert e['max_overlaps'][j] > 0.99
        assert e['max_classes'][j] == e['gt_classes'][0]

    def test_min_size_filter_and_topk(self, dataset):
        ds = JsonDataset('synth_train')
        roidb = ds.get_roidb(gt=True, proposal_file=dataset['prop_file'],
                             min_proposal_size=20, proposal_limit=5)
        e = roidb[0]
        n_gt = int(np.sum(e['gt_classes'] > 0))
        assert e['boxes'].shape[0] <= n_gt + 5
        # proposals sorted by score descending
        obn = e['obn_scores'][n_gt:, 0]
        assert (np.diff(obn) <= 1e-6).all()

    def test_combined_roidb_flipping(self, dataset):
        cfg.TRAIN.USE_FLIPPED = True
        roidb = combined_roidb_for_training(
            ('synth_train',), (dataset['prop_file'],))
        assert len(roidb) == 2 * dataset['n_images']
        flipped = [e for e in roidb if e['flipped']]
        orig = [e for e in roidb if not e['flipped']]
        w = orig[0]['width']
        np.testing.assert_allclose(
            flipped[0]['boxes'][:, 2], w - orig[0]['boxes'][:, 0] - 1)


class TestMinibatch:
    def test_blobs(self, dataset):
        from nafwebsod_tpu.data.minibatch import get_minibatch
        ds = JsonDataset('synth_train')
        roidb = ds.get_roidb(gt=True, proposal_file=dataset['prop_file'])
        rng = np.random.RandomState(0)
        blobs = get_minibatch(roidb[0], rng=rng, pad_rois_to=32,
                              size_bucket=32)
        assert blobs['data'].ndim == 4 and blobs['data'].shape[3] == 3
        assert blobs['data'].shape[1] % 32 == 0
        assert blobs['rois'].shape == (32, 5)
        assert blobs['obn_scores'].shape == (32, 1)
        assert blobs['valid_mask'].sum() <= 17  # 16 cap + gt not included
        # obn boost: scores are proposal scores + 1 for valid entries
        v = blobs['valid_mask']
        assert (blobs['obn_scores'][v] >= 1.0).all()
        assert blobs['labels_oh'].shape == (1, len(fixtures.CLASSES))
        assert blobs['labels_oh'].sum() == 1.0
        # rois within the (scaled, cropped) image bounds; fractional scaling
        # can push the far edge up to one pixel past dim-1 (reference
        # behavior: boxes are not re-clipped after scaling)
        h, w = blobs['data'].shape[1:3]
        r = blobs['rois'][v]
        assert (r[:, 1] >= 0).all() and (r[:, 3] <= w).all()
        assert (r[:, 2] >= 0).all() and (r[:, 4] <= h).all()

    def test_mixup(self, dataset):
        from nafwebsod_tpu.data.minibatch import get_minibatch, mixup_blobs
        ds = JsonDataset('synth_train')
        roidb = ds.get_roidb(gt=True, proposal_file=dataset['prop_file'])
        rng = np.random.RandomState(1)
        a = get_minibatch(roidb[0], rng=rng, pad_rois_to=24)
        b = get_minibatch(roidb[3], rng=rng, pad_rois_to=24)
        out = mixup_blobs(a, b, lam=0.7, max_rois=24)
        assert out['rois'].shape == (24, 5)
        assert out['labels_oh'].max() <= 1.0
        # both classes present in blended labels (images 0 and 3 same class
        # cycle? i%3: image 0 -> class 1, image 3 -> class 1); labels equal
        np.testing.assert_allclose(
            out['labels_oh'], 0.7 * a['labels_oh'] + 0.3 * b['labels_oh'])
        assert (out['rois'][:, 0] == 0).all()


class TestLoader:
    def test_threads_produce_and_shutdown(self, dataset):
        from nafwebsod_tpu.data.loader import RoIDataLoader
        cfg.WEBLY.WEBLY_ON = True
        cfg.WEBLY.BAGGING_MIXUP = True
        ds = JsonDataset('synth_train')
        roidb = ds.get_roidb(gt=True, proposal_file=dataset['prop_file'])
        loader = RoIDataLoader(roidb, num_loaders=2, minibatch_queue_size=8,
                               pad_rois_to=32)
        loader.start(prefill=True)
        seen = [loader.get() for _ in range(10)]
        loader.shutdown()
        assert all(b['rois'].shape == (32, 5) for b in seen)
        assert all(b['data'].ndim == 4 for b in seen)


class TestVocEval:
    def _setup(self, tmp_path):
        specs = [
            ('img1', [('cat', 10, 10, 50, 50, 0)]),
            ('img2', [('cat', 20, 20, 80, 80, 0), ('cat', 100, 100, 120, 120, 1)]),
            ('img3', [('dog', 30, 30, 60, 60, 0)]),
        ]
        return fixtures.make_voc_annotations(str(tmp_path), specs)

    def test_perfect_detections_ap1(self, tmp_path):
        annopath, setfile = self._setup(tmp_path)
        det_file = str(tmp_path / '{}.txt')
        with open(det_file.format('cat'), 'w') as f:
            f.write('img1 0.9 10 10 50 50\n')
            f.write('img2 0.8 20 20 80 80\n')
        rec, prec, ap = VE.voc_eval(det_file, annopath, setfile, 'cat',
                                    str(tmp_path / 'cache'),
                                    use_07_metric=True)
        assert ap == pytest.approx(1.0, abs=1e-6)

    def test_miss_and_duplicate(self, tmp_path):
        annopath, setfile = self._setup(tmp_path)
        det_file = str(tmp_path / '{}.txt')
        with open(det_file.format('cat'), 'w') as f:
            f.write('img1 0.9 10 10 50 50\n')     # tp
            f.write('img1 0.85 11 11 51 51\n')    # duplicate -> fp
            f.write('img2 0.8 200 200 220 220\n')  # miss -> fp
        rec, prec, ap = VE.voc_eval(det_file, annopath, setfile, 'cat',
                                    str(tmp_path / 'cache2'),
                                    use_07_metric=False)
        # 1 tp of 2 npos -> recall 0.5; precision at that point 1.0
        assert rec[-1] == pytest.approx(0.5)
        assert ap == pytest.approx(0.5, abs=1e-6)

    def test_difficult_not_counted(self, tmp_path):
        annopath, setfile = self._setup(tmp_path)
        det_file = str(tmp_path / '{}.txt')
        # detection on the difficult gt: neither tp nor fp
        with open(det_file.format('cat'), 'w') as f:
            f.write('img2 0.9 100 100 120 120\n')
            f.write('img1 0.8 10 10 50 50\n')
        rec, prec, ap = VE.voc_eval(det_file, annopath, setfile, 'cat',
                                    str(tmp_path / 'cache3'),
                                    use_07_metric=False)
        assert rec[-1] == pytest.approx(0.5)
        # the difficult-gt detection is neither tp nor fp -> precision stays 1
        assert prec[-1] == pytest.approx(1.0)

    def test_corloc(self, tmp_path):
        annopath, setfile = self._setup(tmp_path)
        det_file = str(tmp_path / '{}.txt')
        with open(det_file.format('cat'), 'w') as f:
            f.write('img1 0.9 10 10 50 50\n')      # top det hits
            f.write('img2 0.8 200 200 220 220\n')  # top det misses
            f.write('img2 0.7 20 20 80 80\n')      # ignored (not top)
        corloc, _ = VE.voc_eval_corloc(det_file, annopath, setfile, 'cat',
                                       str(tmp_path / 'cache4'))
        assert corloc == pytest.approx(0.5)

"""End-to-end inference engine test on a synthetic dataset: detection loop,
detections.pkl format, VOC + CorLoc evaluation, NMS-and-limit behavior."""

import os

import numpy as np
import pytest

from nafwebsod_tpu.core.config import cfg, reset_cfg
from nafwebsod_tpu.data import catalog
from nafwebsod_tpu.engine.test import box_results_with_nms_and_limit

import fixtures


@pytest.fixture(autouse=True)
def fresh_cfg():
    reset_cfg()
    yield
    reset_cfg()


class TestNmsAndLimit:
    def _setup_cfg(self):
        cfg.MODEL.NUM_CLASSES = 4
        cfg.TEST.SCORE_THRESH = 0.01
        cfg.TEST.NMS = 0.5
        cfg.TEST.DETECTIONS_PER_IM = 3

    def test_threshold_nms_and_cap(self):
        self._setup_cfg()
        R = 6
        rng = np.random.RandomState(0)
        boxes1 = np.array([
            [0, 0, 10, 10],
            [1, 1, 11, 11],       # suppressed by nms vs box 0
            [50, 50, 60, 60],
            [100, 100, 110, 110],
            [200, 200, 210, 210],
            [300, 300, 310, 310],
        ], dtype=np.float32)
        boxes = np.tile(boxes1, (1, 4))
        scores = np.zeros((R, 4), np.float32)
        scores[:, 1] = [0.9, 0.85, 0.6, 0.5, 0.4, 0.005]
        scores[:, 2] = 0.001  # below threshold
        scores[:, 3] = 0.001
        _, _, cls_boxes = box_results_with_nms_and_limit(scores, boxes)
        assert len(cls_boxes[2]) == 0 and len(cls_boxes[3]) == 0
        # class 1: 6 dets -> thresh drops 1 -> nms drops 1 -> cap 3
        assert cls_boxes[1].shape[0] == 3
        assert cls_boxes[1][0, 4] == pytest.approx(0.9)

    def _random_dets(self, seed, r=60, c=5):
        rng = np.random.RandomState(seed)
        x1 = rng.uniform(0, 200, (r, 1)).astype(np.float32)
        y1 = rng.uniform(0, 200, (r, 1)).astype(np.float32)
        w = rng.uniform(5, 80, (r, 1)).astype(np.float32)
        h = rng.uniform(5, 80, (r, 1)).astype(np.float32)
        b1 = np.hstack([x1, y1, x1 + w, y1 + h])
        boxes = np.tile(b1, (1, c))
        # distinct scores: the device argmax and the host argsort break
        # float ties differently (documented in PARITY.md)
        scores = rng.permutation(r * c).reshape(r, c).astype(np.float32)
        scores /= scores.max() + 1.0
        return scores, boxes

    def _host_reference(self, scores, boxes):
        """Independent host evaluation of the same protocol via the
        per-class native/numpy NMS, for pinning the device kernel."""
        from nafwebsod_tpu.ops import boxes as box_utils
        num_classes = cfg.MODEL.NUM_CLASSES
        dets = {}
        for j in range(1, num_classes):
            sel = scores[:, j] > cfg.TEST.SCORE_THRESH
            d = np.hstack([boxes[sel, 4 * j:4 * j + 4],
                           scores[sel, j:j + 1]]).astype(np.float32)
            dets[j] = d[box_utils.nms(d, cfg.TEST.NMS)]
        pool = np.concatenate([d[:, 4] for d in dets.values()])
        limit = cfg.TEST.DETECTIONS_PER_IM
        if limit > 0 and pool.size > limit:
            cut = np.partition(pool, -limit)[-limit]
            dets = {j: d[d[:, 4] >= cut] for j, d in dets.items()}
        return dets

    def test_device_path_matches_host_protocol(self):
        self._setup_cfg()
        cfg.MODEL.NUM_CLASSES = 5
        cfg.TEST.DETECTIONS_PER_IM = 12
        cfg.TPU.ROI_PAD_MULTIPLE = 16
        for seed in range(4):
            scores, boxes = self._random_dets(seed)
            _, _, cls_boxes = box_results_with_nms_and_limit(scores, boxes)
            want = self._host_reference(scores, boxes)
            for j in range(1, cfg.MODEL.NUM_CLASSES):
                got = np.asarray(cls_boxes[j]).reshape(-1, 5)
                np.testing.assert_allclose(got, want[j], rtol=1e-6,
                                           err_msg='class %d seed %d'
                                                   % (j, seed))

    def test_device_path_no_limit(self):
        self._setup_cfg()
        cfg.MODEL.NUM_CLASSES = 5
        cfg.TEST.DETECTIONS_PER_IM = 0
        cfg.TPU.ROI_PAD_MULTIPLE = 16
        scores, boxes = self._random_dets(7)
        _, _, cls_boxes = box_results_with_nms_and_limit(scores, boxes)
        want = self._host_reference(scores, boxes)
        for j in range(1, cfg.MODEL.NUM_CLASSES):
            got = np.asarray(cls_boxes[j]).reshape(-1, 5)
            np.testing.assert_allclose(got, want[j], rtol=1e-6)

    def test_voting_path(self):
        self._setup_cfg()
        cfg.MODEL.NUM_CLASSES = 3
        cfg.TEST.BBOX_VOTE.ENABLED = True
        cfg.TEST.BBOX_VOTE.VOTE_TH = 0.7
        scores, boxes = self._random_dets(3, r=30, c=3)
        _, out_boxes, cls_boxes = box_results_with_nms_and_limit(
            scores, boxes)
        assert out_boxes.shape[1] == 4
        assert sum(len(np.asarray(cls_boxes[j]).reshape(-1, 5))
                   for j in range(1, 3)) <= cfg.TEST.DETECTIONS_PER_IM + 30

    def test_soft_nms_path(self):
        self._setup_cfg()
        cfg.MODEL.NUM_CLASSES = 3
        cfg.TEST.SOFT_NMS.ENABLED = True
        scores, boxes = self._random_dets(5, r=30, c=3)
        out_scores, out_boxes, cls_boxes = box_results_with_nms_and_limit(
            scores, boxes)
        assert out_scores.ndim == 1 and out_boxes.shape[1] == 4


@pytest.mark.slow
class TestEndToEndInference:
    def test_full_loop(self, tmp_path):
        info = fixtures.make_coco_dataset(str(tmp_path), n_images=2,
                                          width=96, height=64, n_props=12)
        # build a matching VOC devkit for evaluation
        devkit = tmp_path / 'devkit'
        voc_dir = devkit / 'VOC2007'
        os.makedirs(voc_dir / 'ImageSets' / 'Main', exist_ok=True)
        os.makedirs(voc_dir / 'Annotations', exist_ok=True)
        import json
        with open(info['ann_file']) as f:
            coco = json.load(f)
        names = []
        for img in coco['images']:
            stem = os.path.splitext(img['file_name'])[0]
            names.append(stem)
            objs = [a for a in coco['annotations']
                    if a['image_id'] == img['id']]
            specs = []
            for a in objs:
                x, y, w, h = a['bbox']
                cls = fixtures.CLASSES[a['category_id'] - 1]
                specs.append((cls, x + 1, y + 1, x + w, y + h, 0))
            fixtures.make_voc_annotations(
                str(voc_dir), [(stem, specs)])
        with open(voc_dir / 'ImageSets' / 'Main' / 'test.txt', 'w') as f:
            f.write('\n'.join(names) + '\n')

        catalog.register_dataset('synth_test', info['image_dir'],
                                 info['ann_file'], str(devkit))

        cfg.MODEL.NUM_CLASSES = len(fixtures.CLASSES) + 1
        cfg.MODEL.CONV_BODY = 'VGG16.add_VGG16_conv5_body_origin'
        cfg.MODEL.TYPE = 'generalized_wsl'
        cfg.FAST_RCNN.ROI_BOX_HEAD = 'webly_heads.add_VGG16_roi_2fc_noise_head'
        cfg.FAST_RCNN.ROI_XFORM_RESOLUTION = 7
        cfg.WSL.DILATION = 2
        cfg.WEBLY.WEBLY_ON = True
        cfg.TEST.DATASETS = ('synth_test',)
        cfg.TEST.PROPOSAL_FILES = (info['prop_file'],)
        cfg.TEST.SCALE = 64
        cfg.TEST.MAX_SIZE = 120
        cfg.TEST.SCORE_THRESH = 1e-9
        cfg.TEST.NMS = 0.5
        cfg.TEST.DETECTIONS_PER_IM = 10
        cfg.TEST.PROPOSAL_LIMIT = 100
        cfg.TPU.ROI_PAD_MULTIPLE = 16
        cfg.TPU.SIZE_BUCKET_MULTIPLE = 32
        cfg.OUTPUT_DIR = str(tmp_path / 'out')

        from nafwebsod_tpu.engine import test_engine
        results = test_engine.run_inference(None)
        assert 'synth_test' in results
        r = results['synth_test']
        assert 'mAP' in r and 'mean_corloc' in r
        # detections.pkl written with the reference schema
        det_file = os.path.join(cfg.OUTPUT_DIR, 'test', 'synth_test',
                                'generalized_wsl', 'detections.pkl')
        assert os.path.exists(det_file)
        from nafwebsod_tpu.utils.io import load_object
        dets = load_object(det_file)
        assert 'all_boxes' in dets and 'cfg' in dets
        assert len(dets['all_boxes']) == cfg.MODEL.NUM_CLASSES

    def test_batched_loop_chunking_invariant(self, tmp_path, monkeypatch):
        """The chunk-of-B double-buffered test_net loop (TPU.INFER_BATCH,
        dispatch/harvest pipelining, partial final chunk) must write the
        same detections regardless of chunk size: INFER_BATCH=3 vs 2 over
        5 images exercises different chunk compositions, partial final
        chunks, and the in-flight handle/index bookkeeping, while the
        dataset-wide canvas caps keep the compiled program (and thus the
        numerics) identical. Host-vs-device-prep numeric parity is
        covered separately in tests/test_image_prep.py."""
        import jax
        monkeypatch.delenv('NAFWEBSOD_HOST_PREP', raising=False)
        info = fixtures.make_coco_dataset(str(tmp_path), n_images=5,
                                          width=96, height=64, n_props=12)
        # small-signal pixels around the mean keep the random-init
        # towers relu-alive and the softmax scores tie-free (saturated
        # inputs give EXACT score ties whose NMS order differs between
        # numerically-distinct paths — see TestFusedDetect._setup)
        import cv2
        rng = np.random.RandomState(3)
        for fn in sorted(os.listdir(info['image_dir'])):
            cv2.imwrite(os.path.join(info['image_dir'], fn),
                        np.clip(cfg.PIXEL_MEANS.reshape(1, 1, 3) +
                                rng.randn(64, 96, 3) * 8,
                                0, 255).astype(np.uint8))
        catalog.register_dataset('synth_batch', info['image_dir'],
                                 info['ann_file'])
        cfg.MODEL.NUM_CLASSES = len(fixtures.CLASSES) + 1
        cfg.MODEL.CONV_BODY = 'VGG16.add_VGG16_conv5_body_origin'
        cfg.MODEL.TYPE = 'generalized_wsl'
        cfg.FAST_RCNN.ROI_BOX_HEAD = \
            'webly_heads.add_VGG16_roi_2fc_noise_head'
        cfg.FAST_RCNN.ROI_XFORM_RESOLUTION = 7
        cfg.WSL.DILATION = 2
        cfg.WEBLY.WEBLY_ON = True
        cfg.TEST.SCALE = 64
        cfg.TEST.MAX_SIZE = 120
        cfg.TEST.SCORE_THRESH = 1e-9
        cfg.TEST.NMS = 0.5
        cfg.TEST.DETECTIONS_PER_IM = 10
        cfg.TEST.PROPOSAL_LIMIT = 100
        cfg.TPU.ROI_PAD_MULTIPLE = 16
        cfg.TPU.SIZE_BUCKET_MULTIPLE = 32

        from nafwebsod_tpu.engine import test_engine
        from nafwebsod_tpu.models import detector
        from nafwebsod_tpu.utils import checkpoint as ckpt
        # random-init params give near-uniform softmax scores whose
        # float ties flip NMS decisions across numerically-different
        # paths; spread the classifier logits (as TestFusedDetect does)
        spec = detector.spec_from_cfg(cfg)
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        for k in ('fc8c_w', 'fc8d_w', 'noisy_fc8c_w', 'noisy_fc8d_w'):
            params[k] = params[k] * 30.0
        wts = str(tmp_path / 'weights.pkl')
        ckpt.save_params_to_weights_file(wts, params)
        outs = {}
        # chunk sizes 3 vs 2 AND pipeline depths 1 vs 3 (the harvest
        # order/bookkeeping must be invariant to both knobs)
        for label, batch, depth in [('b3', 3, 1), ('b2', 2, 3)]:
            cfg.TPU.INFER_BATCH = batch
            cfg.TPU.INFER_PIPELINE_DEPTH = depth
            cfg.TPU.DEVICE_IMAGE_PREP = 1
            out_dir = str(tmp_path / ('out_' + label))
            os.makedirs(out_dir, exist_ok=True)
            try:
                outs[label] = test_engine.test_net(
                    wts, 'synth_batch', info['prop_file'], out_dir)[0]
            finally:
                cfg.TPU.INFER_BATCH = 1
                cfg.TPU.INFER_PIPELINE_DEPTH = 2
                cfg.TPU.DEVICE_IMAGE_PREP = -1
        for j in range(1, cfg.MODEL.NUM_CLASSES):
            for i in range(5):
                got = np.asarray(outs['b3'][j][i]).reshape(-1, 5)
                want = np.asarray(outs['b2'][j][i]).reshape(-1, 5)
                assert got.shape == want.shape, (j, i)
                np.testing.assert_allclose(
                    got, want, rtol=1e-5, atol=1e-6,
                    err_msg='class %d image %d' % (j, i))


class TestFusedDetect:
    """im_detect_fused (ONE device program: forward + class-batched NMS)
    must produce the same detections as the two-call im_detect_bbox ->
    box_results_with_nms_and_limit path."""

    def _setup(self, tmp_path=None):
        from nafwebsod_tpu.models import detector
        import jax
        cfg.MODEL.NUM_CLASSES = 5
        cfg.TEST.SCALE = 64
        cfg.TEST.MAX_SIZE = 120
        cfg.TEST.SCORE_THRESH = 1e-9
        cfg.TEST.NMS = 0.5
        cfg.TEST.DETECTIONS_PER_IM = 10
        cfg.TPU.ROI_PAD_MULTIPLE = 16
        cfg.TPU.SIZE_BUCKET_MULTIPLE = 32
        spec = detector.ModelSpec(
            num_classes=5, hidden_dim=16, webly_on=True, webly_entropy=True,
            dilation=2, compute_dtype='float32')
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        # spread the classifier logits: random tiny-init params give
        # near-uniform softmaxes whose float-tie NMS ordering is the one
        # documented tie-break deviation — real checkpoints are tie-free
        for k in ('fc8c_w', 'fc8d_w', 'noisy_fc8c_w', 'noisy_fc8d_w'):
            params[k] = params[k] * 30.0
        rng = np.random.RandomState(0)
        # small-signal pixels around the mean keep the random-init towers
        # relu-alive: saturated inputs zero fc7 for most rois and produce
        # EXACT score ties (uniform softmax), which NMS tie-order resolves
        # differently per path (the documented deviation)
        im = np.clip(cfg.PIXEL_MEANS.reshape(1, 1, 3) +
                     rng.randn(60, 80, 3) * 8, 0, 255).astype(np.uint8)
        boxes = rng.uniform(0, 50, (24, 4)).astype(np.float32)
        boxes[:, 2:] = np.minimum(boxes[:, :2] + 6 +
                                  rng.uniform(0, 25, (24, 2)), 79)
        boxes[:, 3] = np.minimum(boxes[:, 3], 59)
        # inject exact duplicates to exercise the dedup path
        boxes[5] = boxes[0]
        boxes[6] = boxes[1]
        obn = rng.rand(24, 1).astype(np.float32)
        obn[5] = obn[0]
        obn[6] = obn[1]
        return spec, params, im, boxes, obn

    def test_fused_matches_two_call_path(self):
        from nafwebsod_tpu.engine import test as infer
        spec, params, im, boxes, obn = self._setup()
        assert infer._can_fuse_detect(spec)
        fused = infer.im_detect_fused(spec, params, im, boxes, obn)
        scores, pred_boxes, _ = infer.im_detect_bbox(
            spec, params, im, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE,
            boxes=boxes, obn_scores=obn)
        _, _, want = infer.box_results_with_nms_and_limit(scores, pred_boxes)
        for j in range(1, cfg.MODEL.NUM_CLASSES):
            got_j = np.asarray(fused[j]).reshape(-1, 5)
            want_j = np.asarray(want[j]).reshape(-1, 5)
            # identical detection sets (sort rows for tie-order stability)
            got_j = got_j[np.lexsort(got_j.T)]
            want_j = want_j[np.lexsort(want_j.T)]
            np.testing.assert_allclose(got_j, want_j, rtol=1e-5, atol=1e-5,
                                       err_msg='class %d' % j)

    def test_context_fused_matches_two_call_path(self):
        """The context family takes the fused path too: the drivers thread
        the per-image blob extent (im_hw), so the ring clipping sees the
        true image edge rather than the bucket-padded canvas (the blob here
        is 60x80-ish inside a 64x96 canvas — unthreaded im_hw WOULD change
        the outer-ring boxes and the scores)."""
        from nafwebsod_tpu.models import detector
        from nafwebsod_tpu.engine import test as infer
        import jax
        _, params0, im, boxes, obn = self._setup()
        spec = detector.ModelSpec(
            num_classes=5, hidden_dim=16, webly_on=False,
            webly_entropy=False, box_head='vgg16_context_2fc',
            dilation=2, compute_dtype='float32')
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        for k in ('fc8c_w', 'fc8d_frame_w'):
            params[k] = params[k] * 30.0
        assert spec.is_context and infer._can_fuse_detect(spec)
        fused = infer.im_detect_fused(spec, params, im, boxes, obn)
        scores, pred_boxes, _ = infer.im_detect_bbox(
            spec, params, im, cfg.TEST.SCALE, cfg.TEST.MAX_SIZE,
            boxes=boxes, obn_scores=obn)
        _, _, want = infer.box_results_with_nms_and_limit(scores, pred_boxes)
        for j in range(1, cfg.MODEL.NUM_CLASSES):
            got_j = np.asarray(fused[j]).reshape(-1, 5)
            want_j = np.asarray(want[j]).reshape(-1, 5)
            got_j = got_j[np.lexsort(got_j.T)]
            want_j = want_j[np.lexsort(want_j.T)]
            np.testing.assert_allclose(got_j, want_j, rtol=1e-5, atol=1e-5,
                                       err_msg='class %d' % j)
        # batch driver: mixed image sizes in one padded chunk — each
        # image's rings still clip at ITS extent
        batched = infer.im_detect_fused_batch(
            spec, params, [im, im[:52, :64]], [boxes, boxes * 0.6],
            [obn, obn])
        single = infer.im_detect_fused(spec, params, im[:52, :64],
                                       boxes * 0.6, obn)
        for j in range(1, cfg.MODEL.NUM_CLASSES):
            got = np.asarray(batched[1][j]).reshape(-1, 5)
            want_j = np.asarray(single[j]).reshape(-1, 5)
            got = got[np.lexsort(got.T)]
            want_j = want_j[np.lexsort(want_j.T)]
            np.testing.assert_allclose(got, want_j, rtol=2e-5, atol=2e-5,
                                       err_msg='class %d' % j)

    def test_gate_disables_on_aug(self):
        from nafwebsod_tpu.engine import test as infer
        spec, _, _, _, _ = self._setup()
        cfg.TEST.BBOX_AUG.ENABLED = True
        assert not infer._can_fuse_detect(spec)

    def test_batch_matches_per_image(self):
        from nafwebsod_tpu.engine import test as infer
        spec, params, im, boxes, obn = self._setup()
        rng = np.random.RandomState(7)
        ims, bxs, obns = [], [], []
        for k in range(3):
            im_k = np.clip(cfg.PIXEL_MEANS.reshape(1, 1, 3) +
                           rng.randn(50 + 6 * k, 70 + 4 * k, 3) * 8,
                           0, 255).astype(np.uint8)
            h, w = im_k.shape[:2]
            b = rng.uniform(0, 40, (10 + 4 * k, 4)).astype(np.float32)
            b[:, 2:] = np.minimum(b[:, :2] + 5 +
                                  rng.uniform(0, 20, (len(b), 2)),
                                  [w - 1, h - 1])
            ims.append(im_k)
            bxs.append(b)
            obns.append(rng.rand(len(b), 1).astype(np.float32))
        batched = infer.im_detect_fused_batch(spec, params, ims, bxs, obns)
        for k in range(3):
            single = infer.im_detect_fused(spec, params, ims[k], bxs[k],
                                           obns[k])
            for j in range(1, cfg.MODEL.NUM_CLASSES):
                got = np.asarray(batched[k][j]).reshape(-1, 5)
                want = np.asarray(single[j]).reshape(-1, 5)
                got = got[np.lexsort(got.T)]
                want = want[np.lexsort(want.T)]
                np.testing.assert_allclose(
                    got, want, rtol=2e-5, atol=2e-5,
                    err_msg='image %d class %d' % (k, j))


def test_infer_batch_auto_resolution(monkeypatch):
    """TPU.INFER_BATCH = -1 resolves to the measured sweet spot (16) on
    accelerator backends and to 1 on CPU; explicit values are honored
    (test_engine.py resolution, BASELINE.md batch sweep)."""
    import jax
    from nafwebsod_tpu.core.config import cfg

    def resolve(value, backend):
        b = int(value)
        if b < 0:
            b = 16 if backend != 'cpu' else 1
        return max(b, 1)

    # mirror of the test_net resolution logic, pinned here so a drift in
    # either place fails the test
    src = open('nafwebsod_tpu/engine/test_engine.py').read()
    assert "infer_batch = 16 if jax.default_backend() != 'cpu' else 1" in src
    assert resolve(-1, 'cpu') == 1
    assert resolve(-1, 'tpu') == 16
    assert resolve(4, 'tpu') == 4
    assert resolve(0, 'cpu') == 1
    assert int(cfg.TPU.INFER_BATCH) == -1   # the shipped default is auto


class TestInferMesh:
    """TPU.INFER_MESH (mesh-sharded eval chunks): splitting a chunk's
    images over the virtual device mesh must reproduce the single-device
    scan exactly — same program per image, different placement."""

    def _images(self, n):
        rng = np.random.RandomState(7)
        ims, boxes_l, obn_l = [], [], []
        for i in range(n):
            im = np.clip(cfg.PIXEL_MEANS.reshape(1, 1, 3) +
                         rng.randn(60, 80, 3) * 8, 0, 255).astype(np.uint8)
            boxes = rng.uniform(0, 50, (20, 4)).astype(np.float32)
            boxes[:, 2:] = np.minimum(boxes[:, :2] + 6 +
                                      rng.uniform(0, 25, (20, 2)), 79)
            boxes[:, 3] = np.minimum(boxes[:, 3], 59)
            ims.append(im)
            boxes_l.append(boxes)
            obn_l.append(rng.rand(20, 1).astype(np.float32))
        return ims, boxes_l, obn_l

    def test_mesh_chunk_matches_single_device(self):
        from nafwebsod_tpu.engine import test as infer
        helper = TestFusedDetect()
        spec, params, _, _, _ = helper._setup()
        ims, boxes_l, obn_l = self._images(8)

        cfg.TPU.INFER_MESH = 0
        plain = infer.im_detect_fused_batch(spec, params, ims, boxes_l,
                                            obn_l)
        cfg.TPU.INFER_MESH = 4
        try:
            meshed = infer.im_detect_fused_batch(spec, params, ims,
                                                 boxes_l, obn_l)
        finally:
            cfg.TPU.INFER_MESH = 0
        assert len(meshed) == len(plain) == 8
        for i in range(8):
            for j in range(1, cfg.MODEL.NUM_CLASSES):
                got = np.asarray(meshed[i][j]).reshape(-1, 5)
                want = np.asarray(plain[i][j]).reshape(-1, 5)
                np.testing.assert_allclose(
                    got, want, rtol=1e-5, atol=1e-6,
                    err_msg='image %d class %d' % (i, j))

    def test_indivisible_chunk_falls_back(self):
        from nafwebsod_tpu.engine import test as infer
        helper = TestFusedDetect()
        spec, params, _, _, _ = helper._setup()
        ims, boxes_l, obn_l = self._images(3)
        cfg.TPU.INFER_MESH = 4
        try:
            assert infer._infer_mesh_size(3) == 1
            out = infer.im_detect_fused_batch(spec, params, ims, boxes_l,
                                              obn_l)
        finally:
            cfg.TPU.INFER_MESH = 0
        assert len(out) == 3

"""Tool tests: caffemodel wire parser golden round-trip, log-curve parsing,
pth converter mapping, vis rendering, and pkl-to-coco conversion."""

import json
import os
import pickle
import struct
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'tools'))


# ---------------------------------------------------------------------------
# protobuf wire-format encoding helpers (test-side golden writer)
# ---------------------------------------------------------------------------

def _varint(n):
    out = b''
    while True:
        b = n & 0x7F
        n >>= 7
        out += bytes([b | (0x80 if n else 0)])
        if not n:
            return out


def _field(num, wire, payload):
    return _varint((num << 3) | wire) + payload


def _ld(num, payload):
    return _field(num, 2, _varint(len(payload)) + payload)


def _blob_proto(arr, use_shape=True):
    arr = np.asarray(arr, np.float32)
    msg = b''
    if use_shape:
        shape_msg = b''.join(_field(1, 0, _varint(d)) for d in arr.shape)
        msg += _ld(7, shape_msg)
    else:  # legacy num/channels/height/width
        dims4 = (1,) * (4 - arr.ndim) + arr.shape
        for i, d in enumerate(dims4):
            msg += _field(i + 1, 0, _varint(d))
    msg += _ld(5, arr.ravel().astype('<f4').tobytes())  # packed data
    return msg


class TestCaffemodelParser:
    def test_v1_and_modern_layers(self, tmp_path):
        from pickle_caffe_blobs import parse_caffemodel

        w = np.arange(24, dtype=np.float32).reshape(2, 3, 2, 2)
        b = np.array([0.5, -0.5], np.float32)
        fc_w = np.arange(6, dtype=np.float32).reshape(1, 1, 2, 3)

        # V1LayerParameter: name=4, blobs=6
        layer_v1 = _ld(4, b'conv1_1') + _ld(6, _blob_proto(w)) + \
            _ld(6, _blob_proto(b))
        # modern LayerParameter: name=1, blobs=7; legacy-dims fc blob
        layer_new = _ld(1, b'fc6') + _ld(7, _blob_proto(fc_w,
                                                        use_shape=False))
        net = _ld(2, layer_v1) + _ld(100, layer_new)
        path = tmp_path / 'net.caffemodel'
        path.write_bytes(net)

        layers = parse_caffemodel(str(path))
        np.testing.assert_array_equal(layers['conv1_1'][0], w)
        np.testing.assert_array_equal(layers['conv1_1'][1], b)
        # legacy 4-D fc squeezed to 2-D
        np.testing.assert_array_equal(layers['fc6'][0],
                                      fc_w.reshape(2, 3))


class TestVisualizeLearn:
    def test_parse_log(self, tmp_path):
        from visualize_learn import parse_log
        log = tmp_path / 'train.log'
        log.write_text(
            'INFO foo\n'
            'json_stats: {"iter": 0, "loss": 2.0, "lr": 0.001}\n'
            'json_stats: {"iter": 20, "loss": 1.5, "lr": 0.001}\n'
            'some eval: mAP: 0.31\n')
        stats, maps = parse_log(str(log))
        assert [s['iter'] for s in stats] == [0, 20]
        assert maps == [0.31]


class TestVis:
    def test_vis_one_image_and_heatmap(self, tmp_path):
        from nafwebsod_tpu.utils import vis
        im = np.zeros((40, 60, 3), np.uint8)
        cls_boxes = [None,
                     np.array([[5, 5, 30, 30, 0.9]], np.float32),
                     np.zeros((0, 5), np.float32)]
        out_path = str(tmp_path / 'det.jpg')
        out = vis.vis_one_image(im, cls_boxes, thresh=0.5,
                                output_name=out_path)
        assert os.path.exists(out_path)
        assert out.sum() > 0  # something was drawn

        heat = vis.roi_score_heatmap(
            (40, 60), np.array([[0, 5, 5, 20, 20]], np.float32), [1.0])
        assert heat.max() == 1.0
        assert heat[30, 50] == 0.0

    def test_vis_training_dump(self, tmp_path):
        from nafwebsod_tpu.utils import vis
        rng = np.random.RandomState(0)
        image = rng.rand(1, 32, 32, 3).astype(np.float32) * 50
        rois = np.array([[0, 2, 2, 20, 20], [0, 5, 5, 28, 28]], np.float32)
        rois_pred = rng.rand(2, 3).astype(np.float32)
        labels = np.array([[1, 0, 1]], np.float32)
        vis.vis_training(str(tmp_path), 42, image, rois, rois_pred, labels)
        assert (tmp_path / 'iter42_image.png').exists()
        assert (tmp_path / 'iter42_class0_heat.png').exists()
        assert (tmp_path / 'iter42_class2_heat.png').exists()


class TestConvertPklToCoco:
    def test_roundtrip(self, tmp_path):
        import fixtures
        from nafwebsod_tpu.data import catalog
        info = fixtures.make_coco_dataset(str(tmp_path))
        catalog.register_dataset('synth_conv', info['image_dir'],
                                 info['ann_file'])
        # synthetic detections: 4 classes (bg + 3), 4 images
        n_images = info['n_images']
        all_boxes = [[np.zeros((0, 5), np.float32)] * n_images
                     for _ in range(4)]
        for i in range(n_images):
            all_boxes[1][i] = np.array([[1, 2, 30, 40, 0.9]], np.float32)
        det_pkl = tmp_path / 'detections.pkl'
        with open(det_pkl, 'wb') as f:
            pickle.dump({'all_boxes': all_boxes}, f)

        out_json = tmp_path / 'pseudo.json'
        from convert_pkl_to_coco import convert
        convert(str(det_pkl), 'synth_conv', str(out_json))
        with open(out_json) as f:
            data = json.load(f)
        assert len(data['annotations']) == n_images
        ann = data['annotations'][0]
        assert ann['bbox'] == [1.0, 2.0, 30.0, 39.0]
        assert ann['score'] == pytest.approx(0.9)


class TestCheckpointSurgeryTools:
    def _save_pkl(self, path, blobs, wrap=True):
        from nafwebsod_tpu.utils.io import save_object
        save_object({'blobs': blobs} if wrap else blobs, str(path))

    def test_delete_momentum(self, tmp_path):
        from delete_momentum import strip_momentum
        blobs = {'fc6_w': np.ones((2, 2)), 'fc6_w_momentum': np.ones((2, 2)),
                 'fc6_b': np.zeros((2,))}
        out = strip_momentum(blobs)
        assert set(out) == {'fc6_w', 'fc6_b'}

    def test_merge_conv_and_bn_folds_affine(self):
        from merge_conv_and_bn import fold_bn
        rng = np.random.RandomState(0)
        w = rng.randn(4, 3, 3, 3).astype(np.float32)   # OIHW
        s = rng.rand(4).astype(np.float32) + 0.5
        b = rng.randn(4).astype(np.float32)
        blobs = {'res2_0_branch2a_w': w, 'res2_0_branch2a_bn_s': s,
                 'res2_0_branch2a_bn_b': b, 'fc_w': np.ones((2, 2))}
        out = fold_bn(blobs)
        assert 'res2_0_branch2a_bn_s' not in out
        # conv output x*w then *s  ==  x*(w*s) for every output channel
        np.testing.assert_allclose(out['res2_0_branch2a_w'],
                                   w * s[:, None, None, None], rtol=1e-6)
        np.testing.assert_allclose(out['res2_0_branch2a_b'], b)  # 0*s + b
        assert 'fc_w' in out

    def test_merge_conv_and_bn_stem_special_case(self):
        from merge_conv_and_bn import fold_bn
        blobs = {'conv1_w': np.ones((2, 3, 7, 7), np.float32),
                 'res_conv1_bn_s': np.full((2,), 2.0, np.float32),
                 'res_conv1_bn_b': np.ones((2,), np.float32)}
        out = fold_bn(blobs)
        np.testing.assert_allclose(out['conv1_w'], 2.0)
        np.testing.assert_allclose(out['conv1_b'], 1.0)

    def test_diff_net_stats(self):
        from diff_net import compare
        a = {'fc_w': np.ones((4, 4), np.float32)}
        b = {'fc_w': np.ones((4, 4), np.float32) * 2.0}
        (name, stats), = list(compare(a, b))
        assert name == 'fc_w'
        assert stats['mean_abs_diff'] == pytest.approx(1.0)
        assert stats['normF'] == pytest.approx(4.0)

    def test_combine_deeplab(self):
        from combine_deeplab_and_original_vgg16 import combine
        original = {'conv1_w': np.ones((2,)), 'fc8c_w': np.ones((2,))}
        deeplab = {'conv1_w': np.ones((2,)), 'fc6_1_w': np.zeros((3,)),
                   'mask_fc8_1_w': np.ones((2,))}
        out = combine(original, deeplab)
        assert set(out) == {'conv1_w', 'fc6_1_w'}

    def test_convert_coco_model_to_cityscapes(self):
        from convert_coco_model_to_cityscapes import (NUM_COCO_CLS,
                                                      remap_class_blob)
        rng = np.random.RandomState(0)
        cls_w = rng.randn(NUM_COCO_CLS, 8).astype(np.float32)
        out = remap_class_blob(cls_w, 'cityscapes_to_coco')
        assert out.shape == (9, 8)
        # cityscapes person (id 3) seeds from coco person (id 1)
        np.testing.assert_array_equal(out[3], cls_w[1])
        bbox_w = rng.randn(4 * NUM_COCO_CLS, 8).astype(np.float32)
        out4 = remap_class_blob(bbox_w, 'cityscapes_to_coco')
        assert out4.shape == (36, 8)
        np.testing.assert_array_equal(
            out4.reshape(9, 4, 8)[3], bbox_w.reshape(81, 4, 8)[1])

    def test_distort_voc_json(self):
        import random
        from distort_voc_json import distort
        ds = {
            'categories': [{'id': i} for i in range(1, 5)],
            'images': [{'id': 1}, {'id': 2}],
            'annotations': [
                {'image_id': 1, 'category_id': 1},
                {'image_id': 1, 'category_id': 2},
                {'image_id': 2, 'category_id': 3},
            ],
        }
        rng = random.Random(0)
        out = distort(ds, p1=0.0, p2=1.0, rng=rng)
        # p2=1: every image keeps exactly one annotation
        assert len(out['annotations']) == 2
        ids = [a['image_id'] for a in out['annotations']]
        assert sorted(ids) == [1, 2]

    def test_generate_testdev_filter(self):
        from generate_testdev_from_test import filter_testdev
        dets = [{'image_id': 1, 'score': 0.5}, {'image_id': 9, 'score': 0.1}]
        assert filter_testdev(dets, [9]) == [dets[1]]

    def test_densenet_converter_folds_bn(self, tmp_path):
        from pickle_caffe_blobs_densenet import (convert,
                                                 parse_caffemodel_typed)
        w = np.ones((2, 3, 1, 1), np.float32)
        mean = np.array([1.0, 2.0], np.float32)
        var = np.array([0.25, 1.0], np.float32)
        s = np.array([2.0, 3.0], np.float32)
        b = np.array([0.5, -0.5], np.float32)

        def layer(name, ltype, blobs):
            msg = _ld(1, name.encode()) + _ld(2, ltype.encode())
            for blob in blobs:
                msg += _ld(7, _blob_proto(blob))
            return _ld(100, msg)

        net = (layer('conv1', 'Convolution', [w]) +
               layer('conv1_bn', 'BatchNorm',
                     [mean, var, np.array([1.0], np.float32)]) +
               layer('conv1_scale', 'Scale', [s, b]))
        path = tmp_path / 'dense.caffemodel'
        path.write_bytes(net)
        layers = parse_caffemodel_typed(str(path))
        assert [l[1] for l in layers] == ['Convolution', 'BatchNorm', 'Scale']

        out = convert(layers)
        np.testing.assert_array_equal(out['conv1_b'], 0.0)  # zero-filled
        std = np.sqrt(var + 1e-5)
        np.testing.assert_allclose(out['conv1_bn_s'], s / std, rtol=1e-6)
        np.testing.assert_allclose(out['conv1_bn_b'], b - mean * s / std,
                                   rtol=1e-6)

        kept = convert(layers, keep_bn=True)
        np.testing.assert_allclose(kept['conv1_bn_rm'], mean)
        np.testing.assert_allclose(kept['conv1_bn_riv'], var)

    def test_delete_nolog_exp_dry_run(self, tmp_path):
        from delete_nolog_exp import kept_ids
        logs = tmp_path / '_logs'
        logs.mkdir()
        (logs / 'exp1 something.log').write_text('x')
        assert kept_ids(str(logs)) == {'exp1'}

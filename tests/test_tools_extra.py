"""Tool-tail tests: proposal converters, cityscapes->COCO conversion,
torchvision .pth conversion, pkl inspectors, reval, visualize_results.

Each tool's pure conversion core is exercised with synthetic inputs; the
two inspectors run as real subprocesses (they are pure stdout tools)."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'tools'))

import fixtures
from nafwebsod_tpu.core.config import cfg, reset_cfg
from nafwebsod_tpu.data import catalog


@pytest.fixture(autouse=True)
def fresh_cfg():
    reset_cfg()
    cfg.MODEL.NUM_CLASSES = len(fixtures.CLASSES) + 1
    yield
    reset_cfg()


@pytest.fixture()
def dataset_name(tmp_path):
    info = fixtures.make_coco_dataset(str(tmp_path))
    catalog.register_dataset('tools_extra_ds', info['image_dir'],
                             info['ann_file'])
    return 'tools_extra_ds'


class TestConvertProposals:
    def test_mcg(self, tmp_path, dataset_name):
        import scipy.io as sio
        from convert_proposals import convert_mcg
        from nafwebsod_tpu.data.json_dataset import JsonDataset

        roidb = JsonDataset(dataset_name).get_roidb()
        mat_dir = tmp_path / 'mcg'
        mat_dir.mkdir()
        for entry in roidb:
            stem = os.path.splitext(os.path.basename(entry['image']))[0]
            # MCG convention: 1-indexed (y1, x1, y2, x2)
            sio.savemat(str(mat_dir / (stem + '.mat')), {
                'bboxes': np.array([[3, 2, 23, 12], [5, 6, 25, 26]],
                                   np.float64),
                'bboxes_scores': np.array([[0.9], [0.4]], np.float64),
            })
        out = str(tmp_path / 'mcg.pkl')
        convert_mcg(dataset_name, str(mat_dir), out)
        with open(out, 'rb') as f:
            data = pickle.load(f)
        assert set(data) == {'boxes', 'scores', 'indexes'}
        assert len(data['boxes']) == len(roidb)
        # 0-indexed (x1, y1, x2, y2) after conversion
        np.testing.assert_array_equal(data['boxes'][0][0], [1, 2, 11, 22])
        assert data['scores'][0].dtype == np.float32

    def test_selective_search_zero_scores(self, tmp_path, dataset_name):
        import scipy.io as sio
        from convert_proposals import convert_selective_search
        from nafwebsod_tpu.data.json_dataset import JsonDataset

        roidb = JsonDataset(dataset_name).get_roidb()
        raw = np.empty((len(roidb), 1), object)
        for i in range(len(roidb)):
            raw[i, 0] = np.array([[3, 2, 23, 12]], np.float64)
        mat = str(tmp_path / 'ss.mat')
        sio.savemat(mat, {'boxes': raw})
        out = str(tmp_path / 'ss.pkl')
        convert_selective_search(dataset_name, mat, out)
        with open(out, 'rb') as f:
            data = pickle.load(f)
        np.testing.assert_array_equal(data['boxes'][0][0], [1, 2, 11, 22])
        # the reference writes zero scores for selective search
        assert float(data['scores'][0].sum()) == 0.0


class TestConvertCityscapes:
    def test_gtfine_tree_to_coco_json(self, tmp_path):
        gt = tmp_path / 'gtFine' / 'val' / 'somecity'
        gt.mkdir(parents=True)
        (gt / 'somecity_000000_000019_gtFine_polygons.json').write_text(
            json.dumps({
                'imgWidth': 100, 'imgHeight': 80,
                'objects': [
                    {'label': 'car',
                     'polygon': [[10, 10], [40, 10], [40, 30], [10, 30]]},
                    {'label': 'cargroup',  # -> crowd car
                     'polygon': [[50, 50], [70, 50], [70, 70]]},
                    {'label': 'sky',  # not an instance category
                     'polygon': [[0, 0], [1, 0], [1, 1]]},
                ],
            }))
        out = str(tmp_path / 'out.json')
        proc = subprocess.run(
            [sys.executable,
             os.path.join(REPO, 'tools', 'convert_cityscapes_to_coco.py'),
             str(tmp_path / 'gtFine'), str(tmp_path), 'val', out],
            capture_output=True, text=True, timeout=120)
        assert proc.returncode == 0, proc.stderr
        data = json.load(open(out))
        assert len(data['images']) == 1
        assert data['images'][0]['width'] == 100
        assert len(data['annotations']) == 2  # sky dropped
        car, crowd = data['annotations']
        assert car['bbox'] == [10.0, 10.0, 30.0, 20.0]
        assert car['iscrowd'] == 0 and crowd['iscrowd'] == 1
        names = {c['name'] for c in data['categories']}
        assert 'car' in names and 'sky' not in names


class TestConvertPth:
    def test_vgg16_state_dict_roundtrip(self, tmp_path, monkeypatch):
        torch = pytest.importorskip('torch')
        from convert_pth_to_pkl import VGG16_MAP, main

        state = {}
        for caffe_name, pth_name in VGG16_MAP:
            if caffe_name.startswith('conv'):
                cin = 3 if caffe_name == 'conv1_1' else 4
                w = torch.arange(2 * cin * 9, dtype=torch.float32).reshape(
                    2, cin, 3, 3)
            else:
                w = torch.arange(8, dtype=torch.float32).reshape(2, 4)
            state[pth_name + '.weight'] = w
            state[pth_name + '.bias'] = torch.zeros(2)
        pth = str(tmp_path / 'w.pth')
        torch.save(state, pth)
        out = str(tmp_path / 'w.pkl')
        monkeypatch.setattr(sys, 'argv',
                            ['convert_pth_to_pkl.py', pth, out, '--flip-rgb'])
        main()
        with open(out, 'rb') as f:
            blobs = pickle.load(f)['blobs']
        assert set(blobs) == {n + s for n, _ in VGG16_MAP for s in ('_w', '_b')}
        # --flip-rgb reverses conv1_1's input-channel axis only
        w0 = state['features.0.weight'].numpy()
        np.testing.assert_array_equal(blobs['conv1_1_w'], w0[:, ::-1])
        np.testing.assert_array_equal(blobs['conv2_1_w'],
                                      state['features.5.weight'].numpy())


class TestPklInspectors:
    def _weights_pkl(self, tmp_path):
        path = str(tmp_path / 'w.pkl')
        with open(path, 'wb') as f:
            pickle.dump({'blobs': {'fc6_w': np.zeros((4, 2), np.float32),
                                   'conv1_w': np.ones((1, 3, 3, 3))}}, f, 2)
        return path

    def test_show_pkl_and_convert_pkl_for_seg(self, tmp_path):
        path = self._weights_pkl(tmp_path)
        for tool in ('show_pkl.py', 'convert_pkl_for_seg.py'):
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, 'tools', tool), path],
                capture_output=True, text=True, timeout=120)
            assert proc.returncode == 0, (tool, proc.stderr)
            assert 'fc6_w' in proc.stdout


class TestRevalAndVis:
    def _detections(self, dataset_name, tmp_path):
        """A detections.pkl whose boxes ARE the gt boxes (score 0.9)."""
        from nafwebsod_tpu.data.json_dataset import JsonDataset
        ds = JsonDataset(dataset_name)
        roidb = ds.get_roidb(gt=True)
        num_classes = cfg.MODEL.NUM_CLASSES
        all_boxes = [[] for _ in range(num_classes)]
        for j in range(1, num_classes):
            for entry in roidb:
                sel = entry['gt_classes'] == j
                dets = np.concatenate(
                    [entry['boxes'][sel],
                     np.full((int(sel.sum()), 1), 0.9)], axis=1)
                all_boxes[j].append(dets.astype(np.float32))
        path = str(tmp_path / 'detections.pkl')
        with open(path, 'wb') as f:
            pickle.dump({'all_boxes': all_boxes, 'cfg': ''}, f, 2)
        return path

    def test_reval_on_cached_detections(self, tmp_path, dataset_name):
        det_file = self._detections(dataset_name, tmp_path)
        cfg.TEST.DATASETS = (dataset_name,)
        cfg.OUTPUT_DIR = str(tmp_path / 'out')
        from nafwebsod_tpu.data import task_evaluation
        from nafwebsod_tpu.data.json_dataset import JsonDataset
        from nafwebsod_tpu.utils.io import load_object
        # same call chain tools/reval.py main() runs after cfg setup
        data = load_object(det_file)
        results = task_evaluation.evaluate_all(
            JsonDataset(dataset_name), data['all_boxes'], None, None,
            str(tmp_path / 'out'))
        (metrics,) = results.values()
        assert metrics['AP50'] == pytest.approx(1.0)

    def test_visualize_results_renders(self, tmp_path, dataset_name):
        det_file = self._detections(dataset_name, tmp_path)
        from visualize_results import vis
        out_dir = str(tmp_path / 'vis')
        vis(dataset_name, det_file, 0.5, 2.0, out_dir, limit=2)
        pngs = [f for f in os.listdir(out_dir) if f.endswith('.png')]
        assert len(pngs) == 2


class TestGridSearchCache:
    def test_rebuild_prenms_cache(self):
        from test_net_grid_search import rebuild_prenms_cache
        # WSL-style detections: every class shares the same box rows
        num_classes, num_images, R = 3, 2, 4
        rows = np.arange(R * 5, dtype=np.float32).reshape(R, 5)
        all_boxes = [[] for _ in range(num_classes)]
        for j in range(1, num_classes):
            all_boxes[j] = [rows + j for _ in range(num_images)]
        scores, boxes = rebuild_prenms_cache(all_boxes, num_classes,
                                             num_images)
        assert len(scores) == num_images and len(boxes) == num_images
        assert scores[0].shape == (R, num_classes)
        assert boxes[0].shape == (R, 4 * num_classes)
        # per-class score column j = that class's 5th det column
        np.testing.assert_array_equal(scores[0][:, 1], rows[:, 4] + 1)
        np.testing.assert_array_equal(scores[0][:, 2], rows[:, 4] + 2)
        # background column stays -1
        assert (scores[0][:, 0] == -1).all()


def test_shannon_entropy_demo_runs():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'shannon_entropy.py')],
        capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    # the uniform case has entropy log(N) -> complement exactly 0
    assert '2000' in proc.stdout


class TestInferCLI:
    def test_single_image_inference(self, tmp_path, dataset_name,
                                    monkeypatch):
        import cv2
        from nafwebsod_tpu.core import config as config_mod
        from nafwebsod_tpu.data.json_dataset import JsonDataset
        from nafwebsod_tpu.models import detector
        from nafwebsod_tpu.utils.checkpoint import \
            save_params_to_weights_file

        cfg_yaml = tmp_path / 'cfg.yaml'
        cfg_yaml.write_text(
            'MODEL:\n'
            '  TYPE: generalized_wsl\n'
            '  CONV_BODY: VGG16.add_VGG16_conv5_body_origin\n'
            '  NUM_CLASSES: {}\n'
            'FAST_RCNN:\n'
            '  ROI_BOX_HEAD: wsl_heads.add_VGG16_roi_2fc_head\n'
            'TEST:\n'
            '  SCALE: 48\n'
            '  MAX_SIZE: 64\n'
            'TPU:\n'
            '  HEAD_HIDDEN_DIM: 16\n'.format(cfg.MODEL.NUM_CLASSES))

        # random-init checkpoint in the reference pkl schema
        config_mod.merge_cfg_from_file(str(cfg_yaml))
        import jax
        spec = detector.spec_from_cfg(cfg)
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        wts = str(tmp_path / 'w.pkl')
        save_params_to_weights_file(wts, params)
        reset_cfg()
        cfg.MODEL.NUM_CLASSES = len(fixtures.CLASSES) + 1

        image = JsonDataset(dataset_name).get_roidb()[0]['image']
        stem = os.path.splitext(os.path.basename(image))[0]
        props = str(tmp_path / 'props.pkl')
        h, w = cv2.imread(image).shape[:2]
        with open(props, 'wb') as f:
            pickle.dump({'boxes': np.array(
                [[1, 1, w - 2, h - 2], [2, 2, w // 2, h // 2]], np.float32),
                'scores': np.ones((2, 1), np.float32)}, f, 2)

        out_dir = str(tmp_path / 'out')
        monkeypatch.setattr(sys, 'argv', [
            'infer.py', '--cfg', str(cfg_yaml), '--wts', wts,
            '--output-dir', out_dir, '--proposals', props,
            '--thresh', '0.0', str(image)])
        from infer import main
        main()
        assert os.path.exists(os.path.join(out_dir, stem + '_det.png'))
        with open(os.path.join(out_dir, stem + '_det.pkl'), 'rb') as f:
            out = pickle.load(f)
        assert len(out['cls_boxes']) == cfg.MODEL.NUM_CLASSES


class TestLoaderBenchmarkCLI:
    def test_three_batches_one_thread(self, tmp_path, dataset_name,
                                      monkeypatch):
        from data_loader_benchmark import main
        cfg_yaml = tmp_path / 'loader_cfg.yaml'
        cfg_yaml.write_text(
            'MODEL:\n  NUM_CLASSES: {}\n'
            'TRAIN:\n'
            "  DATASETS: ('{}',)\n"
            '  SCALES: (64,)\n'
            '  MAX_SIZE: 96\n'
            '  BATCH_SIZE_PER_IM: 16\n'.format(
                cfg.MODEL.NUM_CLASSES, dataset_name))
        monkeypatch.setattr(sys, 'argv', [
            'data_loader_benchmark.py', '--cfg', str(cfg_yaml),
            '--num-batches', '3', '--threads', '1'])
        main()  # raises on any loader failure


class TestVisWrappers:
    """The *_vis wrappers monkeypatch the base tools' parse_args — pin that
    seam (a round-4 CLI refactor silently removed it once)."""

    def test_test_net_vis_forces_vis(self, monkeypatch):
        import test_net
        import test_net_vis
        seen = {}

        def fake_parse():
            import types
            return types.SimpleNamespace(vis=False, opts=None)

        monkeypatch.setattr(test_net, 'parse_args', fake_parse)
        monkeypatch.setattr(test_net, 'main',
                            lambda: seen.update(
                                vis=test_net.parse_args().vis))
        test_net_vis.main()
        assert seen['vis'] is True

    def test_train_net_vis_forces_sample(self, monkeypatch):
        import train_net
        import train_net_vis
        seen = {}

        def fake_parse():
            import types
            return types.SimpleNamespace(opts=['A', 'B'])

        monkeypatch.setattr(train_net, 'parse_args', fake_parse)
        monkeypatch.setattr(train_net, 'main',
                            lambda: seen.update(
                                opts=train_net.parse_args().opts))
        train_net_vis.main()
        assert seen['opts'] == ['A', 'B', 'WSL.SAMPLE', 'True']


class TestDrawIdealDetections:
    def test_renders_per_gt_class(self, tmp_path, dataset_name, monkeypatch):
        from draw_ideal_detection_result import jet_bgr, main
        assert jet_bgr(0.0) != jet_bgr(1.0)
        # proposal pkl over the fixture dataset: gt boxes as proposals
        from nafwebsod_tpu.data.json_dataset import JsonDataset
        ds = JsonDataset(dataset_name)
        roidb = ds.get_roidb(gt=True)
        props = {'boxes': [e['boxes'].astype(np.uint16) for e in roidb],
                 'scores': [np.ones((len(e['boxes']), 1), np.float32)
                            for e in roidb],
                 'indexes': [e['id'] for e in roidb]}
        prop_file = str(tmp_path / 'props.pkl')
        with open(prop_file, 'wb') as f:
            pickle.dump(props, f, 2)
        out_dir = str(tmp_path / 'ideal')
        monkeypatch.setattr(sys, 'argv', [
            'draw_ideal_detection_result.py', dataset_name, prop_file,
            out_dir])
        main()
        assert any(f.endswith('_ideal.png') for f in os.listdir(out_dir))


def test_mesh_scaling_benchmark_one_step():
    from mesh_scaling_benchmark import bench_mesh
    dt = bench_mesh(2, iters=1, warmup=1, H=48, W=48, R=16, hidden=16)
    assert dt > 0


class TestVisTsne:
    def test_writes_embedding_png(self, tmp_path, monkeypatch):
        import jax
        from nafwebsod_tpu.core import config as config_mod
        from nafwebsod_tpu.models import detector
        from nafwebsod_tpu.utils.checkpoint import \
            save_params_to_weights_file

        info = fixtures.make_coco_dataset(str(tmp_path))
        catalog.register_dataset('tsne_ds', info['image_dir'],
                                 info['ann_file'])
        cfg_yaml = tmp_path / 'cfg.yaml'
        cfg_yaml.write_text(
            'MODEL:\n'
            '  TYPE: generalized_wsl\n'
            '  CONV_BODY: VGG16.add_VGG16_conv5_body_origin\n'
            '  NUM_CLASSES: {}\n'
            'FAST_RCNN:\n'
            '  ROI_BOX_HEAD: wsl_heads.add_VGG16_roi_2fc_head\n'
            'TEST:\n'
            "  DATASETS: ('tsne_ds',)\n"
            "  PROPOSAL_FILES: ('{}',)\n"
            '  SCALE: 48\n'
            '  MAX_SIZE: 64\n'
            'TPU:\n'
            '  HEAD_HIDDEN_DIM: 16\n'.format(
                cfg.MODEL.NUM_CLASSES, info['prop_file']))
        config_mod.merge_cfg_from_file(str(cfg_yaml))
        spec = detector.spec_from_cfg(cfg)
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        wts = str(tmp_path / 'w.pkl')
        save_params_to_weights_file(wts, params)
        reset_cfg()
        cfg.MODEL.NUM_CLASSES = len(fixtures.CLASSES) + 1

        out = str(tmp_path / 'tsne.png')
        monkeypatch.setattr(sys, 'argv', [
            'vis_tsne.py', '--cfg', str(cfg_yaml), '--wts', wts,
            '--num-images', '2', '--out', out])
        from vis_tsne import main
        main()
        assert os.path.getsize(out) > 0


def test_run_parity_stage_listing():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'run_parity.py'),
         '--help'], capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    for stage in ('convert', 'goldens', 'train', 'eval'):
        assert stage in proc.stdout

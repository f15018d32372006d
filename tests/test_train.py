"""End-to-end training-driver tests on the synthetic dataset: the loop runs,
losses are finite, snapshots are written in the reference pkl format, and
AUTO_RESUME picks up from the newest snapshot (train_wsl.py:121-160) or skips
when model_final.pkl exists."""

import os

import numpy as np
import pytest

from nafwebsod_tpu.core.config import cfg, reset_cfg
from nafwebsod_tpu.data import catalog
from nafwebsod_tpu.engine import train as train_engine
from nafwebsod_tpu.utils import checkpoint as ckpt

import fixtures


@pytest.fixture()
def train_cfg(tmp_path):
    reset_cfg()
    info = fixtures.make_coco_dataset(str(tmp_path), n_images=4)
    catalog.register_dataset('synth_train', info['image_dir'],
                             info['ann_file'])
    cfg.MODEL.NUM_CLASSES = len(fixtures.CLASSES) + 1
    cfg.MODEL.TYPE = 'generalized_wsl'
    cfg.MODEL.CONV_BODY = 'VGG16.add_VGG16_conv5_body_origin'
    cfg.FAST_RCNN.ROI_BOX_HEAD = 'webly_heads.add_VGG16_roi_2fc_noise_head'
    cfg.FAST_RCNN.ROI_XFORM_RESOLUTION = 7
    cfg.TRAIN.DATASETS = ('synth_train',)
    cfg.TRAIN.PROPOSAL_FILES = (info['prop_file'],)
    cfg.TRAIN.SCALES = (64,)
    cfg.TRAIN.MAX_SIZE = 120
    cfg.TRAIN.BATCH_SIZE_PER_IM = 16
    cfg.TRAIN.USE_FLIPPED = False
    cfg.TRAIN.CROWD_FILTER_THRESH = 0.0
    cfg.TRAIN.FREEZE_CONV_BODY = True
    cfg.TRAIN.SNAPSHOT_ITERS = 2
    cfg.WSL.WSL_ON = True
    cfg.WSL.DILATION = 2
    cfg.WSL.USE_DISTORTION = False
    cfg.WSL.USE_CROP = False
    cfg.WEBLY.WEBLY_ON = True
    cfg.WEBLY.ENTROPY = True
    cfg.SOLVER.BASE_LR = 1e-5
    cfg.SOLVER.LR_POLICY = 'steps_with_decay'
    cfg.SOLVER.STEPS = [0]
    cfg.SOLVER.MAX_ITER = 4
    cfg.SOLVER.WARM_UP_ITERS = 0
    cfg.NUM_GPUS = 1
    cfg.DATA_LOADER.NUM_THREADS = 1
    cfg.TPU.HEAD_HIDDEN_DIM = 32
    cfg.TPU.ROI_PAD_MULTIPLE = 16
    cfg.TPU.SIZE_BUCKET_MULTIPLE = 32
    cfg.OUTPUT_DIR = str(tmp_path / 'out')
    yield info
    reset_cfg()


class TestTrainModel:
    def test_loop_and_snapshots(self, train_cfg):
        checkpoints, losses = train_engine.train_model()
        assert len(losses) == 4
        assert np.isfinite(losses).all()
        assert os.path.exists(checkpoints['final'])
        # snapshot at iter 1 (period 2): model_iter1.pkl
        assert 1 in checkpoints and os.path.exists(checkpoints[1])
        # reference pkl schema: blobs + momentum + cfg
        blobs, saved_cfg = ckpt.load_weights_pkl(checkpoints['final'])
        assert 'fc8c_w' in blobs and 'fc8c_w_momentum' in blobs
        assert saved_cfg is not None

        # AUTO_RESUME: model_final exists -> skip training
        checkpoints2, losses2 = train_engine.train_model()
        assert losses2 == []
        assert checkpoints2['final'].endswith('model_final.pkl')

    def test_auto_resume_from_snapshot(self, train_cfg):
        checkpoints, _ = train_engine.train_model()
        os.remove(checkpoints['final'])
        # resumes from model_iter1.pkl at iter 2 -> only 2 more iterations
        _, losses = train_engine.train_model()
        assert len(losses) == 2

    def test_host_prefetch_stream_is_bit_identical(self, train_cfg):
        """TPU.HOST_PREFETCH moves window assembly (loader drain, stack,
        rng chain, upload) to a background thread — the training stream
        must be BIT-identical to the inline path (same blobs order, same
        rng splits); only wall-clock scheduling may change. Also covers
        the STEPS_PER_CALL window driver under prefetch."""
        import glob

        cfg.TPU.STEPS_PER_CALL = 2
        losses = {}
        for depth in (0, 2):
            cfg.TPU.HOST_PREFETCH = depth
            np.random.seed(cfg.RNG_SEED)  # loader shuffle/jitter draws
            _, losses[depth] = train_engine.train_model()
            for p in glob.glob(os.path.join(cfg.OUTPUT_DIR, '**',
                                            'model_*.pkl'), recursive=True):
                os.remove(p)  # else the next run AUTO_RESUME-skips
        assert losses[0] and losses[0] == losses[2]

    def test_prefetch_thread_error_surfaces_on_main(self, train_cfg,
                                                    monkeypatch):
        """An exception inside the window-prefetch producer (loader drain,
        stack, upload) must re-raise on the main thread, not hang the
        queue consumer."""
        from nafwebsod_tpu.data.loader import RoIDataLoader

        orig_get = RoIDataLoader.get
        calls = {'n': 0}

        def flaky_get(self):
            calls['n'] += 1
            if calls['n'] > 2:
                raise ValueError('loader exploded mid-run')
            return orig_get(self)

        monkeypatch.setattr(RoIDataLoader, 'get', flaky_get)
        cfg.TPU.HOST_PREFETCH = 2
        with pytest.raises(ValueError, match='loader exploded'):
            train_engine.train_model()

    def test_resume_skips_stray_momentum_blobs(self, train_cfg, monkeypatch):
        """An externally produced pkl may carry momentum blobs with no
        matching param; resume must skip them with a warning, not KeyError
        (ADVICE r4). The loader filters to live params, so inject the
        stray key at its return to exercise the guard."""
        checkpoints, _ = train_engine.train_model()
        os.remove(checkpoints['final'])
        orig = ckpt.initialize_params_from_weights_file

        def patched(params, path, strict_shapes=True):
            new_params, momentum, unmatched = orig(params, path,
                                                   strict_shapes)
            momentum['stray_blob'] = np.zeros(3, np.float32)
            return new_params, momentum, unmatched

        monkeypatch.setattr(train_engine.ckpt,
                            'initialize_params_from_weights_file', patched)
        _, losses = train_engine.train_model()
        assert len(losses) == 2
        assert np.isfinite(losses).all()

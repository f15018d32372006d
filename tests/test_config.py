"""Config system tests (mirrors the reference's test strategy for
``detectron/tests/test_cfg.py``: merge, immutability, coercion, CLI overrides)."""

import os
import tempfile

import numpy as np
import pytest

from nafwebsod_tpu.core import config as core_config
from nafwebsod_tpu.core.config import (
    cfg,
    assert_and_infer_cfg,
    dump_cfg,
    load_cfg,
    merge_cfg_from_file,
    merge_cfg_from_list,
    reset_cfg,
)


@pytest.fixture(autouse=True)
def fresh_cfg():
    reset_cfg()
    yield
    reset_cfg()


def test_defaults():
    assert cfg.TRAIN.IMS_PER_BATCH == 2
    assert cfg.WSL.WSL_ON is False
    assert cfg.WEBLY.BAGGING_MIXUP_ALPHA == 1.5
    assert cfg.TEST.BBOX_AUG.SCORE_HEUR == 'UNION'


def test_merge_from_list():
    merge_cfg_from_list(['TRAIN.SCALES', '(100,)', 'MODEL.NUM_CLASSES', '21'])
    assert cfg.TRAIN.SCALES == (100,)
    assert cfg.MODEL.NUM_CLASSES == 21


def test_merge_from_list_rejects_bad_key():
    with pytest.raises(AssertionError):
        merge_cfg_from_list(['NOT.A.KEY', '1'])


def test_merge_from_file_flagship_yaml():
    yaml_text = """
MODEL:
  TYPE: generalized_wsl
  NUM_CLASSES: 21
SOLVER:
  BASE_LR: 0.001
  MAX_ITER: 200000
  STEPS: [0, 150000]
TRAIN:
  SCALES: (480, 576, 688, 864, 1200)
  MAX_SIZE: 2000
  BATCH_SIZE_PER_IM: 2048
  FREEZE_CONV_BODY: True
WSL:
  WSL_ON: True
  DILATION: 2
  MEAN_LOSS: True
WEBLY:
  WEBLY_ON: True
  ENTROPY: True
  BAGGING_MIXUP: True
PIXEL_MEANS: [[[103.939, 116.779, 123.68]]]
DEDUP_BOXES: 0.125
USE_NCCL: True
"""
    with tempfile.NamedTemporaryFile('w', suffix='.yaml', delete=False) as f:
        f.write(yaml_text)
        path = f.name
    try:
        merge_cfg_from_file(path)
    finally:
        os.unlink(path)
    assert cfg.MODEL.NUM_CLASSES == 21
    assert cfg.TRAIN.SCALES == (480, 576, 688, 864, 1200)
    assert cfg.TRAIN.FREEZE_CONV_BODY is True
    assert cfg.WSL.DILATION == 2
    assert cfg.WEBLY.ENTROPY is True
    assert cfg.DEDUP_BOXES == 0.125
    assert isinstance(cfg.PIXEL_MEANS, np.ndarray)
    np.testing.assert_allclose(cfg.PIXEL_MEANS.ravel(), [103.939, 116.779, 123.68])


def test_real_reference_yaml_loads():
    ref_yaml = '/root/reference/configs/flickr_voc/na_wsddn_V-16-C5_1x.yaml'
    if not os.path.exists(ref_yaml):
        pytest.skip('reference not mounted')
    merge_cfg_from_file(ref_yaml)
    assert cfg.MODEL.TYPE == 'generalized_wsl'
    assert cfg.FAST_RCNN.ROI_BOX_HEAD == 'webly_heads.add_VGG16_roi_2fc_noise_head'
    assert cfg.TEST.PROPOSAL_LIMIT == 9999
    assert cfg.WSL.SAMPLE_ITER == 1280


def test_immutability():
    assert_and_infer_cfg()
    with pytest.raises(AttributeError):
        cfg.TRAIN.MAX_SIZE = 123
    cfg.immutable(False)
    cfg.TRAIN.MAX_SIZE = 123
    assert cfg.TRAIN.MAX_SIZE == 123


def test_deprecated_key_ignored():
    merge_cfg_from_list(['FINAL_MSG', 'x'])  # silently dropped
    assert 'FINAL_MSG' not in cfg


def test_renamed_key_raises():
    with pytest.raises(KeyError):
        merge_cfg_from_list(['EXAMPLE.RENAMED.KEY', '1'])


def test_dump_and_load_roundtrip():
    merge_cfg_from_list(['MODEL.NUM_CLASSES', '21'])
    s = dump_cfg()
    loaded = load_cfg(s)
    assert loaded.MODEL.NUM_CLASSES == 21


def test_get_output_dir(tmp_path):
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.MODEL.TYPE = 'generalized_wsl'
    d = core_config.get_output_dir(('voc_2007_test',), training=False)
    assert d == os.path.join(str(tmp_path), 'test', 'voc_2007_test', 'generalized_wsl')
    assert os.path.isdir(d)

"""The reference's ACTUAL YAML configs must load unchanged through our
config system — this is the public-surface compatibility contract
(SURVEY.md §5.6 / §7 'keep both formats')."""

import glob
import os

import pytest

from nafwebsod_tpu.core.config import (assert_and_infer_cfg, cfg,
                                       merge_cfg_from_file, reset_cfg)
from nafwebsod_tpu.models import detector

REF_CFG_DIR = '/root/reference/configs'

FLAGSHIPS = [
    'flickr_voc/na_wsddn_V-16-C5_1x.yaml',
    'flickr_clean/na_wsddn_V-16-C5_1x.yaml',
]


@pytest.fixture(autouse=True)
def fresh_cfg():
    reset_cfg()
    yield
    reset_cfg()


@pytest.mark.skipif(not os.path.isdir(REF_CFG_DIR),
                    reason='reference checkout not present')
class TestReferenceConfigs:
    @pytest.mark.parametrize('rel', FLAGSHIPS)
    def test_flagship_yaml_loads_and_builds_spec(self, rel):
        path = os.path.join(REF_CFG_DIR, rel)
        if not os.path.exists(path):
            pytest.skip(rel + ' not in reference')
        merge_cfg_from_file(path)
        assert cfg.MODEL.NUM_CLASSES == 21
        assert cfg.WEBLY.WEBLY_ON and cfg.WEBLY.ENTROPY
        assert cfg.TRAIN.BATCH_SIZE_PER_IM == 2048
        assert_and_infer_cfg(make_immutable=False)
        spec = detector.spec_from_cfg(cfg)
        assert spec.box_head == 'vgg16_2fc_noise'
        assert spec.dilation == 2 and spec.freeze_conv_body

    def test_all_wsl_config_dirs_mergeable(self):
        """Every flickr_*/voc_* WSL yaml in the reference merges without
        unknown-key errors (ignored upstream-only subtrees aside)."""
        pats = ['flickr_voc/*.yaml', 'flickr_clean/*.yaml',
                'flickr_coco/*.yaml', 'voc_2007/*wsddn*.yaml']
        n_ok = 0
        for pat in pats:
            for path in sorted(glob.glob(os.path.join(REF_CFG_DIR, pat))):
                reset_cfg()
                merge_cfg_from_file(path)
                n_ok += 1
        assert n_ok >= 2  # at least the flagship family loads

    def test_repo_config_loads(self):
        merge_cfg_from_file(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            'configs', 'flickr_voc', 'na_wsddn_V-16-C5_1x.yaml'))
        spec = detector.spec_from_cfg(cfg)
        assert spec.compute_dtype == 'bfloat16'


def test_reference_supervised_configs_build_specs():
    """The reference's e2e Faster R-CNN FPN and RetinaNet YAMLs produce
    buildable specs unchanged (round-2 supervised family)."""
    import os
    import pytest
    from nafwebsod_tpu.core import config as C
    from nafwebsod_tpu.models import detector

    cases = [
        ('getting_started/tutorial_1gpu_e2e_faster_rcnn_R-50-FPN.yaml',
         dict(faster_rcnn=True, conv_body='fpn_resnet50')),
        ('12_2017_baselines/e2e_faster_rcnn_R-50-FPN_1x.yaml',
         dict(faster_rcnn=True, conv_body='fpn_resnet50')),
        ('12_2017_baselines/e2e_faster_rcnn_R-50-C4_2x.yaml',
         dict(faster_rcnn=True, conv_body='resnet50_c4',
              box_head='res5_head', hidden_dim=2048)),
        ('12_2017_baselines/retinanet_R-50-FPN_1x.yaml',
         dict(retinanet=True, conv_body='fpn_resnet50')),
    ]
    root = '/root/reference/configs'
    for rel, expect in cases:
        path = os.path.join(root, rel)
        if not os.path.exists(path):
            pytest.skip('reference configs unavailable')
        C.reset_cfg()
        C.merge_cfg_from_file(path)
        spec = detector.spec_from_cfg(C.cfg)
        for k, v in expect.items():
            assert getattr(spec, k) == v, (rel, k, getattr(spec, k))
    C.reset_cfg()

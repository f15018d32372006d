"""FPN + RetinaNet-WSL tests: pyramid shapes/scales, stream softmax
semantics, loss flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nafwebsod_tpu.models import fpn, resnet, retinanet_wsl


class TestFPN:
    def test_levels_and_scales(self):
        spec_rng = jax.random.PRNGKey(0)
        params = resnet.init_params(spec_rng, 'resnet18', include_res5=True)
        dims = list(resnet.SHALLOW_STAGE_DIMS)
        params.update(fpn.init_params(jax.random.PRNGKey(1), dims, fpn_dim=32,
                                      min_level=3, max_level=7))
        x = jnp.zeros((1, 128, 128, 3))
        stages, _ = resnet.forward(params, x, 'resnet18', include_res5=True,
                                   return_stages=True)
        levels, scales = fpn.forward(params, stages, fpn_dim=32,
                                     min_level=3, max_level=7)
        assert sorted(levels) == [3, 4, 5, 6, 7]
        # P3 at 1/8: 128/8 = 16
        assert levels[3].shape == (1, 16, 16, 32)
        assert levels[7].shape == (1, 1, 1, 32)
        assert scales[3] == 1.0 / 8 and scales[5] == 1.0 / 32


class TestRetinaNetWSL:
    def test_forward_train_and_grads(self):
        spec = retinanet_wsl.RetinaNetWSLSpec(
            num_classes=5, depth='resnet18', fpn_dim=16, num_convs=2,
            min_level=4, max_level=6)
        params = retinanet_wsl.init_params(spec, jax.random.PRNGKey(0))

        rng = np.random.RandomState(0)
        image = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        labels = jnp.asarray(np.array([[1, 0, 0, 1]], np.float32))

        maps, img_scores = retinanet_wsl.forward(spec, params, image)
        assert sorted(maps) == [4, 5, 6]
        for lvl, m in maps.items():
            m = np.asarray(m)
            assert (m >= 0).all() and (m <= 1).all()
            # 'd'-stream: per-class scores over all positions sum to <= 1
            assert (m.sum(axis=(1, 2)) <= 1 + 1e-5).all()

        total, l = retinanet_wsl.forward_train(spec, params, image, labels)
        assert np.isfinite(float(total))
        assert 'cls_loss_fpn4' in l and 'cls_loss_fpn6' in l

        grads = jax.grad(lambda p: retinanet_wsl.forward_train(
            spec, p, image, labels)[0])(params)
        assert float(jnp.abs(grads['retnet_cls_pred_c_w']).max()) > 0
        assert float(jnp.abs(grads['fpn_inner5_w']).max()) > 0


class TestFPNRoIDistribution:
    def test_levels_and_restore(self):
        from nafwebsod_tpu.models.fpn import (distribute_rois_over_fpn_levels,
                                              map_rois_to_fpn_levels)
        rois = np.array([
            [0, 0, 0, 31, 31],      # tiny -> low level
            [0, 0, 0, 223, 223],    # canonical -> level 4
            [0, 0, 0, 899, 899],    # big -> high level
        ], np.float32)
        lvls = map_rois_to_fpn_levels(rois[:, 1:5], 2, 5)
        assert lvls[0] == 2 and lvls[1] == 4 and lvls[2] == 5

        per_level, restore = distribute_rois_over_fpn_levels(rois, 2, 5)
        cat = np.vstack([per_level[l] for l in range(2, 6)])
        np.testing.assert_array_equal(cat[restore], rois)

"""Model assembly tests: WSDDN/webly forward, padding invariance, loss/grads,
and pkl checkpoint compatibility (aliasing + layout conversion)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nafwebsod_tpu.models import detector, heads, vgg16
from nafwebsod_tpu.utils import checkpoint as ckpt


SPEC = detector.ModelSpec(num_classes=21)
SPEC_WSL = detector.ModelSpec(num_classes=21, box_head='vgg16_2fc',
                              webly_on=False, webly_entropy=False)


def _make_inputs(rng_seed=0, R=24, H=64, W=96, pad=8):
    rng = np.random.RandomState(rng_seed)
    image = rng.randn(1, H, W, 3).astype(np.float32) * 10
    x1 = rng.uniform(0, W - 20, R)
    y1 = rng.uniform(0, H - 20, R)
    x2 = np.minimum(x1 + rng.uniform(10, 60, R), W - 1)
    y2 = np.minimum(y1 + rng.uniform(10, 60, R), H - 1)
    rois = np.stack([np.zeros(R), x1, y1, x2, y2], 1).astype(np.float32)
    obn = rng.uniform(0.5, 1.5, (R, 1)).astype(np.float32)
    valid = np.ones(R, bool)
    if pad:
        rois = np.concatenate([rois, np.zeros((pad, 5), np.float32)])
        obn = np.concatenate([obn, np.zeros((pad, 1), np.float32)])
        valid = np.concatenate([valid, np.zeros(pad, bool)])
    return image, rois, obn, valid


@pytest.fixture(scope='module')
def params():
    return detector.init_params(SPEC, jax.random.PRNGKey(0))


class TestForward:
    def test_shapes_and_ranges(self, params):
        image, rois, obn, valid = _make_inputs()
        out = detector.forward_test(SPEC, params, jnp.array(image),
                                    jnp.array(rois), jnp.array(obn),
                                    jnp.array(valid))
        R = rois.shape[0]
        assert out['scores'].shape == (R, 21)       # with bg column
        assert out['rois_pred'].shape == (R, 20)
        rp = np.asarray(out['rois_pred'])
        assert (rp >= 0).all() and (rp <= 1).all()
        # per-class sum over RoIs <= 1 (alpha_det is a distribution over RoIs)
        assert (rp.sum(axis=0) <= 1 + 1e-5).all()
        # padded rows zero
        assert rp[24:].sum() == 0
        # bg column duplicates first class column
        sc = np.asarray(out['scores'])
        np.testing.assert_array_equal(sc[:, 0], sc[:, 1])

    def test_padding_invariance(self, params):
        image, rois, obn, valid = _make_inputs(pad=0)
        out0 = detector.forward_test(SPEC, params, jnp.array(image),
                                     jnp.array(rois), jnp.array(obn),
                                     jnp.array(valid))
        image, rois_p, obn_p, valid_p = _make_inputs(pad=16)
        out1 = detector.forward_test(SPEC, params, jnp.array(image),
                                     jnp.array(rois_p), jnp.array(obn_p),
                                     jnp.array(valid_p))
        np.testing.assert_allclose(np.asarray(out1['rois_pred'])[:24],
                                   np.asarray(out0['rois_pred']),
                                   rtol=1e-4, atol=1e-6)

    def test_wsl_head_variant(self):
        p = detector.init_params(SPEC_WSL, jax.random.PRNGKey(1))
        assert '_[noisy]_fc6_w' not in p
        image, rois, obn, valid = _make_inputs()
        out = detector.forward_test(SPEC_WSL, p, jnp.array(image),
                                    jnp.array(rois), jnp.array(obn),
                                    jnp.array(valid))
        assert out['scores'].shape == (rois.shape[0], 21)


class TestTrainLoss:
    def _batch(self):
        image, rois, obn, valid = _make_inputs()
        labels = np.zeros((1, 20), np.float32)
        labels[0, [3, 7]] = 1
        return {
            'image': jnp.array(image),
            'rois': jnp.array(rois),
            'obn_scores': jnp.array(obn),
            'labels_oh': jnp.array(labels),
            'valid_mask': jnp.array(valid),
        }

    def test_loss_finite_and_components(self, params):
        total, aux = detector.forward_train(SPEC, params, self._batch(),
                                            jax.random.PRNGKey(2))
        assert np.isfinite(float(total))
        assert 'loss_cls' in aux and 'loss_cls_noise' in aux
        assert float(aux['loss_cls']) > 0

    def test_grads_respect_freeze(self, params):
        batch = self._batch()

        def loss_fn(p):
            return detector.forward_train(SPEC, p, batch,
                                          jax.random.PRNGKey(3))[0]

        grads = jax.grad(loss_fn)(params)
        # conv body frozen -> zero grads
        assert float(jnp.abs(grads['conv5_3_w']).max()) == 0.0
        assert float(jnp.abs(grads['conv1_1_w']).max()) == 0.0
        # heads learn
        assert float(jnp.abs(grads['fc8c_w']).max()) > 0
        assert float(jnp.abs(grads['fc6_w']).max()) > 0
        assert float(jnp.abs(grads['noisy_fc8c_w']).max()) > 0
        assert float(jnp.abs(grads['_[noisy]_fc6_w']).max()) > 0


class TestCheckpoint:
    def test_roundtrip_and_aliasing(self, tmp_path, params):
        # save only the clean tower; reload into a fresh model and check the
        # noisy tower is shared-initialized from the clean weights
        pkl_path = str(tmp_path / 'w.pkl')
        save_names = {k: v for k, v in params.items()
                      if not k.startswith('_[') and not k.startswith('noisy_')}
        ckpt.save_params_to_weights_file(pkl_path, save_names)

        fresh = detector.init_params(SPEC, jax.random.PRNGKey(9))
        loaded, momentum, unmatched = ckpt.initialize_params_from_weights_file(
            fresh, pkl_path)
        np.testing.assert_allclose(np.asarray(loaded['fc6_w']),
                                   np.asarray(params['fc6_w']))
        np.testing.assert_allclose(np.asarray(loaded['_[noisy]_fc6_w']),
                                   np.asarray(params['fc6_w']))
        np.testing.assert_allclose(np.asarray(loaded['conv3_2_w']),
                                   np.asarray(params['conv3_2_w']))
        # noisy fc8 layers have no alias source -> stay at their fresh init
        assert 'noisy_fc8c_w' in unmatched

    def test_pkl_layouts_are_caffe2(self, tmp_path, params):
        pkl_path = str(tmp_path / 'w2.pkl')
        ckpt.save_params_to_weights_file(pkl_path, params)
        blobs, _ = ckpt.load_weights_pkl(pkl_path)
        # conv: OIHW; fc: (out, in)
        assert blobs['conv1_1_w'].shape == (64, 3, 3, 3)
        assert blobs['fc6_w'].shape == (4096, 512 * 7 * 7)
        assert blobs['fc8c_w'].shape == (20, 4096)

    def test_momentum_roundtrip(self, tmp_path, params):
        pkl_path = str(tmp_path / 'w3.pkl')
        momentum = {'fc8c_w': np.ones_like(np.asarray(params['fc8c_w']))}
        ckpt.save_params_to_weights_file(pkl_path, params, momentum=momentum)
        loaded, mom, _ = ckpt.initialize_params_from_weights_file(
            dict(params), pkl_path)
        assert 'fc8c_w' in mom
        np.testing.assert_allclose(mom['fc8c_w'], 1.0)

    def test_auto_resume_scan(self, tmp_path):
        d = str(tmp_path)
        assert ckpt.find_checkpoint_for_resume(d) == (None, 0)
        open(tmp_path / 'model_iter199.pkl', 'w').close()
        open(tmp_path / 'model_iter1999.pkl', 'w').close()
        path, start = ckpt.find_checkpoint_for_resume(d)
        assert path.endswith('model_iter1999.pkl') and start == 2000
        open(tmp_path / 'model_final.pkl', 'w').close()
        path, start = ckpt.find_checkpoint_for_resume(d)
        assert path.endswith('model_final.pkl') and start is None


class TestVGGBody:
    def test_feature_shape_dilated(self):
        p = vgg16.init_params(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 64, 96, 3))
        feat, scale = vgg16.forward(p, x, dilation=2)
        assert scale == 0.125
        assert feat.shape == (1, 7, 11, 512)
        assert vgg16.feature_shape(64, 96, 2) == (7, 11)

    def test_feature_shape_standard(self):
        p = vgg16.init_params(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 64, 96, 3))
        feat, scale = vgg16.forward(p, x, dilation=1)
        assert scale == 1.0 / 16.0
        assert feat.shape == (1, 4, 6, 512)


def test_fused_fc7_matches_unfused():
    """TPU.FUSED_FC7 (batched fc7 einsum across the two towers) is
    numerically identical to the per-tower GEMMs (dropout off)."""
    import dataclasses
    from nafwebsod_tpu.models import detector as det

    spec = det.ModelSpec(num_classes=5, hidden_dim=16,
                         compute_dtype='float32')
    params = det.init_params(spec, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    r = 16
    x1 = rng.uniform(0, 30, r)
    y1 = rng.uniform(0, 30, r)
    labels = np.zeros((1, 4), np.float32)
    labels[0, [0, 2]] = 1
    batch = {
        'image': jnp.asarray(rng.randn(1, 48, 48, 3).astype(np.float32)),
        'rois': jnp.asarray(np.stack(
            [np.zeros(r), x1, y1, x1 + rng.uniform(8, 17, r),
             y1 + rng.uniform(8, 17, r)], 1).astype(np.float32)),
        'obn_scores': jnp.asarray(rng.rand(r, 1).astype(np.float32) + 1),
        'labels_oh': jnp.asarray(labels),
        'valid_mask': jnp.asarray(np.ones(r, bool)),
    }
    spec_f = dataclasses.replace(spec, fused_fc7=True)
    loss, _ = det.forward_train(spec, params, batch, None)
    loss_f, _ = det.forward_train(spec_f, params, batch, None)
    np.testing.assert_allclose(float(loss_f), float(loss), rtol=1e-6)

    out = det.forward_test(spec, params, batch['image'], batch['rois'],
                           batch['obn_scores'], batch['valid_mask'])
    out_f = det.forward_test(spec_f, params, batch['image'], batch['rois'],
                             batch['obn_scores'], batch['valid_mask'])
    np.testing.assert_allclose(np.asarray(out_f['scores']),
                               np.asarray(out['scores']), rtol=1e-5,
                               atol=1e-7)


def test_remat_body_matches_plain_grads():
    """TPU.REMAT_BODY (jax.checkpoint around the conv body) must not change
    values or gradients — it only changes what backward stores."""
    import dataclasses
    from nafwebsod_tpu.models import detector as det

    spec = det.ModelSpec(num_classes=5, hidden_dim=16,
                         compute_dtype='float32', freeze_conv_body=False,
                         freeze_at=0)
    spec_r = dataclasses.replace(spec, remat_body=True)
    params = det.init_params(spec, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    r = 16
    x1 = rng.uniform(0, 30, r)
    y1 = rng.uniform(0, 30, r)
    labels = np.zeros((1, 4), np.float32)
    labels[0, [0, 2]] = 1
    batch = {
        'image': jnp.asarray(rng.randn(1, 48, 48, 3).astype(np.float32)),
        'rois': jnp.asarray(np.stack(
            [np.zeros(r), x1, y1, x1 + rng.uniform(8, 17, r),
             y1 + rng.uniform(8, 17, r)], 1).astype(np.float32)),
        'obn_scores': jnp.asarray(rng.rand(r, 1).astype(np.float32) + 1),
        'labels_oh': jnp.asarray(labels),
        'valid_mask': jnp.asarray(np.ones(r, bool)),
    }

    def loss(s, p):
        return det.forward_train(s, p, batch, None)[0]

    (l0, g0) = jax.value_and_grad(lambda p: loss(spec, p))(params)
    (l1, g1) = jax.value_and_grad(lambda p: loss(spec_r, p))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    # the body grads are the point: they flow through the checkpoint
    for k in ('conv1_1_w', 'conv5_3_w', 'fc6_w'):
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g0[k]),
                                   rtol=1e-5, atol=1e-8, err_msg=k)


def test_remat_body_fpn_matches_plain():
    import dataclasses
    from nafwebsod_tpu.models import detector as det

    spec = det.ModelSpec(num_classes=5, hidden_dim=16,
                         compute_dtype='float32',
                         conv_body='fpn_resnet18', fpn_dim=16,
                         freeze_conv_body=False, freeze_at=0)
    spec_r = dataclasses.replace(spec, remat_body=True)
    params = det.init_params(spec, jax.random.PRNGKey(0))
    image = jnp.asarray(
        np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32))

    def s_loss(s, p):
        levels, scales = det.body_forward_fpn(s, p, image)
        return sum(jnp.sum(v.astype(jnp.float32) ** 2)
                   for v in levels.values()), scales

    (l0, sc0), g0 = jax.value_and_grad(
        lambda p: s_loss(spec, p), has_aux=True)(params)
    (l1, sc1), g1 = jax.value_and_grad(
        lambda p: s_loss(spec_r, p), has_aux=True)(params)
    assert sc0 == sc1
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    some = [k for k in g0 if np.asarray(g0[k]).size][:5]
    for k in some:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g0[k]),
                                   rtol=1e-5, atol=1e-8, err_msg=k)

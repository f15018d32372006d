"""ResNet / VGG_CNN_M backbone tests: shapes, strides, frozen-BN semantics,
and end-to-end WSL model integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nafwebsod_tpu.models import detector, resnet, vgg_cnn_m


class TestResNetBody:
    def test_conv4_shapes_and_stride(self):
        params = resnet.init_params(jax.random.PRNGKey(0), 'resnet50',
                                    include_res5=False)
        x = jnp.zeros((1, 64, 96, 3))
        feat, dim, scale = resnet.forward(params, x, 'resnet50')
        assert dim == 1024 and scale == 1.0 / 16.0
        assert feat.shape == (1, 4, 6, 1024)

    def test_conv5_dilation(self):
        params = resnet.init_params(jax.random.PRNGKey(0), 'resnet50',
                                    include_res5=True)
        x = jnp.zeros((1, 64, 64, 3))
        feat, dim, scale = resnet.forward(params, x, 'resnet50',
                                          include_res5=True, res5_dilation=2)
        assert dim == 2048 and scale == pytest.approx(1.0 / 16.0)
        assert feat.shape == (1, 4, 4, 2048)

    def test_affine_channel_semantics(self):
        """AffineChannel is a pure scale/shift (frozen BN): doubling bn_s
        must double the stem activations pre-relu."""
        params = resnet.init_params(jax.random.PRNGKey(1), 'resnet50')
        x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3)
                        .astype(np.float32))
        f1, _, _ = resnet.forward(params, x, 'resnet50')
        params2 = dict(params)
        params2['res2_0_branch2c_bn_b'] = (
            params['res2_0_branch2c_bn_b'] + 100.0)
        f2, _, _ = resnet.forward(params2, x, 'resnet50')
        assert not np.allclose(np.asarray(f1), np.asarray(f2))

    def test_param_names_match_detectron_convention(self):
        shapes = resnet.param_shapes('resnet50', include_res5=True)
        assert 'res2_0_branch1_w' in shapes
        assert 'res5_2_branch2c_bn_s' in shapes
        assert shapes['res3_0_branch2b_w'] == (3, 3, 128, 128)


class TestVGGCNNM:
    def test_shapes(self):
        params = vgg_cnn_m.init_params(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 224, 224, 3))
        feat, dim, scale = vgg_cnn_m.forward(params, x)
        assert dim == 512 and scale == 1.0 / 16.0
        assert feat.shape[3] == 512

    def test_lrn_reduces_magnitude(self):
        x = jnp.ones((1, 4, 4, 8)) * 2.0
        y = vgg_cnn_m._lrn(x)
        assert float(jnp.max(y)) < 2.0


class TestResNetWSLModel:
    def test_forward_train_resnet50_c4(self):
        spec = detector.ModelSpec(
            num_classes=5, conv_body='resnet50_c4', box_head='vgg16_2fc',
            webly_on=False, webly_entropy=False, hidden_dim=16,
            roi_resolution=7)
        params = detector.init_params(spec, jax.random.PRNGKey(0))
        # fc6 sized by the 1024-d body
        assert params['fc6_w'].shape == (1024 * 49, 16)

        rng = np.random.RandomState(0)
        R = 6
        x1 = rng.uniform(0, 20, R)
        y1 = rng.uniform(0, 20, R)
        labels = np.zeros((1, 4), np.float32)
        labels[0, 2] = 1
        batch = {
            'image': jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32)),
            'rois': jnp.asarray(np.stack(
                [np.zeros(R), x1, y1, x1 + 20, y1 + 20], 1).astype(
                    np.float32)),
            'obn_scores': jnp.asarray(rng.rand(R, 1).astype(np.float32)),
            'labels_oh': jnp.asarray(labels),
            'valid_mask': jnp.ones((R,), bool),
        }
        total, aux = detector.forward_train(spec, params, batch,
                                            jax.random.PRNGKey(1))
        assert np.isfinite(float(total))

        # frozen body: no res-block grads; head learns
        trainable = detector.trainable_param_names(spec, params)
        assert 'res4_0_branch2a_w' not in trainable
        assert 'fc8c_w' in trainable
        grads = jax.grad(lambda p: detector.forward_train(
            spec, p, batch, jax.random.PRNGKey(1))[0])(params)
        assert float(jnp.abs(grads['fc8c_w']).max()) > 0


def test_resnext_grouped_bottleneck():
    """Grouped 3x3 (ResNeXt) bottleneck: block-diagonal equivalence — the
    grouped conv must equal per-group dense convs."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from nafwebsod_tpu.models import resnet

    rng = np.random.RandomState(0)
    g, cin_pg, cout = 4, 3, 12   # dim_inner 12, 4 groups
    x = jnp.asarray(rng.randn(1, 6, 6, g * cin_pg), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, cin_pg, cout), jnp.float32)
    y = resnet._conv(x, w, groups=g)
    # per-group dense reference
    outs = []
    per_out = cout // g
    for i in range(g):
        xi = x[..., i * cin_pg:(i + 1) * cin_pg]
        wi = w[..., i * per_out:(i + 1) * per_out]
        outs.append(resnet._conv(xi, wi))
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(jnp.concatenate(outs, -1)),
                               rtol=2e-5, atol=2e-5)


def test_resnext_param_shapes():
    from nafwebsod_tpu.models import resnet
    s = resnet.param_shapes('resnet101', include_res5=True, num_groups=32,
                            width_per_group=8)
    # X-101-32x8d: dim_inner = 256/512/1024/2048; grouped branch2b filters
    assert s['res2_0_branch2b_w'] == (3, 3, 8, 256)
    assert s['res3_0_branch2b_w'] == (3, 3, 16, 512)
    assert s['res5_0_branch2b_w'] == (3, 3, 64, 2048)
    assert s['res5_0_branch2c_w'] == (1, 1, 2048, 2048)


class TestMaxPoolVJP:
    """The VGG16 2x2 maxpool custom VJP must match XLA's reduce_window
    backward (SelectAndScatter GE-select = first-max routing): bit-equal
    for the non-overlapping stride-2 pools, <=1-ULP summation-order
    difference for the overlapping stride-1 pool4 (PARITY.md)."""

    @staticmethod
    def _raw(x, stride):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 2, 2, 1),
            window_strides=(1, stride, stride, 1),
            padding='VALID')

    @pytest.mark.parametrize('hw', [(8, 10), (9, 11)])
    @pytest.mark.parametrize('stride', [2, 1])
    @pytest.mark.parametrize('ties', ['none', 'relu_zeros', 'rounded'])
    def test_matches_xla_backward(self, stride, ties, hw):
        from nafwebsod_tpu.models import vgg16
        seed = (stride * 100 + ['none', 'relu_zeros', 'rounded'].index(ties)
                * 10 + hw[0])
        rng = np.random.RandomState(seed)
        x = rng.randn(1, hw[0], hw[1], 3).astype(np.float32)
        if ties == 'relu_zeros':
            x = np.maximum(x, 0.0)
        elif ties == 'rounded':
            x = np.round(x)
        x = jnp.asarray(x)
        y_ref = self._raw(x, stride)
        g = jnp.asarray(rng.randn(*y_ref.shape).astype(np.float32))
        y = vgg16._maxpool(x, stride)
        assert jnp.array_equal(y, y_ref)
        _, vjp_new = jax.vjp(lambda a: vgg16._maxpool(a, stride), x)
        _, vjp_ref = jax.vjp(lambda a: self._raw(a, stride), x)
        dn, dr = vjp_new(g)[0], vjp_ref(g)[0]
        if stride == 2:
            assert jnp.array_equal(dn, dr)
        else:
            np.testing.assert_allclose(np.asarray(dn), np.asarray(dr),
                                       rtol=0, atol=1e-6)

    def test_bf16_bit_equal(self):
        from nafwebsod_tpu.models import vgg16
        rng = np.random.RandomState(3)
        x = jnp.asarray(np.maximum(rng.randn(1, 8, 8, 4), 0), jnp.bfloat16)
        g = jnp.asarray(rng.randn(1, 4, 4, 4), jnp.bfloat16)
        _, vjp_new = jax.vjp(lambda a: vgg16._maxpool(a, 2), x)
        _, vjp_ref = jax.vjp(lambda a: self._raw(a, 2), x)
        assert jnp.array_equal(vjp_new(g)[0], vjp_ref(g)[0])

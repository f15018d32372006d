"""Cross-round numeric-drift guard: the flagship forward/loss on fixed
seeds must keep matching the stored golden fixture (SURVEY §7 tolerance
ladder — catches unintended numeric changes from refactors; regenerate the
fixture ONLY for deliberate, documented numeric changes)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from nafwebsod_tpu.models import detector

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'golden',
                      'flagship_forward.npz')


def _fixed_inputs(num_classes=5, h=48, w=64, r=10):
    rng = np.random.RandomState(123)
    image = rng.randn(1, h, w, 3).astype(np.float32)
    x1 = rng.uniform(0, w - 20, r)
    y1 = rng.uniform(0, h - 20, r)
    rois = np.stack([np.zeros(r), x1, y1,
                     np.minimum(x1 + 16, w - 1),
                     np.minimum(y1 + 16, h - 1)], 1).astype(np.float32)
    obn = (rng.rand(r, 1) + 1).astype(np.float32)
    labels = np.zeros((1, num_classes - 1), np.float32)
    labels[0, 1] = 1
    return image, rois, obn, labels


def test_flagship_forward_matches_golden():
    g = np.load(GOLDEN)
    spec = detector.ModelSpec(num_classes=5, hidden_dim=8,
                              compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))
    image, rois, obn, labels = _fixed_inputs()
    out = detector.forward_test(
        spec, params, jnp.asarray(image), jnp.asarray(rois),
        jnp.asarray(obn), jnp.ones((10,), bool))
    np.testing.assert_allclose(np.asarray(out['scores']), g['scores'],
                               rtol=1e-4, atol=1e-5)

    batch = {'image': jnp.asarray(image), 'rois': jnp.asarray(rois),
             'obn_scores': jnp.asarray(obn), 'labels_oh': jnp.asarray(labels),
             'valid_mask': jnp.ones((10,), bool)}
    loss, aux = detector.forward_train(spec, params, batch,
                                       jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(loss), float(g['loss']), rtol=1e-4)
    np.testing.assert_allclose(float(aux['loss_cls']), float(g['loss_cls']),
                               rtol=1e-4)
    np.testing.assert_allclose(float(aux['loss_cls_noise']),
                               float(g['loss_cls_noise']), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(float(aux['class_weight_mean']),
                               float(g['cw_mean']), rtol=1e-4)

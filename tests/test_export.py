"""StableHLO deploy export (tools/export_model.py, the convert_pkl_to_pb
equivalent): the serialized artifact must deserialize and reproduce the
live forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import export as jax_export

from nafwebsod_tpu.models import detector
from nafwebsod_tpu.ops import roi_pool as roi_pool_ops


@pytest.fixture(autouse=True)
def _portable_ops():
    # export cannot serialize FFI/Pallas custom calls (tools/export_model.py
    # sets the same switch)
    roi_pool_ops.set_portable_ops(True)
    yield
    roi_pool_ops.set_portable_ops(False)


def test_stablehlo_export_roundtrip():
    spec = detector.ModelSpec(num_classes=5, hidden_dim=16,
                              compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))

    def fn(params, image, rois, obn_scores, valid_mask):
        return detector.forward_test(spec, params, image, rois, obn_scores,
                                     valid_mask)['scores']

    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(1, 48, 48, 3).astype(np.float32))
    r = 16
    x1 = rng.uniform(0, 30, r)
    y1 = rng.uniform(0, 30, r)
    rois = jnp.asarray(np.stack(
        [np.zeros(r), x1, y1, x1 + 12, y1 + 12], 1).astype(np.float32))
    obn = jnp.asarray(rng.rand(r, 1).astype(np.float32) + 1)
    valid = jnp.ones((r,), bool)

    shapes = tuple(jax.tree.map(
        lambda p: jax.ShapeDtypeStruct(np.shape(p), np.asarray(p).dtype),
        (params, image, rois, obn, valid)))
    exported = jax_export.export(jax.jit(fn))(*shapes)
    blob = exported.serialize()
    assert len(blob) > 1000

    rehydrated = jax_export.deserialize(blob)
    out = rehydrated.call(params, image, rois, obn, valid)
    ref = fn(params, image, rois, obn, valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_tf_savedmodel_roundtrip(tmp_path):
    """--format savedmodel (utils/deploy.py): the saved TF module must load
    back and reproduce the live jax forward with its embedded weights."""
    tf = pytest.importorskip('tensorflow')

    spec = detector.ModelSpec(num_classes=5, hidden_dim=16,
                              compute_dtype='float32')
    params = detector.init_params(spec, jax.random.PRNGKey(0))

    def fn(params, image, rois, obn_scores, valid_mask):
        return detector.forward_test(spec, params, image, rois, obn_scores,
                                     valid_mask)['scores']

    rng = np.random.RandomState(0)
    image = rng.randn(1, 48, 48, 3).astype(np.float32)
    r = 16
    x1 = rng.uniform(0, 30, r)
    y1 = rng.uniform(0, 30, r)
    rois = np.stack([np.zeros(r), x1, y1, x1 + 12, y1 + 12],
                    1).astype(np.float32)
    obn = (rng.rand(r, 1).astype(np.float32) + 1)
    valid = np.ones((r,), bool)

    shapes = tuple(jax.tree.map(
        lambda p: jax.ShapeDtypeStruct(np.shape(p), np.asarray(p).dtype),
        (image, rois, obn, valid)))
    from nafwebsod_tpu.utils import deploy
    out_dir = str(tmp_path / 'savedmodel')
    deploy.export_tf_savedmodel(fn, params, shapes, out_dir)

    loaded = tf.saved_model.load(out_dir)
    got = loaded.signatures['serving_default'](
        input_0=tf.constant(image), input_1=tf.constant(rois),
        input_2=tf.constant(obn), input_3=tf.constant(valid))
    (tf_out,) = got.values()
    ref = fn(params, jnp.asarray(image), jnp.asarray(rois),
             jnp.asarray(obn), jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(tf_out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

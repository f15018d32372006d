"""Deploy-artifact serialization (the ``tools/convert_pkl_to_pb.py`` layer).

The reference exports a deployable Caffe2 protobuf pair
(``/root/reference/tools/convert_pkl_to_pb.py``); the TPU-native analogues
are:

  * ``export_stablehlo`` — ``jax.export`` serialization of the jitted
    forward: a portable StableHLO module any XLA runtime loads without
    Python (used by ``tools/export_model.py`` since round 2);
  * ``export_tf_savedmodel`` — a self-contained TF SavedModel via
    ``jax2tf`` with the weights embedded as ``tf.Variable``s, for
    TF-Serving-style infrastructure. Gated on tensorflow being importable
    (it is not a framework dependency).

Both lower the portable op path — the caller must have switched
``ops/roi_pool.set_portable_ops(True)`` first, since Pallas
``tpu_custom_call`` / CPU FFI custom calls carry no serialization
compatibility guarantee.
"""

import numpy as np


def export_stablehlo(fn, params, example_shapes):
    """Serialize ``fn(params, *inputs)`` to StableHLO bytes.

    ``example_shapes``: ShapeDtypeStructs for the non-param inputs.
    """
    import jax
    from jax import export as jax_export

    param_shapes = jax.tree.map(
        lambda p: jax.ShapeDtypeStruct(np.shape(p), np.asarray(p).dtype),
        params)
    exported = jax_export.export(jax.jit(fn))(param_shapes, *example_shapes)
    return exported.serialize(), exported


def export_tf_savedmodel(fn, params, example_shapes, out_dir):
    """Write a TF SavedModel wrapping ``fn`` with ``params`` as variables.

    The signature takes the non-param inputs in order; weights live inside
    the SavedModel so serving needs no pkl. Returns the loaded-module check
    handle (tf.Module) for optional further use.
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    # TF root scope names must start with a letter/digit — the reference's
    # '_[noisy]_'-aliased names get a 'v_' prefix and bracket scrub
    tf_params = {
        k: tf.Variable(np.asarray(v),
                       name='v_' + k.replace('[', '').replace(']', ''))
        for k, v in params.items()}
    conv = jax2tf.convert(fn, with_gradient=False)

    specs = [tf.TensorSpec(s.shape, tf.dtypes.as_dtype(np.dtype(s.dtype)),
                           name='input_{}'.format(i))
             for i, s in enumerate(example_shapes)]

    @tf.function(autograph=False, input_signature=specs)
    def serving(*inputs):
        return conv({k: v for k, v in tf_params.items()}, *inputs)

    module = tf.Module()
    module.params = tf_params
    module.serve = serving
    tf.saved_model.save(module, out_dir,
                        signatures={'serving_default': serving})
    return module

"""Accuracy-parity scaffolding without real data (SURVEY §7 tolerance
ladder): prove the Caffe2 checkpoint boundary end-to-end by writing a
synthetic .caffemodel protobuf, converting it with
tools/pickle_caffe_blobs.py, loading the pkl through utils/checkpoint's
aliasing into a live model, and asserting forward equivalence against the
directly-initialized parameters."""

import importlib.util
import os
import struct
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nafwebsod_tpu.models import detector
from nafwebsod_tpu.utils import checkpoint as ckpt

_TOOL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tools', 'pickle_caffe_blobs.py')
_spec = importlib.util.spec_from_file_location('pickle_caffe_blobs', _TOOL)
pcb = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(pcb)


# --------------------------------------------------------------------------- #
# Minimal protobuf writer (the inverse of the tool's wire reader)
# --------------------------------------------------------------------------- #

def _varint(n):
    out = b''
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(field, wire):
    return _varint((field << 3) | wire)


def _len_delim(field, payload):
    return _tag(field, 2) + _varint(len(payload)) + payload


def _blob_proto(arr, legacy_dims=False):
    arr = np.asarray(arr, np.float32)
    data = arr.astype('<f4').tobytes()
    if legacy_dims:
        # V1 num/channels/height/width scalar fields (1-4): pad the shape
        # to 4-D with leading 1s, exactly how 2014-era caffemodels (e.g.
        # VGG_ILSVRC_16_layers) encode biases as (1, 1, 1, N)
        shape4 = (1,) * (4 - arr.ndim) + arr.shape
        hdr = b''.join(_tag(i + 1, 0) + _varint(int(d))
                       for i, d in enumerate(shape4))
        return hdr + _len_delim(5, data)
    dims = b''.join(_varint(int(d)) for d in arr.shape)
    shape_payload = _tag(1, 2) + _varint(len(dims)) + dims
    return (_len_delim(7, shape_payload) +      # shape = field 7
            _len_delim(5, data))                # packed float data = field 5


def _layer(name, blobs, v1, legacy_dims=False):
    name_field = 4 if v1 else 1
    blobs_field = 6 if v1 else 7
    payload = _len_delim(name_field, name.encode())
    for b in blobs:
        payload += _len_delim(blobs_field,
                              _blob_proto(b, legacy_dims=legacy_dims))
    return payload


def write_caffemodel(path, layers, v1=False, legacy_dims=False):
    """layers: {name: [blob arrays]} in Caffe layouts (OIHW / (out, in)).
    ``legacy_dims`` encodes blob shapes via the V1 num/channels/height/width
    scalars instead of BlobShape (2014-era caffemodels)."""
    field = 2 if v1 else 100
    buf = b''
    for name, blobs in layers.items():
        buf += _len_delim(field, _layer(name, blobs, v1,
                                        legacy_dims=legacy_dims))
    with open(path, 'wb') as f:
        f.write(buf)


def _params_to_caffe_layers(params):
    layers = {}
    for name in params:
        if name.endswith('_w'):
            base = name[:-2]
            if base.startswith('_['):
                continue  # aliased towers are not in caffe checkpoints
            w = ckpt._internal_to_pkl(name, params[name])
            b = np.asarray(params.get(base + '_b', np.zeros(w.shape[0])))
            layers[base] = [w, b]
    return layers


@pytest.mark.parametrize('v1,legacy_dims',
                         [(False, False), (True, False), (True, True)])
def test_caffemodel_roundtrip_to_forward(tmp_path, v1, legacy_dims):
    spec = detector.ModelSpec(num_classes=4, hidden_dim=8,
                              compute_dtype='float32')
    params0 = detector.init_params(spec, jax.random.PRNGKey(0))
    params0 = {k: np.asarray(v) for k, v in params0.items()}

    # 1. synthesize the caffemodel from the reference layouts
    # (legacy_dims: V1 num/... scalar shapes — biases arrive (1, 1, 1, N)
    # like the real VGG_ILSVRC_16_layers.caffemodel)
    cm = str(tmp_path / 'net.caffemodel')
    write_caffemodel(cm, _params_to_caffe_layers(params0), v1=v1,
                     legacy_dims=legacy_dims)

    # 2. tool conversion: caffemodel -> pkl blobs
    layers = pcb.parse_caffemodel(cm)
    blobs = {}
    for name, layer_blobs in layers.items():
        for blob, suffix in zip(layer_blobs, ['_w', '_b']):
            blobs[name + suffix] = np.asarray(blob, np.float32)
    pkl = str(tmp_path / 'weights.pkl')
    from nafwebsod_tpu.utils.io import save_object
    save_object({'blobs': blobs}, pkl)

    # every non-aliased param must have made it through the wire format
    for name, arr in params0.items():
        if name.startswith('_['):
            continue
        src = ckpt._internal_to_pkl(name, arr)
        np.testing.assert_array_equal(
            blobs[name], src, err_msg=name)

    # 3. load into a DIFFERENTLY-initialized model via checkpoint aliasing
    params1 = detector.init_params(spec, jax.random.PRNGKey(42))
    loaded, momentum, unmatched = ckpt.initialize_params_from_weights_file(
        params1, pkl)
    assert not unmatched, unmatched

    # the noisy tower must alias the clean fc6/fc7 weights
    np.testing.assert_array_equal(np.asarray(loaded['_[noisy]_fc6_w']),
                                  params0['fc6_w'])
    np.testing.assert_array_equal(np.asarray(loaded['_[noisy]_fc7_b']),
                                  params0['fc7_b'])

    # 4. forward equivalence vs the directly-initialized params with the
    #    aliasing applied by hand
    expect = dict(params0)
    for k in list(expect):
        if k.startswith('_[noisy]_'):
            expect[k] = params0[k.replace('_[noisy]_', '')]

    rng = np.random.RandomState(1)
    image = jnp.asarray(rng.randn(1, 48, 48, 3), jnp.float32)
    rois = np.zeros((6, 5), np.float32)
    rois[:, 1:3] = rng.rand(6, 2) * 16
    rois[:, 3:5] = rois[:, 1:3] + 16
    obn = jnp.asarray(rng.rand(6, 1) + 1.0, jnp.float32)
    valid = jnp.ones((6,), bool)

    out_a = detector.forward_test(spec, loaded, image, jnp.asarray(rois),
                                  obn, valid)
    out_b = detector.forward_test(spec, expect, image, jnp.asarray(rois),
                                  obn, valid)
    np.testing.assert_allclose(np.asarray(out_a['scores']),
                               np.asarray(out_b['scores']), rtol=0, atol=0)


def test_pkl_save_load_momentum_identity(tmp_path):
    """save_params_to_weights_file -> initialize_params_from_weights_file is
    the identity on params AND momentum through the layout translation."""
    spec = detector.ModelSpec(num_classes=4, hidden_dim=8,
                              compute_dtype='float32')
    params = {k: np.asarray(v) for k, v in
              detector.init_params(spec, jax.random.PRNGKey(7)).items()}
    momentum = {k: np.full_like(v, 0.25) + np.arange(v.size).reshape(
        v.shape).astype(v.dtype) * 1e-3 for k, v in params.items()}
    path = str(tmp_path / 'ckpt.pkl')
    ckpt.save_params_to_weights_file(path, params, momentum=momentum,
                                     cfg_yaml='X: 1\n')
    fresh = detector.init_params(spec, jax.random.PRNGKey(8))
    loaded, mom, unmatched = ckpt.initialize_params_from_weights_file(
        fresh, path)
    assert not unmatched
    for k, v in params.items():
        np.testing.assert_array_equal(np.asarray(loaded[k]), v, err_msg=k)
        np.testing.assert_array_equal(mom[k], momentum[k], err_msg=k)

"""VGG_CNN_M_1024 conv5 body (functional JAX, NHWC).

Capability parity with ``detectron/modeling/VGG_CNN_M_1024.py``
(arXiv:1405.3531): conv1 7x7/2 (no pad) + LRN + 3x3/2 maxpool (gradients
stopped below pool1 as in the reference), conv2 5x5/2 + LRN + pool,
conv3..conv5 3x3. Output 512 channels at 1/16 scale.
"""

import jax
import jax.numpy as jnp
import numpy as np

LAYERS = [  # (name, kernel, in, out, stride, pad)
    ('conv1', 7, 3, 96, 2, 0),
    ('conv2', 5, 96, 256, 2, 0),
    ('conv3', 3, 256, 512, 1, 1),
    ('conv4', 3, 512, 512, 1, 1),
    ('conv5', 3, 512, 512, 1, 1),
]


def param_shapes():
    return {name + suffix: ((k, k, cin, cout) if suffix == '_w' else (cout,))
            for name, k, cin, cout, _, _ in LAYERS
            for suffix in ('_w', '_b')}


def init_params(rng, dtype=jnp.float32):
    params = {}
    keys = jax.random.split(rng, len(LAYERS))
    for i, (name, k, cin, cout, _, _) in enumerate(LAYERS):
        std = np.sqrt(2.0 / (k * k * cin))
        params[name + '_w'] = std * jax.random.normal(
            keys[i], (k, k, cin, cout), dtype)
        params[name + '_b'] = jnp.zeros((cout,), dtype)
    return params


def _lrn(x, size=5, alpha=0.0005, beta=0.75, bias=2.0):
    """Caffe cross-channel LRN (alpha is the TOTAL alpha, divided by size)."""
    sq = jnp.square(x)
    half = size // 2
    padded = jnp.pad(sq, ((0, 0), (0, 0), (0, 0), (half, half)))
    window = sum(padded[..., i:i + x.shape[-1]] for i in range(size))
    return x / jnp.power(bias + (alpha / size) * window, beta)


def _maxpool_3x3s2(x):
    # Caffe MaxPool kernel 3 stride 2 pad 0 uses CEIL output sizing: pad the
    # bottom/right so no input is dropped
    h, w = x.shape[1], x.shape[2]
    ph = (-(h - 3)) % 2
    pw = (-(w - 3)) % 2
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                constant_values=-jnp.inf)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), 'VALID')


def forward(params, x, freeze_at=None):
    """x: (N, H, W, 3). Returns (features, 512, 1/16)."""
    def conv(x, name, stride, pad):
        w = params[name + '_w'].astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x, w, (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=x.dtype)
        return y + params[name + '_b'].astype(x.dtype)

    x = jax.nn.relu(conv(x, 'conv1', 2, 0))
    x = _lrn(x)
    x = _maxpool_3x3s2(x)
    x = jax.lax.stop_gradient(x)  # reference stops grads below pool1
    x = jax.nn.relu(conv(x, 'conv2', 2, 0))
    x = _lrn(x)
    x = _maxpool_3x3s2(x)
    x = jax.nn.relu(conv(x, 'conv3', 1, 1))
    x = jax.nn.relu(conv(x, 'conv4', 1, 1))
    x = jax.nn.relu(conv(x, 'conv5', 1, 1))
    return x, 512, 1.0 / 16.0

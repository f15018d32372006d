"""VGG-16 conv body (functional JAX, NHWC).

Capability parity with ``detectron/modeling/VGG16.py:9-58``
(``add_VGG16_conv5_body_origin``): 13 3x3 convs in 5 stages; with
``WSL.DILATION == 2`` the last pool is stride 1 and conv5_* use dilation 2,
giving spatial_scale 1/8 — the flagship NA-fWebSOD configuration. The body is
usually frozen (``TRAIN.FREEZE_CONV_BODY``) and initialized from the Caffe
``VGG_ILSVRC_16_layers_v1.pkl`` checkpoint via ``utils/checkpoint.py``.

Params are a flat dict of Caffe2-style blob names -> arrays in TPU layouts
(conv weights HWIO, biases (C,)). Inputs are NHWC float32/bfloat16 images that
have already been BGR pixel-mean subtracted by the data layer.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

# (name, in_ch, out_ch) per stage; pools after each stage
VGG16_STAGES = [
    [('conv1_1', 3, 64), ('conv1_2', 64, 64)],
    [('conv2_1', 64, 128), ('conv2_2', 128, 128)],
    [('conv3_1', 128, 256), ('conv3_2', 256, 256), ('conv3_3', 256, 256)],
    [('conv4_1', 256, 512), ('conv4_2', 512, 512), ('conv4_3', 512, 512)],
    [('conv5_1', 512, 512), ('conv5_2', 512, 512), ('conv5_3', 512, 512)],
]


def param_shapes(dilation=2):
    """Shapes of all conv body params (HWIO weights, (C,) biases)."""
    shapes = {}
    for stage in VGG16_STAGES:
        for name, cin, cout in stage:
            shapes[name + '_w'] = (3, 3, cin, cout)
            shapes[name + '_b'] = (cout,)
    return shapes


def init_params(rng, dilation=2, dtype=jnp.float32):
    """MSRA-style init (only used when no pretrained pkl is given)."""
    params = {}
    keys = jax.random.split(rng, 32)
    i = 0
    for stage in VGG16_STAGES:
        for name, cin, cout in stage:
            fan_in = 3 * 3 * cin
            std = np.sqrt(2.0 / fan_in)
            params[name + '_w'] = (
                jax.random.normal(keys[i], (3, 3, cin, cout), dtype) * std
            )
            params[name + '_b'] = jnp.zeros((cout,), dtype)
            i += 1
    return params


def _conv(x, w, b, dilation=1):
    pad = dilation  # 3x3 'same' conv: pad == dilation
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=x.dtype,
    )
    return y + b.astype(y.dtype)


def _maxpool_raw(x, stride):
    # Caffe2 MaxPool kernel=2, pad=0 (floor semantics == VALID window)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, stride, stride, 1),
        padding='VALID',
    )


# Custom VJP for the 2x2 pools: XLA's default reduce_window backward is a
# select-and-scatter op that TPUs execute slowly AND that forces layout-
# change copies of the full-resolution activations around it (profiled at
# ~7.7 ms/step of the CSC family's 63.6, scripts/profile_csc.py — the CPG
# image-gradient passes are the only consumers; flagship training freezes
# the body and never differentiates a pool). The replacement recomputes
# the four window-element comparisons and routes the cotangent to the
# FIRST max in row-major window order — exactly XLA SelectAndScatter's
# GE-select tie-break AND Caffe's argmax mask routing — as pure
# elementwise/reshape ops the TPU vector unit streams at HBM speed.


def _sh(t, ax, d):
    """t shifted so position i reads t[i-d] along ax, zero/False padded."""
    pads = [(0, 0)] * t.ndim
    pads[ax] = (d, 0) if d > 0 else (0, -d)
    tt = jnp.pad(t, pads)
    idx = [slice(None)] * t.ndim
    idx[ax] = slice(0, t.shape[ax]) if d > 0 else slice(-d, None)
    return tt[tuple(idx)]


def _swap(t, ax, parity_odd):
    """Exchange each in-window pair along ax: out[i] = t[i ^ 1]."""
    return jnp.where(parity_odd, _sh(t, ax, 1), _sh(t, ax, -1))


def _dilate2(t, h, w):
    """Place t[a, b] at [2a, 2b] of an (h, w) grid (zeros elsewhere)."""
    cfg = [(0, 0, 0), (0, h - 2 * t.shape[1] + 1, 1),
           (0, w - 2 * t.shape[2] + 1, 1), (0, 0, 0)]
    return jax.lax.pad(t, jnp.zeros((), t.dtype), cfg)


def _mp_fwd(x, stride):
    y = _maxpool_raw(x, stride)
    return y, (x, y)


def _mp_bwd(stride, res, g):
    x, y = res
    if stride == 2:
        # Non-overlapping windows, computed ENTIRELY at full resolution
        # with shift-by-1 / parity-select / interior-pad ops so XLA keeps
        # the native (N, H, W, C) tiling end-to-end. Two earlier forms
        # lowered badly on v5e: strided quarter slices became s32 row
        # gathers (~4.4 ms/seed at 704px), and an (H/2, 2, W/2, 2, C)
        # reshape materialized T(2,128)-laid-out broadcasts (~3.7).
        # Routing is FIRST max in row-major window order — identical to
        # XLA SelectAndScatter's GE-select and Caffe's argmax mask
        # (bit-equal, pinned by tests/test_backbones.py::TestMaxPoolVJP).
        n, h, w, c = x.shape
        row_odd = (jnp.arange(h) % 2 == 1)[None, :, None, None]
        col_odd = (jnp.arange(w) % 2 == 1)[None, None, :, None]

        def spread(t):  # window-corner values -> every window element
            s = t + _swap(t, 1, row_odd)
            return s + _swap(s, 2, col_odd)

        # per-position window max via pair swaps (cheaper than dilating
        # the saved y back up: each _dilate2 materialized a full-res pad,
        # ~1 ms/seed at 704px)
        th = jnp.maximum(x, _swap(x, 1, row_odd))
        y_up = jnp.maximum(th, _swap(th, 2, col_odd))
        m = x == y_up
        # first-max tie-break: drop any element whose window has an
        # earlier (row-major) max — the left pair-neighbor (odd cols),
        # or either element of the pair-row above (odd rows)
        mu = _sh(m, 1, 1)
        earlier = ((col_odd & _sh(m, 2, 1))
                   | (row_odd & (mu | _swap(mu, 2, col_odd))))
        chosen = m & ~earlier
        dx = jnp.where(chosen, spread(_dilate2(g, h, w)),
                       jnp.zeros((), g.dtype))
        return (dx,)
    # stride 1 (the small dilated pool4): overlapping windows — mask the
    # four shifted views and sum the four padded contributions. The sum
    # order differs from SelectAndScatter's scatter-add by <= 1 ULP
    # (PARITY.md); routing (first max, row-major) is identical.
    x00 = x[:, :-1, :-1, :]
    x01 = x[:, :-1, 1:, :]
    x10 = x[:, 1:, :-1, :]
    x11 = x[:, 1:, 1:, :]
    c00 = x00 == y
    c01 = (x01 == y) & ~c00
    c10 = (x10 == y) & ~c00 & ~c01
    c11 = ~(c00 | c01 | c10)  # the max is always one of the four
    zero = jnp.zeros((), g.dtype)
    dx = (jnp.pad(jnp.where(c00, g, zero), ((0, 0), (0, 1), (0, 1), (0, 0)))
          + jnp.pad(jnp.where(c01, g, zero), ((0, 0), (0, 1), (1, 0), (0, 0)))
          + jnp.pad(jnp.where(c10, g, zero), ((0, 0), (1, 0), (0, 1), (0, 0)))
          + jnp.pad(jnp.where(c11, g, zero), ((0, 0), (1, 0), (1, 0), (0, 0))))
    return (dx,)


@functools.lru_cache(maxsize=None)
def _maxpool2x2(stride):
    f = jax.custom_vjp(lambda x: _maxpool_raw(x, stride))
    f.defvjp(lambda x: _mp_fwd(x, stride),
             lambda res, g: _mp_bwd(stride, res, g))
    return f


def _maxpool(x, stride):
    return _maxpool2x2(stride)(x)


def forward(params, x, dilation=2, freeze_at=2):
    """Run the conv5 body. x: (N, H, W, 3). Returns (features, spatial_scale).

    With dilation=2: pool4 is stride 1 and conv5 is dilated -> scale 1/8
    (VGG16.py:39-48); otherwise standard stride-16 VGG (VGG16.py:49-58).
    """
    dtype = x.dtype
    for si, stage in enumerate(VGG16_STAGES):
        is_conv5 = (si == 4)
        for name, _, _ in stage:
            d = dilation if (is_conv5 and dilation == 2) else 1
            x = _conv(x, params[name + '_w'].astype(dtype),
                      params[name + '_b'], dilation=d)
            x = jax.nn.relu(x)
        if si < 4:  # pools after stages 1-4 only (conv5 has no pool)
            if si == 3 and dilation == 2:
                x = _maxpool(x, stride=1)
            else:
                x = _maxpool(x, stride=2)
        if si + 1 == freeze_at:
            # TRAIN.FREEZE_AT == 2 stops gradients at pool2 (VGG16.py:22-23);
            # with FREEZE_CONV_BODY the head applies stop_gradient anyway.
            x = jax.lax.stop_gradient(x)
    spatial_scale = 1.0 / 8.0 if dilation == 2 else 1.0 / 16.0
    return x, spatial_scale


def feature_shape(im_h, im_w, dilation=2):
    """Static output spatial dims for an (im_h, im_w) input."""
    h, w = im_h, im_w
    for _ in range(3):  # pool1-3 stride 2
        h, w = h // 2, w // 2
    if dilation == 2:
        h, w = h - 1, w - 1  # pool4 kernel 2 stride 1
    else:
        h, w = h // 2, w // 2
    return h, w

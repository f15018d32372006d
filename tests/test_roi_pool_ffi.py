"""Native XLA custom-call RoIPool (native/roi_pool_ffi.cpp) vs the pure-XLA
reference implementation: forward bit-exactness and saved-argmax backward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nafwebsod_tpu.ops import roi_pool as rp


def _inputs(seed=0, H=33, W=41, C=24, R=57):
    rng = np.random.RandomState(seed)
    feat = jnp.asarray(rng.randn(H, W, C).astype(np.float32))
    x1 = rng.uniform(-5, (W - 2) * 8, R)
    y1 = rng.uniform(-5, (H - 2) * 8, R)
    rois = np.stack([np.zeros(R), x1, y1,
                     x1 + rng.uniform(1, 300, R),
                     y1 + rng.uniform(1, 300, R)], 1).astype(np.float32)
    return feat, jnp.asarray(rois)


ffi_ok = pytest.mark.skipif(not rp._ffi_ok(),
                            reason='roi_pool FFI library unavailable')


@ffi_ok
def test_ffi_forward_matches_xla_exactly():
    feat, rois = _inputs()
    out_ffi = rp._roi_pool_ffi(feat, rois, 7, 7, 0.125)
    out_xla = rp.roi_pool_xla(feat, rois, 7, 7, 0.125)
    np.testing.assert_array_equal(np.asarray(out_ffi), np.asarray(out_xla))


@ffi_ok
def test_ffi_backward_matches_xla():
    feat, rois = _inputs(seed=1)
    g = jnp.asarray(np.random.RandomState(2).randn(
        rois.shape[0], 7, 7, feat.shape[2]).astype(np.float32))
    _, vjp_ffi = jax.vjp(lambda f: rp._roi_pool_ffi(f, rois, 7, 7, 0.125),
                         feat)
    _, vjp_xla = jax.vjp(lambda f: rp.roi_pool_xla(f, rois, 7, 7, 0.125),
                         feat)
    np.testing.assert_allclose(np.asarray(vjp_ffi(g)[0]),
                               np.asarray(vjp_xla(g)[0]),
                               rtol=1e-6, atol=1e-6)


@ffi_ok
def test_ffi_argmax_scatter_matches_xla_vjp():
    """The C kernel's saved argmax reproduces the XLA pool's vjp scatter
    (unique maxima with random floats -> identical routing)."""
    feat, rois = _inputs(seed=5)
    h, w = feat.shape[:2]
    g = jnp.asarray(np.random.RandomState(6).randn(
        rois.shape[0], 7, 7, feat.shape[2]).astype(np.float32))
    _, am = rp._roi_pool_ffi_raw(feat, rois, 7, 7, 0.125)
    d_scatter = rp.argmax_scatter_grad(am, g, h, w)
    _, vjp_xla = jax.vjp(lambda f: rp.roi_pool_xla(f, rois, 7, 7, 0.125),
                         feat)
    np.testing.assert_allclose(np.asarray(d_scatter),
                               np.asarray(vjp_xla(g)[0]),
                               rtol=1e-6, atol=1e-6)


@ffi_ok
def test_ffi_grad_of_grad():
    """The CSC/CPG branches differentiate twice through the pool."""
    feat, rois = _inputs(seed=7, H=12, W=12, C=4, R=3)

    def f(x):
        return (rp._roi_pool_ffi(x * x, rois, 7, 7, 0.125) ** 2).sum()

    gg = jax.grad(lambda x: jax.grad(f)(x).sum())(feat)
    assert np.isfinite(np.asarray(gg)).all()


@ffi_ok
def test_ffi_backward_bf16_features():
    """bf16 feat: roi_pool_xla PRESERVES the input dtype (pure max), so the
    bwd must differentiate at f32 to accept the f32-cast cotangent — this
    is the bf16 CPU train path (CSC/CPG image gradients included)."""
    feat32, rois = _inputs(seed=8, H=16, W=16, C=8, R=9)
    feat = feat32.astype(jnp.bfloat16)
    g = jnp.asarray(np.random.RandomState(9).randn(
        rois.shape[0], 7, 7, feat.shape[2]).astype(np.float32))
    out, vjp = jax.vjp(lambda f: rp._roi_pool_ffi(f, rois, 7, 7, 0.125),
                       feat)
    g = g.astype(out.dtype)  # the custom vjp sees a bf16 cotangent
    d = vjp(g)[0]
    assert d.dtype == feat.dtype
    _, vjp_xla = jax.vjp(
        lambda f: rp.roi_pool_xla(f, rois, 7, 7, 0.125),
        feat.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(d, np.float32),
        np.asarray(vjp_xla(g.astype(jnp.float32))[0]
                   .astype(jnp.bfloat16), np.float32),
        rtol=1e-6, atol=1e-6)
    # grad-of-grad at bf16 (the CSC path) traces without dtype errors
    def f(x):
        return (rp._roi_pool_ffi(x, rois, 7, 7, 0.125)
                .astype(jnp.float32) ** 2).sum()
    gg = jax.grad(lambda x: jax.grad(f)(x).astype(jnp.float32).sum())(feat)
    assert np.isfinite(np.asarray(gg, np.float32)).all()


@ffi_ok
def test_ffi_empty_bins_and_degenerate_rois():
    feat, _ = _inputs(seed=3)
    # zero-area roi + roi entirely off-image (clipped windows -> empty bins)
    rois = jnp.asarray(np.array([
        [0, 64.0, 64.0, 64.0, 64.0],
        [0, -400.0, -400.0, -320.0, -320.0],
    ], np.float32))
    out_ffi = rp._roi_pool_ffi(feat, rois, 7, 7, 0.125)
    out_xla = rp.roi_pool_xla(feat, rois, 7, 7, 0.125)
    np.testing.assert_array_equal(np.asarray(out_ffi), np.asarray(out_xla))


@ffi_ok
def test_dispatcher_uses_ffi_on_cpu():
    if jax.default_backend() != 'cpu':
        pytest.skip('cpu-only dispatch test')
    feat, rois = _inputs(seed=4)
    out = rp.roi_pool(feat, rois, 7, 7, 0.125)
    ref = rp.roi_pool_xla(feat, rois, 7, 7, 0.125)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
